"""MJPEG-in-AVI: JPEG-compressed video streams through the existing
RIFF demux + the baseline JPEG decoder — the compressed-AVI path the
r7 verdict noted "falls out of" JPEG. Gray-valued frames (R=G=B) are
exact through the integer YCbCr pair, so roundtrips assert equality;
other codecs stay refused."""

import struct

import numpy as np
import pytest

from grasper_spark.functions.multimodal import (
    avi_bytes,
    decode_avi,
    synth_mjpg_frames,
)


def _flat_gray_frames(vals, h=8, w=16):
    """One HxWx3 gray-valued frame per value list: frame f is flat
    8x8 blocks with the given per-block values."""
    out = []
    for block_vals in vals:
        row = np.repeat(np.asarray(block_vals, dtype=np.uint8), 8)
        plane = np.tile(row, (h, 1))
        out.append(np.stack([plane] * 3, axis=-1))
    return out


def test_mjpeg_roundtrip_gray_valued_exact():
    frames = _flat_gray_frames([[10, 200], [99, 45]])
    payload = avi_bytes(frames, fps=12, codec="MJPG")
    fps, got = decode_avi(payload)
    assert fps == 12
    assert len(got) == 2
    for f, g in zip(frames, got):
        np.testing.assert_array_equal(g, f)


def test_mjpeg_payload_contains_jpeg_frames():
    frames = _flat_gray_frames([[1, 2]])
    payload = avi_bytes(frames, fps=5, codec="MJPG")
    assert b"MJPG" in payload
    # the frame chunk body is a real JPEG (SOI marker)
    i = payload.find(b"00dc")
    assert i > 0
    assert payload[i + 8:i + 10] == b"\xff\xd8"


def test_mjpeg_color_tolerance():
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(2)]
    _, got = decode_avi(avi_bytes(frames, fps=10, codec="MJPG"))
    for f, g in zip(frames, got):
        assert np.abs(g.astype(int) - f.astype(int)).max() <= 4


def test_unknown_codec_still_refused():
    frames = _flat_gray_frames([[1, 2]])
    with pytest.raises(ValueError, match="codec"):
        avi_bytes(frames, codec="XVID")
    # and on the decode side: patch the fourcc of a valid MJPG payload
    payload = bytearray(avi_bytes(frames, codec="MJPG"))
    i = payload.find(b"MJPG")  # strh codec
    payload[i:i + 4] = b"XVID"
    j = payload.find(b"MJPG", i + 4)  # strf biCompression
    payload[j:j + 4] = b"XVID"
    with pytest.raises(ValueError, match="codec|compression"):
        decode_avi(bytes(payload))


def test_mjpeg_truncated_frame_raises():
    frames = _flat_gray_frames([[7, 8]])
    payload = avi_bytes(frames, fps=10, codec="MJPG")
    i = payload.find(b"00dc")
    (size,) = struct.unpack("<I", payload[i + 4:i + 8])
    cut = payload[: i + 8 + size // 2]
    with pytest.raises(ValueError):
        decode_avi(cut)


def test_mjpeg_corruption_fuzz_valueerror_only():
    frames = _flat_gray_frames([[3, 250]])
    base = avi_bytes(frames, fps=10, codec="MJPG")
    for pos in range(12, len(base), 11):
        p = bytearray(base)
        p[pos] ^= 0xA5
        try:
            fps, got = decode_avi(bytes(p))
            assert isinstance(got, list)
        except ValueError:
            pass


def test_synth_mjpg_frames_formulas():
    # n = 2 frames, 16x8, two flat blocks per frame:
    # v(bx, f) = (41*id + 13*bx + 57*f) % 256
    frames = synth_mjpg_frames(9)
    assert len(frames) == 2
    assert frames[0].shape == (8, 16, 3)
    assert frames[0][0, 0, 0] == (41 * 9) % 256
    assert frames[0][0, 8, 0] == (41 * 9 + 13) % 256
    assert frames[1][0, 0, 0] == (41 * 9 + 57) % 256
    # gray-valued: all three channels equal
    assert (frames[0][..., 0] == frames[0][..., 1]).all()


def test_dib_path_unchanged():
    # the uncompressed path keeps its exact behavior
    f = np.zeros((2, 2, 3), dtype=np.uint8)
    f[0, 0] = (255, 0, 0)
    fps, got = decode_avi(avi_bytes([f], fps=5))
    assert fps == 5
    np.testing.assert_array_equal(got[0], f)
