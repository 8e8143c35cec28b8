"""Real video demux: RIFF/AVI with uncompressed 24bpp DIB frames,
multi-frame (animated) GIF, and the video_frame_features sampling op."""

import numpy as np
import pytest


def test_avi_round_trip_multi_frame():
    from grasper_spark.functions.multimodal import avi_bytes, decode_avi

    rng = np.random.default_rng(21)
    for nframes, h, w in [(1, 4, 5), (3, 7, 6), (6, 3, 3)]:
        fs = [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
              for _ in range(nframes)]
        fps, got = decode_avi(avi_bytes(fs, fps=12))
        assert fps == 12 and len(got) == nframes
        for a, b in zip(fs, got):
            assert np.array_equal(a, b)


def test_avi_rejects_compressed_and_garbage():
    from grasper_spark.functions.multimodal import avi_bytes, decode_avi

    f = np.zeros((2, 2, 3), dtype=np.uint8)
    good = bytearray(avi_bytes([f]))
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        decode_avi(b"RIFF\x00\x00\x00\x00WAVE")
    # flip the strh codec to an unsupported compressed fourcc (MJPG is
    # supported as of r8 — see tests/test_mjpeg.py; XVID stays refused)
    i = bytes(good).find(b"DIB ")
    bad = bytes(good[:i]) + b"XVID" + bytes(good[i + 4:])
    with pytest.raises(ValueError, match="compressed AVI codec"):
        decode_avi(bad)
    # strh says MJPG but strf compression says uncompressed: refused,
    # not guessed
    halfway = bytes(good[:i]) + b"MJPG" + bytes(good[i + 4:])
    with pytest.raises(ValueError, match="inconsistent MJPG"):
        decode_avi(halfway)
    with pytest.raises(ValueError):
        decode_avi(bytes(good[:-20]))  # truncated frame


def test_avi_corruption_raises_only_valueerror():
    import random

    from grasper_spark.functions.multimodal import avi_bytes, decode_avi

    rng = np.random.default_rng(22)
    base = bytearray(avi_bytes(
        [rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8) for _ in range(2)]
    ))
    random.seed(9)
    for _ in range(300):
        p = bytearray(base)
        for _ in range(random.randint(1, 4)):
            i = random.randrange(len(p))
            p[i] ^= 1 << random.randrange(8)
        try:
            decode_avi(bytes(p))
        except ValueError:
            pass
    for cut in range(0, len(base), 5):
        try:
            decode_avi(bytes(base[:cut]))
        except ValueError:
            pass


def test_gif_multi_frame_demux_and_partial_refusal():
    import struct

    from grasper_spark.functions.multimodal import (
        decode_gif, gif_bytes, gif_frames,
    )

    rng = np.random.default_rng(23)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    fs = [rng.integers(0, 8, size=(5, 6), dtype=np.uint8) for _ in range(3)]
    payload = gif_bytes(fs, pal)
    got = gif_frames(payload)
    assert len(got) == 3
    for idx, g in zip(fs, got):
        assert np.array_equal(g, pal[idx])
    # decode_gif = first frame
    assert np.array_equal(decode_gif(payload), pal[fs[0]])
    # a SECOND frame that is a partial patch must be refused, not
    # silently returned uncomposited
    i = payload.index(b",", payload.index(b",") + 1)  # 2nd image descriptor
    patched = bytearray(payload)
    patched[i + 1:i + 9] = struct.pack("<HHHH", 1, 1, 3, 2)  # offset + smaller
    with pytest.raises(ValueError, match="partial-canvas"):
        gif_frames(bytes(patched))


def test_synth_avi_formulas_match_decoder():
    from grasper_spark.functions.multimodal import (
        avi_bytes, decode_avi, synth_avi_frames,
    )

    for mid in (0, 2, 4, 8, 96, 98, 194):
        fs = synth_avi_frames(mid)
        assert len(fs) == 2 + mid % 3
        assert fs[0].shape == (2 + mid % 3, 3 + mid % 4, 3)
        fps, got = decode_avi(avi_bytes(fs, fps=10))
        assert fps == 10
        for a, b in zip(fs, got):
            assert np.array_equal(a, b)


def test_video_frame_features_sampling(spark):
    from grasper_spark.functions.multimodal import (
        avi_bytes, gif_bytes, luma_int, synth_avi_frames,
        video_frame_features,
    )

    fs = synth_avi_frames(4)  # 3 frames
    rng = np.random.default_rng(24)
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    gfs = [rng.integers(0, 4, size=(3, 4), dtype=np.uint8) for _ in range(4)]
    media = spark.createDataFrame(
        [
            (1, avi_bytes(fs), "video"),
            (2, gif_bytes(gfs, pal), "video"),
            (3, b"\x00junk", "video"),
        ],
        ["media_id", "payload", "media_type"],
    )
    rows = video_frame_features(media).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    assert [r.op for r in by_id[3]] == ["error"]
    avi_rows = sorted(by_id[1], key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in avi_rows] == [0, 1, 2]
    for r, f in zip(avi_rows, fs):
        assert (r.width, r.height) == (f.shape[1], f.shape[0])
        assert r.luma_sum == int(luma_int(f).sum())
    # every_n sampling keeps frames 0 and 2 of the 4-frame GIF
    rows2 = [r for r in video_frame_features(media, every_n=2).collect()
             if r.media_id == 2]
    assert sorted(r.frame_idx for r in rows2) == [0, 2]
    with pytest.raises(ValueError):
        video_frame_features(media, every_n=0)
