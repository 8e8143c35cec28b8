"""Baseline JPEG (SOF0) codec tests — the closed-form oracle
discipline: flat-8x8-block images under the all-ones quant table are
JPEG-exact (DC-only DCT domain), so roundtrips assert EQUALITY there;
non-flat content gets tolerance bounds; malformed payloads raise
ValueError only (the on_error='null' contract)."""

import struct

import numpy as np
import pytest

from grasper_spark.functions.jpeg import (
    QUANT_CHROM,
    QUANT_FLAT,
    QUANT_LUM,
    ZIGZAG,
    decode_jpeg,
    jpeg_bytes,
    rgb_to_ycbcr_int,
    synth_jpg_pixels,
    ycbcr_to_rgb_int,
)


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spot-pin the published scan order (ITU T.81 Figure 5)
    assert ZIGZAG[:8].tolist() == [0, 1, 8, 16, 9, 2, 3, 10]
    assert ZIGZAG[-3:].tolist() == [55, 62, 63]


@pytest.mark.parametrize("mid", [1, 2, 3, 5, 10, 37, 96, 255, 1001])
def test_gray_flat_blocks_roundtrip_exact(mid):
    px = synth_jpg_pixels(mid)
    got = decode_jpeg(jpeg_bytes(px))
    assert got.shape == (px.shape[0], px.shape[1], 1)
    np.testing.assert_array_equal(got[:, :, 0], px)


def test_synth_jpg_formulas_match_module_doc():
    # w = 8*(1 + id%3), h = 8*(1 + id%2), v = (37id + 11bx + 23by) % 256
    px = synth_jpg_pixels(7)
    assert px.shape == (8 * 2, 8 * 2)
    assert px[0, 0] == (37 * 7) % 256
    assert px[0, 8] == (37 * 7 + 11) % 256
    assert px[8, 0] == (37 * 7 + 23) % 256
    # flat within each block
    assert (px[:8, :8] == px[0, 0]).all()


@pytest.mark.parametrize("sub", ["444", "422", "420"])
def test_gray_valued_color_roundtrip_exact(sub):
    # R=G=B images survive the integer YCbCr pair exactly (Y=v,
    # Cb=Cr=128), and constant chroma survives any subsampling
    v = np.repeat(np.repeat((np.arange(4).reshape(2, 2) * 60 + 20).astype(np.uint8), 8, 0), 8, 1)
    rgb = np.stack([v, v, v], axis=-1)
    got = decode_jpeg(jpeg_bytes(rgb, subsampling=sub))
    np.testing.assert_array_equal(got, rgb)


def test_ycbcr_pair_exact_on_gray():
    v = np.arange(256, dtype=np.uint8).reshape(16, 16)
    rgb = np.stack([v, v, v], axis=-1)
    ycc = rgb_to_ycbcr_int(rgb)
    np.testing.assert_array_equal(ycc[..., 0], v)
    assert (ycc[..., 1] == 128).all() and (ycc[..., 2] == 128).all()
    np.testing.assert_array_equal(ycbcr_to_rgb_int(ycc), rgb)


def test_nonflat_color_tolerance():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    got = decode_jpeg(jpeg_bytes(img, subsampling="444"))
    # all-ones quant: error only from DCT rounding (<= 4 observed <= 3)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 4


def test_smooth_image_standard_tables():
    y, x = np.mgrid[0:48, 0:64]
    img = np.stack(
        [np.clip(x * 3, 0, 255), np.clip(y * 4, 0, 255), np.clip(x + y, 0, 255)],
        axis=-1,
    ).astype(np.uint8)
    for sub in ("444", "420"):
        got = decode_jpeg(jpeg_bytes(img, quant=(QUANT_LUM, QUANT_CHROM), subsampling=sub))
        err = np.abs(got.astype(int) - img.astype(int))
        assert err.mean() < 6, (sub, err.mean())


def test_odd_dimensions_pad_and_crop():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (13, 21), dtype=np.uint8)
    got = decode_jpeg(jpeg_bytes(img))
    assert got.shape == (13, 21, 1)
    assert np.abs(got[:, :, 0].astype(int) - img.astype(int)).max() <= 4
    # 420 color with non-MCU-multiple dims
    cimg = rng.integers(0, 256, (19, 27, 3), dtype=np.uint8)
    got = decode_jpeg(jpeg_bytes(cimg, subsampling="420"))
    assert got.shape == (19, 27, 3)


def test_restart_intervals_roundtrip():
    y, x = np.mgrid[0:24, 0:40]
    g = np.clip(x * 2 + y, 0, 255).astype(np.uint8)
    a = decode_jpeg(jpeg_bytes(g, restart_interval=3))
    b = decode_jpeg(jpeg_bytes(g))
    np.testing.assert_array_equal(a, b)
    # and the DRI payload really contains RST markers
    payload = jpeg_bytes(g, restart_interval=1)
    assert b"\xff\xd0" in payload or b"\xff\xd1" in payload


def test_rejects_unsupported_shapes():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"GIF89a" + b"\x00" * 20)
    with pytest.raises(ValueError, match="empty image"):
        jpeg_bytes(np.zeros((0, 8), dtype=np.uint8))
    with pytest.raises(ValueError, match=r"\(H,W"):
        jpeg_bytes(np.zeros((8, 8, 2), dtype=np.uint8))


def test_relabeled_sof_markers_rejected():
    # SOF2 decodes for real now (test_jpeg_progressive.py), but a
    # baseline payload RELABELED as progressive is malformed: its
    # full-band interleaved scan is illegal under SOF2 rules
    p = bytearray(jpeg_bytes(synth_jpg_pixels(1)))
    i = p.find(b"\xff\xc0")
    p[i + 1] = 0xC2
    with pytest.raises(ValueError, match="DC scan with Se"):
        decode_jpeg(bytes(p))
    # extended-sequential (SOF1) stays honestly unsupported
    p[i + 1] = 0xC1
    with pytest.raises(ValueError, match="extended/lossless/arithmetic"):
        decode_jpeg(bytes(p))


def test_16bit_dqt_rejected():
    p = bytearray(jpeg_bytes(synth_jpg_pixels(1)))
    i = p.find(b"\xff\xdb")
    p[i + 4] |= 0x10  # Pq=1: 16-bit table
    with pytest.raises(ValueError, match="16-bit quantization"):
        decode_jpeg(bytes(p))


def test_truncation_raises_valueerror():
    p = jpeg_bytes(synth_jpg_pixels(5))
    for cut in (3, 10, len(p) // 2, len(p) - 3):
        with pytest.raises(ValueError):
            decode_jpeg(p[:cut])


def test_corruption_fuzz_valueerror_only():
    # flip bytes across the payload: decode must raise ValueError or
    # return an array — never IndexError/struct.error/KeyError (the
    # media module's on_error contract wraps ValueError paths only)
    base = jpeg_bytes(synth_jpg_pixels(9))
    for pos in range(2, len(base), 7):
        p = bytearray(base)
        p[pos] ^= 0xA5
        try:
            out = decode_jpeg(bytes(p))
            assert isinstance(out, np.ndarray)
        except ValueError:
            pass


def test_missing_sos_rejected():
    p = jpeg_bytes(synth_jpg_pixels(1))
    i = p.find(b"\xff\xda")
    with pytest.raises(ValueError, match="no scan data"):
        decode_jpeg(p[:i] + b"\xff\xd9")


def test_byte_stuffing_exercised():
    # an image whose entropy stream is long enough to contain 0xFF
    # bytes with high probability; roundtrip exactness proves the
    # stuff/unstuff pair agrees
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    payload = jpeg_bytes(img)
    assert b"\xff\x00" in payload  # stuffing actually happened
    got = decode_jpeg(payload)
    assert np.abs(got[:, :, 0].astype(int) - img.astype(int)).max() <= 4


def test_pipeline_jpg_rows(spark):
    # magic-byte sniff routes 0xFFD8 to the real decoder inside
    # media_decode_features; a TRUNCATED MP3 frame (valid sync, body
    # shorter than the header's frame length) lands on the error path
    from pyspark.sql import types as T

    from grasper_spark.functions.jpeg import jpeg_bytes as jb
    from grasper_spark.functions.multimodal import media_decode_features

    rows = [
        (1, bytearray(jb(synth_jpg_pixels(1)))),
        (2, bytearray(b"\xff\xfb\x90\x44" + b"\x00" * 16)),  # truncated MP3
    ]
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    out = {r["media_id"]: r for r in media_decode_features(
        spark.createDataFrame(rows, schema)
    ).collect()}
    px = synth_jpg_pixels(1)
    assert out[1]["op"] == "jpg"
    assert (out[1]["a"], out[1]["b"]) == (px.shape[1], px.shape[0])
    assert out[1]["c"] == int(px.astype(np.int64).sum())
    assert out[2]["op"] == "error"


# ---- property-based: the exactness contract holds over the whole
# flat-block domain, not just the synth formulas ----

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        bw=st.integers(1, 4),
        bh=st.integers(1, 3),
        seed=st.integers(0, 2**31 - 1),
        dri=st.sampled_from([0, 1, 3]),
    )
    def test_flat_block_roundtrip_property(bw, bh, seed, dri):
        import numpy as np

        rng = np.random.default_rng(seed)
        blocks = rng.integers(0, 256, (bh, bw), dtype=np.uint8)
        px = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
        got = decode_jpeg(jpeg_bytes(px, restart_interval=dri))
        np.testing.assert_array_equal(got[:, :, 0], px)

    @settings(max_examples=15, deadline=None)
    @given(
        bw=st.integers(2, 4),
        bh=st.integers(2, 3),
        seed=st.integers(0, 2**31 - 1),
        sub=st.sampled_from(["444", "422", "420"]),
    )
    def test_gray_valued_color_roundtrip_property(bw, bh, seed, sub):
        import numpy as np

        rng = np.random.default_rng(seed)
        blocks = rng.integers(0, 256, (bh, bw), dtype=np.uint8)
        # 16x16-aligned flat regions so subsampled chroma MCUs stay flat
        v = np.repeat(np.repeat(blocks, 16, axis=0), 16, axis=1)
        rgb = np.stack([v, v, v], axis=-1)
        got = decode_jpeg(jpeg_bytes(rgb, subsampling=sub))
        np.testing.assert_array_equal(got, rgb)
except ImportError:  # pragma: no cover
    pass
