"""Real PNG decode: CRC-checked chunk walk, stdlib-zlib IDAT inflate,
and the five scanline filters — round-trips, a hand-crafted IDAT check
that is independent of the encoder, 16-bit depth and Adam7 interlacing
(round 8), rejection of the still-unsupported shapes (sub-byte depths,
palette-without-PLTE, unknown interlace methods), and the on_error
pipeline policy for truncated payloads."""

import struct
import zlib

import numpy as np
import pytest


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def _png(w, h, depth, color_type, interlace, idat_raw) -> bytes:
    from grasper_spark.functions.multimodal import PNG_SIG

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(idat_raw))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ch", [3, 4])
@pytest.mark.parametrize("seed", range(5))
def test_png_round_trip_every_filter_phase(ch, seed):
    """filter_seed rotates which filter each row gets; 6 rows >= 5
    filters, so every (filter, channel-count) pair round-trips."""
    from grasper_spark.functions.multimodal import decode_png, png_bytes

    rng = np.random.default_rng(100 * ch + seed)
    px = rng.integers(0, 256, size=(6, 5, ch), dtype=np.uint8)
    assert np.array_equal(decode_png(png_bytes(px, filter_seed=seed)), px)


def test_png_handcrafted_scanlines_decode_exactly():
    """Filtered bytes written BY HAND (not via png_bytes), with the
    expected reconstruction hand-computed per the PNG spec — a shared
    encoder/decoder bug cannot cancel out here.

    2x4 RGB image, raw rows:
      row0 = (10,20,30) (110,220,130)
      row1 = (15,25,35) (115,225,135)
      row2 = (20,30,40) (120,230,140)
      row3 = (21,31,41) (121,231,141)
    """
    from grasper_spark.functions.multimodal import decode_png

    # row0 Sub(1):  px0 - 0 = (10,20,30); px1 - px0 = (100,200,100)
    r0 = bytes([1, 10, 20, 30, 100, 200, 100])
    # row1 Up(2):   raw - row0 = (5,5,5) (5,5,5)
    r1 = bytes([2, 5, 5, 5, 5, 5, 5])
    # row2 Avg(3):  px0: raw - (0 + up)//2 = (20,30,40) - (7,12,17)
    #               px1: raw - (left + up)//2 = (120,230,140) - ((20+115)//2,(30+225)//2,(40+135)//2)
    #                    = (120-67, 230-127, 140-87)
    r2 = bytes([3, 13, 18, 23, 53, 103, 53])
    # row3 Paeth(4): px0: pred=paeth(0, up=(20,30,40), 0)=up -> raw-up=(1,1,1)
    #                px1: pred=paeth(left=(21,31,41), up=(120,230,140), ul=(20,30,40))
    #                p = left+up-ul = (121,231,141); pa=|p-left|=(100,200,100),
    #                pb=|p-up|=(1,1,1), pc=|p-ul|=(101,201,101) -> up wins
    #                raw - up = (1,1,1)
    r3 = bytes([4, 1, 1, 1, 1, 1, 1])
    got = decode_png(_png(2, 4, 8, 2, 0, r0 + r1 + r2 + r3))
    want = np.array(
        [
            [[10, 20, 30], [110, 220, 130]],
            [[15, 25, 35], [115, 225, 135]],
            [[20, 30, 40], [120, 230, 140]],
            [[21, 31, 41], [121, 231, 141]],
        ],
        dtype=np.uint8,
    )
    assert np.array_equal(got, want)


def test_png_multiple_idat_chunks_concatenate():
    from grasper_spark.functions.multimodal import PNG_SIG, decode_png, png_bytes

    px = np.arange(3 * 4 * 3, dtype=np.uint8).reshape(3, 4, 3)
    payload = png_bytes(px, filter_seed=2)
    # re-split the single IDAT into two chunks at an arbitrary byte
    sig_ihdr = payload[: 8 + 12 + 13]
    idat_len = struct.unpack(">I", payload[33:37])[0]
    idat_body = payload[41 : 41 + idat_len]
    rest = payload[41 + idat_len + 4 :]  # IEND chunk
    split = max(1, len(idat_body) // 2)
    rebuilt = (
        sig_ihdr
        + _chunk(b"IDAT", idat_body[:split])
        + _chunk(b"IDAT", idat_body[split:])
        + rest
    )
    assert rebuilt[:8] == PNG_SIG
    assert np.array_equal(decode_png(rebuilt), px)


def test_png_crc_mismatch_raises():
    from grasper_spark.functions.multimodal import decode_png, png_bytes

    px = np.zeros((2, 2, 3), dtype=np.uint8)
    payload = bytearray(png_bytes(px))
    # flip one bit inside the IDAT body (after IHDR = 8 + 25 bytes)
    payload[8 + 25 + 8 + 2] ^= 0x40
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(payload))


def test_png_rejects_unsupported_shapes():
    from grasper_spark.functions.multimodal import decode_png

    # 16-bit and Adam7 are SUPPORTED as of round 8 — the old rejects
    # became decodes (pinned in test_png_16bit/adam7 below); what stays
    # refused: sub-byte depths, unknown interlace methods, bad combos
    with pytest.raises(ValueError, match="4-bit"):
        decode_png(_png(1, 1, 4, 0, 0, bytes([0, 0])))
    with pytest.raises(ValueError, match="missing PLTE"):
        decode_png(_png(1, 1, 8, 3, 0, bytes([0, 0])))
    with pytest.raises(ValueError, match="interlace method 2"):
        decode_png(_png(1, 1, 8, 2, 2, bytes([0, 1, 2, 3])))
    with pytest.raises(ValueError, match="16-bit palette"):
        decode_png(_png(1, 1, 16, 3, 0, bytes([0, 0, 0])))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\xff\xd8\xff\xe0 jpeg bytes")
    # the previously-refused shapes now decode
    one_px_16 = decode_png(_png(1, 1, 16, 2, 0, bytes([0] * 7)))
    assert one_px_16.shape == (1, 1, 3) and one_px_16.dtype.name == "uint16"
    one_px_i = decode_png(_png(1, 1, 8, 2, 1, bytes([0, 1, 2, 3])))
    assert (one_px_i == [[[1, 2, 3]]]).all()


def _palette_png(w, h, plte: bytes, idx_rows: bytes) -> bytes:
    from grasper_spark.functions.multimodal import PNG_SIG

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", zlib.compress(idx_rows))
        + _chunk(b"IEND", b"")
    )


def test_png_palette_decodes_through_plte():
    from grasper_spark.functions.multimodal import decode_png

    plte = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255])  # red green blue
    # 2x2 indices with Sub filter on row 1: raw (2,0) -> filt (2, 254)
    rows = bytes([0, 0, 1]) + bytes([1, 2, 254])
    got = decode_png(_palette_png(2, 2, plte, rows))
    want = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 0, 0]]], dtype=np.uint8
    )
    assert np.array_equal(got, want)
    # out-of-range index: raise, not garbage
    bad = bytes([0, 0, 7]) + bytes([0, 0, 0])
    with pytest.raises(ValueError, match="palette index out of range"):
        decode_png(_palette_png(2, 2, plte, bad))


@pytest.mark.parametrize("ch", [1, 2])
def test_png_grayscale_round_trip(ch):
    """Color types 0 (gray) and 4 (gray+alpha) — all four non-palette
    8-bit PNG types decode."""
    from grasper_spark.functions.multimodal import decode_png, png_bytes

    rng = np.random.default_rng(50 + ch)
    px = rng.integers(0, 256, size=(7, 4, ch), dtype=np.uint8)
    for seed in range(5):
        assert np.array_equal(decode_png(png_bytes(px, filter_seed=seed)), px)
    # a 2-D array encodes as grayscale and decodes to HxWx1
    if ch == 1:
        got = decode_png(png_bytes(px[:, :, 0]))
        assert got.shape == (7, 4, 1)
        assert np.array_equal(got[:, :, 0], px[:, :, 0])


def test_pipeline_grayscale_png_features(spark):
    from grasper_spark.functions.multimodal import (
        media_decode_features, png_bytes,
    )

    gray = np.arange(12, dtype=np.uint8).reshape(3, 4, 1)
    ga = np.stack([np.full((3, 4), 9, np.uint8), np.full((3, 4), 7, np.uint8)], axis=-1)
    media = spark.createDataFrame(
        [(1, png_bytes(gray), "image"), (2, png_bytes(ga), "image")],
        ["media_id", "payload", "media_type"],
    )
    rows = {r.media_id: r for r in media_decode_features(media).collect()}
    # gray: luma = the gray plane itself; d = luma[0,0]
    assert rows[1].op == "png" and (rows[1].a, rows[1].b) == (4, 3)
    assert rows[1].c == int(gray.sum()) and rows[1].d == 0
    # gray+alpha: luma sum over the gray plane, d = alpha plane sum
    assert rows[2].c == 9 * 12 and rows[2].d == 7 * 12


def test_png_truncation_and_stream_errors():
    from grasper_spark.functions.multimodal import decode_png, png_bytes

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = png_bytes(px)
    # cut inside the IEND/IDAT tail -> truncated chunk or missing IEND
    with pytest.raises(ValueError):
        decode_png(payload[:-15])
    # valid chunks but the inflated stream is the wrong size
    short = zlib.decompress  # noqa: F841 (doc: stream len checked post-inflate)
    bad = _png(3, 2, 8, 2, 0, bytes([0] * (1 + 9)))  # one row missing
    with pytest.raises(ValueError, match="IDAT size mismatch"):
        decode_png(bad)
    # invalid filter type byte
    bad_filter = _png(1, 1, 8, 2, 0, bytes([7, 1, 2, 3]))
    with pytest.raises(ValueError, match="invalid scanline filter"):
        decode_png(bad_filter)
    # corrupt deflate stream with a VALID chunk CRC
    from grasper_spark.functions.multimodal import PNG_SIG

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    junk = (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", b"\x01notdeflate")
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="corrupt IDAT"):
        decode_png(junk)


def test_synth_png_formulas_match_decoder():
    from grasper_spark.functions.multimodal import (
        decode_png, png_bytes, synth_png_pixels,
    )

    for mid in (1, 3, 5, 7, 17, 97, 101, 195):
        px = synth_png_pixels(mid)
        assert px.shape == (2 + mid % 4, 3 + mid % 5, 4 if mid % 4 == 3 else 3)
        assert np.array_equal(decode_png(png_bytes(px, filter_seed=mid)), px)


def test_pipeline_png_rows_and_truncated_idat_policy(spark):
    from grasper_spark.functions.multimodal import (
        decode_png, luma_int, media_decode_features, png_bytes,
        synth_png_pixels, synthetic_media,
    )

    docs = spark.createDataFrame([(i,) for i in (1, 3, 7, 11)], ["doc_id"])
    rows = {r.media_id: r for r in
            media_decode_features(synthetic_media(docs)).collect()}
    # synthetic_media routes id%4==3 to PNG (RGBA), id%4==1 stays BMP
    assert rows[1].op == "bmp" and rows[3].op == "png" and rows[7].op == "png"
    px = synth_png_pixels(7)
    lu = luma_int(px[..., :3])
    assert (rows[7].a, rows[7].b) == (px.shape[1], px.shape[0])
    assert rows[7].c == int(lu.sum())
    assert rows[7].d == int(px[..., 3].astype(np.int64).sum())

    # truncated IDAT: error row under on_error='null', raise under 'raise'
    good = png_bytes(synth_png_pixels(3))
    media = spark.createDataFrame(
        [(1, good[: len(good) - 18], "image"), (2, good, "image")],
        ["media_id", "payload", "media_type"],
    )
    got = {r.media_id: r for r in media_decode_features(media).collect()}
    assert got[1].op == "error" and got[1].a == -1
    assert got[2].op == "png"
    with pytest.raises(Exception):
        media_decode_features(media, on_error="raise").collect()


def test_decoders_raise_only_valueerror_under_corruption():
    """Production contract: a malformed payload raises ValueError (the
    type media_decode_features' on_error policy documents) — bit-flips
    and truncations must never leak struct.error / zlib.error /
    IndexError. (4000-trial sweeps per decoder ran out-of-band; this
    keeps a fast deterministic slice in CI.)"""
    import random

    from grasper_spark.functions.multimodal import (
        bmp_bytes, decode_bmp, decode_png, decode_wav, png_bytes, wav_bytes,
    )

    rng = np.random.default_rng(3)
    corpus = [
        (decode_png, bytearray(png_bytes(
            rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8), filter_seed=1))),
        (decode_wav, bytearray(wav_bytes(
            rng.integers(-32768, 32768, 50).astype(np.int16)))),
        (decode_bmp, bytearray(bmp_bytes(
            rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)))),
    ]
    random.seed(7)
    for fn, base in corpus:
        for _ in range(300):  # random bit flips
            p = bytearray(base)
            for _ in range(random.randint(1, 4)):
                i = random.randrange(len(p))
                p[i] ^= 1 << random.randrange(8)
            try:
                fn(bytes(p))
            except ValueError:
                pass  # the contract
        for cut in range(0, len(base), 7):  # truncation sweep
            try:
                fn(bytes(base[:cut]))
            except ValueError:
                pass


if True:  # keep hypothesis import pattern consistent with the suite
    try:
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=40, deadline=None)
        @given(
            st.integers(min_value=1, max_value=9),
            st.integers(min_value=1, max_value=9),
            st.sampled_from([3, 4]),
            st.integers(min_value=0, max_value=2**31 - 1),
        )
        def test_png_round_trip_property(w, h, ch, seed):
            from grasper_spark.functions.multimodal import decode_png, png_bytes

            rng = np.random.default_rng(seed)
            px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
            assert np.array_equal(decode_png(png_bytes(px, filter_seed=seed)), px)

    except ImportError:  # pragma: no cover
        pass


# ---- round 8: Adam7 interlacing + 16-bit depth -------------------------


def test_png_adam7_roundtrip_all_channels_and_sizes():
    import numpy as np

    from grasper_spark.functions.multimodal import decode_png, png_bytes

    rng = np.random.default_rng(5)
    for ch in (1, 2, 3, 4):
        for (h, w) in [(1, 1), (1, 9), (2, 3), (5, 5), (8, 8), (9, 10), (16, 17)]:
            px = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
            got = decode_png(png_bytes(px, filter_seed=h + w, interlace=True))
            np.testing.assert_array_equal(got, px)


def test_png_adam7_empty_passes_handled():
    # a 1x1 image populates only pass 1; 2x2 populates passes 1/4/6/7
    # with passes 2/3/5 empty — the spec says empty passes contribute
    # zero scanlines, which is exactly what the encoder emits
    import numpy as np

    from grasper_spark.functions.multimodal import decode_png, png_bytes

    px = np.array([[[10, 20, 30], [40, 50, 60]],
                   [[70, 80, 90], [11, 12, 13]]], dtype=np.uint8)
    got = decode_png(png_bytes(px, interlace=True))
    np.testing.assert_array_equal(got, px)


def test_png_16bit_roundtrip_and_dtype():
    import numpy as np

    from grasper_spark.functions.multimodal import decode_png, png_bytes

    rng = np.random.default_rng(6)
    for ch in (1, 2, 3, 4):
        for il in (False, True):
            px = rng.integers(0, 65536, (6, 7, ch), dtype=np.uint16)
            got = decode_png(png_bytes(px, bit_depth=16, interlace=il, filter_seed=3))
            assert got.dtype == np.uint16
            np.testing.assert_array_equal(got, px)


def test_png_16bit_big_endian_on_the_wire():
    # one pixel, value 0x0102: stored big-endian per the spec
    import zlib

    import numpy as np

    from grasper_spark.functions.multimodal import decode_png, png_bytes

    p = png_bytes(np.array([[[0x0102]]], dtype=np.uint16), bit_depth=16)
    # IDAT body: filter byte 0 + 0x01 0x02
    idat_at = p.find(b"IDAT") + 4
    size = int.from_bytes(p[idat_at - 8:idat_at - 4], "big")
    raw = zlib.decompress(p[idat_at:idat_at + size])
    assert raw == b"\x00\x01\x02"
    assert decode_png(p)[0, 0, 0] == 0x0102


def test_png_interlaced_corruption_fuzz_valueerror_only():
    import numpy as np

    from grasper_spark.functions.multimodal import decode_png, png_bytes

    rng = np.random.default_rng(9)
    base = png_bytes(rng.integers(0, 256, (5, 5, 3), dtype=np.uint8), interlace=True)
    for pos in range(8, len(base), 5):
        p = bytearray(base)
        p[pos] ^= 0xA5
        try:
            out = decode_png(bytes(p))
            assert out.shape[2] in (1, 2, 3, 4)
        except ValueError:
            pass
