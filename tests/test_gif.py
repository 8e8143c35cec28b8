"""Real GIF decode: LZW (variable code widths, cScSc case, dictionary
resets), block walk (extensions, sub-blocks, local color tables),
interlacing, and the ValueError-only corruption contract."""

import struct

import numpy as np
import pytest


def test_gif_round_trip_shapes_and_palettes():
    from grasper_spark.functions.multimodal import decode_gif, gif_bytes

    rng = np.random.default_rng(4)
    for h, w, ncol in [(1, 1, 2), (3, 5, 4), (9, 7, 16), (12, 11, 256)]:
        pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
        idx = rng.integers(0, ncol, size=(h, w), dtype=np.uint8)
        assert np.array_equal(decode_gif(gif_bytes(idx, pal)), pal[idx])


def test_gif_lzw_dictionary_reset_path():
    """200x300 random 256-color frame forces 12-bit codes and at least
    one 4096-entry dictionary reset."""
    from grasper_spark.functions.multimodal import decode_gif, gif_bytes

    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, size=(200, 300), dtype=np.uint8)
    assert np.array_equal(decode_gif(gif_bytes(idx, pal)), pal[idx])


def test_gif_lzw_handcrafted_stream():
    """Hand-packed LZW codes decoded without the encoder: mcs=2,
    clear=4, end=5; stream CLEAR,1,2,6(=[1,2]),END over 3-bit codes
    -> pixels [1, 2, 1, 2] (code 6 is the first dynamic entry)."""
    from grasper_spark.functions.multimodal import _lzw_decode

    codes = [(4, 3), (1, 3), (2, 3), (6, 3), (5, 3)]
    acc = n = 0
    data = bytearray()
    for c, w in codes:
        acc |= c << n
        n += w
        while n >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        data.append(acc & 0xFF)
    assert list(_lzw_decode(bytes(data), 2, 4)) == [1, 2, 1, 2]


def test_gif_cscsc_special_case():
    """The code-equals-next-entry case: stream CLEAR,1,6,END where 6
    is not yet in the table -> prev + prev[0] = [1, 1]."""
    from grasper_spark.functions.multimodal import _lzw_decode

    codes = [(4, 3), (1, 3), (6, 3), (5, 3)]
    acc = n = 0
    data = bytearray()
    for c, w in codes:
        acc |= c << n
        n += w
        while n >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        data.append(acc & 0xFF)
    assert list(_lzw_decode(bytes(data), 2, 3)) == [1, 1, 1]


def test_gif_extension_blocks_skipped():
    """A graphics-control extension (the 89a norm) between the color
    table and the frame must be walked over by sub-block length."""
    from grasper_spark.functions.multimodal import decode_gif, gif_bytes

    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    payload = gif_bytes(idx, pal)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE + 4-byte block + term
    comment = b"\x21\xfe\x05hello\x00"  # comment extension
    # splice after header + LSD + GCT (6 + 7 + 6 bytes for 2 colors)
    cut = 6 + 7 + 6
    spliced = payload[:cut] + gce + comment + payload[cut:]
    assert np.array_equal(decode_gif(spliced), pal[idx])


def test_gif_interlaced_frame_deinterlaces():
    from grasper_spark.functions.multimodal import decode_gif, gif_bytes, _lzw_encode

    rng = np.random.default_rng(6)
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, size=(11, 3), dtype=np.uint8)
    # build an interlaced variant by hand: rows stored in 4-pass order
    order = np.concatenate([
        np.arange(0, 11, 8), np.arange(4, 11, 8),
        np.arange(2, 11, 4), np.arange(1, 11, 2),
    ])
    stored = idx[order]
    lzw = _lzw_encode(stored.reshape(-1), 2)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        blocks += bytes([len(chunk)]) + chunk
    payload = (
        b"GIF89a"
        + struct.pack("<HHBBB", 3, 11, 0x80 | 0x11, 0, 0)
        + pal.tobytes()
        + struct.pack("<sHHHHB", b",", 0, 0, 3, 11, 0x40)  # interlace flag
        + bytes([2]) + bytes(blocks) + b"\x00;"
    )
    assert np.array_equal(decode_gif(payload), pal[idx])


def test_gif_rejections():
    from grasper_spark.functions.multimodal import decode_gif, gif_bytes

    pal = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)
    idx = np.zeros((2, 2), dtype=np.uint8)
    good = gif_bytes(idx, pal)
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"JIF89a" + good[6:])
    with pytest.raises(ValueError, match="no image frame"):
        # header + LSD + GCT + trailer, no image descriptor
        decode_gif(good[: 6 + 7 + 6] + b";")
    with pytest.raises(ValueError):
        decode_gif(good[:-6])  # truncated mid-LZW


def test_gif_corruption_raises_only_valueerror():
    import random

    from grasper_spark.functions.multimodal import decode_gif, gif_bytes

    rng = np.random.default_rng(8)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(6, 8), dtype=np.uint8)
    base = bytearray(gif_bytes(idx, pal))
    random.seed(13)
    for _ in range(300):
        p = bytearray(base)
        for _ in range(random.randint(1, 4)):
            i = random.randrange(len(p))
            p[i] ^= 1 << random.randrange(8)
        try:
            decode_gif(bytes(p))
        except ValueError:
            pass
    for cut in range(len(base)):
        try:
            decode_gif(bytes(base[:cut]))
        except ValueError:
            pass


def test_synth_gif_formulas_match_decoder():
    from grasper_spark.functions.multimodal import (
        decode_gif, gif_bytes, synth_gif_frame,
    )

    for mid in (1, 3, 7, 97, 101, 195):
        idx, pal = synth_gif_frame(mid)
        assert idx.shape == (3 + mid % 3, 4 + mid % 4)
        assert np.array_equal(decode_gif(gif_bytes(idx, pal)), pal[idx])


def test_pipeline_gif_rows(spark):
    from grasper_spark.functions.multimodal import (
        gif_bytes, luma_int, media_decode_features, synth_gif_frame,
    )

    idx, pal = synth_gif_frame(5)
    media = spark.createDataFrame(
        [(5, gif_bytes(idx, pal), "image")], ["media_id", "payload", "media_type"]
    )
    rows = media_decode_features(media).collect()
    assert len(rows) == 1 and rows[0].op == "gif"
    lu = luma_int(pal[idx])
    assert (rows[0].a, rows[0].b) == (idx.shape[1], idx.shape[0])
    assert rows[0].c == int(lu.sum()) and rows[0].d == int(lu[0, 0])
