"""Regression tests for the round-6 ADVICE.md findings.

1. COVERAGE.md / SCALE.md — two table rows had been merged onto one
   line ('... || ...'), corrupting the markdown tables.
2. multimodal.media_decode_features — the on_error='null' try block
   wrapped feature computation and emit, so a genuine bug in the
   feature math was silently converted into an 'error' row. The try
   now covers ONLY the decode calls.
3. multimodal.byte_stats — summed via buf.astype(np.int64), an 8x
   materialized copy of the concatenated Arrow batch buffer; now
   accumulates in int64 through reduceat's dtype without the copy.
4. (task 7) multimodal.bmp_bytes — built scanlines in a per-row
   Python loop; now one vectorized block write.
"""

import inspect
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# 1. markdown table integrity
# ---------------------------------------------------------------------------


def test_markdown_tables_have_no_merged_rows():
    for doc in ("COVERAGE.md", "SCALE.md"):
        with open(os.path.join(REPO, doc)) as fh:
            for ln, line in enumerate(fh, 1):
                # a merged pair of table rows reads '... || ...' — two
                # adjacent pipes mid-line never occur in a well-formed
                # single row (empty cells render as '| |' with a space)
                assert " || " not in line, f"{doc}:{ln} merged table rows"


# ---------------------------------------------------------------------------
# 2. on_error scope: decode only
# ---------------------------------------------------------------------------


def test_media_decode_try_scope_covers_decode_only():
    """The except path must not be reachable from feature math: no
    emit() call may sit inside the try block (decode raises, features
    emit OUTSIDE the except's reach). Structural, but deterministic —
    a behavioral probe would need to inject a bug into the worker
    subprocess."""
    from grasper_spark.functions import multimodal

    src = inspect.getsource(multimodal.media_decode_features)
    assert "try:" in src and "except Exception" in src
    body = src.split("try:", 1)[1].split("except Exception", 1)[0]
    assert "emit(" not in body, "feature emit leaked into the decode try block"
    assert "decode_wav" in body and "decode_bmp" in body and "decode_png" in body


def test_media_decode_feature_rows_survive_null_policy(spark):
    """Valid payloads under on_error='null' must yield REAL rows (the
    policy only converts decode failures)."""
    from grasper_spark.functions.multimodal import (
        media_decode_features, png_bytes, synth_png_pixels, wav_bytes,
    )

    wav = wav_bytes(np.array([1, -2, 3], dtype=np.int16))
    png = png_bytes(synth_png_pixels(3))
    media = spark.createDataFrame(
        [(1, wav, "audio"), (2, png, "image"), (3, b"\x00garbage", "image")],
        ["media_id", "payload", "media_type"],
    )
    got = {r.media_id: r.op for r in media_decode_features(media).collect()}
    assert got == {1: "wav", 2: "png", 3: "error"}


# ---------------------------------------------------------------------------
# 3. byte_stats: int64 accumulation, no 8x copy
# ---------------------------------------------------------------------------


def test_byte_stats_accumulates_int64_without_copy():
    from grasper_spark.functions import multimodal
    from grasper_spark.functions.multimodal import byte_stats

    # the flagged allocation is gone from the source
    src = inspect.getsource(multimodal.byte_stats)
    assert "astype(np.int64)" not in src
    assert "dtype=np.int64" in src  # reduceat accumulates in int64

    # sum of one segment exceeds int32 (and uint8) range: proves the
    # accumulator dtype, not just the output dtype
    big = b"\xff" * 9_000_000  # 255 * 9e6 = 2.295e9 > 2^31
    lens, sums, firsts = byte_stats([big, b"ab", b""])
    assert sums.tolist() == [255 * 9_000_000, 195, 0]
    assert lens.tolist() == [9_000_000, 2, 0]
    assert firsts.tolist() == [255, 97, -1]


# ---------------------------------------------------------------------------
# 4. bmp_bytes: vectorized block write (behavioral — odd stride, big)
# ---------------------------------------------------------------------------


def test_bmp_bytes_vectorized_round_trip_large_odd_stride():
    from grasper_spark.functions import multimodal
    from grasper_spark.functions.multimodal import bmp_bytes, decode_bmp

    src = inspect.getsource(multimodal.bmp_bytes)
    assert "for y in range" not in src, "per-row Python loop is back"

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(257, 331, 3), dtype=np.uint8)  # stride pad 3
    assert np.array_equal(decode_bmp(bmp_bytes(px)), px)
