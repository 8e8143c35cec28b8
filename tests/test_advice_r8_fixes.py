"""Regression tests for the round-8 ADVICE.md findings.

1. decode_png must reject zero-width/zero-height PNGs (valid CRCs,
   empty IDAT) with ValueError so they stay on the on_error path.
2. The compiler's edge-label IN-list fast path must survive labels
   containing backslashes/quotes (escapedStringLiterals=false).
3. decode_avi must honor the biHeight sign: negative = top-down DIB,
   no row flip.
4. The ivf ledger arm ranks the exhaustive candidate set by the
   integer key only (no float pre-cut) — covered by widening k; here
   we pin that ivf_topk with a huge k returns every candidate.
"""

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import types as T

from grasper_spark import G, PropertyGraph
from grasper_spark.functions.multimodal import (
    avi_bytes,
    decode_avi,
    decode_png,
)


def _png_raw(w, h, ihdr_extra=(8, 0, 0, 0, 0), idat_raw=b""):
    """Hand-assemble a CRC-valid PNG with the given IHDR dims."""
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, *ihdr_extra)
    idat = zlib.compress(idat_raw)
    return sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def test_png_zero_width_rejected():
    with pytest.raises(ValueError, match="empty image dimensions"):
        decode_png(_png_raw(0, 3))


def test_png_zero_height_rejected():
    with pytest.raises(ValueError, match="empty image dimensions"):
        decode_png(_png_raw(3, 0))


def test_png_zero_both_rejected():
    # w=h=0 with an IDAT that inflates to 0 bytes passes every size
    # check if the dim guard is missing; it must raise, not return an
    # empty array (the feature math indexes [0,0] outside on_error).
    with pytest.raises(ValueError, match="empty image dimensions"):
        decode_png(_png_raw(0, 0))


# ---- compiler IN-list escaping ---------------------------------------

V_SCHEMA = T.StructType(
    [
        T.StructField("vid", T.LongType()),
        T.StructField("label", T.StringType()),
        T.StructField("name", T.StringType()),
    ]
)
E_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType()),
        T.StructField("dst", T.LongType()),
        T.StructField("label", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def slash_g(spark):
    v = spark.createDataFrame(
        [(1, "a", "one"), (2, "a", "two"), (3, "a", "three"), (4, "a", "four")],
        V_SCHEMA,
    )
    e = spark.createDataFrame(
        [
            (1, 2, "a\\b"),   # embedded backslash: naive escape -> backspace
            (1, 3, "a\\"),    # trailing backslash: naive escape eats the quote
            (1, 4, "a'b"),    # quote: already escaped, must keep working
            (2, 3, "ab"),     # the literal the corrupted 'a\b' would match
        ],
        E_SCHEMA,
    )
    return G(PropertyGraph(v, e, name="slash").cache())


def test_edge_label_with_embedded_backslash(slash_g):
    got = [r.val for r in slash_g.V().has("name", "one").out("a\\b").values("name").df().collect()]
    assert got == ["two"]


def test_edge_label_with_trailing_backslash(slash_g):
    got = [r.val for r in slash_g.V().has("name", "one").out("a\\").values("name").df().collect()]
    assert got == ["three"]


def test_edge_label_with_quote(slash_g):
    got = [r.val for r in slash_g.V().has("name", "one").out("a'b").values("name").df().collect()]
    assert got == ["four"]


def test_backslash_label_does_not_leak_to_plain(slash_g):
    # 'a\b' must NOT match the plain 'ab' edge (the backspace rewrite bug)
    got = [r.val for r in slash_g.V().out("a\\b").values("name").df().collect()]
    assert got == ["two"]


# ---- AVI top-down DIB orientation ------------------------------------


def _patch_avi_topdown(payload: bytes) -> bytes:
    """Flip an avi_bytes payload to top-down: negate strf biHeight and
    un-flip the stored frame rows so display order is preserved."""
    buf = bytearray(payload)
    i = buf.find(b"strf")
    # strf chunk: cid(4) size(4) then BITMAPINFOHEADER; biHeight at +8
    off = i + 8 + 8
    (bh,) = struct.unpack_from("<i", buf, off)
    struct.pack_into("<i", buf, off, -bh)
    return bytes(buf)


def test_avi_topdown_not_flipped():
    # 2x2 frame with distinct corner colors
    f = np.zeros((2, 2, 3), dtype=np.uint8)
    f[0, 0] = (255, 0, 0)
    f[1, 1] = (0, 0, 255)
    bottom_up = avi_bytes([f], fps=5)
    fps, frames = decode_avi(bottom_up)
    assert fps == 5
    np.testing.assert_array_equal(frames[0], f)

    # top-down: same stored bytes but negative biHeight means rows are
    # already in display order -> decoded frame is the vertical mirror
    # of the bottom-up interpretation
    td = _patch_avi_topdown(bottom_up)
    _, td_frames = decode_avi(td)
    np.testing.assert_array_equal(td_frames[0], f[::-1])


# ---- ivf arm: huge k disables the float cut ---------------------------


def test_ivf_topk_huge_k_returns_all_candidates(spark):
    from grasper_spark.functions.similarity import ivf_index, ivf_topk

    rows = [(i, [float(i + 1), float((i * 7) % 5)]) for i in range(12)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    assigned, cents = ivf_index(emb, n_clusters=2, max_iter=2)
    out = ivf_topk(
        assigned, cents, emb.limit(1), k=2_000_000_000, n_probe=2
    )
    # n_probe = n_clusters + unbounded k => every non-self corpus vector
    assert out.count() == 11
