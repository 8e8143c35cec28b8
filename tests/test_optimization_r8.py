"""Regression tests for round-8 optimization-round internals.

1. _exploded_shingles moved from the posexplode + window-lead form (one
   Window.partitionBy(id) exchange per call) to the zero-shuffle
   index-explode + try_element_at form. The row-set contract is pinned
   here against hand-derived expectations for every edge class the old
   form handled: empty docs (no rows), short docs (one whole-text
   shingle), exact-n docs, longer docs (duplicates KEPT when
   distinct=False), and the char unit.
2. The new plan must contain NO Exchange before the first aggregation/
   consumer — the point of the rewrite.
"""

import pytest
from pyspark.sql import functions as F

from grasper_spark.functions.dedup import _exploded_shingles


ROWS = [
    (1, ""),                          # empty → no shingle rows
    (2, "a"),                         # 1 token, n=3 → whole text
    (3, "a b"),                       # 2 tokens, n=3 → whole text
    (4, "a b c"),                     # exactly n → one shingle
    (5, "a b c d"),                   # n+1 → two shingles
    (6, "x x x x x"),                 # duplicate shingles
    (7, "  Padded   SPACES  here now "),  # normalization + trim
    (8, "\t\n  \t"),                  # whitespace-only → like empty
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def _rows(df):
    return sorted((r["doc_id"], r["sh"]) for r in df.collect())


def test_word_shingles_non_distinct(docs):
    got = _rows(_exploded_shingles(docs, "text", "doc_id", 3, distinct=False))
    # docs 1 and 8: split(trim('')) = [''] — ONE empty-string token, so
    # whitespace-only docs carry a single '' shingle (old-form parity;
    # char unit filters '' out, see test_char_unit_short_and_exact)
    assert got == sorted(
        [
            (1, ""), (8, ""),
            (2, "a"),
            (3, "a b"),
            (4, "a b c"),
            (5, "a b c"), (5, "b c d"),
            (6, "x x x"), (6, "x x x"), (6, "x x x"),  # dupes kept
            (7, "padded spaces here"), (7, "spaces here now"),
        ]
    )


def test_word_shingles_distinct(docs):
    got = _rows(_exploded_shingles(docs, "text", "doc_id", 3, distinct=True))
    assert got == sorted(
        [
            (1, ""), (8, ""),
            (2, "a"),
            (3, "a b"),
            (4, "a b c"),
            (5, "a b c"), (5, "b c d"),
            (6, "x x x"),
            (7, "padded spaces here"), (7, "spaces here now"),
        ]
    )


def test_char_unit_short_and_exact(spark):
    df = spark.createDataFrame(
        [(1, "ab"), (2, "abc"), (3, "abcd"), (4, "")],
        "doc_id long, text string",
    )
    got = _rows(_exploded_shingles(df, "text", "doc_id", 3, True, unit="char"))
    assert got == sorted([(1, "ab"), (2, "abc"), (3, "abc"), (3, "bcd")])


def test_no_hash_exchange_in_non_distinct_plan(docs):
    # the rewrite removed the Window.partitionBy(id) hash exchange; the
    # only exchange _exploded_shingles may still introduce is _spread's
    # round-robin parallelism guard on under-partitioned local inputs
    plan = (
        _exploded_shingles(docs, "text", "doc_id", 3, distinct=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning" not in plan, plan
    assert "Window" not in plan, plan
