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


def test_line_dedup_semantics_pinned(spark):
    # the payload-free line_dedup must keep the old form's exact
    # contract: drop EVERY occurrence of a line whose normalized form
    # appears in >= max_df docs; blanks kept verbatim; all-hot docs
    # come back as '' with n_kept 0; original line order preserved
    from grasper_spark.functions.dedup import line_dedup

    df = spark.createDataFrame(
        [
            (1, "alpha\nBOILER\nbeta"),
            (2, "boiler\ngamma"),
            (3, "\n\n"),
            (4, "  BOILER  \nonly boiler"),
            (5, "only boiler\nunique"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["text"], r["n_lines"], r["n_kept"])
           for r in line_dedup(df, max_df=2).collect()}
    assert got == {
        1: ("alpha\nbeta", 3, 2),
        2: ("gamma", 2, 1),
        3: ("\n\n", 3, 3),          # blanks never hot
        4: ("", 2, 0),              # all-hot -> empty text
        5: ("unique", 2, 1),
    }


def test_text_name_cache_reuses_columns(spark):
    from grasper_spark.functions.text import lang_id, quality_score

    # same name -> same cached Column object (built once per process)
    assert lang_id("text") is lang_id("text")
    assert quality_score("text") is quality_score("text")
    assert lang_id("text") is not lang_id("other")
    # Column args bypass the cache but stay correct
    df = spark.createDataFrame([("the and of to in",)], "text string")
    a = df.select(lang_id("text").alias("l")).collect()[0]["l"]
    b = df.select(lang_id(F.col("text")).alias("l")).collect()[0]["l"]
    assert a == b == "en"


def test_shingle_relation_identity_fast_path(spark):
    from grasper_spark.functions import dedup as dd

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "b c d e")], "doc_id long, text string"
    )
    r1 = dd._hashed_shingle_relation(df, "text", "doc_id", 3, "word")
    r2 = dd._hashed_shingle_relation(df, "text", "doc_id", 3, "word")
    assert r1 is r2  # identity fast path (no JVM re-analysis)
    # a different corpus evicts the slot and must NOT return the stale
    # relation for the old one afterwards without rebuilding
    df2 = spark.createDataFrame([(9, "x y z w")], "doc_id long, text string")
    r3 = dd._hashed_shingle_relation(df2, "text", "doc_id", 3, "word")
    assert r3 is not r2
    r4 = dd._hashed_shingle_relation(df, "text", "doc_id", 3, "word")
    assert r4 is not r2 or dd._SH_PERSISTED[0][1] is r4
    assert sorted(r["doc_id"] for r in r4.select("doc_id").distinct().collect()) == [1, 2]


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


def test_positional_grams_pinned(spark):
    # _positional_grams moved to the same zero-shuffle index-explode
    # form as _exploded_shingles, with the explode index doubling as
    # the 0-based gram position. Pin the (id, pos, gram-key) contract
    # the old window-lead form produced: contiguous positions, no rows
    # for docs shorter than n (incl. empty/whitespace-only), char unit.
    from grasper_spark.functions.dedup import _positional_grams

    df = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, ""),
            (3, "   "),
            (4, "x y"),
            (5, " Pad  me "),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r["doc_id"], r["pos"], r["k"])
        for r in _positional_grams(df, "text", "doc_id", 3).collect()
    )
    def key(s):
        return df.sparkSession.createDataFrame(
            [(s,)], "g string"
        ).select(F.xxhash64("g").alias("k")).collect()[0]["k"]

    # only doc 1 has >= 3 tokens (doc 5 normalizes to 'pad me', 2 tokens
    # -> no rows, the old lead-null filter's behavior)
    assert got == [(1, 0, key("a b c")), (1, 1, key("b c d"))]
    # n=1 on an empty doc must emit nothing (the old t != '' filter)
    n1 = _positional_grams(df.filter("doc_id in (2,3)"), "text", "doc_id", 1)
    assert n1.count() == 0
    # char unit: positions address codepoints of the normalized text
    ch = sorted(
        (r["doc_id"], r["pos"])
        for r in _positional_grams(
            df.filter("doc_id = 4"), "text", "doc_id", 2, unit="char"
        ).collect()
    )
    assert ch == [(4, 0), (4, 1)]  # "x y" -> 'x ', ' y'


def test_positional_grams_no_window_exchange(spark):
    from grasper_spark.functions.dedup import _positional_grams

    df = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id long, text string"
    )
    plan = (
        _positional_grams(df, "text", "doc_id", 3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning" not in plan, plan
    assert "Window" not in plan, plan


def test_entry_plan_memo_identity_and_isolation(spark):
    # the entry-level plan memo (__spark_entry__._plan_memo) must return
    # the SAME unmaterialized plan for the same (session, corpus) and a
    # DIFFERENT one per corpus — and each must compute ITS corpus' rows
    # (no cross-corpus leakage, no result caching)
    import __spark_entry__ as entry

    d1, d2 = "/root/testdata/sf0.001", "/root/testdata/sf0.01"

    def chk(df):  # content checksum — both corpora have 500 docs
        return df.select(
            F.xxhash64(F.concat_ws("|", *df.columns)).alias("h")
        ).agg(F.expr("bit_xor(h)").alias("h")).collect()[0]["h"]

    a = entry._q_doc_text_lang(spark, d1)
    assert entry._q_doc_text_lang(spark, d1) is a
    h1 = chk(a)
    b = entry._q_doc_text_lang(spark, d2)
    assert b is not a
    assert chk(b) != h1
    # returning to the first corpus hits the memo and still recomputes
    assert chk(entry._q_doc_text_lang(spark, d1)) == h1
    # the cached object is a lazy PLAN — nothing got persisted
    assert not a.storageLevel.useMemory and not a.storageLevel.useDisk
    # the other memoized entries share the helper: spot-check identity
    assert entry._q_events_agg(spark, d1) is entry._q_events_agg(spark, d1)
    assert entry._q_emb_cosine_topk(spark, d1) is entry._q_emb_cosine_topk(spark, d1)
    assert entry._q_doc_line_dedup(spark, d1) is entry._q_doc_line_dedup(spark, d1)


def test_entry_plan_memo_slot_guard(spark):
    # doc_neardup_jaccard's memo keys on the overlap_pair_stats object,
    # which is itself guarded by the one-slot shingle persist: switching
    # corpora evicts the slot, and the entry must rebuild (stale plans
    # over an evicted persist would silently recompute the WRONG corpus)
    import __spark_entry__ as entry

    d1, d2 = "/root/testdata/sf0.001", "/root/testdata/sf0.01"
    a = entry._q_doc_neardup_jaccard(spark, d1)
    assert entry._q_doc_neardup_jaccard(spark, d1) is a
    n1 = a.count()
    b = entry._q_doc_neardup_jaccard(spark, d2)  # evicts the d1 slot
    assert b is not a
    c = entry._q_doc_neardup_jaccard(spark, d1)  # rebuilt, not stale
    assert c is not a
    assert c.count() == n1
