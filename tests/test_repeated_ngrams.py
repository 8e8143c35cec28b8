"""Repeated n-gram span dedup (exact substring dedup, Lee et al. 2022):
span detection, island merging, removal, DuckDB parity, plan shape."""

import pytest
from pyspark.sql import functions as F


def _spans(df, **kw):
    from grasper_spark.functions.dedup import repeated_ngram_spans

    return {
        (r[0], r.span_start, r.span_end): r.n_grams
        for r in repeated_ngram_spans(df, **kw).collect()
    }


def test_cross_doc_repeated_span_detected(spark):
    docs = spark.createDataFrame(
        [
            (1, "x1 x2 p q r s x3 x4"),
            (2, "y1 p q r s y2 y3"),
            (3, "entirely different tokens here now"),
        ],
        ["doc_id", "text"],
    )
    got = _spans(docs, n=3, min_count=2)
    # grams "p q r" (doc1 pos2 / doc2 pos1) and "q r s" (pos3 / pos2)
    # each appear twice; seeds merge into one maximal span per doc
    assert got == {(1, 2, 6): 2, (2, 1, 5): 2}


def test_islands_merge_touching_but_not_gapped(spark):
    # one doc repeated verbatim twice (so every gram is hot), plus a doc
    # where two hot regions are separated by a fresh gap > n
    base = "a b c d e"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),
            (3, f"{base} u1 u2 u3 u4 {base}"),
        ],
        ["doc_id", "text"],
    )
    got = _spans(docs, n=3, min_count=2)
    # docs 1/2: all 3 grams hot -> single span covering the whole doc
    assert got[(1, 0, 5)] == 3 and got[(2, 0, 5)] == 3
    # doc 3: hot seeds at 0,1,2 and 9,10,11 with a 4-token unique gap
    # (grams straddling the gap are unique) -> two distinct islands
    assert got[(3, 0, 5)] == 3 and got[(3, 9, 14)] == 3
    assert len([k for k in got if k[0] == 3]) == 2


def test_short_docs_and_unique_docs_yield_no_spans(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "c d e f g h")],
        ["doc_id", "text"],
    )
    # docs 1/2 are dupes but shorter than n=3: no full gram exists
    assert _spans(docs, n=3, min_count=2) == {}


def test_min_count_threshold(spark):
    docs = spark.createDataFrame(
        [(i, "p q r s") for i in range(1, 4)] + [(9, "z y x w")],
        ["doc_id", "text"],
    )
    # grams appear 3x: present at min_count=3, absent at min_count=4
    assert len(_spans(docs, n=3, min_count=3)) == 3
    assert _spans(docs, n=3, min_count=4) == {}


def test_remove_repeated_spans_drops_all_occurrences(spark):
    from grasper_spark.functions.dedup import remove_repeated_spans

    docs = spark.createDataFrame(
        [
            (1, "x1 x2 p q r s x3 x4"),
            (2, "y1 p q r s y2 y3"),
            (3, "unique tokens only in here"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in remove_repeated_spans(docs, n=3).collect()}
    assert out[1].text == "x1 x2 x3 x4" and out[1].n_removed == 4
    assert out[2].text == "y1 y2 y3" and out[2].n_removed == 4
    assert out[3].text == "unique tokens only in here"
    assert out[3].n_removed == 0 and out[3].n_tokens == 5


def test_remove_fully_covered_doc_keeps_empty_row(spark):
    from grasper_spark.functions.dedup import remove_repeated_spans

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in remove_repeated_spans(docs, n=3).collect()}
    assert set(out) == {1, 2}
    for r in out.values():
        assert r.text == "" and r.n_tokens == 0 and r.n_removed == 3


def test_remove_spans_empty_doc_reports_zero_tokens(spark):
    """Regression: split('') yields [''], and the phantom token made an
    empty document claim n_tokens=1."""
    from grasper_spark.functions.dedup import remove_repeated_spans

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "real tokens here")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in remove_repeated_spans(docs, n=3).collect()}
    assert set(out) == {1, 2, 3}
    for mid in (1, 2):
        r = out[mid]
        assert (r.text, r.n_tokens, r.n_removed) == ("", 0, 0)
    assert out[3].n_tokens == 3


def test_removal_normalizes_like_span_indexing(spark):
    from grasper_spark.functions.dedup import remove_repeated_spans

    # mixed case + multi-space: spans index NORMALIZED tokens, so the
    # cleaned text must be built from the same stream
    docs = spark.createDataFrame(
        [(1, "  KEEP1   p Q r  keep2 "), (2, "p q R")], ["doc_id", "text"]
    )
    out = {r.doc_id: r.text for r in remove_repeated_spans(docs, n=3).collect()}
    assert out[1] == "keep1 keep2" and out[2] == ""


def test_char_unit_spans_for_unsegmented_text(spark):
    """unit='char': codepoint n-grams catch repeated substrings in text
    whitespace tokenization sees as one giant token (CJK-style)."""
    from grasper_spark.functions.dedup import repeated_ngram_spans

    docs = spark.createDataFrame(
        [
            (1, "xxABCDEFGHyy"),
            (2, "zzABCDEFGHqq"),
            (3, "nothingshared"),
        ],
        ["doc_id", "text"],
    )
    # word unit: each doc is ONE token, no full 6-gram exists -> empty
    assert _spans(docs, n=6, min_count=2) == {}
    got = _spans(docs, n=6, min_count=2, unit="char")
    # normalize lowercases: 'abcdefgh' (8 chars) repeats at pos 2..10
    assert got == {(1, 2, 10): 3, (2, 2, 10): 3}


def test_char_unit_removal(spark):
    from grasper_spark.functions.dedup import remove_repeated_spans

    docs = spark.createDataFrame(
        [(1, "xxABCDEFGHyy"), (2, "zzABCDEFGHqq")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in
           remove_repeated_spans(docs, n=6, unit="char").collect()}
    assert out[1].text == "xxyy" and out[1].n_removed == 8
    assert out[2].text == "zzqq" and out[2].n_tokens == 4


def test_unit_validation(spark):
    from grasper_spark.functions.dedup import repeated_ngram_spans

    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="unit"):
        repeated_ngram_spans(docs, n=3, unit="byte")


def test_repeated_spans_match_duckdb(spark):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    from grasper_spark.functions.dedup import repeated_ngram_spans

    rows = [
        (1, "x1 x2 p q r s x3 x4"),
        (2, "y1 p q r s y2 y3"),
        (3, "a b c d e"),
        (4, "a b c d e u1 a b c d e"),
        (5, "lone words without any twins"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        tuple(r) for r in repeated_ngram_spans(docs, n=3, min_count=2).collect()
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    n = 3
    want = sorted(
        tuple(r)
        for r in con.execute(f"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
  FROM documents
), grams AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+{n - 1}], ' ') AS g
  FROM toks, unnest(range(1, len(t) - {n} + 2)) AS u(i)
), hot AS (
  SELECT g FROM grams GROUP BY g HAVING count(*) >= 2
), seeds AS (
  SELECT doc_id, pos FROM grams JOIN hot USING (g)
), flagged AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + {n}
              THEN 1 ELSE 0 END AS f
  FROM seeds WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), isl AS (
  SELECT doc_id, pos, sum(f) OVER (PARTITION BY doc_id ORDER BY pos) AS isl
  FROM flagged
)
SELECT doc_id, min(pos)::BIGINT AS span_start, (max(pos) + {n})::BIGINT AS span_end,
       count(*)::BIGINT AS n_grams
FROM isl GROUP BY doc_id, isl
""").fetchall()
    )
    assert got == want


def test_spans_plan_is_python_free(spark):
    from grasper_spark.functions.dedup import repeated_ngram_spans

    docs = spark.createDataFrame(
        [(i, f"w{i} p q r s w{i + 1}") for i in range(20)], ["doc_id", "text"]
    )
    plan = repeated_ngram_spans(docs, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
