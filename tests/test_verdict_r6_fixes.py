"""Regression tests for the round-5 VERDICT "Next round" items.

1. emb_lsh_topk (the red row in CORRECTNESS_r04 AND r05) must be
   float-free in every HASHED column: the entry's schema contains no
   Double/Float type at all, the integer-exact qint_lsh_topk ranking is
   pure int64 arithmetic, and the *_ok tolerance arms are all zero.
2. No ledger entry may hash a cross-row float aggregate: an invariant
   sweep over every oracle_sql() fails on `round(sum(...))` /
   `round(avg(...))` patterns (the r4 centroid bug class — fold-order-
   sensitive float sums squeezed through a rounding that itself differs
   between engines).
3. The quantized sum plumbing (windowed_counts / time_rollup / resample
   / unigram_lm_score `quantize=`) produces int64 columns equal to the
   floor-quantized reference.
"""

import importlib.util
import os
import re

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

SF0001 = "/root/testdata/sf0.001"


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_r6", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _has_float(dt) -> bool:
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return True
    if isinstance(dt, T.ArrayType):
        return _has_float(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_has_float(f.dataType) for f in dt.fields)
    if isinstance(dt, T.MapType):
        return _has_float(dt.keyType) or _has_float(dt.valueType)
    return False


def test_emb_lsh_topk_schema_is_float_free(spark):
    """VERDICT r5 #1 done-criterion: no DoubleType column reaches the
    hash for this entry."""
    entry = _load_entry()
    df = entry.queries()["emb_lsh_topk"](spark, SF0001)
    for f in df.schema.fields:
        assert not _has_float(f.dataType), (
            f"emb_lsh_topk hashes float column {f.name}: {f.dataType} — "
            "the ledger compares by exact repr; quantize to integers"
        )


def test_emb_lsh_topk_tolerance_arms_zero(spark):
    """The *_ok arms (float library ops vs canonical integers) must be
    deterministically zero — they are what still verifies lsh_topk /
    l2_normalize / quantize_int8 / group_centroids now that the hashed
    arms are integer-only."""
    entry = _load_entry()
    df = entry.queries()["emb_lsh_topk"](spark, SF0001)
    bad = (
        df.filter(F.col("op").isin("topk_ok", "norm_ok", "quant_ok", "centroid_ok"))
        .agg(F.sum(F.abs(F.col("b"))).alias("s"))
        .collect()[0]["s"]
    )
    assert bad == 0


def test_qint_lsh_topk_matches_float_ranking_closely(spark):
    """qint_lsh_topk is a faithful ANN: on the test corpus its per-query
    neighbor SET overlaps the float lsh_topk's (same planes) — bucket
    membership may differ only where a plane dot is within quantization
    noise of zero."""
    from grasper_spark.functions.similarity import lsh_topk, qint_lsh_topk

    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    fl = lsh_topk(emb, queries, k=10, dim=64, num_planes=6)
    qi = qint_lsh_topk(emb, queries, k=10, dim=64, num_planes=6)
    fset = {(r["query_id"], r["neighbor_id"]) for r in fl.collect()}
    qset = {(r["query_id"], r["neighbor_id"]) for r in qi.collect()}
    assert len(fset & qset) >= int(0.8 * max(len(fset), 1))


def test_no_hashed_cross_row_float_aggregate_in_oracles():
    """Invariant (VERDICT r5 #2 done-criterion): no oracle hashes a
    cross-row float aggregate through rounding. `round(sum(...))` /
    `round(avg(...))` is the exact bug class that red-flagged r4 and r5:
    the float fold is order-sensitive across engines AND round() itself
    differs (exact-decimal HALF_UP vs multiply-based) on identical bits."""
    entry = _load_entry()
    pat = re.compile(r"round\s*\(\s*(sum|avg)\s*\(", re.IGNORECASE)
    offenders = {
        name: pat.search(sql).group(0)
        for name, sql in entry.oracle_sql().items()
        if pat.search(sql)
    }
    assert not offenders, f"hashed cross-row float aggregates: {offenders}"


def test_no_hashed_cross_row_float_aggregate_in_spark_entry_source():
    """Same invariant on the Spark side: the entry module must not build
    F.round(F.sum(...)) / F.round(F.avg(...)) hashed columns."""
    src = open(
        os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    ).read()
    pat = re.compile(r"F\.round\s*\(\s*F\.(sum|avg)\s*\(")
    assert not pat.search(src), pat.search(src).group(0) if pat.search(src) else None


def test_quantized_sum_plumbing(spark):
    """quantize=K paths emit int64 equal to sum(floor(v*K)) computed
    independently, and stay long through the gap-filled resample."""
    from grasper_spark.streaming.windows import (
        load_events, resample, time_rollup, windowed_counts_batch,
    )

    ev = load_events(spark, SF0001)
    ref = ev.agg(F.sum(F.floor(F.col("value") * 10000.0)).alias("s")).collect()[0]["s"]

    wc = windowed_counts_batch(spark, SF0001, quantize=10000)
    assert dict(wc.dtypes)["sum_value"] == "bigint"
    assert wc.agg(F.sum("sum_value")).collect()[0][0] == ref

    tr = time_rollup(ev, quantize=10000)
    assert dict(tr.dtypes)["sum_value"] == "bigint"
    grand = tr.filter((F.col("day") == "ALL") & (F.col("hour") == "ALL")).collect()
    assert grand[0]["sum_value"] == ref

    rs = resample(ev, "1 day", quantize=10000)
    assert dict(rs.dtypes)["sum_value"] == "bigint"
    assert rs.agg(F.sum("sum_value")).collect()[0][0] == ref


def test_unigram_lm_quantized_is_integer_sum(spark):
    from grasper_spark.functions.text import unigram_lm_score

    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    q = unigram_lm_score(docs, quantize=10000)
    assert dict(q.dtypes)["lm_score"] == "bigint"
    fl = unigram_lm_score(docs)
    j = q.join(
        fl.select("doc_id", F.col("lm_score").alias("fl_mean")), "doc_id"
    ).select(
        (
            F.abs(F.col("lm_score") / F.col("n_tokens") / 10000.0 - F.col("fl_mean"))
            < 0.01
        ).alias("ok")
    )
    assert all(r["ok"] for r in j.collect())
