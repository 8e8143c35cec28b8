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


@pytest.mark.slow  # full query re-run; oracle emb_lsh_topk keeps the cover
def test_emb_lsh_topk_schema_is_float_free(spark):
    """VERDICT r5 #1 done-criterion: no DoubleType column reaches the
    hash for ANY embedding entry (the family that red-flagged r4+r5)."""
    entry = _load_entry()
    for name in ("emb_lsh_topk", "emb_cosine_topk", "emb_neardup"):
        df = entry.queries()[name](spark, SF0001)
        for f in df.schema.fields:
            assert not _has_float(f.dataType), (
                f"{name} hashes float column {f.name}: {f.dataType} — "
                "the ledger compares by exact repr; quantize to integers"
            )


@pytest.mark.slow  # full query re-run; oracle emb_lsh_topk keeps the cover
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


def test_grasper_text_export_is_distributed_multipart(spark, tmp_path):
    """VERDICT r5 #5: the Grasper-text export writes per-partition
    part files (the reference's own multi-part layout) with no
    driver-side collect of V/E — round-trip a multi-partition graph and
    require >1 part file per bulk table."""
    import inspect
    import os

    from grasper_spark import PropertyGraph
    from grasper_spark.sources.grasper_text import load_grasper_text
    from grasper_spark.sources.sinks import write_grasper_text

    n = 500
    v = (
        spark.range(n)
        .repartition(6)
        .select(
            F.col("id").alias("vid"),
            F.lit("node").alias("label"),
            F.concat(F.lit("name_"), F.col("id").cast("string")).alias("name"),
            (F.col("id") % 97).cast("int").alias("age"),
            (F.col("id") * 0.5).cast("double").alias("score"),
        )
    )
    e = (
        spark.range(n - 1)
        .repartition(6)
        .select(
            F.col("id").alias("src"),
            (F.col("id") + 1).alias("dst"),
            F.lit("next").alias("label"),
            (F.col("id") * 0.25).cast("double").alias("weight"),
        )
    )
    g = PropertyGraph(v, e, name="multipart")
    out = str(tmp_path / "gtext")
    write_grasper_text(g, out)

    for table in ("vtx_property", "edge_property", "vertices"):
        parts = [f for f in os.listdir(os.path.join(out, table)) if f.startswith("part_")]
        assert len(parts) > 1, f"{table}: expected >1 part file, got {parts}"

    # no full collect in the write path (bounded dictionary collects only)
    src = inspect.getsource(write_grasper_text)
    assert ".collect()" not in src.replace(
        'graph.vertices.select("label").distinct().orderBy("label").collect()', ""
    ).replace(
        'graph.edges.select("label").distinct().orderBy("label").collect()', ""
    )

    # round-trip parity
    back = load_grasper_text(spark, out)
    assert back.vertices.count() == n
    assert back.edges.count() == n - 1
    want = {(r["vid"], r["name"], r["age"], r["score"]) for r in v.collect()}
    got = {
        (r["vid"], r["name"], r["age"], r["score"])
        for r in back.vertices.collect()
    }
    assert got == want
    ew = {(r["src"], r["dst"], r["weight"]) for r in e.collect()}
    eg = {(r["src"], r["dst"], r["weight"]) for r in back.edges.collect()}
    assert eg == ew


def test_union_persists_branch_input_at_fork(spark):
    """VERDICT r5 #6: a 2+-branch union persists the incoming stream at
    the fork (one upstream execution, every branch reads the cached
    fork) — bare base scans exempt (the graph relation is already
    cached)."""
    from grasper_spark import G, PropertyGraph
    from grasper_spark.plans import compiler as C

    v = spark.range(40).select(
        F.col("id").alias("vid"), F.lit("n").alias("label"),
        (F.col("id") % 5).cast("int").alias("grp"),
    )
    e = spark.range(39).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst"),
        F.lit("next").alias("label"), F.lit(1.0).alias("weight"),
    )
    g = G(PropertyGraph(v, e, name="union-fork").cache(), cache_plans=False)

    with C._STORE_LRU_LOCK:
        C._STORE_LRU.clear()
    n = g.query(
        'g.V().has("grp", 2).union(out().values("grp"), in().values("grp"))'
    ).count()
    assert n > 0
    with C._STORE_LRU_LOCK:
        forked = len(C._STORE_LRU)
    assert forked == 1, "filtered union input should persist at the fork"

    # bare scan input: no extra persist (the base relation is cached)
    with C._STORE_LRU_LOCK:
        C._STORE_LRU.clear()
    g.query('g.V().union(out().values("grp"), in().values("grp"))').count()
    with C._STORE_LRU_LOCK:
        assert len(C._STORE_LRU) == 0


def test_measured_crossover_seeds_conversion_floor(spark, tmp_path, monkeypatch):
    """VERDICT r5 #7: a recorded crossover measurement seeds new G
    handles' index_scan_min_avoided floor — a conversion avoiding fewer
    rows than the measured wash point is vetoed, one above it is taken,
    and SetConfig still overrides."""
    from grasper_spark import G, PropertyGraph
    from grasper_spark.plans.index_store import (
        CALIBRATION_ENV, derive_min_avoided, load_measured_floor,
        record_crossover,
    )

    # derivation unit cases
    assert derive_min_avoided({
        "small": {"n_vertices": 1000, "scan_p50_ms": 10, "index_p50_ms": 11},
        "big": {"n_vertices": 100000, "scan_p50_ms": 50, "index_p50_ms": 20},
    }) == (1000 + 100000) // 2
    assert derive_min_avoided({  # never won → floor out everything measured
        "a": {"n_vertices": 1000, "scan_p50_ms": 10, "index_p50_ms": 10},
        "b": {"n_vertices": 100000, "scan_p50_ms": 50, "index_p50_ms": 49},
    }) == 100000
    assert derive_min_avoided({  # always won → reference parity
        "a": {"n_vertices": 1000, "scan_p50_ms": 20, "index_p50_ms": 10},
    }) == 0

    cal = str(tmp_path / "crossover.json")
    monkeypatch.setenv(CALIBRATION_ENV, cal)
    assert load_measured_floor() is None  # never measured → no seed

    n = 200
    v = spark.range(n).select(
        F.col("id").alias("vid"), F.lit("n").alias("label"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("name"),
    )
    e = spark.createDataFrame([(0, 1, "x", 1.0)],
                              "src long, dst long, label string, weight double")
    graph = PropertyGraph(v, e, name="xover").cache()

    # measured wash point ABOVE this graph's size → conversion vetoed
    record_crossover({
        "a": {"n_vertices": 100, "scan_p50_ms": 10, "index_p50_ms": 10},
        "b": {"n_vertices": 100000, "scan_p50_ms": 50, "index_p50_ms": 51},
    })
    assert load_measured_floor() == 100000
    g1 = G(graph)
    g1.query("BuildIndex(V, 'name')").collect()
    c, _ = g1.V().has("name", "u7").values("name")._compile()
    assert c.index_hits == 0  # avoided rows (199) < measured floor

    # measured wash point BELOW this graph's size → conversion taken
    record_crossover({
        "a": {"n_vertices": 10, "scan_p50_ms": 10, "index_p50_ms": 10},
        "b": {"n_vertices": 100, "scan_p50_ms": 50, "index_p50_ms": 20},
    })
    g2 = G(graph)
    g2.query("BuildIndex(V, 'name')").collect()
    c2, _ = g2.V().has("name", "u7").values("name")._compile()
    assert c2.index_hits == 1  # avoided rows (199) > floor (55)

    # explicit SetConfig overrides the seeded floor
    g1.query("SetConfig('index_scan_min_avoided', '0')")
    c3, _ = g1.V().has("name", "u7").values("name")._compile()
    assert c3.index_hits == 1


@pytest.mark.slow  # full query re-run; oracle emb_neardup keeps the cover
def test_emb_neardup_entry_is_float_free_and_consistent(spark):
    """emb_neardup hashed the same round(float,6) shape that red-flagged
    emb_lsh_topk twice — and the sf1 corpus has a candidate within 1e-6
    of the 0.4 threshold. The entry is now integer-exact: no Double/
    Float column in its schema, and its Spark-side tolerance arms
    (cos_ok / lib_ok) are zero."""
    entry = _load_entry()
    df = entry.queries()["emb_neardup"](spark, SF0001)
    for f in df.schema.fields:
        assert not _has_float(f.dataType), f"{f.name}: {f.dataType}"
    arms = {r["op"]: r["id_b"] for r in df.filter(F.col("op").isin("cos_ok", "lib_ok")).collect()}
    assert arms == {"cos_ok": 0, "lib_ok": 0}


def test_qint_neardup_matches_float_off_boundary(spark):
    """The integer threshold test agrees with the float library away
    from the boundary (quantization error ~6e-3 on cos, margin 0.02)."""
    from grasper_spark.functions.similarity import (
        lsh_neardup_pairs, qint_lsh_neardup_pairs,
    )

    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
    fl = {(r["id_a"], r["id_b"]): r["sim"] for r in lsh_neardup_pairs(emb).collect()}
    qi = {(r["id_a"], r["id_b"]): r["sim_q"] for r in qint_lsh_neardup_pairs(emb).collect()}
    for k, sim in fl.items():
        if sim >= 0.42:
            assert k in qi, f"float pair {k} (sim {sim}) missing from integer set"
    for k, sq in qi.items():
        if sq >= 176400:  # quantized cos² ≥ 0.42²·1e6
            assert k in fl, f"integer pair {k} (sim_q {sq}) missing from float set"


def test_qint_overflow_guards():
    """qint operators reject scales that could silently wrap int64
    (Spark longs wrap outside ANSI mode — wrong integers, no error)."""
    import pytest as _pytest

    from grasper_spark.functions import similarity as S

    S._check_qint_bounds(4096, 64, 1)      # the defaults are in-bounds
    S._check_qint_bounds(2048, 64, 5)
    with _pytest.raises(ValueError):
        S._check_qint_bounds(10**6, 64, 5)
    with _pytest.raises(ValueError):
        S._check_qint_bounds(100000, 64, 1)


def test_pagerank_qint_empty_graph(spark):
    from grasper_spark import PropertyGraph
    from grasper_spark.algos import pagerank_qint

    v = spark.createDataFrame([], "vid long, label string")
    e = spark.createDataFrame([], "src long, dst long, label string, weight double")
    out = pagerank_qint(PropertyGraph(v, e, name="empty"), iterations=2)
    assert out.count() == 0
