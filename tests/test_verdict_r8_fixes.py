"""Round-8 VERDICT.md task regressions:

4. (compiler) side-effect semi-join profiling — covered by plan-shape
   assertions added in this round where applicable.
5. emu regime attribution: PerQueryPrepared.serve() returns the tier
   that answered and accumulates hit/miss counters; run_emu surfaces
   per-regime latencies + LRU stats; PreparedQuery.warm_async()
   pre-populates the relation tier's row LRU off the serving path.
6. bench.py writes BENCH_FULL.json atomically (tmp + os.replace).
8. bench.py carries a noise sentinel (fixed JVM-only job) whose passes
   are recorded next to every headline/sf1 measurement.
"""

import os

import pytest

from grasper_spark import G


# ---------------------------------------------------------------------------
# 5a. PerQueryPrepared serve() regimes + stats
# ---------------------------------------------------------------------------


def test_perquery_serve_regimes(modern):
    from grasper_spark.plans.prepared import PerQueryPrepared

    g = G(modern)
    # aggregate() forces the fallback tier (global side-effect step)
    pq = PerQueryPrepared(
        g, 'g.V().has("name","$RAND").aggregate("x").values("age")'
    )
    assert pq.stats == {"row_hits": 0, "plan_hits": 0, "cold": 0}
    rows1, reg1 = pq.serve("marko")
    assert reg1 == "cold"
    assert rows1 == [(29,)]
    # repeated value: driver-local row LRU
    rows2, reg2 = pq.serve("marko")
    assert reg2 == "row_hit" and rows2 == rows1
    assert pq.stats["row_hits"] == 1 and pq.stats["cold"] == 1
    # rows() still serves plain lists through the same counters
    assert pq.rows("vadas") == [(27,)]
    assert pq.stats["cold"] == 2
    # df(value) compiles into the plan LRU without touching the row
    # LRU; the first serve() of that value then reuses the plan
    pq.df("josh")
    _, reg3 = pq.serve("josh")
    assert reg3 == "plan_hit"
    assert pq.stats["plan_hits"] == 1
    # an epoch bump (graph refresh) clears BOTH LRUs -> cold again
    g._invalidations = getattr(g, "_invalidations", 0) + 1
    _, reg4 = pq.serve("marko")
    assert reg4 == "cold"
    pq.close()


def test_run_emu_reports_regimes_and_lru_stats(modern):
    from grasper_spark.emu import run_emu

    g = G(modern)
    cfg = "30 2\n1\n" + 'g.V().has("name","$RAND").aggregate("x").values("age")' + " name 1.0\n"
    res = run_emu(g, cfg, max_queries=30, seed=7)
    assert res.template_modes[0] == "per-query"
    assert 0 in res.lru_stats
    st = res.lru_stats[0]
    assert st["row_hits"] + st["plan_hits"] + st["cold"] == res.total_queries
    # 6 distinct names, 30 queries -> repeats MUST hit the row LRU
    assert st["row_hits"] > 0
    regs = res.per_template_regimes[0]
    assert set(regs) <= {"row_hit", "plan_hit", "cold"}
    assert sum(r["n"] for r in regs.values()) == res.total_queries
    # the two regimes are attributable: row hits are driver-local (µs),
    # colds pay a Spark job — orders of magnitude apart
    if "row_hit" in regs and "cold" in regs:
        assert regs["row_hit"]["p50_ms"] < regs["cold"]["p50_ms"]


# ---------------------------------------------------------------------------
# 5b. relation-tier warm_async
# ---------------------------------------------------------------------------


def test_warm_async_prefills_row_lru(modern):
    g = G(modern)
    # max_local_rows=0 forces the relation tier even on tiny data
    pq = g.prepare('g.V().has("label","$RAND").values("name")', max_local_rows=0)
    assert pq.mode == "relation"
    done = pq.warm_async()
    assert done.wait(timeout=60)
    # every parameter key is now in the row LRU: serving is driver-local
    import time

    vals = pq.param_values()
    for v in vals:
        t0 = time.perf_counter()
        rows = pq.rows(v)
        dt = (time.perf_counter() - t0) * 1000
        assert rows  # real results
        assert dt < 50, f"post-warm probe took {dt:.1f}ms (want driver-local)"
    pq.close()


def test_warm_async_local_tier_noop(modern):
    g = G(modern)
    pq = g.prepare('g.V().has("label","$RAND").values("name")')
    assert pq.mode == "local"
    done = pq.warm_async()
    assert done.is_set()  # local tier: nothing to warm
    pq.close()


# ---------------------------------------------------------------------------
# 6 + 8. bench source pins: atomic full-doc write, sentinel records
# ---------------------------------------------------------------------------


def _bench_src() -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "bench.py")) as fh:
        return fh.read()


def test_bench_full_doc_write_is_atomic():
    src = _bench_src()
    assert 'tmp_path = full_path + ".tmp"' in src
    assert "os.replace(tmp_path, full_path)" in src


def test_bench_records_sentinel_passes():
    src = _bench_src()
    assert "def _sentinel(spark)" in src
    # one sentinel between headline queries + per-sf1-query readings
    assert "sentinel_passes[name] = _sentinel(spark)" in src
    assert '"sentinel_passes": sentinel_passes' in src
    assert 'sf1[name]["sentinel_s"] = _sentinel(spark)' in src
    # the compact driver line carries the small summary
    compact = src.split("compact = {", 1)[1].split("}", 1)[0]
    assert '"sentinel"' in compact
    assert "sentinel_passes" not in compact


def test_bench_relation_tier_postwarm_pin():
    src = _bench_src()
    assert "warm_async(vals)" in src
    assert "p50_cold_postwarm_ms" in src


# ---------------------------------------------------------------------------
# 4. expansion join strategy: measured-crossover merge hint
# ---------------------------------------------------------------------------


def test_expand_merge_hint_above_crossover(modern):
    from grasper_spark.plans import compiler as C

    g2 = modern  # PropertyGraph fixture
    spark = g2.vertices.sparkSession
    # pin BOTH inputs to the default arm's broadcast decision: the
    # threshold conf AND materialized cache stats — test_plan_shapes
    # runs spark.catalog.clearCache(), after which the fixture's
    # relations scan as ExistingRDD with UNKNOWN size (defaults huge),
    # flipping the un-hinted plan to SMJ (the full-suite-only failure)
    g2.vertices.cache().count()
    g2.edges.cache().count()
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    try:
        # no recorded count -> compiler must not run a count job and
        # must leave Catalyst's choice alone (broadcast on tiny graphs)
        g2._edge_count = None
        plan_default = G(g2).V().out("knows").count().df()._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan_default, plan_default
        # recorded count above the crossover -> sort-merge join
        g2._edge_count = C.EXPAND_MERGE_MIN_EDGES
        plan_big = G(g2).V().out("knows").count().df()._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan_big
        assert "BroadcastHashJoin" not in plan_big.split("SortMergeJoin")[0]
    finally:
        g2._edge_count = None
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_edge_count_records_once(modern):
    n1 = modern.edge_count()
    assert n1 == 6
    assert modern._edge_count == 6
    assert modern.edge_count() == 6  # cached, no recount
