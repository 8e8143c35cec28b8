"""Regression tests for the round-5 ADVICE.md findings.

1. compiler.py — _persisted_store keys its LRU on the 32-bit
   semanticHash; a hash collision must NOT silently substitute a
   different persisted relation as the side-effect store (confirm with
   sameSemantics, fall through to a fresh persist on mismatch).
2. prepared.py — the _ARROW_SAFE "int" prefix must not match interval
   dtypes (Arrow renders intervals differently from Row.collect).
3. prepared.py — a loadable-but-wrong-shaped local.pkl sidecar must be
   discarded (local tier rebuilds from the intact parquet snapshot)
   instead of raising through prepare() into permanent fallback.
4. prepared.py — PerQueryPrepared.rows() must see post-refresh data:
   its per-value LRU is cleared when the graph's invalidation epoch
   moves, so df(value) and rows(value) agree about freshness.
"""

import os
import pickle

import pytest
from pyspark.sql import functions as F

from grasper_spark import G, PropertyGraph


# ---------------------------------------------------------------------------
# 1. store-LRU collision safety
# ---------------------------------------------------------------------------


def test_persisted_store_hash_collision_not_served(spark):
    from grasper_spark.plans import compiler as C

    a = spark.range(10).select(F.col("id").alias("x"))
    b = spark.range(20).select((F.col("id") * 2).alias("x"))  # different plan

    orig_sem, orig_same = None, None
    try:
        orig_sem = type(a).semanticHash
        type(a).semanticHash = lambda self: 424242  # force a collision
        with C._STORE_LRU_LOCK:
            C._STORE_LRU.pop(424242, None)
        pa = C._persisted_store(a)
        pb = C._persisted_store(b)
        # collision detected via sameSemantics: b must NOT be served a's
        # relation
        assert pa.count() == 10
        assert pb.count() == 20
        assert {r["x"] for r in pb.collect()} == {i * 2 for i in range(20)}
        # and the true hit path still serves the cached relation
        pa2 = C._persisted_store(spark.range(10).select(F.col("id").alias("x")))
        assert pa2 is pa
    finally:
        if orig_sem is not None:
            type(a).semanticHash = orig_sem
        with C._STORE_LRU_LOCK:
            C._STORE_LRU.pop(424242, None)


# ---------------------------------------------------------------------------
# 2. interval dtypes excluded from the Arrow fast path
# ---------------------------------------------------------------------------


def test_arrow_safe_excludes_intervals():
    from grasper_spark.plans.prepared import PreparedQuery

    ok = PreparedQuery._arrow_safe
    assert ok("bigint") and ok("int") and ok("decimal(10,2)") and ok("string")
    assert not ok("interval day to second")
    assert not ok("interval year to month")
    assert not ok("timestamp")  # never listed — sanity that unknowns stay out


# ---------------------------------------------------------------------------
# 3/4. prepared serving: sidecar validation + fallback freshness
# ---------------------------------------------------------------------------


@pytest.fixture()
def small_graph(spark):
    v = spark.range(12).select(
        F.col("id").alias("vid"),
        F.lit("person").alias("label"),
        F.concat(F.lit("n"), F.col("id").cast("string")).alias("name"),
        (F.col("id") % 4).cast("int").alias("grp"),
    )
    e = spark.createDataFrame(
        [(0, 1, "knows", 1.0), (1, 2, "knows", 1.0)],
        "src long, dst long, label string, weight double",
    )
    return PropertyGraph(v, e, name="advice-r6").cache()


def test_corrupt_sidecar_rebuilds_local_tier(small_graph, tmp_path):
    from grasper_spark.plans.prepared import PreparedQuery

    g = G(small_graph, cache_plans=False)
    template = 'g.V().has("name","$RAND").values("grp")'
    cache = str(tmp_path / "pq")

    first = PreparedQuery(g, template, cache_dir=cache)
    want = first.rows("n3")
    # find the snapshot dir and corrupt its sidecar with a loadable but
    # wrong-shaped object
    snaps = [
        os.path.join(root)
        for root, dirs, files in os.walk(cache)
        if "local.pkl" in files
    ]
    assert snaps, "expected a local.pkl sidecar to be written"
    for sd in snaps:
        with open(os.path.join(sd, "local.pkl"), "wb") as fh:
            pickle.dump(["not", "a", "sidecar"], fh)

    again = PreparedQuery(g, template, cache_dir=cache)
    # the wrong-shaped sidecar is discarded, NOT raised through: the
    # local tier rebuilds from the parquet snapshot and serves correctly
    assert again.mode in ("local", "relation")
    assert again.rows("n3") == want


def test_perquery_rows_lru_cleared_on_refresh(small_graph):
    from grasper_spark.plans.prepared import PerQueryPrepared

    g = G(small_graph, cache_plans=False)
    # aggregate() makes the template fallback-eligible (global
    # side-effect step)
    pq = PerQueryPrepared(
        g, 'g.V().has("name","$RAND").aggregate("x").values("grp")'
    )
    before = pq.rows("n2")
    assert before  # cached now
    assert pq._row_lru
    g._invalidations += 1  # what refresh()/ingest does
    after = pq.rows("n2")
    assert after == before  # same data — but recomputed, not stale-served
    # the LRU was cleared and re-primed at the NEW epoch
    assert pq._epoch == g._invalidations
