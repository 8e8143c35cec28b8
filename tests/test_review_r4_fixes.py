"""Regression tests for the round-4 self-review findings.

1. G.refresh() drops built indexes (stale posting relations must not
   serve pre-ingest data).
2. _invalidate_caches serializes with the auto-prepare build protocol
   (epoch bump + install check under one lock).
3. Barrier df() on the relation tier goes through the rows() LRU — one
   job cold, zero jobs hot, correct empty-group synthesis.
4. A failing on_commit hook must NOT fail the micro-batch (the append
   already committed; a replay would duplicate edges).
5. A BaseException unwinding a build clears the _BUILDING marker.
"""

import threading

import pytest
from pyspark.sql import functions as F

from grasper_spark import G, PropertyGraph
from grasper_spark.plans.prepared import PreparedQuery, prepare


def test_refresh_drops_built_indexes(modern):
    g = G(modern)
    g.query("BuildIndex(V,'name')").collect()
    assert g._index_store.has("V", "name")
    g.refresh()
    assert not g._index_store.has("V", "name")
    # queries still answer (scan fallback)
    assert g.query('g.V().has("name","marko").count()').collect()[0][0] == 1


def test_refresh_after_ingest_serves_fresh_indexed_rows(spark, tmp_path):
    # the review's concrete scenario: BuildIndex, ingest, refresh — the
    # next indexed-key lookup must see the new vertex
    log = str(tmp_path / "vlog")
    spark.createDataFrame(
        [(1, "person", "ann")], ["vid", "label", "name"]
    ).write.mode("append").parquet(log)
    edges = spark.createDataFrame([(1, 1, "self")], ["src", "dst", "label"])

    def load():
        return PropertyGraph(spark.read.parquet(log), edges)

    g = G(load(), graph_loader=load)
    g.query("BuildIndex(V,'name')").collect()
    assert [r[0] for r in g.query('g.V().has("name","bob").count()').collect()] == [0]
    spark.createDataFrame(
        [(2, "person", "bob")], ["vid", "label", "name"]
    ).write.mode("append").parquet(log)
    g.refresh()
    assert [r[0] for r in g.query('g.V().has("name","bob").count()').collect()] == [1]


def test_barrier_relation_tier_df_uses_lru(modern):
    g = G(modern, cache_plans=False)
    p = PreparedQuery(
        g, 'g.V().has("name","$RAND").out("knows").count()', max_local_rows=0
    )
    try:
        assert p.mode == "relation" and p._empty_rows == [(0,)]
        # cold: one collect populates the LRU; df() serves from it
        assert [tuple(r) for r in p.df("marko").collect()] == [(2,)]
        assert [tuple(r) for r in p.df("vadas").collect()] == [(0,)]  # synthesized
        assert [tuple(r) for r in p.df("ghost").collect()] == [(0,)]
        assert "marko" in p._row_lru and "vadas" in p._row_lru
        assert p.df("marko").columns == ["val"]
    finally:
        p.close()


def test_on_commit_failure_does_not_fail_the_batch(spark, tmp_path):
    from grasper_spark.streaming.graph_updates import (
        append_edges_stream,
        read_edges_stream,
    )

    src, log, ckpt = (str(tmp_path / d) for d in ("in", "log", "ck"))
    spark.createDataFrame(
        [(1, 2, "knows")], ["src", "dst", "label"]
    ).write.mode("append").parquet(src)

    def boom():
        raise RuntimeError("invalidation hook failed")

    q = append_edges_stream(read_edges_stream(spark, src), log, ckpt, on_commit=boom)
    q.processAllAvailable()
    assert q.exception() is None  # batch committed despite the hook
    q.stop()
    assert spark.read.parquet(log).count() == 1  # appended exactly once


def test_building_marker_cleared_on_base_exception(modern, monkeypatch):
    import grasper_spark.plans.prepared as prep_mod

    g = G(modern)
    q = 'g.V().has("name","marko").values("age")'

    def exploding_init(self, *a, **kw):
        raise KeyboardInterrupt  # BaseException, not Exception

    monkeypatch.setattr(prep_mod.PreparedQuery, "__init__", exploding_init)
    for _ in range(g.AUTO_PREPARE_AFTER):
        g.query(q)
        g._plan_cache.clear()
    with pytest.raises(KeyboardInterrupt):
        g.query(q)
    # the marker did not leak: the shape can build again
    assert g._BUILDING not in g._auto_prepared.values()
    monkeypatch.undo()
    g._plan_cache.clear()
    assert [r[0] for r in g.query(q).collect()] == [29]
