"""Regression tests for the round-4 ADVICE.md findings.

1. prepared.py — ordered templates served through a cache_dir snapshot
   must keep their ordering guarantee (sort spec persisted in the
   manifest and re-applied after the parquet read).
2. ann_index.py — appending to a LEGACY (sidecar-only) index upgrades
   it to a versioned manifest, as the module docstring promises.
3. gen_sf.py — generated timestamps are session-timezone-independent
   (fixed UTC epoch literals, not unix_timestamp(lit(...))).
4. api.py — _try_auto_prepared must not hold the prepare lock across a
   materialization; concurrent threads fall through to per-query
   execution, and an invalidation during the build discards the result.
"""

import json
import os
import threading
import time

import pytest
from pyspark.sql import functions as F

from grasper_spark import G, PropertyGraph
from grasper_spark.plans.prepared import PreparedQuery


# ---------------------------------------------------------------------------
# 1. ordered template through a snapshot
# ---------------------------------------------------------------------------


@pytest.fixture()
def ordered_graph(spark):
    # enough rows per key that the materialized relation spans several
    # shuffle partitions → several parquet files → file read order is
    # NOT the sort order unless the manifest re-applies it
    n = 120
    v = spark.range(n).select(
        F.col("id").alias("vid"),
        F.lit("item").alias("label"),
        F.concat(F.lit("GRP_"), (F.col("id") % 3).cast("string")).alias("grp"),
        # descending scores shuffled across vids so vid order != score order
        ((F.col("id") * 37) % 1000).cast("double").alias("score"),
    )
    e = spark.createDataFrame([(0, 1, "x", 1.0)], "src long, dst long, label string, weight double")
    return PropertyGraph(v, e, name="ordered-snap").cache()


def test_ordered_template_survives_snapshot(ordered_graph, tmp_path):
    g = G(ordered_graph, cache_plans=False)  # per-query truth below
    template = 'g.V().has("grp","$RAND").values("score").order(decr)'
    cache = str(tmp_path / "pq_cache")

    first = PreparedQuery(g, template, cache_dir=cache)  # builds + writes
    # per-query truth (IN ORDER — no sorting on the comparison)
    want = {
        v: [
            (r[0],)
            for r in g.query(template.replace("$RAND", v)).collect()
        ]
        for v in first.param_values()
    }
    assert all(len(rows) >= 30 for rows in want.values())
    for v, rows in want.items():
        assert rows == sorted(rows, reverse=True)  # truly ordered data
        assert first.rows(v) == rows

    # the manifest must carry the output-mapped sort spec
    snaps = [d for d in os.listdir(cache) if d.startswith("pq_")]
    assert len(snaps) == 1
    with open(os.path.join(cache, snaps[0], "manifest.json")) as fh:
        mf = json.load(fh)
    assert mf["sort_out"] == [["val", False]]

    # a NEW instance loads the snapshot (no rebuild) and must serve the
    # same per-key order
    second = PreparedQuery(g, template, cache_dir=cache)
    for v, rows in want.items():
        assert second.rows(v) == rows, v
    first.close()
    second.close()


def test_unmappable_sort_not_snapshotted(ordered_graph, tmp_path):
    # order(score) then values(grp): the sort column (an order-key
    # history column) is dropped by the projection — the template still
    # serves in-session but must NOT freeze a snapshot it cannot re-sort
    g = G(ordered_graph, cache_plans=False)
    template = 'g.V().has("grp","$RAND").order("score").values("score")'
    cache = str(tmp_path / "pq_cache2")
    p = PreparedQuery(g, template, cache_dir=cache)
    assert p._has_sort
    if p._sort_out is None:
        snaps = [d for d in os.listdir(cache) if d.startswith("pq_")] if os.path.isdir(cache) else []
        assert all(
            not os.path.exists(os.path.join(cache, s, "_SNAP_OK")) for s in snaps
        )
    for v in p.param_values():
        want = [
            (r[0],) for r in g.query(template.replace("$RAND", v)).collect()
        ]
        assert p.rows(v) == want
    p.close()


# ---------------------------------------------------------------------------
# 2. legacy ANN index upgraded on append
# ---------------------------------------------------------------------------


def test_legacy_ivf_upgraded_on_append(spark, tmp_path):
    from grasper_spark.functions.ann_index import MANIFEST, read_manifest
    from grasper_spark.functions.similarity import ivf_append

    path = str(tmp_path / "ivf_legacy")
    centroids = [[0, [1.0, 0.0]], [1, [0.0, 1.0]]]
    vecs = spark.createDataFrame(
        [(1, [0.9, 0.1], 0), (2, [0.1, 0.9], 1)],
        "vec_id long, embedding array<double>, cluster int",
    )
    # legacy layout: partitioned assignment + bare centroids.json sidecar
    vecs.write.partitionBy("cluster").parquet(os.path.join(path, "assigned"))
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "centroids.json"), "w") as fh:
        json.dump(centroids, fh)
    assert not os.path.exists(os.path.join(path, MANIFEST))

    new = spark.createDataFrame(
        [(3, [0.8, 0.2])], "vec_id long, embedding array<double>"
    )
    out = ivf_append(spark, path, new)
    assert out.collect()[0]["cluster"] == 0
    # the append wrote the manifest: the index is now versioned
    assert os.path.exists(os.path.join(path, MANIFEST))
    doc = read_manifest(path, expect_kind="ivf")
    assert doc["format_version"] == 1
    assert doc["centroids"] == [(0, [1.0, 0.0]), (1, [0.0, 1.0])]


def test_legacy_ivfpq_upgraded_on_append(spark, tmp_path):
    from grasper_spark.functions.ann_index import MANIFEST, read_manifest
    from grasper_spark.functions.pq import ivfpq_append, pq_train

    path = str(tmp_path / "ivfpq_legacy")
    vecs = spark.createDataFrame(
        [
            (i, [1.0 + i % 3, 1.0 + (i * 7) % 5, 1.0 + (i * 3) % 7, 1.0 + (i * 5) % 11])
            for i in range(24)
        ],
        "vec_id long, embedding array<double>",
    )
    codebooks = pq_train(vecs, m=2, nbits=2, dim=4)
    assigned = vecs.withColumn("cluster", (F.col("vec_id") % 2).cast("int"))
    from grasper_spark.functions.pq import pq_encode

    coded = assigned.select("vec_id", "cluster").join(
        pq_encode(vecs, codebooks), "vec_id"
    )
    coded.write.partitionBy("cluster").parquet(os.path.join(path, "codes"))
    with open(os.path.join(path, "centroids.json"), "w") as fh:
        json.dump([[0, [1.0, 1.0, 1.0, 1.0]], [1, [3.0, 1.0, 1.0, 2.0]]], fh)
    with open(os.path.join(path, "codebooks.json"), "w") as fh:
        json.dump(codebooks, fh)

    new = spark.createDataFrame(
        [(100, [0.9, 0.9, 0.9, 0.9])], "vec_id long, embedding array<double>"
    )
    ivfpq_append(spark, path, new)
    assert os.path.exists(os.path.join(path, MANIFEST))
    assert read_manifest(path, expect_kind="ivfpq")["format_version"] == 1


# ---------------------------------------------------------------------------
# 3. gen_sf timestamps are timezone-independent
# ---------------------------------------------------------------------------


@pytest.mark.slow  # regenerates under TZs; test_generation_is_deterministic keeps the cover
def test_gen_sf_reproducible_across_timezones(spark, tmp_path):
    from tools.gen_sf import generate_sf

    tz = spark.conf.get("spark.sql.session.timeZone")
    base = "/root/testdata/sf0.001"
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        generate_sf(spark, str(tmp_path / "utc"), sf=0.002, base_sf_dir=base)
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        generate_sf(spark, str(tmp_path / "nyc"), sf=0.002, base_sf_dir=base)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        for tbl, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey"),
                         ("events", "event_id")):
            a = spark.read.parquet(str(tmp_path / "utc" / f"{tbl}.parquet"))
            b = spark.read.parquet(str(tmp_path / "nyc" / f"{tbl}.parquet"))
            assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), tbl
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)


def test_gen_sf_has_no_session_tz_dependent_exprs():
    import tools.gen_sf as m

    with open(m.__file__) as fh:
        src = fh.read()
    assert "F.unix_timestamp(" not in src
    assert "F.timestamp_seconds(" not in src  # instant-typed, session-TZ-read


# ---------------------------------------------------------------------------
# 4. auto-prepare builds outside the lock
# ---------------------------------------------------------------------------


def test_auto_prepare_concurrent_fallthrough(modern, monkeypatch):
    import grasper_spark.plans.prepared as prep_mod

    g = G(modern)
    q = 'g.V().has("name","marko").values("age")'
    build_started = threading.Event()
    release_build = threading.Event()

    real_init = PreparedQuery.__init__

    def slow_init(self, *a, **kw):
        build_started.set()
        assert release_build.wait(timeout=30)
        real_init(self, *a, **kw)

    monkeypatch.setattr(prep_mod.PreparedQuery, "__init__", slow_init)

    # sightings 1..AUTO_PREPARE_AFTER run per-query; the next triggers a build
    for _ in range(g.AUTO_PREPARE_AFTER):
        g.query(q)
        g._plan_cache.clear()  # force re-entry into the shape counter

    results = {}

    def builder():
        results["built"] = g.query(q).collect()

    t = threading.Thread(target=builder)
    t.start()
    assert build_started.wait(timeout=30)
    # while the build is in flight the shape is marked _BUILDING and a
    # concurrent query of the same shape completes per-query (no block)
    shapes = [k for k, v in g._auto_prepared.items() if v is g._BUILDING]
    assert len(shapes) == 1
    t0 = time.perf_counter()
    g._plan_cache.clear()
    rows = g.query('g.V().has("name","vadas").values("age")').collect()
    dt = time.perf_counter() - t0
    assert [r[0] for r in rows] == [27]
    assert dt < 10  # did not wait for the (still-held) build
    assert not release_build.is_set()
    release_build.set()
    t.join(timeout=60)
    assert [r[0] for r in results["built"]] == [29]
    rec = g._auto_prepared[shapes[0]]
    assert rec is not None and rec is not g._BUILDING
    rec.close()


def test_auto_prepare_invalidation_during_build_discards(modern, monkeypatch):
    import grasper_spark.plans.prepared as prep_mod

    g = G(modern)
    q = 'g.V().has("name","marko").values("age")'
    build_started = threading.Event()
    release_build = threading.Event()
    real_init = PreparedQuery.__init__

    def slow_init(self, *a, **kw):
        build_started.set()
        assert release_build.wait(timeout=30)
        real_init(self, *a, **kw)

    monkeypatch.setattr(prep_mod.PreparedQuery, "__init__", slow_init)
    for _ in range(g.AUTO_PREPARE_AFTER):
        g.query(q)
        g._plan_cache.clear()

    t = threading.Thread(target=lambda: g.query(q))
    t.start()
    assert build_started.wait(timeout=30)
    g._invalidate_caches()  # e.g. SetConfig / stream ingest mid-build
    release_build.set()
    t.join(timeout=60)
    # the stale build was discarded, not installed
    assert all(v is None for v in g._auto_prepared.values()) or not g._auto_prepared
