"""Sink round-trips + custom stateful streaming operator."""

import pytest
from conftest import MODERN_E, MODERN_V, rows
from pyspark.sql import functions as F


def test_grasper_text_roundtrip(modern, spark, tmp_path):
    from grasper_spark.sources import load_grasper_text
    from grasper_spark.sources.sinks import write_grasper_text

    out = str(tmp_path / "graph_text")
    write_grasper_text(modern, out)
    back = load_grasper_text(spark, out)
    assert rows(back.vertices.select("vid", "label", "name", "age", "lang")) == sorted(MODERN_V)
    assert rows(back.edges.select("src", "dst", "label", "weight")) == sorted(MODERN_E)


def test_parquet_roundtrip(modern, spark, tmp_path):
    from grasper_spark.sources.sinks import read_parquet, write_parquet

    out = str(tmp_path / "graph_pq")
    write_parquet(modern, out)
    back = read_parquet(spark, out)
    assert rows(back.vertices) == rows(modern.vertices)
    assert rows(back.edges) == rows(modern.edges)


def test_stateful_running_user_stats(spark):
    from grasper_spark.streaming.stateful import running_user_stats
    from grasper_spark.streaming.windows import load_events, read_events_stream

    sf = "/root/testdata/sf0.001"
    q = (
        running_user_stats(read_events_stream(spark, sf))
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("user_stats")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # last update per user == batch aggregate
    got_df = spark.sql(
        "SELECT user_id, n_events, total_value FROM user_stats"
    )
    # with a single micro-batch there is exactly one update per user
    got = {r.user_id: (r.n_events, round(r.total_value, 4)) for r in got_df.collect()}
    want_df = (
        load_events(spark, sf)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum(F.coalesce("value", F.lit(0.0))), 4).alias("t"))
    )
    want = {r.user_id: (r.n, r.t) for r in want_df.collect()}
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0]
        assert abs(got[u][1] - want[u][1]) < 1e-6


def test_bucketed_traversal_no_shuffle(modern, spark):
    """The 100 TB deployment shape: V bucketed by vid, E by src and dst —
    the traversal join runs bucket-local (zero hash exchanges; only the
    property re-attach join shuffles the moved stream side)."""
    from grasper_spark import G
    from grasper_spark.sources.sinks import read_bucketed, write_bucketed

    write_bucketed(modern, "modern_bkt_test", buckets=4)
    bg = read_bucketed(spark, "modern_bkt_test")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q = G(bg).V().has("name", "marko").out("knows").count().df()
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert plan.count("Exchange hashpartitioning") == 0, plan
        assert [r[0] for r in q.collect()] == [2]

        q2 = G(bg).V().has("name", "marko").out("knows").values("age").df()
        plan2 = q2._jdf.queryExecution().executedPlan().toString()
        # only the moved traverser stream re-shuffles for the property
        # join — the Grasper send_remote hop; both base tables stay put
        assert plan2.count("Exchange hashpartitioning") <= 1, plan2
        assert sorted(r[0] for r in q2.collect()) == [27, 32]

        # in() uses the dst-bucketed orientation — also exchange-free
        q3 = G(bg).V().has("name", "lop").in_("created").count().df()
        plan3 = q3._jdf.queryExecution().executedPlan().toString()
        assert plan3.count("Exchange hashpartitioning") == 0, plan3
        assert [r[0] for r in q3.collect()] == [3]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_streaming_dedup(spark, tmp_path):
    import pyspark.sql.functions as F

    from grasper_spark.streaming.dedup import dedup_stream

    # stream a parquet dir with duplicate texts
    src = str(tmp_path / "docs_stream")
    spark.createDataFrame(
        [(1, "hello world"), (2, "hello  WORLD"), (3, "different")],
        ["doc_id", "text"],
    ).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        dedup_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select * from dedup_out").collect()
    assert len(rows) == 2  # docs 1+2 share a normalized fingerprint
    assert {r.doc_id for r in rows} & {1, 2}  # one representative survived
    assert any(r.doc_id == 3 for r in rows)


def test_streaming_corpus_monitor_equals_batch(spark, tmp_path):
    import datetime

    import pyspark.sql.functions as F

    from grasper_spark.streaming.monitor import corpus_monitor, corpus_monitor_batch

    src = str(tmp_path / "monitor_stream")
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        # window 12:00 — 3 docs, incl. one empty doc
        (1, "alpha beta gamma", t0),
        (2, "alpha alpha", t0 + datetime.timedelta(seconds=20)),
        (3, "", t0 + datetime.timedelta(seconds=40)),
        # window 12:01 — 2 docs, disjoint vocab
        (4, "delta epsilon", t0 + datetime.timedelta(minutes=1)),
        (5, "delta zeta eta theta", t0 + datetime.timedelta(minutes=1, seconds=30)),
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")
    batch.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string, ts timestamp").parquet(src)
    q = (
        corpus_monitor(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("monitor_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(tuple(r) for r in spark.sql("select * from monitor_out").collect())
    want = sorted(tuple(r) for r in corpus_monitor_batch(batch).collect())
    assert got == want and len(got) == 2
    by_start = {r[0].minute: r for r in got}
    # window :00 — 3 docs (empty doc counted), 5 tokens, vocab {alpha,beta,gamma}
    assert by_start[0][1:4] == (3, 5, 3)
    # window :01 — 2 docs, 6 tokens, vocab {delta,epsilon,zeta,eta,theta}
    assert by_start[1][1:4] == (2, 6, 5)


def test_streaming_dedup_with_watermark_collapses_across_ts(spark, tmp_path):
    # same content at DIFFERENT event times must still collapse to one
    # survivor (fingerprint-only dedup within the watermark horizon)
    import datetime

    from grasper_spark.streaming.dedup import dedup_stream

    src = str(tmp_path / "docs_stream_ts")
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    spark.createDataFrame(
        [
            (1, "hello world", t0),
            (2, "hello  WORLD", t0 + datetime.timedelta(minutes=5)),
            (3, "different", t0 + datetime.timedelta(minutes=10)),
        ],
        "doc_id long, text string, ts timestamp",
    ).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string, ts timestamp").parquet(src)
    q = (
        dedup_stream(stream, ts_col="ts")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_ts_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select * from dedup_ts_out").collect()
    assert len(rows) == 2
    assert {r.doc_id for r in rows} & {1, 2}
    assert any(r.doc_id == 3 for r in rows)


def test_streaming_edge_ingestion(spark, tmp_path):
    # edge batches land as files; the log absorbs them append-only and a
    # traversal over the log sees each consistent prefix
    from grasper_spark.graph import PropertyGraph
    from grasper_spark.plans.api import G
    from grasper_spark.streaming.graph_updates import (
        append_edges_stream,
        degree_updates,
        read_edges_stream,
    )

    src = str(tmp_path / "incoming")
    log = str(tmp_path / "edge_log")
    ckpt = str(tmp_path / "ckpt")
    b1 = spark.createDataFrame([(1, 2, "knows"), (1, 3, "knows")], ["src", "dst", "label"])
    b1.write.mode("append").parquet(src)

    q = append_edges_stream(read_edges_stream(spark, src), log, ckpt)
    q.processAllAvailable()
    assert spark.read.parquet(log).count() == 2

    # second batch arrives mid-stream
    b2 = spark.createDataFrame([(2, 3, "knows"), (4, 1, "likes")], ["src", "dst", "label"])
    b2.write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    edges = spark.read.parquet(log)
    assert edges.count() == 4
    v = spark.createDataFrame([(i, "person") for i in (1, 2, 3, 4)], ["vid", "label"])
    g = G(PropertyGraph(vertices=v, edges=edges))
    assert sorted(g.V().out("knows").dedup().df().toPandas()["vid"]) == [2, 3]

    # streaming degree agg (update mode) converges to the batch twin
    dq = (
        degree_updates(read_edges_stream(spark, src))
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("deg_out")
        .start()
    )
    dq.processAllAvailable()
    dq.stop()
    # memory sink in update mode appends every update; keep the last per vid
    got = {
        r["vid"]: (r["out_deg"], r["in_deg"])
        for r in spark.sql("select * from deg_out").collect()
    }
    want = {
        r["vid"]: (r["out_deg"], r["in_deg"])
        for r in degree_updates(edges).collect()
    }
    assert got == want


def test_streaming_curation_gates_and_dedup(spark, tmp_path):
    # streaming twin of curate(): junk dropped, duplicates collapsed,
    # audit columns present — matches the batch gates on the same data
    from grasper_spark.functions.text import quality_score
    from grasper_spark.streaming.curation import curate_stream

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs far away home"),
        (2, "the quick  brown fox jumps over the lazy dog and runs far away home"),
        (3, "!!! ??? ,,, ;;; ### $$$"),  # punctuation junk → low quality
        (4, "der hund und die katze das ist der test und der hund ist gut"),  # de
    ]
    src = str(tmp_path / "curate_stream")
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        curate_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("curate_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.sql("select * from curate_out").collect()
    # doc 3 fails quality, doc 4 fails language, 1/2 collapse to one
    assert len(out) == 1 and out[0].doc_id in (1, 2)
    assert {"lang_pred", "quality", "n_tokens", "fingerprint"} <= set(
        out[0].asDict()
    )
    # gates agree with the batch scorer
    batch = spark.createDataFrame(rows, ["doc_id", "text"]).select(
        "doc_id", quality_score(F.col("text")).alias("q")
    ).collect()
    assert {r.doc_id: r.q >= 0.3 for r in batch}[3] is False


def test_streaming_neardup_matches_batch_twin(spark, tmp_path):
    # micro-batch LSH near-dedup against a persistent bucket store must
    # equal the arrival-order batch twin when docs stream in id order
    from grasper_spark.functions.dedup import neardup_keep_flags
    from grasper_spark.streaming.neardup import neardup_stream

    X = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Y = "alpha beta gamma delta epsilon zeta eta theta iota OMEGA"
    Z = "SIGMA beta gamma delta epsilon zeta eta theta iota OMEGA"
    batch1 = [(10, X), (11, Y)]
    batch2 = [(12, Z), (20, "unrelated text about engines and files")]
    kw = dict(bands=16, shingle_n=2)

    src = str(tmp_path / "nd_src")
    store = str(tmp_path / "nd_store")
    sink = str(tmp_path / "nd_sink")
    ckpt = str(tmp_path / "nd_ckpt")
    spark.createDataFrame(batch1, ["doc_id", "text"]).write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = neardup_stream(stream, store, sink, ckpt, **kw)
    try:
        q.processAllAvailable()
        # second batch arrives later: 12 must drop via the STORE hit
        # (its near-neighbor 11 was dropped in batch 1 but left buckets)
        spark.createDataFrame(batch2, ["doc_id", "text"]).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    kept_stream = sorted(
        r.doc_id for r in spark.read.parquet(sink).select("doc_id").collect()
    )
    assert kept_stream == [10, 20]  # 11 in-batch dup, 12 cross-batch dup

    all_docs = spark.createDataFrame(batch1 + batch2, ["doc_id", "text"])
    twin = sorted(
        r.doc_id for r in neardup_keep_flags(all_docs, **kw).filter("kept").collect()
    )
    assert twin == kept_stream


def test_zorder_code_locality(spark):
    from grasper_spark.sources.sinks import zorder_code

    df = spark.range(0, 256).select(
        (F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("long").alias("y")
    )
    coded = df.withColumn(
        "z", zorder_code(["x", "y"], [0, 0], [15, 15], bits=4)
    ).collect()
    z = {(r.x, r.y): r.z for r in coded}
    assert len(set(z.values())) == 256  # bijective on the 16x16 grid
    # interleaving: neighbors in BOTH dims stay within a bounded code
    # distance (quadrant locality), unlike a lexicographic sort where
    # (x, y)->(x, y+1) can jump the whole x-range
    assert abs(z[(3, 3)] - z[(2, 2)]) < 64
    assert z[(0, 0)] == 0 and z[(15, 15)] == 255


def test_write_zordered_roundtrip_and_rowgroup_stats(spark, tmp_path):
    from grasper_spark.sources.sinks import write_zordered

    from grasper_spark.streaming.windows import load_events

    events = load_events(spark, "/root/testdata/sf0.001")
    out = str(tmp_path / "events_z")
    write_zordered(
        events.withColumn("ts_us", F.unix_micros("ts")),
        out, ["user_id", "ts_us"], num_files=4,
    )
    back = spark.read.parquet(out)
    assert back.count() == events.count()
    # clustered layout: a single-user filter touches a minority of files
    import pyarrow.parquet as pq
    import glob
    files_with_user = 0
    for f in glob.glob(f"{out}/*.parquet"):
        md = pq.read_metadata(f)
        lo = min(md.row_group(i).column(2).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(2).statistics.max for i in range(md.num_row_groups))
        if lo <= 3 <= hi:
            files_with_user += 1
    nf = len(glob.glob(f"{out}/*.parquet"))
    assert nf >= 3 and files_with_user < nf  # pruning is possible


def test_compact_parquet(spark, tmp_path):
    from grasper_spark.sources.sinks import compact_parquet

    src = str(tmp_path / "frag")
    spark.range(0, 10000).repartition(64).write.parquet(src)
    out = str(tmp_path / "compact")
    n = compact_parquet(spark, src, out, target_mb=128)
    assert n == 1
    import glob
    assert len(glob.glob(f"{out}/*.parquet")) == 1
    assert spark.read.parquet(out).count() == 10000


def test_transform_with_state_unavailable_raises_pointed_error(spark):
    # without protobuf the TWS factories must fail fast with guidance,
    # not crash a driver worker mid-query
    import pytest as _pytest

    from grasper_spark.streaming import stateful_v2

    if stateful_v2.TWS_AVAILABLE:
        _pytest.skip("protobuf installed - gating path not reachable")
    from grasper_spark.streaming.windows import read_events_stream

    with _pytest.raises(RuntimeError, match="protobuf"):
        stateful_v2.running_user_stats_v2(
            read_events_stream(spark, "/root/testdata/sf0.001")
        )


def test_transform_with_state_running_stats(spark):
    # Spark 4 StatefulProcessor twin must agree with the batch aggregate
    # (and therefore with the applyInPandasWithState v1 operator, which
    # has the same assertion above)
    pytest.importorskip("google.protobuf")
    from grasper_spark.streaming.stateful_v2 import running_user_stats_v2
    from grasper_spark.streaming.windows import load_events, read_events_stream

    sf = "/root/testdata/sf0.001"
    q = (
        running_user_stats_v2(read_events_stream(spark, sf))
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("user_stats_v2")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r.user_id: (r.n_events, round(r.total_value, 4))
        for r in spark.sql(
            "SELECT user_id, n_events, total_value FROM user_stats_v2"
        ).collect()
    }
    want = {
        r.user_id: (r.n, r.t)
        for r in load_events(spark, sf)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.coalesce("value", F.lit(0.0))), 4).alias("t"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0]
        assert abs(got[u][1] - want[u][1]) < 1e-6


def test_transform_with_state_map_state_histogram(spark):
    pytest.importorskip("google.protobuf")
    from grasper_spark.streaming.stateful_v2 import user_event_type_counts
    from grasper_spark.streaming.windows import load_events, read_events_stream

    sf = "/root/testdata/sf0.001"
    q = (
        user_event_type_counts(read_events_stream(spark, sf))
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("type_counts_v2")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.user_id, r.event_type): r.cnt
        for r in spark.sql(
            "SELECT user_id, event_type, cnt FROM type_counts_v2"
        ).collect()
    }
    want = {
        (r.user_id, r.event_type): r.n
        for r in load_events(spark, sf)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_edge_stream_refreshes_serving_tier(spark, tmp_path):
    """VERDICT r3 Next #6: append edges via the stream → the next
    G.query point lookup serves the fresh rows (auto-prepared template
    invalidated by the on_commit → G.refresh hook)."""
    from grasper_spark import G, PropertyGraph
    from grasper_spark.streaming.graph_updates import (
        append_edges_stream,
        read_edges_stream,
    )

    src = str(tmp_path / "incoming")
    log = str(tmp_path / "edge_log")
    ckpt = str(tmp_path / "ckpt")
    v = spark.createDataFrame(
        [(i, "person", f"p{i}") for i in (1, 2, 3, 4)], ["vid", "label", "name"]
    )
    spark.createDataFrame(
        [(1, 2, "knows")], ["src", "dst", "label"]
    ).write.mode("append").parquet(log)

    def load():
        return PropertyGraph(vertices=v, edges=spark.read.parquet(log))

    g = G(load(), graph_loader=load)
    q = 'g.V().has("name","p1").out("knows").values("name")'
    # three sightings of the shape → auto-prepared and served
    for qq in (q, q.replace("p1", "p2"), q):
        g.query(qq).collect()
        g._plan_cache.clear()
    live = [r for r in g._auto_prepared.values() if r not in (None, g._BUILDING)]
    assert len(live) == 1
    assert [r[0] for r in g.query(q).collect()] == ["p2"]

    # new edge lands via the stream; on_commit drives G.refresh
    spark.createDataFrame(
        [(1, 3, "knows")], ["src", "dst", "label"]
    ).write.mode("append").parquet(src)
    sq = append_edges_stream(read_edges_stream(spark, src), log, ckpt, on_commit=g.refresh)
    sq.processAllAvailable()
    sq.stop()

    # stale serving tier was dropped and the fresh edge is visible
    assert g._auto_prepared == {}
    assert sorted(r[0] for r in g.query(q).collect()) == ["p2", "p3"]


def test_bucketed_external_per_table_gate_and_label_partition(modern, spark, tmp_path):
    """Round-4 snapshot layout: small V plain (per-table gate), edges
    bucketed AND partitioned by label — label-filtered traversals prune
    to one edge type's directory (PartitionFilters on the scan)."""
    from grasper_spark import G
    from grasper_spark.sources.sinks import (
        attach_bucketed_external,
        write_bucketed_external,
    )

    out = str(tmp_path / "snap")
    write_bucketed_external(
        modern, "ptg_w", out, buckets=2, bucket_vertices=False
    )
    import os

    assert os.path.isdir(os.path.join(out, "v_plain"))
    assert not os.path.isdir(os.path.join(out, "v"))
    # label dirs under the edge tables
    assert any(d.startswith("label=") for d in os.listdir(os.path.join(out, "e_src")))

    g = attach_bucketed_external(spark, "ptg_a", out, name="ptg")
    assert g.vertices.count() == modern.vertices.count()
    assert g.edges.count() == modern.edges.count()
    gg = G(g)
    got = sorted(
        r[0] for r in gg.V().has("name", "marko").out("knows").values("name").df().collect()
    )
    assert got == ["josh", "vadas"]
    # the out('knows') edge scan prunes to the knows partition
    plan = (
        gg.V().out("knows").df()._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [isnotnull(label" in plan and "= knows)" in plan
