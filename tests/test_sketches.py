"""Sketch-based corpus statistics: estimates vs exact ground truth, and
the mergeable-shard property that makes them the 100 TB design."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    # deterministic synthetic corpus with a KNOWN vocabulary: doc i
    # holds tokens w{i} .. w{i+9}, so vocab = n_docs + 9 exactly
    n = 400
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(9)),
                    lambda j: F.concat(F.lit("w"), (F.col("id") + j).cast("string")),
                ),
                " ",
            ).alias("text"),
            (F.col("id") % 4).alias("shard"),
        )
    )


def test_vocab_summary_estimates_match_exact(spark, corpus):
    from grasper_spark.functions.sketches import vocab_summary

    row = vocab_summary(corpus).collect()[0]
    assert row["n_docs"] == 400
    assert row["n_tokens"] == 4000
    exact_vocab = 409  # w0..w408
    assert abs(row["est_vocab"] - exact_vocab) / exact_vocab < 0.05
    # every doc is exactly 10 tokens -> all quantiles are 10
    assert row["p50_doc_tokens"] == 10
    assert row["p95_doc_tokens"] == 10


def test_shard_sketches_merge_to_global_estimate(spark, corpus):
    from grasper_spark.functions.sketches import (
        merge_token_sketches,
        shard_token_sketches,
        vocab_summary,
    )

    shards = shard_token_sketches(corpus)
    assert shards.count() == 4
    # per-shard estimates are near their exact per-shard vocab
    exact = {
        r["shard"]: r["n"]
        for r in corpus.select(
            "shard", F.explode(F.split(F.lower("text"), r"\s+")).alias("t")
        )
        .groupBy("shard")
        .agg(F.countDistinct("t").alias("n"))
        .collect()
    }
    for r in shards.collect():
        assert abs(r["est_distinct"] - exact[r["shard"]]) / exact[r["shard"]] < 0.05

    # merged sketches estimate the GLOBAL vocab without rescanning docs
    merged = merge_token_sketches(shards).collect()[0]["est_distinct"]
    direct = vocab_summary(corpus).collect()[0]["est_vocab"]
    assert abs(merged - 409) / 409 < 0.05
    assert abs(merged - direct) / max(direct, 1) < 0.02


def test_sketch_agg_is_partial(spark, corpus):
    # the HLL aggregate must partial-aggregate (sketch bytes shuffle,
    # not token values): plan shows two HashAggregate/ObjectHashAggregate
    # phases around a single exchange and no token-valued exchange
    from grasper_spark.functions.sketches import vocab_summary

    plan = (
        vocab_summary(corpus)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_hll_sketch_agg" in plan or "partial_" in plan


def test_corpus_overlap_estimates_known_intersection(spark):
    from grasper_spark.functions.sketches import corpus_overlap

    # corpus A: tokens w0..w999; corpus B: tokens w500..w1499
    # exact: |A|=|B|=1000, |A∩B|=500, |A∪B|=1500, J=1/3, containment=0.5
    def corp(lo, hi):
        return (
            spark.range(lo, hi)
            .select(F.concat(F.lit("w"), F.col("id").cast("string")).alias("text"))
        )

    row = corpus_overlap(corp(0, 1000), corp(500, 1500)).collect()[0]
    assert row["est_a"] == pytest.approx(1000, rel=0.05)
    assert row["est_b"] == pytest.approx(1000, rel=0.05)
    assert row["est_intersection"] == pytest.approx(500, rel=0.10)
    assert row["est_union"] == pytest.approx(1500, rel=0.05)
    assert row["jaccard"] == pytest.approx(1 / 3, rel=0.10)
    assert row["containment_a_in_b"] == pytest.approx(0.5, rel=0.10)
    assert row["containment_b_in_a"] == pytest.approx(0.5, rel=0.10)


def test_source_overlap_matrix_pairs_and_estimates(spark):
    from grasper_spark.functions.sketches import source_overlap_matrix

    # 3 sources: s0 = w0..w599, s1 = w300..w899 (50% overlap with s0),
    # s2 = w5000..w5599 (disjoint from both)
    docs = (
        spark.range(600)
        .select(
            F.concat(F.lit("w"), F.col("id").cast("string")).alias("t0"),
            F.concat(F.lit("w"), (F.col("id") + 300).cast("string")).alias("t1"),
            F.concat(F.lit("w"), (F.col("id") + 5000).cast("string")).alias("t2"),
        )
        .selectExpr(
            "stack(3, 's0', t0, 's1', t1, 's2', t2) AS (source, text)"
        )
    )
    rows = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap_matrix(docs).collect()
    }
    assert set(rows) == {("s0", "s1"), ("s0", "s2"), ("s1", "s2")}
    r01 = rows[("s0", "s1")]
    assert r01["est_intersection"] == pytest.approx(300, rel=0.12)
    assert r01["jaccard"] == pytest.approx(300 / 900, rel=0.12)
    assert rows[("s0", "s2")]["est_intersection"] == pytest.approx(0, abs=5)
    assert rows[("s1", "s2")]["est_intersection"] == pytest.approx(0, abs=5)


def test_theta_sketch_agg_is_partial(spark):
    # like the HLL test: only sketch bytes may shuffle, never tokens
    from grasper_spark.functions.sketches import corpus_overlap

    docs = spark.range(100).select(
        F.concat(F.lit("w"), F.col("id").cast("string")).alias("text")
    )
    plan = (
        corpus_overlap(docs, docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_theta_sketch_agg" in plan or "partial_" in plan


def test_length_sketches_merge_to_global_quantiles(spark, corpus):
    from grasper_spark.functions.sketches import (
        merge_length_sketches,
        shard_length_sketches,
    )

    # every doc is exactly 10 tokens → every quantile is exactly 10 and
    # n equals the doc count; the merge path must see all 4 shards
    shards = shard_length_sketches(corpus)
    assert shards.count() == 4
    assert {r["n"] for r in shards.collect()} == {100}
    row = merge_length_sketches(shards).collect()[0]
    assert row["n"] == 400
    for q in ("q_10", "q_50", "q_90", "q_99"):
        assert row[q] == 10


def test_length_sketches_mixed_distribution(spark):
    from grasper_spark.functions.sketches import (
        merge_length_sketches,
        shard_length_sketches,
    )

    # 900 ten-token docs + 100 hundred-token docs → p50=10, p99≈100;
    # KLL with k=200 is near-exact at n=1000
    docs = spark.range(1000).select(
        (F.col("id") % 2).alias("shard"),
        F.array_join(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.when(F.col("id") < 900, F.lit(10)).otherwise(F.lit(100)),
                ),
                lambda j: F.lit("tok"),
            ),
            " ",
        ).alias("text"),
    )
    row = merge_length_sketches(shard_length_sketches(docs)).collect()[0]
    assert row["n"] == 1000
    assert row["q_50"] == 10
    assert row["q_99"] == 100


def test_frequency_sketches_probe_exact_on_small_input(spark):
    from grasper_spark.functions.sketches import (
        probe_token_frequencies,
        shard_frequency_sketches,
    )

    # doc i repeats token w{i%5} (i%10 + 1) times across 2 shards →
    # exact per-token totals are computable; CMS at eps=1e-4 over ~275
    # tokens has zero collisions, so estimates are exact here
    docs = spark.range(50).select(
        (F.col("id") % 2).alias("shard"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), (F.col("id") % 10) + 1),
                lambda j: F.concat(F.lit("w"), (F.col("id") % 5).cast("string")),
            ),
            " ",
        ).alias("text"),
    )
    exact = {
        r["t"]: r["n"]
        for r in docs.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    sketches = shard_frequency_sketches(docs)
    assert sketches.count() == 2
    got = {
        r["token"]: r["est_count"]
        for r in probe_token_frequencies(
            sketches, ["w0", "w1", "w2", "w3", "w4", "absent"]
        ).collect()
    }
    for t in ("w0", "w1", "w2", "w3", "w4"):
        assert got[t] == exact[t]
    assert got["absent"] == 0


def test_frequency_sketch_overcounts_only(spark):
    # CMS error is one-sided: est >= true always
    from grasper_spark.functions.sketches import (
        probe_token_frequencies,
        shard_frequency_sketches,
    )

    docs = spark.range(2000).select(
        F.lit(0).alias("shard"),
        F.concat(F.lit("tok"), (F.col("id") % 997).cast("string")).alias("text"),
    )
    got = probe_token_frequencies(
        shard_frequency_sketches(docs, eps=0.01), ["tok0", "tok1", "tok996"]
    ).collect()
    for r in got:
        true = 3 if int(r["token"][3:]) < 6 else 2
        assert r["est_count"] >= true


def test_profile_one_pass_and_correct(spark):
    from grasper_spark.functions.sketches import profile

    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, None, "b"), (3, 30.0, None), (4, 40.0, "a")],
        "id int, v double, s string",
    )
    rows = {
        (r["column"], r["stat"]): r["value"] for r in profile(df).collect()
    }
    assert rows[("id", "n")] == 4.0
    assert rows[("v", "nulls")] == 1.0
    assert rows[("s", "nulls")] == 1.0
    assert rows[("v", "min")] == 10.0
    assert rows[("v", "max")] == 40.0
    assert rows[("id", "distinct")] == pytest.approx(4.0, rel=0.05)
    # string columns carry no numeric stats
    assert ("s", "min") not in rows
    # one-pass: exactly one aggregate over one scan
    plan = profile(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan") <= 2  # LocalTableScan appears once (+reused)
