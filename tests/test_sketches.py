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
