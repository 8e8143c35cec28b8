"""Product quantization: codebook training, encode compression, ADC
top-k recall vs exact cosine, and the JVM-side scoring plan shape."""

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def clustered(spark):
    # 4 well-separated clusters in 16-d, L2-normalized — same shape as
    # the IVF recall test: ANN must find same-cluster neighbors
    import random

    random.seed(7)
    rows = []
    for c in range(4):
        base = [0.0] * 16
        base[c * 4] = 1.0
        for i in range(60):
            v = [b + random.uniform(-0.05, 0.05) for b in base]
            n = math.sqrt(sum(x * x for x in v))
            rows.append((c * 100 + i, [x / n for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def pq_parts(clustered):
    from grasper_spark.functions.pq import pq_encode, pq_train

    books = pq_train(clustered, m=4, nbits=4, dim=16)
    codes = pq_encode(clustered, books).cache()
    return books, codes


def test_pq_train_shapes(pq_parts):
    books, _ = pq_parts
    assert len(books) == 4  # m subspaces
    assert all(len(b) == 16 for b in books)  # 2^4 codewords
    assert all(len(c) == 4 for b in books for c in b)  # dsub dims


def test_pq_encode_compresses_and_is_deterministic(spark, clustered, pq_parts):
    books, codes = pq_parts
    rows = codes.collect()
    assert len(rows) == 240
    assert all(len(r["codes"]) == 4 for r in rows)
    assert all(0 <= c < 16 for r in rows for c in r["codes"])
    # deterministic: a second encode produces identical codes
    from grasper_spark.functions.pq import pq_encode

    again = {r["vec_id"]: r["codes"] for r in pq_encode(clustered, books).collect()}
    assert all(again[r["vec_id"]] == r["codes"] for r in rows)


def test_pq_reconstruct_bounded_error(spark, clustered, pq_parts):
    from grasper_spark.functions.pq import pq_reconstruct

    books, codes = pq_parts
    recon = pq_reconstruct(codes, books)
    joined = clustered.alias("o").join(
        recon.withColumnRenamed("embedding", "rv").alias("r"), "vec_id"
    )
    err = joined.select(
        F.sqrt(
            F.aggregate(
                F.zip_with("embedding", "rv", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("l2")
    )
    mx = err.agg(F.max("l2")).collect()[0][0]
    # cluster spread is ±0.05/dim; PQ with 16 codewords per 4-d subspace
    # reconstructs well inside the cluster radius
    assert mx < 0.25


def test_pq_topk_recall_vs_exact(spark, clustered, pq_parts):
    from grasper_spark.functions.pq import pq_topk
    from grasper_spark.functions.similarity import cosine_topk

    books, codes = pq_parts
    queries = clustered.filter(F.col("vec_id") % 100 < 3)  # 12 queries
    exact = cosine_topk(clustered, queries, k=10)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}

    # pure ADC: quantization blurs near-ties inside a tight cluster, so
    # set recall is moderate — but every neighbor must be same-cluster
    a = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(codes, books, queries, k=10).collect()
    }
    assert len(e & a) / len(e) >= 0.5
    for q, n in a:
        assert q // 100 == n // 100

    # two-stage ADC shortlist + exact rerank: the production design
    rr = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(
            codes, books, queries, k=10, rerank_with=clustered
        ).collect()
    }
    recall = len(e & rr) / len(e)
    assert recall >= 0.9, f"rerank recall {recall}"


def test_ivfpq_index_probe_prunes_partitions_and_recalls(spark, clustered, tmp_path):
    from grasper_spark.functions.pq import ivfpq_topk, write_ivfpq_index
    from grasper_spark.functions.similarity import cosine_topk

    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(clustered, path, n_clusters=4, m=4, nbits=4, dim=16)
    queries = clustered.filter(F.col("vec_id") % 100 == 0)  # 1 per cluster
    out = ivfpq_topk(
        spark, path, queries, k=10, n_probe=1, rerank_with=clustered
    )
    e = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(clustered, queries, k=10).collect()
    }
    a = {(r["query_id"], r["neighbor_id"]) for r in out.collect()}
    assert len(e & a) / len(e) >= 0.9

    # partition pruning: probing 1 cluster for 1 query must show a
    # cluster PartitionFilter in the scan
    one = clustered.filter(F.col("vec_id") == 0)
    plan = (
        ivfpq_topk(spark, path, one, k=5, n_probe=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "cluster" in plan.split("PartitionFilters")[1][:120]


def test_pq_scoring_is_jvm_side(spark, clustered, pq_parts):
    # the ENCODE step is the one sanctioned pandas UDF; the SCORE plan
    # must be pure JVM (no Python eval) so the corpus never crosses to
    # Python at query time
    from grasper_spark.functions.pq import pq_topk

    books, codes = pq_parts
    # sever the encode lineage (stored codes would be read from parquet
    # in production) so the plan under test is the scoring side alone
    codes_plain = spark.createDataFrame(
        codes.collect(), "vec_id long, codes array<smallint>"
    )
    queries = clustered.filter(F.col("vec_id") == 0)
    plan = (
        pq_topk(codes_plain, books, queries, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan and "ArrowEval" not in plan
