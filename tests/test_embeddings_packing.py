"""Embedding quantization + sequence packing."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_l2_normalize_unit_norm(spark, emb):
    from grasper_spark.functions.embeddings import l2_normalize

    norms = (
        l2_normalize(emb)
        .select(
            F.sqrt(
                F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x)
            ).alias("n")
        )
        .collect()
    )
    for r in norms:
        assert abs(r.n - 1.0) < 1e-9


def test_quantize_roundtrip_error_bounded(spark, emb):
    from grasper_spark.functions.embeddings import dequantize, quantize_int8

    q = quantize_int8(emb.select("vec_id", "embedding"))
    assert dict(q.dtypes)["q"] == "array<tinyint>"
    rec = dequantize(q)
    joined = (
        emb.select("vec_id", F.col("embedding").alias("orig"))
        .join(rec, "vec_id")
        .select(
            "vec_id",
            F.aggregate(
                F.zip_with("orig", "embedding", lambda a, b: F.abs(a - b)),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, x),
            ).alias("max_err"),
            F.aggregate(
                "orig", F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x))
            ).alias("amax"),
        )
    )
    for r in joined.collect():
        # per-element error bound: scale/2 = amax/254 (+fp slack)
        assert r.max_err <= r.amax / 254.0 + 1e-9


def test_quantized_cosine_preserved(spark, emb):
    from grasper_spark.functions.embeddings import dequantize, quantize_int8

    def cos(a, b):
        dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
        na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))
        nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, x: s + x * x))
        return dot / (na * nb)

    rec = dequantize(quantize_int8(emb.select("vec_id", "embedding")))
    sims = (
        emb.select("vec_id", F.col("embedding").alias("orig"))
        .join(rec, "vec_id")
        .select(cos(F.col("orig"), F.col("embedding")).alias("c"))
        .agg(F.min("c").alias("worst"))
        .collect()[0]
    )
    assert sims.worst > 0.999


def test_quantize_no_shuffle(spark, emb):
    from grasper_spark.functions.embeddings import quantize_int8

    plan = (
        quantize_int8(emb)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


@pytest.fixture(scope="module")
def chunks(spark):
    from grasper_spark.functions.text import chunk_documents

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return chunk_documents(docs, window=64, stride=48).select(
        "doc_id", "chunk_id", "n_chunk_tokens"
    )


def test_pack_sequences_respects_capacity(spark, chunks):
    from grasper_spark.functions.packing import pack_sequences

    packed = pack_sequences(chunks, max_tokens=128, num_shards=8)
    # every piece assigned exactly once
    assert packed.count() == chunks.count()
    per_bin = (
        packed.filter(~F.col("overflow"))
        .groupBy("shard", "bin")
        .agg(F.sum("n_chunk_tokens").alias("tok"), F.first("bin_tokens").alias("rep"))
        .collect()
    )
    for r in per_bin:
        assert r.tok <= 128
        assert r.tok == r.rep  # reported bin_tokens is the real total
    # no overflow rows at this capacity (chunks are <= 64 tokens)
    assert packed.filter(F.col("overflow")).count() == 0


def test_pack_sequences_deterministic_and_efficient(spark, chunks):
    from grasper_spark.functions.packing import pack_sequences, packing_stats

    a = pack_sequences(chunks, max_tokens=128, num_shards=8)
    b = pack_sequences(chunks, max_tokens=128, num_shards=8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    stats = packing_stats(a, 128).collect()[0]
    assert stats.mean_fill > 0.5  # FFD fills bins well past half
    assert stats.waste_frac < 0.5


def test_pack_sequences_overflow_flagged(spark):
    from grasper_spark.functions.packing import pack_sequences

    df = spark.createDataFrame(
        [(1, 0, 50), (1, 1, 500), (2, 0, 60)],
        "doc_id long, chunk_id int, n_chunk_tokens int",
    )
    packed = pack_sequences(df, max_tokens=100, num_shards=2)
    over = packed.filter(F.col("overflow")).collect()
    assert [(r.doc_id, r.chunk_id) for r in over] == [(1, 1)]


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None)
@given(
    lengths=st.lists(st.integers(min_value=1, max_value=200), min_size=1, max_size=60),
    cap=st.integers(min_value=64, max_value=256),
)
def test_pack_sequences_property(lengths, cap):
    # every piece assigned exactly once; no non-overflow bin over cap;
    # overflow flagged iff the piece alone exceeds cap
    from pyspark.sql import SparkSession

    from grasper_spark.functions.packing import pack_sequences

    spark = SparkSession.getActiveSession()
    df = spark.createDataFrame(
        [(i, 0, n) for i, n in enumerate(lengths)],
        "doc_id long, chunk_id int, n_chunk_tokens int",
    )
    packed = pack_sequences(df, max_tokens=cap, num_shards=4).collect()
    assert len(packed) == len(lengths)
    by_bin: dict = {}
    for r in packed:
        assert r.overflow == (r.n_chunk_tokens > cap)
        if not r.overflow:
            by_bin.setdefault((r.shard, r.bin), []).append(r.n_chunk_tokens)
    for parts in by_bin.values():
        assert sum(parts) <= cap


def test_ivf_index_roundtrip_and_partition_pruning(spark, emb, tmp_path):
    # persisted IVF index: same top-k after reload, and a single-cluster
    # probe plan reads ONLY that cluster's files (PartitionFilters on
    # the cluster partition column, not a post-scan filter)
    from grasper_spark.functions.similarity import (
        ivf_index,
        ivf_topk,
        read_ivf_index,
        write_ivf_index,
    )

    assigned, cents = ivf_index(emb, n_clusters=8)
    path = str(tmp_path / "ivf")
    write_ivf_index(assigned, cents, path)
    assigned2, cents2 = read_ivf_index(spark, path)
    assert cents2 == [(c, list(v)) for c, v in cents]

    q = emb.filter(F.col("vec_id") < 3)
    a = ivf_topk(assigned, cents, q, k=5).collect()
    b = ivf_topk(assigned2, cents2, q, k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    one = assigned2.filter(F.col("cluster") == 3)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(cluster" in plan
    one.collect()


def test_ivf_append_ingests_without_retrain(spark, emb, tmp_path):
    from grasper_spark.functions.similarity import (
        ivf_append,
        ivf_index,
        ivf_topk,
        read_ivf_index,
        write_ivf_index,
    )

    base = emb.filter(F.col("vec_id") >= 10)
    assigned, cents = ivf_index(base, n_clusters=8)
    path = str(tmp_path / "ivf2")
    write_ivf_index(assigned, cents, path)

    newv = emb.filter(F.col("vec_id") < 10)
    out = ivf_append(spark, path, newv)
    assert out.count() == newv.count()

    a2, c2 = read_ivf_index(spark, path)
    assert a2.count() == emb.count()
    # an appended vector must now be findable: probe with itself -> its
    # nearest neighbors include only valid ids and sims are sane
    res = ivf_topk(a2, c2, emb.filter(F.col("vec_id") == 5), k=3).collect()
    assert len(res) == 3
    assert all(r.sim <= 1.0 + 1e-9 for r in res)


def test_ivf_append_stream_ingests_microbatches(spark, emb, tmp_path):
    from grasper_spark.functions.similarity import (
        ivf_append_stream,
        ivf_index,
        read_ivf_index,
        write_ivf_index,
    )

    base = emb.filter(F.col("vec_id") >= 10)
    assigned, cents = ivf_index(base, n_clusters=8)
    path = str(tmp_path / "ivf_s")
    write_ivf_index(assigned, cents, path)

    src = str(tmp_path / "src")
    emb.filter(F.col("vec_id") < 10).write.parquet(src)
    stream = spark.readStream.schema(emb.schema).parquet(src)
    q = (
        stream.writeStream.foreachBatch(ivf_append_stream(path))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    a2, _ = read_ivf_index(spark, path)
    assert a2.count() == emb.count()
