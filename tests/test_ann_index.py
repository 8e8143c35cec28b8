"""Shared ANN index manifest (functions/ann_index.py): round-trip +
append for BOTH index kinds through one validated on-disk contract,
legacy-sidecar fallback, and pointed format errors."""

import json
import os

import pytest
from pyspark.sql import functions as F

SF = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_manifest_written_and_validated(spark, emb, tmp_path):
    from grasper_spark.functions.ann_index import (
        MANIFEST,
        IndexFormatError,
        read_manifest,
    )
    from grasper_spark.functions.similarity import ivf_index, write_ivf_index

    assigned, cents = ivf_index(emb, n_clusters=4)
    path = str(tmp_path / "ivf")
    write_ivf_index(assigned, cents, path)
    assert os.path.exists(os.path.join(path, MANIFEST))
    doc = read_manifest(path)
    assert doc["kind"] == "ivf" and doc["format_version"] == 1
    assert doc["n_clusters"] == 4

    # kind mismatch and future version error pointedly
    with pytest.raises(IndexFormatError, match="expected a ivfpq"):
        read_manifest(path, expect_kind="ivfpq")
    mf = os.path.join(path, MANIFEST)
    doc2 = json.load(open(mf))
    doc2["format_version"] = 99
    json.dump(doc2, open(mf, "w"))
    with pytest.raises(IndexFormatError, match="format_version"):
        read_manifest(path)
    with pytest.raises(IndexFormatError, match="no index"):
        read_manifest(str(tmp_path / "nothing-here"))


def test_legacy_sidecar_layout_still_reads(spark, emb, tmp_path):
    # pre-manifest snapshots (bare centroids.json) read as version 0
    from grasper_spark.functions.ann_index import read_manifest
    from grasper_spark.functions.similarity import (
        ivf_append,
        ivf_index,
        read_ivf_index,
    )

    assigned, cents = ivf_index(emb, n_clusters=4)
    path = str(tmp_path / "legacy")
    assigned.write.mode("overwrite").partitionBy("cluster").parquet(
        os.path.join(path, "assigned")
    )
    with open(os.path.join(path, "centroids.json"), "w") as fh:
        json.dump([(c, list(v)) for c, v in cents], fh)
    doc = read_manifest(path)
    assert doc["kind"] == "ivf" and doc["format_version"] == 0
    a2, c2 = read_ivf_index(spark, path)
    assert a2.count() == emb.count()
    # append still works against the legacy layout
    out = ivf_append(spark, path, emb.limit(3).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"))
    assert out.count() == 3


@pytest.mark.slow  # streaming soak; ivfpq_roundtrip_and_append_through_manifest keeps the cover
def test_ivfpq_append_stream_ingests_microbatches(spark, emb, tmp_path):
    from pyspark.sql import functions as F

    from grasper_spark.functions.ann_index import data_dir
    from grasper_spark.functions.pq import ivfpq_append_stream, write_ivfpq_index

    base = emb.filter(F.col("vec_id") >= 10)
    path = str(tmp_path / "ivfpq_s")
    write_ivfpq_index(base, path, n_clusters=4, m=8, nbits=4)
    src = str(tmp_path / "src")
    emb.filter(F.col("vec_id") < 10).write.parquet(src)
    stream = spark.readStream.schema(emb.schema).parquet(src)
    q = (
        stream.writeStream.foreachBatch(ivfpq_append_stream(path))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    codes = spark.read.parquet(data_dir(path, "ivfpq"))
    assert codes.count() == emb.count()


def test_ivfpq_roundtrip_and_append_through_manifest(spark, emb, tmp_path):
    from grasper_spark.functions.ann_index import read_manifest
    from grasper_spark.functions.pq import (
        ivfpq_append,
        ivfpq_topk,
        write_ivfpq_index,
    )

    base = emb.filter(F.col("vec_id") >= 10)
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(base, path, n_clusters=4, m=8, nbits=4)
    doc = read_manifest(path, expect_kind="ivfpq")
    assert doc["m"] == 8 and doc["nbits"] == 4 and len(doc["codebooks"]) == 8

    q = emb.filter(F.col("vec_id") == 42)
    r1 = ivfpq_topk(spark, path, q, k=5, n_probe=2).collect()
    assert len(r1) == 5

    newv = emb.filter(F.col("vec_id") < 10)
    out = ivfpq_append(spark, path, newv)
    assert out.count() == newv.count()
    assert set(out.columns) == {"vec_id", "cluster", "codes"}
    # appended codes participate in probes: probing WITH an appended
    # vector as query returns neighbors (index now covers it)
    r2 = ivfpq_topk(
        spark, path, emb.filter(F.col("vec_id") == 5), k=5, n_probe=4
    ).collect()
    assert len(r2) == 5
    ids = {r.neighbor_id for r in r2}
    assert all(i < 100000 for i in ids)
