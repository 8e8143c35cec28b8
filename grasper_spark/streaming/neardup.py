"""Streaming NEAR-duplicate removal: incremental banded-MinHash LSH.

Exact dedup streams trivially (one fingerprint per doc →
dropDuplicatesWithinWatermark, streaming/dedup.py). Near-dup cannot:
one doc owns `bands` bucket keys and a single stateful operator can
only key state by ONE column, while LSH needs "dup iff ANY band
collides" (OR across keys). The scalable streaming shape is therefore
micro-batch incremental compaction — `foreachBatch` + a persistent
bucket store:

  per micro-batch:
    1. compute the batch's (doc, band, hash) bucket relation
       (functions.dedup.band_buckets — same md5-deterministic kernel as
       the batch operators)
    2. a doc is a DUP iff any bucket hits the store (seen in an earlier
       batch) or an earlier doc in this batch claims it
    3. kept docs append to the sink; ALL batch buckets append to the
       store (dups extend clusters: C near B near A must drop even when
       C~A alone is under threshold)

Semantics == functions.dedup.neardup_keep_flags when docs arrive in id
order — that batch twin is the differential oracle (tested, plus the
driver's DuckDB gate on the `doc_neardup_stream` entry).

Scale notes:
- store I/O is the incremental cost: the semi-join is key-bounded on
  (band, hash); at deployment the store is a bucketed table (or Delta/
  Iceberg with merge) so the probe is co-located and old buckets can be
  vacuumed by retention, mirroring the watermark of the exact path.
- batch-retry idempotency: a replayed batch re-appends its buckets;
  duplicate store rows cannot flip a decision (semi-join semantics) —
  they cost bytes until compaction, not correctness.
- no driver-side loops; everything is one declarative plan per batch.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grasper_spark.functions.dedup import band_buckets

_STORE_SCHEMA = "b INT, h STRING"


def _read_store(spark, store_dir: str) -> DataFrame:
    if os.path.isdir(store_dir) and any(
        f.endswith(".parquet") for f in os.listdir(store_dir)
    ):
        return spark.read.parquet(store_dir)
    return spark.createDataFrame([], _STORE_SCHEMA)


def neardup_foreach_batch(
    store_dir: str,
    sink_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> Callable[[DataFrame, int], None]:
    """Build the foreachBatch processor:

        q = (docs_stream.writeStream
             .foreachBatch(neardup_foreach_batch(store, sink))
             .option("checkpointLocation", ckpt).start())

    `store_dir` holds the (band, hash) bucket set claimed so far;
    `sink_dir` receives kept documents as appended parquet."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.localCheckpoint(eager=True)  # sources are single-pass
        buckets = band_buckets(
            batch_df, text_col, id_col, num_hashes, bands, shingle_n
        ).localCheckpoint(eager=True)  # read 3×: store hit, batch owner, append
        store = _read_store(spark, store_dir)
        store_hit = (
            buckets.join(store, ["b", "h"], "left_semi").select(id_col).distinct()
        )
        owner = buckets.groupBy("b", "h").agg(F.min(id_col).alias("_owner"))
        batch_hit = (
            buckets.join(owner, ["b", "h"], "inner")
            .filter(F.col("_owner") < F.col(id_col))
            .select(id_col)
            .distinct()
        )
        dups = store_hit.unionByName(batch_hit).distinct()
        kept = batch_df.join(dups, id_col, "left_anti")
        kept.write.mode("append").parquet(sink_dir)
        buckets.select("b", "h").distinct().write.mode("append").parquet(store_dir)

    return process


def neardup_stream(
    docs: DataFrame,
    store_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = False,
    **kw,
):
    """Wire a streaming docs DataFrame through the near-dup compactor.
    Returns the started StreamingQuery (caller awaits/stops it)."""
    w = docs.writeStream.foreachBatch(
        neardup_foreach_batch(store_dir, sink_dir, **kw)
    ).option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()
