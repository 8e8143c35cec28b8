"""Stream-stream interval join: clicks × purchases per user within a
time bound.

Two forms with identical semantics (the module's standing pattern —
see streaming/windows.py):
- streaming: both sides watermarked, inner join with a time-range
  predicate. The range condition is what BOUNDS THE JOIN STATE — Spark
  derives, from `purchase_ts <= click_ts + max_delay` plus the two
  watermarks, exactly how long each buffered row can still match, and
  evicts it afterwards. Without the bound the state grows forever.
- batch twin: the same join over the static table — DuckDB-verifiable
  (ledger entry `events_interval_join`) and the backfill path.

Scale: a stream-stream join shuffles both sides on user_id; state per
key is O(events inside the watermark horizon), independent of stream
length. For the batch twin Catalyst plans an equi-join on user_id with
the range as a post-join filter — one shuffle each side, no
range-explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FMT = "yyyy-MM-dd HH:mm:ss"


def interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    max_delay: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Each click matched with every purchase by the same user whose ts
    falls in [click_ts, click_ts + max_delay]. Works on streaming or
    batch inputs (streaming inputs get `watermark`)."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("_p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if p.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("_p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {max_delay}"))
    )
    return c.join(p, cond, "inner").select(
        "click_id",
        "user_id",
        F.date_format("click_ts", _FMT).alias("click_ts"),
        F.date_format("purchase_ts", _FMT).alias("purchase_ts"),
        # raw passthrough: an untouched double hashes identically on any
        # engine; round(·,4) does not (exact-decimal HALF_UP vs
        # multiply-based rounding can differ on identical input bits)
        F.col("purchase_value"),
    )


def interval_join_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    max_delay: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER interval join: every click, matched purchases where
    they exist, NULL purchase columns where none arrived in the window —
    the "click that never converted" detector.

    Streaming semantics: Spark emits the unmatched (NULL-padded) click
    only once its watermark guarantees no matching purchase can still
    arrive — the outer row is late by design, and BOTH sides need
    watermarks for the state bound + the null-emission deadline."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("_p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if p.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("_p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {max_delay}"))
    )
    return c.join(p, cond, "left_outer").select(
        "click_id",
        "user_id",
        F.date_format("click_ts", _FMT).alias("click_ts"),
        F.date_format("purchase_ts", _FMT).alias("purchase_ts"),
        # raw passthrough: an untouched double hashes identically on any
        # engine; round(·,4) does not (exact-decimal HALF_UP vs
        # multiply-based rounding can differ on identical input bits)
        F.col("purchase_value"),
    )


def interval_join_batch(
    spark: SparkSession, sf_dir: str, max_delay: str = "30 minutes"
) -> DataFrame:
    from grasper_spark.streaming.windows import load_events

    ev = load_events(spark, sf_dir)
    return interval_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        max_delay=max_delay,
    )


def interval_join_stream(
    spark: SparkSession, sf_dir: str, max_delay: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming form over the file source (two filtered readers of the
    same event log — the usual two-topic shape in production)."""
    from grasper_spark.streaming.windows import read_events_stream

    ev_c = read_events_stream(spark, sf_dir)
    ev_p = read_events_stream(spark, sf_dir)
    return interval_join(
        ev_c.filter(F.col("event_type") == "click"),
        ev_p.filter(F.col("event_type") == "purchase"),
        max_delay=max_delay,
        watermark=watermark,
    )
