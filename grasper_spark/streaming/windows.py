"""Event-stream operators: windowed aggregation + sessionization.

Both exist in two forms:
- a Structured Streaming form (`readStream` + watermark) — the
  production path; tested with file-source + memory-sink in tests.
- a batch form with identical semantics — used by the oracle gate
  (DuckDB can verify it) and by backfills.

Scale: windowed counts shuffle once on (window, event_type);
sessionization is a per-user window function — partition by user_id,
no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _normalize_ts(df: DataFrame) -> DataFrame:
    """events.parquet stores ts as TIMESTAMP(NANOS); with
    spark.sql.legacy.parquet.nanosAsLong it reads as long — truncate to
    micros (exactly what DuckDB does) and cast to timestamp.

    Micros-precision files without a UTC flag read as TIMESTAMP_NTZ
    under Spark's parquet NTZ inference; normalize to TIMESTAMP (session
    tz is pinned to UTC, so the cast is exact) so downstream time
    arithmetic (unix_micros, watermarks) sees one type."""
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long")))
    elif dt == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


#: lazy handle memo per (session, dir): read.parquet pays ~166 ms of
#: listing + footer/schema work per call — registration-time cost in a
#: serving session, not a per-query one. The handle is an
#: unmaterialized plan (no result caching); a NEW events file under the
#: same path needs a fresh session (or cache clear) to be seen, the
#: same contract as the graph snapshot cache.
_EVENTS_CACHE: dict = {}


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from grasper_spark.session import ensure_runtime_confs

    key = (id(spark), sf_dir.rstrip("/"))
    hit = _EVENTS_CACHE.get(key)
    if hit is None:
        ensure_runtime_confs(spark)
        hit = _EVENTS_CACHE[key] = _normalize_ts(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        )
    return hit


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over `{sf_dir}/events.parquet` (same contract
    as load_events — pointing at the whole sf dir would ingest every
    table under the events schema)."""
    # A file stream needs an explicit schema. Borrow it from a batch read
    # of the same file so the ts physical type (nanos→bigint under
    # nanosAsLong, micros→TIMESTAMP_NTZ, or plain TIMESTAMP) matches
    # whatever the driver generated; _normalize_ts converges all three.
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file-stream source needs a DIRECTORY; glob-filter to the events
    # table so sibling tables aren't ingested under this schema
    return _normalize_ts(
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours",
                    quantize: int | None = None) -> DataFrame:
    """Tumbling-window count+sum per event_type (streaming or batch DF).

    `quantize=K` sums `floor(value*K)` as int64 instead of the float
    sum — a cross-row float sum is fold-order-sensitive, so any
    exact-compare gate (the DuckDB ledger, engine-migration audits)
    should hash the quantized form; integer partial aggregation commutes
    on any engine and any partitioning."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    sum_value = (
        F.sum(F.floor(F.col("value") * F.lit(float(quantize))))
        if quantize
        else F.round(F.sum("value"), 4)
    )
    return (
        src.groupBy(F.window("ts", window), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), sum_value.alias("sum_value"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def windowed_counts_batch(spark: SparkSession, sf_dir: str,
                          window: str = "1 hour",
                          quantize: int | None = None) -> DataFrame:
    return windowed_counts(load_events(spark, sf_dir), window, quantize=quantize)


def sessionize_batch(spark: SparkSession, sf_dir: str,
                     gap_minutes: int = 30) -> DataFrame:
    """Session assignment: a new session starts when the gap from the
    previous event of the same user exceeds `gap_minutes`. Returns
    per-user session stats (user_id, n_sessions, max_session_events)."""
    events = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # gap in exact integer microseconds — matches DuckDB epoch_us()
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    with_new = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)).otherwise(F.lit(0)),
    )
    with_sid = with_new.withColumn("session_id", F.sum("new_session").over(w))
    per_session = with_sid.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
    )


def session_rows(events: DataFrame, gap: str = "30 minutes",
                 watermark: str = "2 hours") -> DataFrame:
    """Per-session rows via Spark's native session_window (gap-based
    merging windows): (user_id, session_start, n_events, sum_value).
    Works on streaming or batch inputs — the streaming form emits a
    session once the watermark passes its close (append mode), which is
    exactly the batch result for a static file.

    Scale: one shuffle on (user_id); session state is bounded by the
    watermark horizon. This is the native-operator twin of
    sessionize_batch's window-function formulation — same gap semantics,
    per-session granularity instead of the per-user rollup."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
            "sum_value",
        )
    )


def session_rows_stream(spark: SparkSession, sf_dir: str,
                        gap: str = "30 minutes") -> DataFrame:
    return session_rows(read_events_stream(spark, sf_dir), gap)


def session_rows_batch(spark: SparkSession, sf_dir: str,
                       gap: str = "30 minutes") -> DataFrame:
    return session_rows(load_events(spark, sf_dir), gap)


def _sum_expr(agg_col: str, quantize: int | None):
    """Float sum (rounded for display) or — with quantize=K — the
    fold-order-free int64 sum of floor(v*K) that exact-compare gates
    hash (see windowed_counts)."""
    if quantize:
        return F.sum(F.floor(F.col(agg_col) * F.lit(float(quantize))))
    return F.round(F.sum(agg_col), 4)


def resample(
    events: DataFrame, every: str = "1 hour", agg_col: str = "value",
    group_col: str | None = None, quantize: int | None = None,
) -> DataFrame:
    """Regular time-series resampling WITH gap filling: one row per
    `every` bucket between the stream's min and max ts (per group when
    group_col is given), zero-filled where no events landed — the
    calendar-join op every downstream charting/feature pipeline needs
    (windowed_counts alone skips empty buckets).

    Scale: the calendar is generated with sequence() from the min/max
    aggregate (two scalars per group — a tiny relation, broadcast into
    the left join); events aggregate FIRST (partial agg on the bucket),
    so the join is bucket-rows × calendar, never raw events × calendar.
    """
    secs = {"1 hour": 3600, "1 minute": 60, "1 day": 86400}.get(every)
    if secs is None:
        raise ValueError(f"resample: unsupported interval {every!r}")
    bucket = (F.floor(F.unix_timestamp("ts") / secs) * secs).cast("long")
    keys = [group_col] if group_col else []
    agg = (
        events.withColumn("_bk", bucket)
        .groupBy(*keys, "_bk")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _sum_expr(agg_col, quantize).alias("sum_value"),
        )
    )
    bounds = events.select(*keys, bucket.alias("_bk")).groupBy(*keys).agg(
        F.min("_bk").alias("_lo"), F.max("_bk").alias("_hi")
    )
    calendar = bounds.select(
        *keys, F.explode(F.sequence("_lo", "_hi", F.lit(secs))).alias("_bk")
    )
    out = (
        calendar.join(agg, keys + ["_bk"], "left")
        .select(
            *keys,
            F.date_format(F.timestamp_seconds("_bk"), "yyyy-MM-dd HH:mm:ss").alias(
                "bucket_start"
            ),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce(
                "sum_value",
                F.lit(0).cast("long") if quantize else F.lit(0.0),
            ).alias("sum_value"),
        )
    )
    return out


def time_rollup(events: DataFrame, agg_col: str = "value",
                quantize: int | None = None) -> DataFrame:
    """Hypertable-style continuous-aggregate shape: ONE pass producing
    day-level, (day, hour)-level, and grand-total rows via ROLLUP on the
    truncated time parts — the multi-granularity materialization a
    time-series store keeps per chunk. NULL grouping keys from the
    rollup are rendered as 'ALL' so every engine agrees on the output.

    Scale: a single partial-aggregated ROLLUP (Spark expands it
    map-side); at 100 TB the input is the time-partitioned table and
    each partition contributes its chunk rows independently."""
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    hour = F.format_string("%02d", F.hour("ts"))
    return (
        events.withColumn("_day", day).withColumn("_hour", hour)
        .rollup("_day", "_hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _sum_expr(agg_col, quantize).alias("sum_value"),
        )
        .select(
            F.coalesce("_day", F.lit("ALL")).alias("day"),
            F.coalesce("_hour", F.lit("ALL")).alias("hour"),
            "n_events",
            "sum_value",
        )
    )
