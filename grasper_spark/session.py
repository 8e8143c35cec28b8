"""SparkSession construction tuned for the engine.

Settings chosen for correctness-vs-oracle (UTC timestamps) and scale
(AQE on, skew-join handling, Arrow for the Pandas-UDF extension ops).
On a real cluster the same builder applies — only master()/memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable confs this engine depends on to an
    EXTERNALLY-built session (e.g. the evaluation driver's): nanos
    timestamps in events.parquet and UTC rendering for oracle parity.
    Idempotent and cheap — called from the loaders."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def get_spark(
    app_name: str = "grasper_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Correctness: duckdb oracle timestamps are UTC-naive.
        .config("spark.sql.session.timeZone", "UTC")
        # Scale: adaptive execution re-plans joins/partitions at runtime.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow: vectorized transfer for the Pandas-UDF extension operators.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # the driver's events.parquet stores TIMESTAMP(NANOS) — read as
        # long nanos and normalize in the loader (Spark has no nanos type).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Multi-client fairness: concurrent queries (emu mode, notebook
        # users) round-robin stages instead of FIFO-queueing behind a
        # long scan — the analogue of the reference master's per-client
        # scheduling (driver/master.hpp:70-115).
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
