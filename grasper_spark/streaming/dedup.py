"""Streaming deduplication: drop exact duplicates as documents arrive.

`dropDuplicates` on a fingerprint keyed by content; with a watermark the
state store evicts fingerprints older than the horizon (bounded state —
the production requirement for infinite streams). Without an event-time
column the caller gets global (unbounded-state) dedup, correct for
bounded backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grasper_spark.functions.text import fingerprint


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """First-seen document per normalized-content fingerprint.

    With `ts_col`, dedup is on the fingerprint ALONE within the
    watermark horizon (dropDuplicatesWithinWatermark) — duplicates with
    different event times still collapse, and state is evicted past the
    horizon. Without `ts_col`: global fingerprint dedup, unbounded
    state (bounded backfills only)."""
    out = docs.withColumn("fingerprint", fingerprint(F.col(text_col)))
    if ts_col is not None:
        out = out.withWatermark(ts_col, watermark)
        return out.dropDuplicatesWithinWatermark(["fingerprint"])
    return out.dropDuplicates(["fingerprint"])
