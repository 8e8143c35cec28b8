"""Structured Streaming surfaces (green-field — the reference is
batch-only, SURVEY.md §2.7)."""

from grasper_spark.streaming.joins import (
    interval_join,
    interval_join_batch,
    interval_join_outer,
    interval_join_stream,
)
from grasper_spark.streaming.monitor import corpus_monitor, corpus_monitor_batch
from grasper_spark.streaming.neardup import neardup_foreach_batch, neardup_stream
from grasper_spark.streaming.stateful_v2 import (
    TWS_AVAILABLE,
    running_user_stats_v2,
    user_event_type_counts,
)
from grasper_spark.streaming.windows import (
    read_events_stream,
    resample,
    session_rows,
    session_rows_batch,
    session_rows_stream,
    sessionize_batch,
    time_rollup,
    windowed_counts,
    windowed_counts_batch,
)

__all__ = [
    "read_events_stream",
    "windowed_counts",
    "windowed_counts_batch",
    "sessionize_batch",
    "session_rows",
    "session_rows_batch",
    "session_rows_stream",
    "resample",
    "time_rollup",
    "interval_join",
    "interval_join_batch",
    "interval_join_outer",
    "interval_join_stream",
    "neardup_foreach_batch",
    "neardup_stream",
    "corpus_monitor",
    "corpus_monitor_batch",
    "TWS_AVAILABLE",
    "running_user_stats_v2",
    "user_event_type_counts",
]
