"""Structured Streaming surfaces (green-field — the reference is
batch-only, SURVEY.md §2.7)."""

from grasper_spark.streaming.neardup import neardup_foreach_batch, neardup_stream
from grasper_spark.streaming.windows import (
    read_events_stream,
    sessionize_batch,
    windowed_counts,
    windowed_counts_batch,
)

__all__ = [
    "read_events_stream",
    "windowed_counts",
    "windowed_counts_batch",
    "sessionize_batch",
    "neardup_foreach_batch",
    "neardup_stream",
]
