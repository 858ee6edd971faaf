"""Structured Streaming operators (north-star extensions; reference is
batch-only, SURVEY.md §2.8)."""

from avro_diff_spark.streaming.dedup import (
    contamination_stream,
    dedup_stream,
    near_dedup_stream,
)
from avro_diff_spark.streaming.diff import key_diff_stream
from avro_diff_spark.streaming.events import (
    EVENTS_SCHEMA,
    hourly_counts_stream,
    read_event_stream,
    running_user_totals,
    sessionize_stream,
)

__all__ = [
    "EVENTS_SCHEMA",
    "contamination_stream",
    "dedup_stream",
    "near_dedup_stream",
    "key_diff_stream",
    "read_event_stream",
    "hourly_counts_stream",
    "sessionize_stream",
    "running_user_totals",
]
