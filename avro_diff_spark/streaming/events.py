"""Structured Streaming twins of the batch event analytics.

The reference is strictly batch (SURVEY.md §2.8 — its "streaming" is Node
file events inside one read); these are north-star extensions built on
Structured Streaming the way a 100 TB event pipeline would run them:

- file-source ``readStream`` over a directory that keeps receiving parquet
  drops (the lakehouse ingest shape),
- event-time windowed aggregation with a watermark for late data,
- gap sessionization via ``session_window`` (state pruned by watermark),
- a custom stateful operator via ``applyInPandasWithState`` (running
  per-user totals) — the escape hatch for semantics the built-in windows
  can't express.

Every operator returns a *streaming* DataFrame; callers pick sink/trigger.
``Trigger.AvailableNow`` turns each into an incremental batch job — same
code path for backfill and live tailing. Batch equivalence is pinned by
tests/test_streaming.py against analytics.events_hourly / sessionize.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

#: schema of the driver testdata events table (streaming sources must be
#: given a schema up front — no inference on an unbounded source).
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_event_stream(
    spark: SparkSession,
    path: str,
    *,
    schema: str | StructType = EVENTS_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a parquet directory.

    ``max_files_per_trigger`` bounds micro-batch size (backpressure); leave
    None for AvailableNow backfills."""
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def hourly_counts_stream(
    events: DataFrame, *, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of analytics.events_hourly: tumbling 1-hour windows.

    The watermark bounds state: windows older than (max event time −
    watermark) are finalized (append mode emits them) and their state is
    dropped — the knob that keeps an unbounded run at bounded memory."""
    ts = F.col("ts").cast("timestamp")
    return (
        events.withColumn("ts", ts)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.unix_micros(F.col("win.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize_stream(
    events: DataFrame, *, gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming gap sessionization via ``session_window`` — the built-in
    merging-window operator (batch twin: analytics.sessionize's lag +
    cumulative-sum formulation; both shuffle once on user_id)."""
    ts = F.col("ts").cast("timestamp")
    return (
        events.withColumn("ts", ts)
        .withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("win"),
            F.col("user_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("ts").alias("first_ts"))
        .select(
            "user_id",
            F.unix_micros(F.col("win.start")).alias("session_start_us"),
            F.unix_micros(F.col("first_ts")).alias("first_event_us"),
            "n_events",
        )
    )


RUNNING_TOTALS_SCHEMA = "user_id long, n_events long, sum_value double"
_STATE_SCHEMA = "n long, s double"


def _totals_fn(
    key: tuple[Any, ...], pdfs: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: cumulative (n_events, sum_value) per user,
    re-emitted on every micro-batch that touches the user.

    ``applyInPandasWithState`` is the Arrow-batched arbitrary-state API —
    the pattern to copy for any operator whose state outlives a window
    (running counters, CDC materialization, per-entity ML feature state).
    State lives in the state store (RocksDB/HDFS-backed on a cluster),
    partitioned by the group key: one shuffle, then local state lookups."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _totals_fn,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
