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


def sliding_counts_stream(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of analytics.events_sliding: HOPPING windows —
    ``window(ts, window, slide)`` assigns each event to its
    window/slide overlapping windows (Spark physically plans the same
    Expand + HashAggregate the batch query writes out explicitly), the
    watermark finalizes and drops each window's state once event time
    passes its end + watermark. State per key = overlapping-windows ×
    groups, bounded regardless of stream length."""
    ts = F.col("ts").cast("timestamp")
    return (
        events.withColumn("ts", ts)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"), F.col("event_type"))
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


SESSIONS_TWS_SCHEMA = (
    "user_id long, session_start_us long, session_end_us long, n_events long"
)


def make_session_processor(gap_minutes: int = 30):
    """StatefulProcessor for gap sessionization with CLOSED-session
    emission — the logic core of :func:`sessionize_stream_tws`, exposed as
    a factory so its semantics are unit-testable by driving
    ``handleInputRows`` / ``handleExpiredTimer`` directly against a fake
    handle (the transformWithState wire protocol needs protobuf, which
    not every deployment ships — see :func:`sessionize_stream_tws`)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    gap_us = gap_minutes * 60_000_000
    gap_ms = gap_minutes * 60_000

    class SessionProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self.handle = handle
            self.sess = handle.getValueState(
                "sess", "start_us long, last_us long, n long"
            )

        def _emit(self, key, start_us, last_us, n):
            import pandas as pd

            return pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start_us": [start_us],
                    "session_end_us": [last_us],
                    "n_events": [n],
                }
            )

        def handleInputRows(self, key, rows, timerValues):
            ts = []
            for pdf in rows:
                ts.extend(int(v) for v in pdf["ts_us"].values)
            ts.sort()
            if self.sess.exists():
                start, last, n = tuple(self.sess.get())
            else:
                start, last, n = None, None, 0
            for t in ts:
                if start is None:
                    start, last, n = t, t, 1
                elif t - last > gap_us:
                    # a later event proves the gap: the session is closed
                    # regardless of watermark — emit now, append-safe
                    yield self._emit(key, start, last, n)
                    start, last, n = t, t, 1
                else:
                    last, n = max(last, t), n + 1
            self.sess.update((start, last, n))
            # one live timer per key: the open session's close time
            for t_ms in list(self.handle.listTimers()):
                self.handle.deleteTimer(t_ms)
            self.handle.registerTimer(last // 1000 + gap_ms + 1)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if self.sess.exists():
                start, last, n = tuple(self.sess.get())
                # guard against a stale timer racing a newer arrival
                if expiredTimerInfo.getExpiryTimeInMs() >= last // 1000 + gap_ms:
                    yield self._emit(key, start, last, n)
                    self.sess.clear()

        def close(self) -> None:
            pass

    return SessionProcessor()


def sessionize_stream_tws(
    events: DataFrame, *, gap_minutes: int = 30, watermark: str = "1 second"
) -> DataFrame:
    """Gap sessionization that emits each session exactly once, when it
    CLOSES — via ``transformWithStateInPandas`` (the arbitrary-state API
    that supersedes ``applyInPandasWithState``: named state slots + real
    event-time TIMERS instead of a single opaque tuple + timeout conf).

    Semantics match analytics.sessionize's boundaries exactly (a new
    session starts when ``ts - prev_ts > gap``, strictly): a session is
    emitted either when a later event proves the gap (in
    ``handleInputRows``) or when the WATERMARK passes ``last + gap`` (an
    event-time timer — ``handleExpiredTimer``), so output is append-only
    and each closed session is final. State per user is one open session
    (start, last, n) — O(1) regardless of history, pruned on close.

    Scale shape: one shuffle on user_id into the state store (RocksDB
    provider — transformWithState requires it), Arrow-batched Python per
    group. Assumes per-user event-time order within the watermark bound;
    data later than the watermark is the caller's dedup/DLQ concern.

    Deployment note: the transformWithState state server speaks protobuf
    between the JVM and the Python worker, so the ``protobuf`` package
    must be importable on workers (stock pyspark[connect] ships it; this
    container does not, so tests/test_streaming.py unit-drives
    :func:`make_session_processor` against a fake handle and skips the
    end-to-end query unless protobuf is importable — same honest-gate
    pattern as the Pillow decoder slot).
    """
    ts = F.col("ts").cast("timestamp")
    return (
        events.withColumn("ts", ts)
        .withWatermark("ts", watermark)
        .select("user_id", F.unix_micros(F.col("ts")).alias("ts_us"), "ts")
        .groupBy("user_id")
        .transformWithStateInPandas(
            make_session_processor(gap_minutes),
            outputStructType=SESSIONS_TWS_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )


def attribution_join_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    *,
    horizon_minutes: int = 60,
    watermark: str = "2 hours",
) -> DataFrame:
    """STREAM-STREAM event-time join: every (click, purchase) pair of the
    same user where the purchase lands within ``horizon_minutes`` AFTER
    the click — conversion attribution where BOTH sides arrive as
    unbounded streams (the shape stream-static joins cannot express:
    the dimension side is itself late-arriving).

    Built exactly the way Structured Streaming bounds this join's state:
    watermarks on BOTH sides plus a time-RANGE join condition, so each
    side's buffered rows expire once the other side's watermark passes
    click_ts + horizon — state ∝ (arrival rate x horizon), never the
    stream's history. The join itself is a keyed equi-join on user_id
    with the range as residual — hash-partitioned by user at any scale.
    Inner join: late rows beyond the watermark drop on both sides
    (documented Structured Streaming semantics).

    Batch equivalence (same expression on two bounded frames) is pinned
    in tests/test_streaming.py."""
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {horizon_minutes} MINUTES")
        )
    )
    return c.join(p, cond, "inner").select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        F.unix_micros(F.col("click_ts")).alias("click_ts_us"),
        F.unix_micros(F.col("purchase_ts")).alias("purchase_ts_us"),
        "purchase_value",
    )
