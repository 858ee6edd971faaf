"""Slowly-changing-dimension Type 2 build: an event/change stream in,
versioned validity intervals out — the warehouse primitive behind
dimension history tables and point-in-time (as-of) joins.

Given per-key timestamped observations of some tracked attributes,
``scd2_build`` emits one row per CHANGE with ``valid_from`` /
``valid_to`` bounds (half-open; the current row's ``valid_to`` is
NULL): consecutive observations with identical tracked values collapse
into one interval, so the output size is the number of genuine
transitions, not the number of observations.

Scale shape: everything is ONE shuffle on the dimension key — the
change-collapse is a ``lag`` window and the interval close a ``lead``
window, both PARTITIONED BY KEY (millions of keys = millions of tiny
partitions, never a global funnel; the plan gate bans unpartitioned
windows). No joins, no state beyond a key's own rows. Composes with
operators/asof.py for the point-in-time fact join, and with
sources/versioned.py ``read_changes`` as the input feed (CDF rows are
exactly such keyed timestamped observations).

Ties: observations sharing (key, ts) are ordered by the tracked values
themselves as a last-resort deterministic tie-break — results are
layout-invariant even on dirty inputs.

No counterpart in the reference (yuana97/Avro_Diff diffs two static
snapshots; SCD2 is the longitudinal generalization: EVERY snapshot
transition, timestamped). Beyond-reference tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def scd2_build(
    df: DataFrame,
    *,
    key: list[str] | str,
    ts: str,
    tracked: list[str],
) -> DataFrame:
    """Collapse per-key observations into SCD2 validity intervals.

    Returns ``key…, tracked…, valid_from, valid_to, version`` where
    ``valid_from`` is the first observation time of a run of identical
    tracked values, ``valid_to`` the next run's start (NULL while
    current), and ``version`` the 1-based change ordinal per key."""
    keys = [key] if isinstance(key, str) else list(key)
    if not keys or not tracked:
        raise ValueError("key= and tracked= must be non-empty")
    order = [F.col(ts).asc()] + [F.col(c).asc_nulls_first() for c in tracked]
    w = Window.partitionBy(*keys).orderBy(*order)
    # a row starts a new interval iff any tracked value differs from the
    # previous observation's (null-safe: eqNullSafe)
    same = F.lit(True)
    for c in tracked:
        same = same & F.col(c).eqNullSafe(F.lag(c).over(w))
    # first-row detection by ROW NUMBER, not lag(ts).isNull(): a NULL ts
    # VALUE in the data (windows order NULLs first) would make the row
    # AFTER it look like a run start and split an identical run in two
    changed = F.when(F.row_number().over(w) == 1, F.lit(True)).otherwise(~same)
    runs = df.select(*keys, ts, *tracked).withColumn(
        "__chg", changed.cast("int")
    )
    # change ordinal = running count of change markers (same window)
    runs = runs.withColumn(
        "version", F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    # a change row IS its run's first observation, so it opens the
    # interval directly — no extra aggregation
    opened = runs.filter(F.col("__chg") == 1).select(
        *keys, *tracked, F.col(ts).alias("valid_from"), "version"
    )
    wv = Window.partitionBy(*keys).orderBy(F.col("version").asc())
    return opened.select(
        *keys,
        *tracked,
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        "version",
    )
