"""Interval (range) join: point-in-interval matching as a bucketized
EQUI-join.

Spark plans a raw ``p.ts BETWEEN i.start AND i.end`` join as a
BroadcastNestedLoopJoin — quadratic, the shape this repo's plan gate
bans. The scale-correct formulation buckets the time axis: each
interval explodes to the buckets it covers (``sequence`` — bounded by
interval-length / bucket-width), each point computes its single bucket,
the join runs on (keys…, bucket) as a plain hash/sort-merge equi-join,
and one residual comparison removes the bucket-edge false positives.
This is the banded interval join every warehouse implements under
``RANGE JOIN`` hints (Databricks' range-join optimization, the
interval-overlap trick in Flink/Kysely); here it is explicit, plan-
gated, and composable.

Cost model: shuffle rows = points + Σ ceil(interval_len / bucket_width)
— pick ``bucket_width`` near the typical interval length so each
interval explodes to O(1) buckets. Skew rides the (keys, bucket)
distribution, so a hot key spreads across its time buckets instead of
one reducer.

No counterpart in the reference (yuana97/Avro_Diff joins only on exact
keys); beyond-reference tier — the brief's "range join" custom-operator
slot, alongside operators/asof.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _fdiv(c: Column, b: int) -> Column:
    """Exact ``floor(c / b)`` for integer ``c`` and positive integer
    ``b`` — pure long arithmetic (``div`` truncates toward zero, minus
    one when a negative dividend leaves a remainder). ``F.floor(c / b)``
    routes through long→double division, which can mis-bucket values
    with |v| >= 2^53; a mis-bucketed point silently misses its
    containing interval (a false negative the residual cannot repair),
    and the operator advertises general integer domains (sequence
    numbers), not just epoch micros."""
    bb = F.lit(int(b))
    q = F.call_function("div", c, bb)
    return q - F.when((c < 0) & (c % bb != 0), F.lit(1)).otherwise(F.lit(0))


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    keys: list[str] | None = None,
    end_inclusive: bool = True,
    how: str = "inner",
    point_id: str | None = None,
) -> DataFrame:
    """Join each point row to every interval row containing it
    (``start <= point <= end``; ``end_inclusive=False`` for half-open
    intervals), optionally also matching equality ``keys``. Integer
    domains (epoch micros, sequence numbers). Returns the joined frame
    with both sides' columns (names must not collide apart from
    ``keys``).

    ``how="left"`` keeps points matching NO interval with null-extended
    interval columns (enrich-or-null) — it needs ``point_id``, a unique
    point key, because the bucket join cannot tell an unmatched point
    from one whose bucket candidates all failed the residual: matched
    ids are collected by ONE distinct + anti-join, both equi-shuffles."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    if how not in ("inner", "left"):
        raise ValueError(f"how={how!r} (inner|left)")
    if how == "left" and not point_id:
        raise ValueError("how='left' requires point_id= (a unique point key)")
    ks = list(keys or [])
    b = bucket_width
    p = points.withColumn("__ib", _fdiv(F.col(point_col), b))
    end_bucket = _fdiv(F.col(end_col), b)
    if not end_inclusive:
        # a half-open interval never matches its exact end: the last
        # covered bucket is the one holding end-1
        end_bucket = _fdiv(F.col(end_col) - 1, b)
    iv = intervals.withColumn(
        "__ib",
        F.explode(F.sequence(_fdiv(F.col(start_col), b), end_bucket)),
    )
    residual = F.col(point_col) >= F.col(start_col)
    residual = residual & (
        F.col(point_col) <= F.col(end_col)
        if end_inclusive
        else F.col(point_col) < F.col(end_col)
    )
    inner = p.join(iv, ks + ["__ib"]).filter(residual).drop("__ib")
    if how == "inner":
        return inner
    unmatched = points.join(
        inner.select(point_id).distinct(), point_id, "left_anti"
    )
    return inner.unionByName(unmatched, allowMissingColumns=True)


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
    keys: list[str] | None = None,
    end_inclusive: bool = True,
) -> DataFrame:
    """Join every pair of OVERLAPPING intervals (``a.start <= b.end AND
    b.start <= a.end``, strict for half-open) — interval×interval, the
    big sibling of :func:`interval_join`. Both sides explode to their
    covered buckets; two overlapping intervals share SEVERAL buckets, so
    the pair is emitted exactly once by keeping only the bucket holding
    ``max(a.start, b.start)`` — the standard dedup-free banding rule (no
    distinct pass over the join output). Equi-join on (keys…, bucket) +
    residuals; shuffle rows per side = Σ ceil(len / bucket_width)."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    ks = list(keys or [])
    b = bucket_width

    def exploded(df: DataFrame, start: str, end: str) -> DataFrame:
        hi = F.col(end) if end_inclusive else F.col(end) - 1
        return df.withColumn(
            "__ob", F.explode(F.sequence(_fdiv(F.col(start), b), _fdiv(hi, b)))
        )

    a = exploded(left, left_start, left_end)
    c = exploded(right, right_start, right_end)
    if end_inclusive:
        overlap = (F.col(left_start) <= F.col(right_end)) & (
            F.col(right_start) <= F.col(left_end)
        )
    else:
        overlap = (F.col(left_start) < F.col(right_end)) & (
            F.col(right_start) < F.col(left_end)
        )
    once = F.col("__ob") == _fdiv(
        F.greatest(F.col(left_start), F.col(right_start)), b
    )
    return a.join(c, ks + ["__ob"]).filter(overlap & once).drop("__ob")
