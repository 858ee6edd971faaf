"""As-of (time-travel) join — a training-pipeline / event-attribution staple.

No reference code exists (the reference joins only on exact keys,
/root/reference/src/index.js:163-223); this is a north-star extension.

The distributed formulation is the **union + running-last window**, not an
inequality join: tag quote rows 0 and probe rows 1, union them, and take
``last(quote_struct, ignorenulls=True)`` over a window partitioned by key
and ordered by (ts, tag, seq) up to the current row. Each probe row then
carries the latest quote at-or-before its timestamp, in one pass — probe
payloads ride along in a struct, so there is no join-back.

Why this shape at 100 TB: one hash shuffle per input on the join key and a
linear per-partition scan — versus the O(probes × quotes-per-key)
intermediate a `q.ts <= p.ts` range join materializes before its
row_number filter. Skewed keys behave like any other window aggregation
(AQE/salting applies); no driver-side state.

Tie-breaks are total and deterministic: a quote AT the probe's timestamp
matches (quotes sort before probes at equal ts); equal-ts quotes resolve to
the highest sequence id.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    probes: DataFrame,
    quotes: DataFrame,
    *,
    on: str | Sequence[str],
    ts: str,
    seq: str,
    quote_cols: Sequence[str],
    prefix: str = "last_",
) -> DataFrame:
    """For each probe row, attach the latest quote row of the same key with
    ``quote.ts <= probe.ts`` (left semantics: unmatched probes keep nulls).

    ``seq`` is the quotes' deterministic tie-break column (e.g. an event
    id): among equal-``ts`` quotes the highest ``seq`` wins.

    Returns all probe columns plus ``{prefix}{c}`` for each quote column.
    """
    keys = [on] if isinstance(on, str) else list(on)
    probe_cols = probes.columns

    tagged_q = quotes.select(
        *[F.col(k) for k in keys],
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.col(seq).cast("long").alias("__seq"),
        F.struct(*[F.col(c) for c in quote_cols]).alias("__q"),
    )
    tagged_p = probes.select(
        *[F.col(k) for k in keys],
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast("long").alias("__seq"),
        F.lit(None).cast(tagged_q.schema["__q"].dataType).alias("__q"),
        F.struct(*[F.col(c) for c in probe_cols]).alias("__p"),
    )
    tagged_q = tagged_q.withColumn(
        "__p", F.lit(None).cast(tagged_p.schema["__p"].dataType)
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc(), F.col("__seq").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        tagged_q.unionByName(tagged_p)
        .withColumn("__last_q", F.last("__q", ignorenulls=True).over(w))
        .filter(F.col("__tag") == 1)
    )
    return out.select(
        *[F.col("__p").getField(c).alias(c) for c in probe_cols],
        *[F.col("__last_q").getField(c).alias(prefix + c) for c in quote_cols],
    )
