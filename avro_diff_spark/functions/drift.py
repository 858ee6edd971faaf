"""Two-sample distribution drift: exact total-variation distance over a
declared bucketing.

The training-data monitoring primitive: "did this week's corpus shift
against last week's?" / "does the replica's value distribution match the
primary's?". The standard scores (PSI, KL) need ``ln`` — whose last-ulp
behavior differs across engines/libms — so the engine ships TVD,

    TVD = 0.5 * sum_i | n_a_i / N_a  -  n_b_i / N_b |,

computed EXACTLY in integer/decimal arithmetic up to one final
correctly-rounded double divide (the same fixed-point discipline as the
sketches in this package): per-bucket cross products ``n_a_i * N_b``
ride DECIMAL(19,0) x DECIMAL(19,0) -> DECIMAL(38,0) (exact for inputs to
~1e19 rows — any real table), and only the finished numerator meets a
double. A DuckDB oracle therefore reproduces the score bit-for-bit.

Scale shape: one union scan + ONE hash aggregation keyed by bucket
(map-side combined — the shuffle carries at most ``len(cuts)+2`` rows per
partition), then a single-row fold over the bounded bucket array via
``F.aggregate`` (no window, no join, no driver collect).

No reference parity (yuana97/Avro_Diff has no statistics surface);
beyond-reference LLM-pipeline tier.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

#: Fixed-point scale of the reported distance: tvd_x1e6 in [0, 1_000_000].
TVD_SCALE = 1_000_000


def _check_cuts(cuts: Sequence[float]) -> None:
    if not cuts or any(cuts[i] >= cuts[i + 1] for i in range(len(cuts) - 1)):
        raise ValueError(f"cuts must be non-empty and strictly increasing: {cuts!r}")


def bucketize(col: Column, cuts: Sequence[float]) -> Column:
    """Branch-free declared bucketing: bucket i holds values in
    [cuts[i-1], cuts[i]), bucket 0 = below cuts[0], bucket len(cuts) =
    the overflow tail, bucket -1 = NULL. A CASE ladder over literals —
    bit-identical in any engine, no table statistics involved.
    ``cuts`` must be strictly increasing (validated — unsorted cuts
    would silently mis-bucket)."""
    _check_cuts(cuts)
    expr = F.lit(len(cuts))
    for i in range(len(cuts) - 1, -1, -1):
        expr = F.when(col < F.lit(cuts[i]), F.lit(i)).otherwise(expr)
    return F.when(col.isNull(), F.lit(-1)).otherwise(expr)


def _fold_tvd(tagged: DataFrame) -> DataFrame:
    """Shared finish: (bucket, _a, _b) tags -> one (n_a, n_b, n_buckets,
    tvd_x1e6) row. One bucket-keyed hash aggregate (map-side combined),
    the 1-row totals broadcast back onto the per-bucket counts via an
    equi-join on a literal key (BroadcastHashJoin — never the BNLJ that a
    keyless 1-row join plans as), then a second map-side-combined global
    aggregate sums the per-bucket decimal cross products. No per-row
    state is ever concentrated: for ``tv_distance_categorical`` the
    bucket count equals the column's distinct cardinality, and this
    shape keeps those rows distributed instead of collecting them into
    one driver-sized array. One final correctly-rounded double divide."""
    h = tagged.groupBy("bucket").agg(
        F.sum("_a").alias("na"), F.sum("_b").alias("nb")
    )
    dec = "decimal(19,0)"
    totals = h.agg(
        F.coalesce(F.sum("na"), F.lit(0)).alias("n_a"),
        F.coalesce(F.sum("nb"), F.lit(0)).alias("n_b"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    # A zero-count sentinel row (derived from the always-1-row totals)
    # keeps the join side non-empty so empty inputs still yield exactly
    # one output row (totality: 0 buckets -> tvd 0); its cross product
    # is identically 0 and n_buckets was counted before the union.
    cells = h.select("na", "nb").unionByName(
        totals.select(
            F.lit(0).cast("bigint").alias("na"), F.lit(0).cast("bigint").alias("nb")
        )
    )
    # Join key derived from a (never-null) data column so Catalyst can't
    # constant-fold it away and degrade the plan to a BNLJ: na - na = 0.
    joined = cells.withColumn("_k", F.col("na") - F.col("na")).join(
        F.broadcast(totals.withColumn("_k", F.col("n_a") - F.col("n_a"))), "_k"
    )
    cell = F.abs(
        F.col("na").cast(dec) * F.col("n_b").cast(dec)
        - F.col("nb").cast(dec) * F.col("n_a").cast(dec)
    )
    folded = joined.groupBy("n_a", "n_b", "n_buckets").agg(
        F.coalesce(F.sum(cell), F.lit(0).cast("decimal(38,0)")).alias("_num")
    )
    denom = F.col("n_a").cast(dec) * F.col("n_b").cast(dec)
    tvd = F.floor(
        F.col("_num").cast("double") / denom.cast("double") * F.lit(TVD_SCALE / 2.0)
    ).cast("long")
    return folded.select(
        "n_a",
        "n_b",
        "n_buckets",
        F.when((F.col("n_a") == 0) & (F.col("n_b") == 0), F.lit(0).cast("long"))
        .when((F.col("n_a") == 0) | (F.col("n_b") == 0), F.lit(TVD_SCALE).cast("long"))
        .otherwise(tvd)
        .alias("tvd_x1e6"),
    )


def tv_distance(
    a: DataFrame, b: DataFrame, col: str, cuts: Sequence[float]
) -> DataFrame:
    """One row: (n_a, n_b, n_buckets, tvd_x1e6). Total on every input:
    two empty samples are at distance 0, an empty vs non-empty sample at
    the maximum 1_000_000; NULLs occupy their own bucket (a NULL-rate
    shift IS drift)."""
    bucket = bucketize(F.col(col), cuts).alias("bucket")
    tagged = a.select(bucket, F.lit(1).alias("_a"), F.lit(0).alias("_b")).unionByName(
        b.select(bucket, F.lit(0).alias("_a"), F.lit(1).alias("_b"))
    )
    return _fold_tvd(tagged)


def tv_distance_sql(
    a_sql: str, b_sql: str, col: str, cuts: Sequence[float]
) -> str:
    """DuckDB twin of :func:`tv_distance` — independent formulation
    (scalar subqueries instead of an array fold), same arithmetic."""
    _check_cuts(cuts)
    ladder = f"CAST({len(cuts)} AS INT)"
    for i in range(len(cuts) - 1, -1, -1):
        ladder = f"CASE WHEN {col} < {cuts[i]!r} THEN {i} ELSE {ladder} END"
    bucket = f"CASE WHEN {col} IS NULL THEN -1 ELSE {ladder} END"
    return f"""
WITH tagged AS (
  SELECT {bucket} AS bucket, 1 AS _a, 0 AS _b FROM {a_sql}
  UNION ALL
  SELECT {bucket} AS bucket, 0 AS _a, 1 AS _b FROM {b_sql}
),
h AS (SELECT bucket, sum(_a)::BIGINT AS na, sum(_b)::BIGINT AS nb
      FROM tagged GROUP BY bucket),
t AS (SELECT coalesce(sum(na), 0)::BIGINT AS n_a,
             coalesce(sum(nb), 0)::BIGINT AS n_b,
             count(*)::BIGINT AS n_buckets
      FROM h),
s AS (SELECT coalesce(sum(abs(CAST(h.na AS DECIMAL(19,0)) * CAST(t.n_b AS DECIMAL(19,0))
                              - CAST(h.nb AS DECIMAL(19,0)) * CAST(t.n_a AS DECIMAL(19,0)))),
                      0) AS num
      FROM h, t)
SELECT n_a, n_b, n_buckets,
       CASE WHEN n_a = 0 AND n_b = 0 THEN 0
            WHEN n_a = 0 OR n_b = 0 THEN {TVD_SCALE}
            ELSE floor(CAST(num AS DOUBLE)
                       / CAST(CAST(n_a AS DECIMAL(19,0)) * CAST(n_b AS DECIMAL(19,0)) AS DOUBLE)
                       * {TVD_SCALE / 2.0!r})::BIGINT
       END AS tvd_x1e6
FROM t, s
"""


def tv_distance_categorical(a: DataFrame, b: DataFrame, col: str) -> DataFrame:
    """:func:`tv_distance` over a CATEGORICAL column: buckets are the
    observed values themselves (NULL is its own category), no declared
    cuts — the corpus-monitoring shape ("did the language / source mix
    shift?"). State = one row per distinct category; same exact decimal
    arithmetic and totality rules."""
    tagged = a.select(
        F.col(col).alias("bucket"), F.lit(1).alias("_a"), F.lit(0).alias("_b")
    ).unionByName(
        b.select(F.col(col).alias("bucket"), F.lit(0).alias("_a"), F.lit(1).alias("_b"))
    )
    return _fold_tvd(tagged)


def tv_distance_categorical_sql(a_sql: str, b_sql: str, col: str) -> str:
    """DuckDB twin of :func:`tv_distance_categorical`."""
    return f"""
WITH tagged AS (
  SELECT {col} AS bucket, 1 AS _a, 0 AS _b FROM {a_sql}
  UNION ALL
  SELECT {col} AS bucket, 0 AS _a, 1 AS _b FROM {b_sql}
),
h AS (SELECT bucket, sum(_a)::BIGINT AS na, sum(_b)::BIGINT AS nb
      FROM tagged GROUP BY bucket),
t AS (SELECT coalesce(sum(na), 0)::BIGINT AS n_a,
             coalesce(sum(nb), 0)::BIGINT AS n_b,
             count(*)::BIGINT AS n_buckets
      FROM h),
s AS (SELECT coalesce(sum(abs(CAST(h.na AS DECIMAL(19,0)) * CAST(t.n_b AS DECIMAL(19,0))
                              - CAST(h.nb AS DECIMAL(19,0)) * CAST(t.n_a AS DECIMAL(19,0)))),
                      0) AS num
      FROM h, t)
SELECT n_a, n_b, n_buckets,
       CASE WHEN n_a = 0 AND n_b = 0 THEN 0
            WHEN n_a = 0 OR n_b = 0 THEN {TVD_SCALE}
            ELSE floor(CAST(num AS DOUBLE)
                       / CAST(CAST(n_a AS DECIMAL(19,0)) * CAST(n_b AS DECIMAL(19,0)) AS DOUBLE)
                       * {TVD_SCALE / 2.0!r})::BIGINT
       END AS tvd_x1e6
FROM t, s
"""
