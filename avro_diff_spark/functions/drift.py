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
    return _fold_tvd_counts(h)


def _fold_tvd_counts(h: DataFrame) -> DataFrame:
    """The fold of :func:`_fold_tvd` starting from per-bucket counts
    (bucket, na, nb) — also the entry point for count tables maintained
    incrementally (:func:`tv_distance_from_counts`)."""
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


#: Fixed-point scale of the KS statistic: ks_x1e6 in [0, 1_000_000].
KS_SCALE = 1_000_000


def ks_distance(a: DataFrame, b: DataFrame, col: str, *, buckets: int = 64) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic, exact to the last
    integer:

        D = sup_x |F_a(x) - F_b(x)|
          = max over merged sample points v of
            |C_a(v) * n_b  -  C_b(v) * n_a| / (n_a * n_b),

    with ``C`` the cumulative counts at the merged order statistics —
    the empirical CDFs are step functions, so the supremum is attained
    at a sample point. The numerator rides DECIMAL(19,0) x DECIMAL(19,0)
    cross products (exact to ~1e19 rows) and only the finished max meets
    one correctly-rounded double divide, the same fixed-point discipline
    as :func:`tv_distance` — a DuckDB oracle reproduces ``ks_x1e6``
    bit-for-bit. Unlike TVD over declared cuts, KS needs NO bucketing
    choice: it reads the full resolution of both samples.

    Scale shape (the two-level Blelloch scan of
    ``operators/prefix.py``, inlined for a two-counter payload): one
    union scan -> ONE hash aggregate keyed by value (map-side combined)
    -> bounded driver state (<= 512-row cut sample + <= ``buckets``-row
    offset totals, the running_sum bounded-collect contract) -> a
    cumulative window PARTITIONED by range bucket -> one global max
    aggregate. No single-partition window, no join, no unbounded
    collect; cut points affect only balance, never values.

    NULLs are excluded (an empirical CDF is defined over ordered
    values; monitor NULL-rate drift with :func:`tv_distance`, where
    NULL is its own bucket). Totality: two empty samples are at
    distance 0, empty vs non-empty at the maximum 1_000_000.

    Returns one row: (n_a, n_b, n_points, ks_x1e6)."""
    from pyspark.sql import Window

    from avro_diff_spark.operators.prefix import _sample_cuts

    v = F.col(col)
    tagged = (
        a.where(v.isNotNull()).select(v.alias("v"), F.lit(1).alias("_a"), F.lit(0).alias("_b"))
    ).unionByName(
        b.where(v.isNotNull()).select(v.alias("v"), F.lit(0).alias("_a"), F.lit(1).alias("_b"))
    )
    # ONE materialization of the merged histogram (optimization round
    # 16, guide §5 reuse): the cut-sample collect, the bucket-totals
    # collect and the final sup-scan plan all read ``h`` — without the
    # checkpoint each consumer re-executes the union scan + hash
    # aggregate from the source (3 full input passes per call,
    # measured). The histogram is bounded by the column's distinct
    # values (≤ input rows, usually far less), the same working-set
    # bound the aggregate itself already implies.
    h = (
        tagged.groupBy("v")
        .agg(F.sum("_a").alias("na"), F.sum("_b").alias("nb"))
        .localCheckpoint()
    )
    cuts = _sample_cuts(h, "v", buckets)
    bexpr = F.lit(len(cuts))
    for i in range(len(cuts) - 1, -1, -1):
        bexpr = F.when(F.col("v") < F.lit(cuts[i]), F.lit(i)).otherwise(bexpr)
    hb = h.withColumn("_bk", bexpr)
    btot = {
        r["_bk"]: (r["_na"], r["_nb"], r["_n"])
        for r in hb.groupBy("_bk")
        .agg(F.sum("na").alias("_na"), F.sum("nb").alias("_nb"), F.count(F.lit(1)).alias("_n"))
        .collect()
    }
    offsets: dict[int, tuple[int, int]] = {}
    acc_a = acc_b = n_points = 0
    for bk in sorted(btot):
        offsets[bk] = (acc_a, acc_b)
        ta, tb, tn = btot[bk]
        acc_a += int(ta)
        acc_b += int(tb)
        n_points += int(tn)
    n_a, n_b = acc_a, acc_b

    if n_a == 0 or n_b == 0:
        ks_lit = 0 if (n_a == 0 and n_b == 0) else KS_SCALE
        return hb.agg(
            F.lit(n_a).cast("long").alias("n_a"),
            F.lit(n_b).cast("long").alias("n_b"),
            F.lit(n_points).cast("long").alias("n_points"),
            F.lit(ks_lit).cast("long").alias("ks_x1e6"),
        )

    keys = F.array(*[F.lit(int(bk)) for bk in offsets])
    oa = F.map_from_arrays(keys, F.array(*[F.lit(x).cast("long") for x, _ in offsets.values()]))
    ob = F.map_from_arrays(keys, F.array(*[F.lit(x).cast("long") for _, x in offsets.values()]))
    bkey = F.col("_bk").cast("int")
    w = (
        Window.partitionBy("_bk")
        .orderBy(F.col("v").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dec = "decimal(19,0)"
    ca = F.element_at(oa, bkey) + F.sum("na").over(w)
    cb = F.element_at(ob, bkey) + F.sum("nb").over(w)
    cross = F.abs(
        ca.cast(dec) * F.lit(n_b).cast(dec) - cb.cast(dec) * F.lit(n_a).cast(dec)
    )
    folded = hb.select(cross.alias("_x")).agg(
        F.coalesce(F.max("_x"), F.lit(0).cast("decimal(38,0)")).alias("_num")
    )
    ks = F.floor(
        F.col("_num").cast("double") / F.lit(float(n_a) * float(n_b)) * F.lit(float(KS_SCALE))
    ).cast("long")
    return folded.select(
        F.lit(n_a).cast("long").alias("n_a"),
        F.lit(n_b).cast("long").alias("n_b"),
        F.lit(n_points).cast("long").alias("n_points"),
        ks.alias("ks_x1e6"),
    )


def ks_distance_sql(a_sql: str, b_sql: str, col: str) -> str:
    """DuckDB twin of :func:`ks_distance` — independent formulation: a
    NATIVE single cumulative window over the merged order statistics
    (proving the two-level scan decomposition), same decimal cross
    products, same final double divide."""
    return f"""
WITH tagged AS (
  SELECT {col} AS v, 1 AS _a, 0 AS _b FROM {a_sql} WHERE {col} IS NOT NULL
  UNION ALL
  SELECT {col} AS v, 0 AS _a, 1 AS _b FROM {b_sql} WHERE {col} IS NOT NULL
),
h AS (SELECT v, sum(_a)::BIGINT AS na, sum(_b)::BIGINT AS nb
      FROM tagged GROUP BY v),
c AS (SELECT CAST(sum(na) OVER w AS BIGINT) AS ca,
             CAST(sum(nb) OVER w AS BIGINT) AS cb
      FROM h WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
t AS (SELECT coalesce(sum(na), 0)::BIGINT AS n_a,
             coalesce(sum(nb), 0)::BIGINT AS n_b,
             count(*)::BIGINT AS n_points
      FROM h),
m AS (SELECT coalesce(max(abs(CAST(c.ca AS DECIMAL(19,0)) * CAST(t.n_b AS DECIMAL(19,0))
                              - CAST(c.cb AS DECIMAL(19,0)) * CAST(t.n_a AS DECIMAL(19,0)))),
                      0) AS num
      FROM c, t)
SELECT n_a, n_b, n_points,
       CASE WHEN n_a = 0 AND n_b = 0 THEN 0
            WHEN n_a = 0 OR n_b = 0 THEN {KS_SCALE}
            ELSE floor(CAST(num AS DOUBLE)
                       / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                       * CAST({KS_SCALE} AS DOUBLE))::BIGINT
       END AS ks_x1e6
FROM t, m
"""


def tv_distance_from_counts(
    a_counts: DataFrame,
    b_counts: DataFrame,
    *,
    bucket_col: str = "bucket",
    n_col: str = "n_rows",
) -> DataFrame:
    """:func:`tv_distance` computed from two PER-BUCKET COUNT TABLES
    instead of the raw samples — the streaming-monitor composition:
    ``maintain_drift_stream`` keeps a live (bucket, n_rows) table ∝
    changes, a pinned reference window keeps another, and the drift
    score between two 100 TB samples reduces to folding two
    <= n_buckets-row tables (no raw-data scan at alert time). Count
    tables must carry no zero/negative rows (the maintenance law drops
    groups at zero), so the bucket set here equals the tagged union's
    and the score is IDENTICAL to :func:`tv_distance` on the raw
    samples — pytest-pinned. Same totality rules."""
    a = a_counts.select(
        F.col(bucket_col).alias("bucket"),
        F.col(n_col).cast("long").alias("na"),
        F.lit(0).cast("long").alias("nb"),
    )
    b = b_counts.select(
        F.col(bucket_col).alias("bucket"),
        F.lit(0).cast("long").alias("na"),
        F.col(n_col).cast("long").alias("nb"),
    )
    h = a.unionByName(b).groupBy("bucket").agg(
        F.sum("na").alias("na"), F.sum("nb").alias("nb")
    )
    return _fold_tvd_counts(h)


def tv_distance_by(
    a: DataFrame,
    b: DataFrame,
    col: str,
    cuts: Sequence[float],
    group_cols: Sequence[str],
) -> DataFrame:
    """Per-group :func:`tv_distance`: one (group..., n_a, n_b,
    n_buckets, tvd_x1e6) row per group key observed in EITHER sample —
    the per-source / per-language corpus monitor ("which slice
    drifted?"). Same exact decimal arithmetic; totality per group
    (a group present in only one sample scores the maximum — its other
    sample is empty).

    Scale shape: one union scan -> ONE hash aggregate keyed by
    (group, bucket) -> per-group totals as a second aggregate joined
    back ON THE GROUP KEY (a real equi-join — no literal-key tricks
    needed here, and the totals side is one row per group) -> one
    (group)-keyed aggregate for the numerator. Buckets stay distributed;
    no windows, no collects."""
    gcols = list(group_cols)
    bucket = bucketize(F.col(col), cuts).alias("bucket")
    tagged = a.select(
        *gcols, bucket, F.lit(1).alias("_a"), F.lit(0).alias("_b")
    ).unionByName(b.select(*gcols, bucket, F.lit(0).alias("_a"), F.lit(1).alias("_b")))
    h = tagged.groupBy(*gcols, "bucket").agg(
        F.sum("_a").alias("na"), F.sum("_b").alias("nb")
    )
    totals = h.groupBy(*gcols).agg(
        F.sum("na").alias("n_a"),
        F.sum("nb").alias("n_b"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    dec = "decimal(19,0)"
    cell = F.abs(
        F.col("na").cast(dec) * F.col("n_b").cast(dec)
        - F.col("nb").cast(dec) * F.col("n_a").cast(dec)
    )
    # null-safe group join: a NULL group key is a real slice (the house
    # rule — global tv_distance gives NULL its own bucket) and must not
    # vanish through a null-unsafe equi-join; the totals side's keys are
    # RENAMED first (totals derives from h, so unrenamed keys would be
    # ambiguous self-join lineage)
    import functools as _ft
    import operator as _op

    t2 = totals.select(
        *[F.col(g).alias(f"_t_{g}") for g in gcols], "n_a", "n_b", "n_buckets"
    )
    cond = _ft.reduce(
        _op.and_, [F.col(g).eqNullSafe(F.col(f"_t_{g}")) for g in gcols]
    )
    folded = (
        h.join(t2, cond)
        .groupBy(*gcols, "n_a", "n_b", "n_buckets")
        .agg(F.sum(cell).alias("_num"))
    )
    denom = F.col("n_a").cast(dec) * F.col("n_b").cast(dec)
    tvd = F.floor(
        F.col("_num").cast("double") / denom.cast("double") * F.lit(TVD_SCALE / 2.0)
    ).cast("long")
    return folded.select(
        *gcols,
        "n_a",
        "n_b",
        "n_buckets",
        F.when((F.col("n_a") == 0) & (F.col("n_b") == 0), F.lit(0).cast("long"))
        .when((F.col("n_a") == 0) | (F.col("n_b") == 0), F.lit(TVD_SCALE).cast("long"))
        .otherwise(tvd)
        .alias("tvd_x1e6"),
    )


def tv_distance_by_sql(
    a_sql: str, b_sql: str, col: str, cuts: Sequence[float], group_cols: Sequence[str]
) -> str:
    """DuckDB twin of :func:`tv_distance_by` (null-safe group join:
    IS NOT DISTINCT FROM — USING would drop NULL-key slices)."""
    _check_cuts(cuts)
    gs = ", ".join(group_cols)
    gs_h = ", ".join(f"h.{g}" for g in group_cols)
    on_nullsafe = " AND ".join(f"h.{g} IS NOT DISTINCT FROM t.{g}" for g in group_cols)
    ladder = f"CAST({len(cuts)} AS INT)"
    for i in range(len(cuts) - 1, -1, -1):
        ladder = f"CASE WHEN {col} < {cuts[i]!r} THEN {i} ELSE {ladder} END"
    bucket = f"CASE WHEN {col} IS NULL THEN -1 ELSE {ladder} END"
    return f"""
WITH tagged AS (
  SELECT {gs}, {bucket} AS bucket, 1 AS _a, 0 AS _b FROM {a_sql}
  UNION ALL
  SELECT {gs}, {bucket} AS bucket, 0 AS _a, 1 AS _b FROM {b_sql}
),
h AS (SELECT {gs}, bucket, sum(_a)::BIGINT AS na, sum(_b)::BIGINT AS nb
      FROM tagged GROUP BY {gs}, bucket),
t AS (SELECT {gs}, sum(na)::BIGINT AS n_a, sum(nb)::BIGINT AS n_b,
             count(*)::BIGINT AS n_buckets
      FROM h GROUP BY {gs}),
s AS (SELECT {gs_h}, n_a, n_b, n_buckets,
             sum(abs(CAST(na AS DECIMAL(19,0)) * CAST(n_b AS DECIMAL(19,0))
                     - CAST(nb AS DECIMAL(19,0)) * CAST(n_a AS DECIMAL(19,0)))) AS num
      FROM h JOIN t ON ({on_nullsafe}) GROUP BY {gs_h}, n_a, n_b, n_buckets)
SELECT {gs}, n_a, n_b, n_buckets,
       CASE WHEN n_a = 0 AND n_b = 0 THEN 0
            WHEN n_a = 0 OR n_b = 0 THEN {TVD_SCALE}
            ELSE floor(CAST(num AS DOUBLE)
                       / CAST(CAST(n_a AS DECIMAL(19,0)) * CAST(n_b AS DECIMAL(19,0)) AS DOUBLE)
                       * {TVD_SCALE / 2.0!r})::BIGINT
       END AS tvd_x1e6
FROM s
"""


def ks_distance_by(
    a: DataFrame,
    b: DataFrame,
    col: str,
    group_cols: Sequence[str],
    *,
    buckets: int = 64,
) -> DataFrame:
    """Per-group :func:`ks_distance`: one (group..., n_a, n_b, n_points,
    ks_x1e6) row per group key observed in either sample — the
    which-slice-drifted companion of :func:`tv_distance_by` at full
    value resolution. Unlike the global version (whose ≤buckets offsets
    are bounded driver literals), the per-group prefix offsets live in a
    groups × buckets table, so here they come from a window PARTITIONED
    BY GROUP over that small aggregate — no driver collect at all, and
    every window is keyed (group for the offsets, (group, range-bucket)
    for the cumulative counts). Totality per group: a group present in
    only one sample scores the maximum. NULL values excluded as in
    :func:`ks_distance`."""
    from pyspark.sql import Window

    from avro_diff_spark.operators.prefix import _sample_cuts

    gcols = list(group_cols)
    v = F.col(col)
    tagged = (
        a.where(v.isNotNull()).select(
            *gcols, v.alias("v"), F.lit(1).alias("_a"), F.lit(0).alias("_b")
        )
    ).unionByName(
        b.where(v.isNotNull()).select(
            *gcols, v.alias("v"), F.lit(0).alias("_a"), F.lit(1).alias("_b")
        )
    )
    h = tagged.groupBy(*gcols, "v").agg(
        F.sum("_a").alias("na"), F.sum("_b").alias("nb")
    )
    cuts = _sample_cuts(h, "v", buckets)
    bexpr = F.lit(len(cuts))
    for i in range(len(cuts) - 1, -1, -1):
        bexpr = F.when(F.col("v") < F.lit(cuts[i]), F.lit(i)).otherwise(bexpr)
    hb = h.withColumn("_bk", bexpr)
    btot = hb.groupBy(*gcols, "_bk").agg(
        F.sum("na").alias("_ta"), F.sum("nb").alias("_tb")
    )
    woff = (
        Window.partitionBy(*gcols)
        .orderBy(F.col("_bk").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    offs = btot.select(
        *gcols,
        "_bk",
        (F.sum("_ta").over(woff) - F.col("_ta")).alias("_oa"),
        (F.sum("_tb").over(woff) - F.col("_tb")).alias("_ob"),
    )
    totals = h.groupBy(*gcols).agg(
        F.sum("na").alias("n_a"),
        F.sum("nb").alias("n_b"),
        F.count(F.lit(1)).alias("n_points"),
    )
    wcum = (
        Window.partitionBy(*gcols, "_bk")
        .orderBy(F.col("v").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dec = "decimal(19,0)"
    # null-safe group joins (NULL group keys are real slices); joined
    # sides derive from h, so their keys are RENAMED to avoid ambiguous
    # self-join lineage
    import functools as _ft
    import operator as _op

    o2 = offs.select(
        *[F.col(g).alias(f"_o_{g}") for g in gcols],
        F.col("_bk").alias("_o_bk"),
        "_oa",
        "_ob",
    )
    c1 = _ft.reduce(
        _op.and_,
        [F.col(g).eqNullSafe(F.col(f"_o_{g}")) for g in gcols]
        + [F.col("_bk") == F.col("_o_bk")],
    )
    t2 = totals.select(
        *[F.col(g).alias(f"_t_{g}") for g in gcols], "n_a", "n_b", "n_points"
    )
    c2 = _ft.reduce(
        _op.and_, [F.col(g).eqNullSafe(F.col(f"_t_{g}")) for g in gcols]
    )
    joined = hb.join(o2, c1).join(t2, c2)
    ca = F.col("_oa") + F.sum("na").over(wcum)
    cb = F.col("_ob") + F.sum("nb").over(wcum)
    cross = F.abs(
        ca.cast(dec) * F.col("n_b").cast(dec) - cb.cast(dec) * F.col("n_a").cast(dec)
    )
    folded = (
        joined.select(*gcols, "n_a", "n_b", "n_points", cross.alias("_x"))
        .groupBy(*gcols, "n_a", "n_b", "n_points")
        .agg(F.max("_x").alias("_num"))
    )
    ks = F.floor(
        F.col("_num").cast("double")
        / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        * F.lit(float(KS_SCALE))
    ).cast("long")
    return folded.select(
        *gcols,
        "n_a",
        "n_b",
        "n_points",
        F.when((F.col("n_a") == 0) & (F.col("n_b") == 0), F.lit(0).cast("long"))
        .when((F.col("n_a") == 0) | (F.col("n_b") == 0), F.lit(KS_SCALE).cast("long"))
        .otherwise(ks)
        .alias("ks_x1e6"),
    )


def ks_distance_by_sql(
    a_sql: str, b_sql: str, col: str, group_cols: Sequence[str]
) -> str:
    """DuckDB twin of :func:`ks_distance_by` — native per-group windows
    (independent formulation proving the bucketed decomposition);
    null-safe group join (IS NOT DISTINCT FROM)."""
    gs = ", ".join(group_cols)
    gs_c = ", ".join(f"c.{g}" for g in group_cols)
    on_nullsafe = " AND ".join(f"c.{g} IS NOT DISTINCT FROM t.{g}" for g in group_cols)
    return f"""
WITH tagged AS (
  SELECT {gs}, {col} AS v, 1 AS _a, 0 AS _b FROM {a_sql} WHERE {col} IS NOT NULL
  UNION ALL
  SELECT {gs}, {col} AS v, 0 AS _a, 1 AS _b FROM {b_sql} WHERE {col} IS NOT NULL
),
h AS (SELECT {gs}, v, sum(_a)::BIGINT AS na, sum(_b)::BIGINT AS nb
      FROM tagged GROUP BY {gs}, v),
c AS (SELECT {gs},
             CAST(sum(na) OVER w AS BIGINT) AS ca,
             CAST(sum(nb) OVER w AS BIGINT) AS cb
      FROM h WINDOW w AS (PARTITION BY {gs} ORDER BY v
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
t AS (SELECT {gs}, sum(na)::BIGINT AS n_a, sum(nb)::BIGINT AS n_b,
             count(*)::BIGINT AS n_points
      FROM h GROUP BY {gs}),
m AS (SELECT {gs_c}, n_a, n_b, n_points,
             max(abs(CAST(ca AS DECIMAL(19,0)) * CAST(n_b AS DECIMAL(19,0))
                     - CAST(cb AS DECIMAL(19,0)) * CAST(n_a AS DECIMAL(19,0)))) AS num
      FROM c JOIN t ON ({on_nullsafe}) GROUP BY {gs_c}, n_a, n_b, n_points)
SELECT {gs}, n_a, n_b, n_points,
       CASE WHEN n_a = 0 AND n_b = 0 THEN 0
            WHEN n_a = 0 OR n_b = 0 THEN {KS_SCALE}
            ELSE floor(CAST(num AS DOUBLE)
                       / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                       * CAST({KS_SCALE} AS DOUBLE))::BIGINT
       END AS ks_x1e6
FROM m
"""
