"""Single-pass table profiler — per-column null/distinct/min/max stats.

The data-profiling report every warehouse tool (Deequ `ColumnProfiler`,
Great Expectations `profile`, DataHub stats) emits as the first step of
onboarding a 100 TB table: for every column, how many rows, how many
nulls, how many distinct values, and the value range. The reference has
no profiling surface (it only counts diff buckets, `src/index.js:63-76`);
this is north-star surface for the Spark engine.

Design (scale shape first):

* **Null / distinct counts** ride ONE melt: each row explodes into
  ``(col_name, repr)`` pairs (map-local ×ncols amplification, no
  shuffle), then ``groupBy(col_name, repr).count`` — partial
  aggregation crushes duplicates map-side, so the shuffle carries at
  most Σ ndv(col) rows, NOT ncols × nrows — then a second keyed
  aggregate by ``col_name`` (≤ ncols groups). Exactly the two-stage
  exact-distinct plan Spark itself generates for ``count(distinct)``,
  but for ALL columns in one pass instead of one scan per column.
* **Min / max** are a single 1-row whole-stage-codegen aggregate over
  the native (correctly ordered) values — NOT min/max of the string
  repr, which would order "10" < "9". The 1-row result is unpivoted
  declaratively and broadcast-joined onto the counts (≤ ncols rows on
  the build side, zero driver collects).

Both passes are mergeable as-is: at 100 TB you run them per partition
/ per day and the partial aggregates combine associatively — the same
property the engine's sketches (``functions/sketches.py``) pin.

Repr law (the profiling domain, applied identically in the DuckDB
oracle): strings stay themselves; integrals cast to string; doubles go
through DECIMAL(18,2) so float formatting can never split a value
across engines; timestamps become epoch micros. ``n_distinct`` counts
distinct *reprs* — the law is part of the operator contract and is
what makes the result exactly reproducible cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T


def _repr_col(col: Column, dtype: T.DataType) -> Column:
    """Canonical string repr of a value under the profiling law."""
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return col.cast(T.DecimalType(18, 2)).cast("string")
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        # ts_micros law (functions/canonical.py): epoch micros under the
        # UTC session timezone == DuckDB epoch_us on the same parquet value
        return F.unix_micros(col.cast("timestamp")).cast("string")
    # strings pass through; integrals/date/bool cast to their canonical
    # text form (identical in Spark and DuckDB for these types)
    return col.cast("string")


def profile_table(
    df: DataFrame, columns: list[str] | None = None, *, approx: bool = False
) -> DataFrame:
    """Profile ``columns`` (default: all top-level non-complex columns)
    of ``df`` into one row per column:

    ``(col_name, n_rows, n_nulls, n_distinct, min_repr, max_repr)``

    ``n_distinct`` excludes nulls (SQL ``count(DISTINCT x)`` semantics)
    and counts distinct canonical reprs. ``min_repr``/``max_repr`` are
    the reprs of the NATIVE min/max (true value order, not text order).

    ``approx=True`` — the 100 TB onboarding default — swaps the exact
    distinct pass for per-column HyperLogLog sketches
    (functions/sketches.py, 512 integer registers, bit-deterministic):
    the melt's shuffle then carries at most ncols x 512 register rows
    instead of Σ ndv(col), and n_rows/n_nulls/min/max all ride the
    single 1-row whole-stage aggregate. Output columns become

    ``(col_name, n_rows, n_nulls, zero_registers, s_scaled, est_x1000,
    min_repr, max_repr)``

    — the raw-estimator sketch state, exactly reproducible cross-engine;
    feed a row to ``sketches.hll_corrected_estimate`` for the
    small-range-corrected NDV (pytest-pinned error bounds).
    """
    if approx:
        return _profile_table_approx(df, columns)
    fields = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        columns = [
            n for n, t in fields.items()
            if not isinstance(t, (T.ArrayType, T.MapType, T.StructType, T.BinaryType))
        ]
    unknown = [c for c in columns if c not in fields]
    if unknown:
        raise ValueError(f"profile_table: no such columns {unknown}")

    # pass B — melt to (col_name, repr), two-stage exact distinct/null agg
    melted = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("col_name"),
                    _repr_col(F.col(c), fields[c]).alias("repr"),
                )
                for c in columns
            ])
        ).alias("kv")
    ).select("kv.col_name", "kv.repr")
    per_value = melted.groupBy("col_name", "repr").agg(F.count(F.lit(1)).alias("cnt"))
    counts = per_value.groupBy("col_name").agg(
        F.sum("cnt").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("repr").isNull(), F.col("cnt"))), F.lit(0)
        ).alias("n_nulls"),
        F.count("repr").alias("n_distinct"),
    )

    # pass A — native-order min/max in ONE 1-row aggregate, unpivoted
    aggs = []
    for i, c in enumerate(columns):
        aggs.append(F.min(c).alias(f"_mn{i}"))
        aggs.append(F.max(c).alias(f"_mx{i}"))
    one = df.agg(*aggs)
    minmax = one.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("col_name"),
                    _repr_col(F.col(f"_mn{i}"), fields[c]).alias("min_repr"),
                    _repr_col(F.col(f"_mx{i}"), fields[c]).alias("max_repr"),
                )
                for i, c in enumerate(columns)
            ])
        ).alias("kv")
    ).select("kv.col_name", "kv.min_repr", "kv.max_repr")

    # minmax drives the join: it has one row per column even for an
    # EMPTY table (the 1-row aggregate yields null min/max), so the
    # profiler keeps its one-row-per-column contract with zero counts —
    # an inner join from the counts side would return 0 rows there,
    # diverging from the per-column UNION ALL oracle shape
    z = F.lit(0).cast("long")
    return minmax.join(F.broadcast(counts), "col_name", "left").select(
        "col_name",
        F.coalesce("n_rows", z).alias("n_rows"),
        F.coalesce("n_nulls", z).alias("n_nulls"),
        F.coalesce("n_distinct", z).alias("n_distinct"),
        "min_repr",
        "max_repr",
    )


def _profile_columns(df: DataFrame, columns: list[str] | None):
    fields = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        columns = [
            n for n, t in fields.items()
            if not isinstance(t, (T.ArrayType, T.MapType, T.StructType, T.BinaryType))
        ]
    unknown = [c for c in columns if c not in fields]
    if unknown:
        raise ValueError(f"profile_table: no such columns {unknown}")
    return columns, fields


def empty_sketch_constants() -> tuple[int, int, int]:
    """(zero_registers, s_scaled, est_x1000) of the EMPTY HLL sketch —
    the coalesce values an all-null column profiles to.  est_x1000 runs
    the same correctly-rounded double sequence as the engines (C and
    2^46 are exact doubles), so the Python constant, the Spark literal
    and the DuckDB literal agree bit-for-bit."""
    import math

    from avro_diff_spark.functions import sketches as SK

    s = SK.HLL_M * (1 << (SK.HLL_W + 1))
    return SK.HLL_M, s, math.floor(SK._hll_alpha_c() / float(s) * 1000.0)


def _profile_table_approx(df: DataFrame, columns: list[str] | None) -> DataFrame:
    """The ``approx=True`` body of :func:`profile_table` — see there."""
    from avro_diff_spark.functions import sketches as SK

    columns, fields = _profile_columns(df, columns)

    # pass B' — melt to (col_name, repr), HLL registers per column: the
    # shuffle carries at most ncols x 512 rows (map-side max combine)
    melted = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("col_name"),
                    _repr_col(F.col(c), fields[c]).alias("repr"),
                )
                for c in columns
            ])
        ).alias("kv")
    ).select("kv.col_name", "kv.repr")
    est = SK.hll_estimate(
        SK.hll_registers(melted, "repr", ["col_name"]), ["col_name"]
    )

    # pass A' — ONE 1-row whole-stage aggregate: count, per-column
    # non-null counts, native-order min/max; unpivoted to ncols rows
    aggs = [F.count(F.lit(1)).alias("_nr")]
    for i, c in enumerate(columns):
        aggs.append(F.count(c).alias(f"_nn{i}"))
        aggs.append(F.min(c).alias(f"_mn{i}"))
        aggs.append(F.max(c).alias(f"_mx{i}"))
    one = df.agg(*aggs)
    base = one.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("col_name"),
                    F.col("_nr").alias("n_rows"),
                    (F.col("_nr") - F.col(f"_nn{i}")).alias("n_nulls"),
                    _repr_col(F.col(f"_mn{i}"), fields[c]).alias("min_repr"),
                    _repr_col(F.col(f"_mx{i}"), fields[c]).alias("max_repr"),
                )
                for i, c in enumerate(columns)
            ])
        ).alias("kv")
    ).select("kv.*")

    # base drives the join (one row per column even when a column is
    # all-null and thus has no sketch row); missing sketches coalesce
    # to the empty-sketch constants
    ez, es, ee = empty_sketch_constants()
    return base.join(F.broadcast(est), "col_name", "left").select(
        "col_name",
        "n_rows",
        "n_nulls",
        F.coalesce("zero_registers", F.lit(ez)).alias("zero_registers"),
        F.coalesce("s_scaled", F.lit(es)).alias("s_scaled"),
        F.coalesce("est_x1000", F.lit(ee)).alias("est_x1000"),
        "min_repr",
        "max_repr",
    )


def column_histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    buckets: int,
) -> DataFrame:
    """Equi-width histogram of a numeric column — the distribution half
    of the profiling report (:func:`profile_table` covers scalars):
    ``(bucket, n_rows, sum_cents)`` with ``bucket = floor((x-lo)/w)``
    clamped to ``-1`` (underflow) and ``buckets`` (overflow). Empty
    buckets are absent (GROUP BY law — gap-fill downstream if a dense
    axis is needed; analytics.events_gapfill is the operator for that).

    Exactness: the bucket index is IEEE double subtract/divide/floor —
    bit-identical in any engine — and the per-bucket value sum goes
    through the house cents law (``floor(x*100 + 0.5)``, int64) so
    partial-aggregation order cannot perturb it. ONE map-side-combined
    keyed aggregate; shuffle volume ≤ buckets+2 rows per map task."""
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    if not hi > lo:
        raise ValueError("need hi > lo")
    width = (hi - lo) / buckets
    x = F.col(col)
    idx = (
        F.least(
            F.greatest(F.floor((x - F.lit(lo)) / F.lit(width)), F.lit(-1)),
            F.lit(buckets),
        )
        .cast("int")
        .alias("bucket")
    )
    cents = F.floor(x * F.lit(100.0) + F.lit(0.5)).cast("long")
    return (
        df.where(x.isNotNull())
        .groupBy(idx)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(cents).cast("long").alias("sum_cents"),
        )
    )


def equi_depth_histogram(
    df: DataFrame,
    col: str,
    tiebreak: list[str],
    n_buckets: int,
) -> DataFrame:
    """Equi-DEPTH histogram (quantile buckets): ``n_buckets`` buckets of
    near-equal row count over the global value order, each reporting its
    exact count, value range (cents law), and sum — the companion to
    :func:`column_histogram`'s fixed-width buckets, and what a query
    optimizer or drift monitor actually wants on a skewed column (a
    fixed-width histogram of a zipfian column puts 99% of rows in one
    bucket; the depth histogram's bucket EDGES carry the shape).

    Bucket law (part of the contract, mirrored by the oracle):
    ``bucket = (rank-1) * n_buckets DIV n_total`` over the global
    (col, tiebreak…) order — sizes differ by at most 1, deterministic
    for any total, no ntile dependence.

    Scale shape: the global rank rides the two-level Blelloch scan
    (operators/prefix.global_row_number — per-range-bucket windows, a
    bounded ≤64-row offsets collect, NEVER a single-partition global
    window); totals broadcast back via the literal-key equi-join; then
    one map-side-combined groupBy over ≤ n_buckets groups. Nulls are
    excluded (a histogram describes values)."""
    from avro_diff_spark.operators.prefix import global_row_number

    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    x = F.col(col)
    base = df.select(col, *tiebreak).where(x.isNotNull())
    from avro_diff_spark.functions.canonical import with_broadcast_totals

    ranked = global_row_number(base, [col, *tiebreak], alias="_rn")
    totals = ranked.agg(F.count(F.lit(1)).alias("_n_total"))
    joined = with_broadcast_totals(ranked, totals, "_rn", "_n_total")
    cents = F.floor(x * F.lit(100.0) + F.lit(0.5)).cast("long")
    return (
        joined.withColumn(
            "bucket",
            F.expr(f"CAST(((_rn - 1) * {int(n_buckets)}) DIV _n_total AS INT)"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(cents).alias("lo_cents"),
            F.max(cents).alias("hi_cents"),
            F.sum(cents).cast("long").alias("sum_cents"),
        )
    )
