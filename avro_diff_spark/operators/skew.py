"""Skew-salted equi-join: spread a hot join key across many reducers.

A shuffle join hashes rows to reducers by join key alone, so ONE hot key
(the null user, the default account, the viral document) lands its
entire row set on one task — at 100 TB that task runs for hours while
the other 999 executors idle, or dies outright. Salting splits each hot
key's rows across ``salts`` reducers: the probe side gains a
deterministic salt column, the build side is replicated once per salt
value, and the join runs on ``(keys…, salt)`` — still a plain hash/
sort-merge EQUI-join (the plan gate's requirement), with per-reducer
input bounded by ``hot_key_rows / salts``.

This is the manual form of what AQE's ``skewJoin`` does adaptively
(splitting oversized shuffle partitions at runtime); the explicit
operator exists because AQE only rescues SORT-MERGE joins after a stage
materializes, while salting shapes the shuffle itself — and because a
pipeline author who KNOWS the skew (every web corpus does) should not
depend on runtime rescue. Cost: the build side shuffles ``salts``×
larger, so salt the SMALL side's replication factor to taste; the probe
side pays one extra int column.

Correctness: the salt is a pure function of the probe row
(``xxhash64`` of all its columns mod ``salts``), so every probe row
carries exactly ONE salt value and meets the full build side at that
salt — ``salted_join(L, R) == L.join(R)`` row-for-row, including
duplicate rows on either side (replication is keyed by the salt
equi-join, never a distinct). Deterministic across any partitioning
(no ``rand()``, no ``spark_partition_id``), so results are
layout-invariant — pinned by the partitioning-invariance gate.

No counterpart in the reference (yuana97/Avro_Diff joins in-memory on a
single node — skew is invisible there); beyond-reference tier, the
scale-mechanics slot alongside operators/interval.py's bucketized range
join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SALT = "__salt"


def _has_map(dtype) -> bool:
    from pyspark.sql import types as T

    if isinstance(dtype, T.MapType):
        return True
    if isinstance(dtype, T.ArrayType):
        return _has_map(dtype.elementType)
    if isinstance(dtype, T.StructType):
        return any(_has_map(f.dataType) for f in dtype.fields)
    return False


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str] | str,
    *,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``probe`` ⋈ ``build`` on the named key columns (same
    names both sides, like ``DataFrame.join(on=)``), with the probe side
    salted across ``salts`` reducers and the build side replicated once
    per salt. Supports ``how`` of ``inner`` and ``left`` (probe-side
    outer) — the replicated side cannot drive an outer join without
    emitting each unmatched build row ``salts`` times, so ``right``/
    ``full`` raise: put the preserved side on the probe."""
    if salts < 1:
        raise ValueError("salts must be >= 1")
    if how not in ("inner", "left"):
        raise ValueError(
            f"how={how!r}: salted_join supports inner|left — make the "
            "preserved side the probe (the build side is replicated)"
        )
    keys = [on] if isinstance(on, str) else list(on)
    if not keys:
        raise ValueError("on= must name at least one key column")
    for c in (_SALT,):
        if c in probe.columns or c in build.columns:
            raise ValueError(f"column {c!r} collides with the salt column")
    # deterministic per-row salt from the WHOLE probe row: a hot key's
    # rows differ in their payload columns, so they spread ~uniformly;
    # identical duplicate rows sharing a salt is harmless (correctness
    # never depends on the spread, only the balance does)
    # hash only the HASHABLE probe columns (xxhash64 refuses MapType);
    # any deterministic row function works — balance, not spread, is
    # what correctness never depends on. All-map rows fall back to salt
    # 0 (correct, just no skew relief for that pathological schema).
    hashable = [
        F.col(f.name)
        for f in probe.schema.fields
        if not _has_map(f.dataType)
    ]
    salt_src = F.xxhash64(*hashable) if hashable else F.lit(0).cast("long")
    salted_probe = probe.withColumn(_SALT, F.pmod(salt_src, F.lit(salts)))
    replicated_build = build.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    joined = salted_probe.join(replicated_build, keys + [_SALT], how)
    return joined.drop(_SALT)


def skew_report(df: DataFrame, keys: list[str], *, top: int = 20) -> DataFrame:
    """Join-key skew diagnosis — what a pipeline author runs BEFORE
    choosing :func:`salted_join`'s ``salts`` (or trusting AQE): the
    ``top`` hottest key values with exact counts, each row carrying the
    global context (total rows, distinct keys) and two integer ratios:

    * ``share_x1e6``  — the key's fraction of all rows × 1e6;
    * ``skew_x1e6``   — the key's count ÷ the MEAN per-key count × 1e6
      (1e6 = perfectly uniform; the number that says "this one key is
      340× average — salt it with ~340 salts or it owns one reducer").

    Scale shape: one map-side-combined groupBy(keys).count; the top-N
    cut is orderBy+limit (TakeOrderedAndProject — per-partition top-N,
    then an N-row merge, never a global sort); the 1-row totals
    broadcast back via the data-derived literal-key equi-join
    (BroadcastHashJoin — the _fold_tvd idiom, no BNLJ); the rank window
    partitions on that same key (constant over ≤ top rows, so WindowExec
    is partitioned and bounded). All ratios are exact int64 — no IEEE
    division in the recorded output."""
    from pyspark.sql import Window

    if not keys:
        raise ValueError("skew_report needs at least one key column")
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows_key"))
    totals = per_key.agg(
        F.coalesce(F.sum("n_rows_key"), F.lit(0)).alias("n_total"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    hot = per_key.orderBy(
        F.col("n_rows_key").desc(), *[F.col(k).asc() for k in keys]
    ).limit(int(top))
    from avro_diff_spark.functions.canonical import with_broadcast_totals

    joined = with_broadcast_totals(hot, totals, "n_rows_key", "n_total")
    w = Window.partitionBy("_k").orderBy(
        F.col("n_rows_key").desc(), *[F.col(k).asc() for k in keys]
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            *keys,
            F.col("n_rows_key").cast("long").alias("n_rows"),
            F.expr("CAST((n_rows_key * 1000000) DIV n_total AS BIGINT)").alias(
                "share_x1e6"
            ),
            F.expr(
                "CAST((n_rows_key * n_keys * 1000000) DIV n_total AS BIGINT)"
            ).alias("skew_x1e6"),
            F.col("n_total").cast("long").alias("n_total"),
            F.col("n_keys").cast("long").alias("n_keys"),
        )
    )
