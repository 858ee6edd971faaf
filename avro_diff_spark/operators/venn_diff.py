"""Venn diff: multiset set-difference / intersection over whole rows.

Reference semantics (SURVEY.md §2.4; reference src/index.js:65-116): stream
file 1 counting canonicalized rows, stream file 2 moving one count per match
into the intersection, else counting into ``added``. Result is three bags:
``removed`` = old∖new, ``added`` = new∖old, ``intersection`` = old∩new,
with multiplicities.

Spark-first: these are exactly ``exceptAll`` / ``intersectAll`` — Catalyst
compiles them to hash aggregates + joins with map-side partial aggregation,
so memory is ∝ distinct rows per partition (the reference's single hash map,
but distributed and spillable). The reference's ``stableStringify``
canonicalization (src/index.js:91) is unnecessary under Spark struct
equality; only MapType columns need rewriting (see
:mod:`avro_diff_spark.functions.canonical`).

The reference's venn printer has a label-swap bug (``added`` count printed
as "removed" and vice versa, src/index.js:60-61); our summary reports
correct labels — a documented divergence.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, functions as F

from avro_diff_spark.functions.canonical import canonicalize_rows, stable_row_json


class VennDiff(NamedTuple):
    removed: DataFrame  # old ∖ new (bag)
    added: DataFrame  # new ∖ old (bag)
    intersection: DataFrame  # old ∩ new (bag)


def venn_diff(old: DataFrame, new: DataFrame) -> VennDiff:
    """Bag-semantics venn diff of two DataFrames with identical schemas."""
    o = canonicalize_rows(old)
    n = canonicalize_rows(new)
    return VennDiff(
        removed=o.exceptAll(n),
        added=n.exceptAll(o),
        intersection=o.intersectAll(n),
    )


def _venn_count_join(old: DataFrame, new: DataFrame) -> DataFrame:
    """One-pass venn core: full-outer join of per-side canonical-row counts.

    Each side is scanned ONCE, partially aggregated map-side, and shuffled
    once on a null-free canonical JSON key; the join is co-partitioned with
    the aggregations (same key), so the whole three-way venn costs 2 scans +
    2 shuffles — vs ~6 scans for the exceptAll×2 + intersectAll formulation
    (the reference streams 2 passes, src/index.js:74-75). The JSON key also
    makes row comparison null-safe, matching set-op semantics where NULLs
    compare equal.

    Returns (row_json, row struct, n_old, n_new) per distinct row.
    """
    def side(df: DataFrame, alias: str) -> DataFrame:
        c = canonicalize_rows(df)
        return (
            c.select(
                stable_row_json(c).alias("row_json"),
                F.struct(*[F.col(x) for x in c.columns]).alias("__row"),
            )
            .groupBy("row_json")
            # rows within a group are identical (fixed schema ⇒ the stable
            # JSON determines the row), so any_value is deterministic
            .agg(F.count(F.lit(1)).alias(f"n_{alias}"), F.first("__row").alias(f"row_{alias}"))
        )

    j = side(old, "old").join(side(new, "new"), "row_json", "full_outer")
    return j.select(
        "row_json",
        F.coalesce("row_old", "row_new").alias("row"),
        F.coalesce("n_old", F.lit(0)).alias("n_old"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )


def _explode_kinds(j: DataFrame, *carry: str) -> DataFrame:
    kinds = F.array(
        F.struct(
            F.lit("removed").alias("venn_kind"),
            F.greatest(F.col("n_old") - F.col("n_new"), F.lit(0)).alias("n"),
        ),
        F.struct(
            F.lit("added").alias("venn_kind"),
            F.greatest(F.col("n_new") - F.col("n_old"), F.lit(0)).alias("n"),
        ),
        F.struct(
            F.lit("intersection").alias("venn_kind"),
            F.least(F.col("n_old"), F.col("n_new")).alias("n"),
        ),
    )
    return (
        j.select(*carry, F.explode(kinds).alias("k"))
        .select(F.col("k.venn_kind").alias("venn_kind"), *carry, F.col("k.n").alias("n_occurrences"))
        .filter(F.col("n_occurrences") > 0)
    )


def venn_counts(old: DataFrame, new: DataFrame) -> DataFrame:
    """One-pass venn with the original row columns in the output.

    Columns: ``venn_kind`` ∈ {removed, added, intersection}, every column of
    the inputs (canonicalized), ``n_occurrences``. Multiplicities equal the
    bag sizes of :func:`venn_diff` exactly: removed = max(n_old−n_new, 0),
    added = max(n_new−n_old, 0), intersection = min(n_old, n_new).
    """
    if old.columns != new.columns:
        raise ValueError("venn inputs must share a schema")
    j = _venn_count_join(old, new)
    wide = j.select(
        *[F.col("row").getField(c).alias(c) for c in old.columns], "n_old", "n_new"
    )
    return _explode_kinds(wide, *old.columns)


def venn_summary(old: DataFrame, new: DataFrame) -> DataFrame:
    """Canonical-row → occurrence-count view of the venn diff.

    One row per (venn_kind, distinct row) with its multiplicity — the direct
    analogue of the reference's ``{canonical_string: count}`` maps
    (src/index.js:68-72), with the row rendered as stable sorted-key JSON
    (parity with ``stableStringify``, src/index.js:91). Built on the
    one-pass count join (2 scans, 2 shuffles — see :func:`_venn_count_join`).

    Columns: ``venn_kind`` ∈ {removed, added, intersection}, ``row_json``,
    ``n_occurrences``.
    """
    return _explode_kinds(_venn_count_join(old, new), "row_json")
