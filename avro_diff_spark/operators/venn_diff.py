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

from avro_diff_spark.functions.canonical import canonicalize_rows


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


def _venn_count_core(old: DataFrame, new: DataFrame) -> DataFrame:
    """One-pass venn core: tag-union + single grouped count — NO join.

    Each side is scanned once with a (1,0)/(0,1) tag, the union groups on
    the canonicalized row columns (SQL GROUP BY treats NULLs as equal, so
    null handling matches set-op semantics for free), and the two tag sums
    are the per-side multiplicities. Total cost: 2 scans + ONE shuffle —
    vs ~6 scans for the exceptAll×2 + intersectAll formulation (the
    reference streams 2 passes, src/index.js:74-75), and strictly fewer
    exchanges than a count-join formulation.

    Returns one row per distinct canonical row: all row columns + n_old,
    n_new.
    """
    if old.columns != new.columns:
        raise ValueError("venn inputs must share a schema")
    o = canonicalize_rows(old).withColumn("__o", F.lit(1)).withColumn("__n", F.lit(0))
    n = canonicalize_rows(new).withColumn("__o", F.lit(0)).withColumn("__n", F.lit(1))
    return (
        o.unionByName(n)
        .groupBy(*old.columns)
        .agg(F.sum("__o").alias("n_old"), F.sum("__n").alias("n_new"))
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
    return _explode_kinds(_venn_count_core(old, new), *old.columns)


def venn_summary(old: DataFrame, new: DataFrame) -> DataFrame:
    """Canonical-row → occurrence-count view of the venn diff.

    One row per (venn_kind, distinct row) with its multiplicity — the direct
    analogue of the reference's ``{canonical_string: count}`` maps
    (src/index.js:68-72), with the row rendered as stable sorted-key JSON
    (parity with ``stableStringify``, src/index.js:91). Built on the
    one-pass tag-union core (2 scans, ONE shuffle — see
    :func:`_venn_count_core`); the JSON renders on DISTINCT rows only,
    after aggregation, never per input row.

    Columns: ``venn_kind`` ∈ {removed, added, intersection}, ``row_json``,
    ``n_occurrences``.
    """
    g = _venn_count_core(old, new)
    cols = [c for c in g.columns if c not in ("n_old", "n_new")]
    with_json = g.select(
        F.to_json(F.struct(*[F.col(c) for c in sorted(cols)])).alias("row_json"),
        "n_old",
        "n_new",
    )
    return _explode_kinds(with_json, "row_json")


def venn_multi(dfs: "list[DataFrame]") -> DataFrame:
    """N-way venn membership: one row per distinct canonical row across
    ALL inputs, with per-input multiplicities ``n_0..n_{k-1}`` and a
    ``region`` bitstring (char i = '1' iff input i contains the row).

    The 2-way one-pass tag-union core (:func:`_venn_count_core`)
    generalized to k inputs: k scans + ONE shuffle, no joins — each
    input contributes a one-hot count vector, the union groups on the
    row columns (GROUP BY nulls-equal == set-op semantics), and the
    per-input sums are the multiplicities. The reference only ever
    diffs two files (src/index.js:65-116); comparing k snapshots
    pairwise costs k(k-1)/2 diffs and misses the joint regions — this
    is the k-snapshot form at the cost of ONE.

    Scale shape: identical to the 2-way core — map-side partial
    aggregation crushes duplicates before the single exchange, memory
    ∝ distinct rows per partition, spillable.
    """
    if len(dfs) < 2:
        raise ValueError("venn_multi needs at least 2 inputs")
    cols = dfs[0].columns
    for d in dfs[1:]:
        if d.columns != cols:
            raise ValueError("venn inputs must share a schema")
    k = len(dfs)
    tagged = [
        canonicalize_rows(d).select(
            "*", *[F.lit(1 if i == j else 0).alias(f"__t{j}") for j in range(k)]
        )
        for i, d in enumerate(dfs)
    ]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    g = u.groupBy(*cols).agg(
        *[F.sum(f"__t{j}").alias(f"n_{j}") for j in range(k)]
    )
    region = F.concat(
        *[F.when(F.col(f"n_{j}") > 0, F.lit("1")).otherwise(F.lit("0")) for j in range(k)]
    )
    return g.withColumn("region", region)


def venn_multi_summary(dfs: "list[DataFrame]", names: "list[str] | None" = None) -> DataFrame:
    """Region-level rollup of :func:`venn_multi`: for each populated
    region of the k-set venn diagram, the number of DISTINCT rows and
    the total occurrences contributed by each input. Output is ≤ 2^k−1
    rows — the k-way generalization of the reference's three printed
    bucket counts (src/index.js:58-63)."""
    k = len(dfs)
    names = names or [f"in{j}" for j in range(k)]
    if len(names) != k:
        raise ValueError("names must match inputs")
    g = venn_multi(dfs)
    return g.groupBy("region").agg(
        F.count(F.lit(1)).alias("n_distinct"),
        *[F.sum(f"n_{j}").alias(f"occ_{names[j]}") for j in range(k)],
    )
