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


def venn_summary(old: DataFrame, new: DataFrame) -> DataFrame:
    """Canonical-row → occurrence-count view of the venn diff.

    One row per (venn_kind, distinct row) with its multiplicity — the direct
    analogue of the reference's ``{canonical_string: count}`` maps
    (src/index.js:68-72), with the row rendered as stable sorted-key JSON
    (parity with ``stableStringify``, src/index.js:91).

    Columns: ``venn_kind`` ∈ {removed, added, intersection}, ``row_json``,
    ``n_occurrences``.
    """
    v = venn_diff(old, new)
    parts = []
    for kind, df in (("removed", v.removed), ("added", v.added), ("intersection", v.intersection)):
        parts.append(
            df.select(stable_row_json(df).alias("row_json"))
            .groupBy("row_json")
            .agg(F.count(F.lit(1)).alias("n_occurrences"))
            .select(F.lit(kind).alias("venn_kind"), "row_json", "n_occurrences")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
