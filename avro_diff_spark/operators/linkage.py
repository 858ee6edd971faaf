"""Record linkage / fuzzy matching under blocking.

The entity-resolution join a data-cleaning pipeline runs ("is this dirty
record the same entity as a master record?") — and the textbook place a
naive formulation explodes: string-distance joins have no equi-key, so
Spark would plan ``levenshtein(a, b) <= d`` alone as a broadcast
nested-loop over |A| x |B| pairs (the plan gate here bans exactly that).
The standard fix (Fellegi & Sunter 1969 linkage model; Christen 2012
blocking survey) is BLOCKING: only records agreeing on a cheap blocking
key are compared, chosen so the error model (typos in the tail, OCR
noise, …) cannot perturb it.

``fuzzy_join`` makes that shape mechanical: each blocking expression
becomes one hash EQUI-join on the computed key, the expensive string
distance runs only inside blocks as a residual filter, and multiple
blocking passes (to cover different error positions) union with pair
dedup. Cost ∝ sum of block-pair sizes — the knob the caller holds —
never |A| x |B|; every shuffle is keyed; no UDFs (``F.levenshtein`` is a
JVM builtin, and DuckDB ships the same function, so oracles cross-check
exactly).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def fuzzy_join(
    a: DataFrame,
    b: DataFrame,
    col: str,
    *,
    blocks: Sequence[Callable[[Column], Column]],
    max_dist: int = 1,
    a_keep: Sequence[str] = (),
    b_keep: Sequence[str] = (),
) -> DataFrame:
    """All (a, b) row pairs whose ``col`` values agree on AT LEAST ONE
    blocking key and lie within ``max_dist`` edit distance. Returns
    ``a_keep`` + ``a_<col>`` + ``b_keep`` + ``b_<col>`` + ``dist``.
    Pairs caught by several blocking passes appear once (dedup on the
    kept keys + both strings). NULL strings never match.

    Multiplicity contract: the final dedup collapses on the KEPT columns
    plus both strings, so input rows that are identical under the
    ``a_keep``/``b_keep`` projections collapse to ONE output pair —
    duplicate-row multiplicity is not preserved. Include a unique id in
    ``a_keep``/``b_keep`` (as the registered ``fuzzy_match_customers``
    query does with ``c_custkey``) when per-row pairing matters."""
    acol, bcol = f"a_{col}", f"b_{col}"
    left = a.where(F.col(col).isNotNull()).select(
        *a_keep, F.col(col).alias(acol)
    )
    right = b.where(F.col(col).isNotNull()).select(
        *b_keep, F.col(col).alias(bcol)
    )
    out = None
    for blk in blocks:
        j = (
            left.withColumn("_blk", blk(F.col(acol)))
            .join(right.withColumn("_blk", blk(F.col(bcol))), "_blk")
            .drop("_blk")
        )
        j = j.where(F.levenshtein(F.col(acol), F.col(bcol)) <= F.lit(max_dist))
        out = j if out is None else out.unionByName(j)
    if out is None:
        raise ValueError("fuzzy_join needs at least one blocking expression")
    return out.distinct().withColumn(
        "dist", F.levenshtein(F.col(acol), F.col(bcol)).cast("long")
    )
