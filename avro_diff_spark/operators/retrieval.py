"""Hybrid retrieval fusion: merge ranked lists from heterogeneous
retrievers (sparse BM25, dense ANN, ...) into ONE ranked list per query
via reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009,
"Reciprocal rank fusion outperforms Condorcet and individual rank
learning methods", SIGIR).

This is the step every production retrieval pipeline takes the moment
it has both a sparse and a dense index: BM25 finds exact-term matches
the embedding space smooths away, ANN finds paraphrases BM25 cannot
see, and RRF combines them using ONLY the ranks — no score calibration
across incomparable scales (BM25 fixed-point sums vs cosine doubles).

Determinism discipline (the house rule): the textbook RRF score
``sum(1 / (k0 + rank))`` is an IEEE sum whose value depends on addend
order; here each list contributes ``scale DIV (k0 + rank)`` — an exact
int64 — and the fused score is an integer SUM, associative and
commutative, so Spark's partial aggregation order and a DuckDB oracle
agree bit-for-bit. With the default ``scale=1_000_000`` the integer
truncation perturbs the classic 1/(60+r) weights by < 1e-6, far below
any rank-inversion threshold for lists shorter than ~10^4.

Scale shape: inputs are per-query top-k lists (k rows per query each —
already tiny relative to the corpus), so the fusion is one UNION of
narrow frames, one keyed groupBy-sum, and one per-query top-k window.
No corpus-sized data ever enters; the expensive work stays inside the
bucketed/partition-pruned index probes upstream
(operators/text_index.py, operators/ann_index.py).

No reference parity: yuana97/Avro_Diff has no retrieval surface
(SURVEY.md §2); beyond-reference LLM-pipeline tier.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["rrf_fuse"]


def rrf_fuse(
    lists: Sequence[DataFrame],
    *,
    k: int = 10,
    k0: int = 60,
    scale: int = 1_000_000,
    weights: Sequence[int] | None = None,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse ranked lists into ``(query_id, doc_id, rank, rrf_x1e6,
    n_lists)`` — top ``k`` per query by the summed integer RRF score
    ``scale DIV (k0 + rank)`` over every list the document appears in
    (``n_lists`` counts them), ties broken by ``doc_id`` ascending.

    Each input needs ``(query_col, doc_col, rank_col)``; extra columns
    (scores) are dropped — RRF is rank-only by design. A document
    missing from a list simply contributes nothing for it (the standard
    RRF convention); a document appearing MORE than once in one list
    (a non-deduped upstream union) counts once at its BEST rank, so
    ``n_lists`` can never exceed the number of retrievers. ``k0`` damps
    the head-heaviness (60 per the paper); ``scale`` sets the
    fixed-point resolution of the integer weights. ``weights`` (one
    INTEGER multiplier per list — weighted RRF) biases fusion toward a
    trusted retriever while staying exact: list i contributes
    ``w_i * (scale DIV (k0 + rank))``, still an int64 sum.
    """
    if not lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    if weights is None:
        weights = [1] * len(lists)
    if len(weights) != len(lists) or any(int(w) < 0 for w in weights):
        raise ValueError("weights must be one non-negative int per list")
    parts = [
        # best (min) rank per doc within a list: contrib is monotone
        # decreasing in rank, and proper top-k inputs are already unique
        # so this is a no-op groupBy on k rows per query
        df.groupBy(
            F.col(query_col).alias("query_id"), F.col(doc_col).alias("doc_id")
        )
        .agg(F.min(rank_col).alias("_r"))
        .select(
            "query_id",
            "doc_id",
            F.expr(f"{int(w)} * ({int(scale)} DIV ({int(k0)} + _r))")
            .cast("long")
            .alias("c"),
        )
        for df, w in zip(lists, weights)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("query_id", "doc_id").agg(
        F.sum("c").alias("rrf_x1e6"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_x1e6").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select("query_id", "doc_id", "rank", "rrf_x1e6", "n_lists")
    )
