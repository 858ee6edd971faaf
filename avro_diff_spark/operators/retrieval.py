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

__all__ = ["rrf_fuse", "maxsim_rerank", "token_vector"]


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
    from avro_diff_spark.operators.similarity import _topk_per_query

    return _topk_per_query(
        fused,
        int(k),
        [F.col("rrf_x1e6").desc(), F.col("doc_id").asc()],
        ["query_id", "doc_id", "rank", "rrf_x1e6", "n_lists"],
    )


# ---------------------------------------------------------------------------
# Late-interaction reranking (MaxSim) — the second-stage scorer
# ---------------------------------------------------------------------------

#: md5 yields 16 bytes -> at most 16 int8 components per token vector.
_MAX_DIM = 16


def token_vector(token: str, dim: int = 8) -> list[int]:
    """Deterministic int8 token embedding: byte ``i`` of ``md5(token)``
    minus 128. A stand-in for a learned token encoder (the container has
    no model runtime — the established deterministic-fake pattern the
    multimodal tier uses), with the property that matters for the
    engine: the DuckDB oracle can derive the very same vectors with
    ``('0x' || substr(md5(t), 2i+1, 2))::BIGINT - 128``, so MaxSim
    scores are exactly reproducible cross-engine in pure int64."""
    import hashlib

    if not 1 <= dim <= _MAX_DIM:
        raise ValueError(f"dim must be in [1, {_MAX_DIM}]")
    h = hashlib.md5(token.encode("utf-8")).hexdigest()
    return [int(h[2 * i : 2 * i + 2], 16) - 128 for i in range(dim)]


def _component(tok, i: int):
    # Spark twin of token_vector: conv(hex pair, 16, 10) - 128
    return (
        F.conv(F.substring(F.md5(F.encode(tok, "UTF-8")), 1 + 2 * i, 2), 16, 10)
        .cast("long")
        - 128
    )


def maxsim_rerank(
    docs: DataFrame,
    candidates: DataFrame,
    queries,
    *,
    k: int = 10,
    dim: int = 8,
    max_doc_tokens: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Late-interaction reranking (Khattab & Zaharia 2020, "ColBERT:
    Efficient and Effective Passage Search via Contextualized Late
    Interaction over BERT"): rescore first-stage ``candidates``
    (query_id, doc_id — e.g. a BM25 or ANN top-N) with
    ``score(q, d) = Σ_{t∈q} max_{u∈d} ⟨v(t), v(u)⟩`` and return the
    top ``k`` per query as (query_id, doc_id, rank, maxsim_score).

    Token vectors come from :func:`token_vector` (int8 components), so
    every dot product is an int64 ≤ dim·128² and the per-query sum is
    exact — no IEEE ordering hazard anywhere. Document tokens are the
    DISTINCT first ``max_doc_tokens`` whitespace tokens (max over
    duplicates is the max over distincts; the cap bounds per-doc work
    the way ColBERT caps passage length). Query tokens keep order and
    multiplicity (a repeated query term doubles its weight — the
    ColBERT semantic).

    Scale shape: the candidate list (queries × depth rows) BROADCASTS
    onto the corpus scan — one equi-join, no shuffle — so only
    candidate docs are ever tokenized; the query-token table
    (queries × tokens × dim literals) broadcasts onto that; then two
    keyed aggregations (max per query token, sum per doc) and one
    per-query top-k window, all on candidate-sized frames. The corpus
    is touched exactly once, by the pruned candidate semi-join."""
    from avro_diff_spark.functions import text as TX

    spark = docs.sparkSession
    qrows = []
    for qid, text in queries:
        toks = [t for t in text.lower().split() if t]
        if not toks:
            raise ValueError(f"query {qid} has no tokens")
        for pos, t in enumerate(toks):
            qrows.append((int(qid), pos, *token_vector(t, dim)))
    qcols = ", ".join(f"q_{i} long" for i in range(dim))
    qdf = spark.createDataFrame(qrows, f"query_id long, qpos int, {qcols}")

    cand = candidates.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("doc_id").alias("doc_id"),
    )
    toks = (
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text"))
        .join(F.broadcast(cand), "doc_id")
        .select(
            "query_id",
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.slice(TX.tokens_ws(F.col("__text")), 1, max_doc_tokens)
                )
            ).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    dot = sum(
        (F.col(f"q_{i}") * _component(F.col("tok"), i) for i in range(dim)),
        start=F.lit(0).cast("long"),
    )
    per_qtok = (
        toks.join(F.broadcast(qdf), "query_id")
        .groupBy("query_id", "doc_id", "qpos")
        .agg(F.max(dot).alias("mx"))
    )
    scores = per_qtok.groupBy("query_id", "doc_id").agg(
        F.sum("mx").alias("maxsim_score")
    )
    from avro_diff_spark.operators.similarity import _topk_per_query

    return _topk_per_query(
        scores,
        int(k),
        [F.col("maxsim_score").desc(), F.col("doc_id").asc()],
        ["query_id", "doc_id", "rank", "maxsim_score"],
    )
