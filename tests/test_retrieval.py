"""RRF fusion (operators/retrieval.py): hand-computed example, rank-only
semantics, list-order/permutation invariance, and the integer-weight
law against the textbook float formula."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avro_diff_spark.operators.retrieval import rrf_fuse


def _lst(spark, rows):
    return spark.createDataFrame(rows, "query_id long, doc_id long, rank int")


def test_rrf_hand_example(spark):
    """Two 3-deep lists over one query, overlap on doc 7: fused scores
    are the exact integer sums 1e6 DIV (60 + r); doc 7 (rank 2 + rank 1)
    beats both heads that appear in only one list."""
    a = _lst(spark, [(1, 5, 1), (1, 7, 2), (1, 9, 3)])
    b = _lst(spark, [(1, 7, 1), (1, 8, 2), (1, 5, 3)])
    got = {
        (r.doc_id): (r.rank, r.rrf_x1e6, r.n_lists)
        for r in rrf_fuse([a, b], k=10).collect()
    }
    w = {r: 1_000_000 // (60 + r) for r in (1, 2, 3)}
    assert got[7] == (1, w[2] + w[1], 2)
    assert got[5] == (2, w[1] + w[3], 2)
    # docs 8 and 9 carry single-list scores w[2]=16129 and w[3]=15873
    assert got[8] == (3, w[2], 1)
    assert got[9] == (4, w[3], 1)


def test_rrf_ignores_scores_and_extra_columns(spark):
    """Fusion is rank-only: wildly different score columns on the inputs
    must not change the output (they are dropped, not summed)."""
    a = _lst(spark, [(1, 5, 1), (1, 7, 2)]).withColumn("score_x1e6", F.lit(10**12))
    b = _lst(spark, [(1, 7, 1), (1, 5, 2)]).withColumn("cosine", F.lit(-1.0))
    rows = rrf_fuse([a, b], k=10).collect()
    # symmetric ranks -> equal scores, tie broken by doc_id asc
    assert [(r.doc_id, r.rank) for r in sorted(rows, key=lambda r: r.rank)] == [
        (5, 1),
        (7, 2),
    ]
    assert rows[0].rrf_x1e6 == rows[1].rrf_x1e6


def test_rrf_list_order_invariance(spark):
    """RRF is a commutative sum over lists: permuting the input list
    order yields the identical fused frame."""
    a = _lst(spark, [(1, 5, 1), (1, 7, 2), (2, 3, 1)])
    b = _lst(spark, [(1, 7, 1), (2, 4, 1), (2, 3, 2)])
    c = _lst(spark, [(1, 9, 1), (2, 3, 1)])
    x = sorted(map(tuple, rrf_fuse([a, b, c], k=5).collect()))
    y = sorted(map(tuple, rrf_fuse([c, a, b], k=5).collect()))
    assert x == y


def test_rrf_self_fusion_doubles_scores(spark):
    """Fusing a list with itself keeps the ranking and doubles every
    score — the mergeability sanity law."""
    a = _lst(spark, [(1, 5, 1), (1, 7, 2), (1, 9, 3)])
    one = {r.doc_id: r.rrf_x1e6 for r in rrf_fuse([a], k=5).collect()}
    two = rrf_fuse([a, a], k=5).collect()
    assert {r.doc_id: r.rrf_x1e6 for r in two} == {d: 2 * s for d, s in one.items()}
    assert [r.n_lists for r in two] == [2, 2, 2]


def test_rrf_integer_weights_match_float_formula(spark):
    """The integer weights floor(scale / (k0 + r)) track the textbook
    1/(k0+r) within 1/scale — the documented precision bound."""
    for r in range(1, 101):
        w = 1_000_000 // (60 + r)
        assert abs(w / 1_000_000 - 1.0 / (60 + r)) < 1e-6


def test_rrf_empty_input_rejected(spark):
    with pytest.raises(ValueError):
        rrf_fuse([])


def test_rrf_custom_columns_and_k0(spark):
    """query/doc/rank column names and k0/scale are parameters; k
    truncates per query."""
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "qid long, cand long, r int"
    )
    out = rrf_fuse(
        [a], k=2, k0=0, scale=100, query_col="qid", doc_col="cand", rank_col="r"
    ).collect()
    assert [(x.doc_id, x.rrf_x1e6) for x in sorted(out, key=lambda x: x.rank)] == [
        (10, 100),
        (11, 50),
    ]


def test_rrf_duplicate_doc_within_one_list_counts_once(spark):
    """A non-deduped upstream list repeating a doc contributes once at
    its BEST rank, and n_lists never exceeds the retriever count."""
    a = _lst(spark, [(1, 7, 3), (1, 7, 15), (1, 8, 1)])
    rows = {r.doc_id: (r.rrf_x1e6, r.n_lists) for r in rrf_fuse([a], k=5).collect()}
    assert rows[7] == (1_000_000 // 63, 1)
    assert rows[8] == (1_000_000 // 61, 1)


def test_rrf_integer_weights_bias_fusion(spark):
    """Weighted RRF: a trusted list's contributions scale by its
    integer weight; weight 0 silences a list (but still counts it in
    n_lists for docs it returned); mismatched weights are rejected."""
    a = _lst(spark, [(1, 5, 1), (1, 7, 2)])
    b = _lst(spark, [(1, 7, 1), (1, 5, 2)])
    plain = {r.doc_id: r.rrf_x1e6 for r in rrf_fuse([a, b], k=5).collect()}
    # weight the second list 3x: doc 7 (rank 1 there) must now win
    out = rrf_fuse([a, b], k=5, weights=[1, 3]).collect()
    got = {r.doc_id: (r.rank, r.rrf_x1e6) for r in out}
    w1, w2 = 1_000_000 // 61, 1_000_000 // 62
    assert got[7] == (1, w2 + 3 * w1)
    assert got[5] == (2, w1 + 3 * w2)
    assert plain[5] == plain[7]  # unweighted was a tie
    # weight 0 silences list b entirely
    z = {r.doc_id: (r.rrf_x1e6, r.n_lists) for r in
         rrf_fuse([a, b], k=5, weights=[1, 0]).collect()}
    assert z[5] == (w1, 2) and z[7] == (w2, 2)
    with pytest.raises(ValueError):
        rrf_fuse([a, b], weights=[1])
    with pytest.raises(ValueError):
        rrf_fuse([a, b], weights=[1, -2])


# ---------------------------------------------------------------------------
# MaxSim late-interaction reranking (round 12)
# ---------------------------------------------------------------------------


def test_token_vector_law():
    import hashlib

    from avro_diff_spark.operators.retrieval import token_vector

    h = hashlib.md5(b"spark").hexdigest()
    v = token_vector("spark", 8)
    assert v == [int(h[2 * i : 2 * i + 2], 16) - 128 for i in range(8)]
    assert all(-128 <= c <= 127 for c in v)
    with pytest.raises(ValueError):
        token_vector("x", 17)


def test_maxsim_rerank_matches_bruteforce(spark):
    """Engine MaxSim == a driver-side brute-force replay of the law on a
    tiny corpus (both stages: per-query-token max, per-doc sum, rank)."""
    from avro_diff_spark.operators.retrieval import maxsim_rerank, token_vector

    docs = spark.createDataFrame(
        [
            (1, "fast table scan engine"),
            (2, "slow full scan"),
            (3, "window merge batch"),
            (4, "Fast FAST fast"),  # case-folds + dedupes to one token
        ],
        "doc_id bigint, text string",
    )
    queries = [(7, "fast scan"), (8, "batch")]
    cand = spark.createDataFrame(
        [(7, 1), (7, 2), (7, 4), (8, 3), (8, 1)], "query_id bigint, doc_id bigint"
    )
    got = {
        (r["query_id"], r["doc_id"]): (r["rank"], r["maxsim_score"])
        for r in maxsim_rerank(docs, cand, queries, k=3, dim=8).collect()
    }

    corpus = {1: "fast table scan engine", 2: "slow full scan", 3: "window merge batch", 4: "fast fast fast"}
    cands = {7: [1, 2, 4], 8: [3, 1]}
    for qid, text in queries:
        qtoks = text.lower().split()
        scored = []
        for d in cands[qid]:
            dtoks = sorted(set(corpus[d].lower().split()))
            s = sum(
                max(
                    sum(a * b for a, b in zip(token_vector(qt), token_vector(dt)))
                    for dt in dtoks
                )
                for qt in qtoks
            )
            scored.append((d, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        for rank, (d, s) in enumerate(scored, 1):
            assert got[(qid, d)] == (rank, s), (qid, d)


def test_maxsim_doc_token_cap_and_empty_query(spark):
    from avro_diff_spark.operators.retrieval import maxsim_rerank, token_vector

    # cap=1: only the FIRST doc token is visible to the scorer
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta alpha")], "doc_id bigint, text string"
    )
    cand = spark.createDataFrame([(1, 1), (1, 2)], "query_id bigint, doc_id bigint")
    out = {
        r["doc_id"]: r["maxsim_score"]
        for r in maxsim_rerank(
            docs, cand, [(1, "beta")], k=2, max_doc_tokens=1
        ).collect()
    }
    dot = lambda a, b: sum(x * y for x, y in zip(token_vector(a), token_vector(b)))
    assert out == {1: dot("beta", "alpha"), 2: dot("beta", "beta")}

    with pytest.raises(ValueError, match="no tokens"):
        maxsim_rerank(docs, cand, [(1, "   ")])
