from __future__ import annotations

import math

from pyspark.sql import functions as F

from avro_diff_spark.operators import similarity as SIM
from avro_diff_spark.snapshots import embeddings_with_dups


def test_cosine_topk_excludes_self_and_ranks(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)
    out = SIM.cosine_topk(q, emb, k=5)
    rows = out.collect()
    assert len(rows) == 15
    by_q = {}
    for r in rows:
        assert r["query_id"] != r["cand_id"]
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cosine"]))
    for ranked in by_q.values():
        ranked.sort()
        cosines = [c for _, c in ranked]
        assert cosines == sorted(cosines, reverse=True)
        assert all(-1.001 <= c <= 1.001 for c in cosines)


def test_planted_duplicate_is_rank1_with_cosine_one(spark, sf_dir):
    corpus = embeddings_with_dups(spark, sf_dir)
    q = corpus.filter(F.col("vec_id") == 1_000_000)  # copy of vec 0
    out = SIM.cosine_topk(q, corpus, k=1).collect()
    assert len(out) == 1
    assert out[0]["cand_id"] == 0
    assert abs(out[0]["cosine"] - 1.0) < 1e-9


def test_pandas_topk_matches_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["rank"]): (r["cand_id"], r["cosine"])
             for r in SIM.cosine_topk(q, emb, k=3).collect()}
    fast = {(r["query_id"], r["rank"]): (r["cand_id"], r["cosine"])
            for r in SIM.cosine_topk_pandas(q, emb, k=3).collect()}
    assert exact.keys() == fast.keys()
    for k in exact:
        ec, ecos = exact[k]
        fc, fcos = fast[k]
        assert ec == fc, f"rank disagreement at {k}"
        assert math.isclose(ecos, fcos, abs_tol=1e-9)


def test_ann_results_are_true_bucketmates(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    ann = SIM.ann_signbucket_topk(q, emb, k=5)
    brute = SIM.cosine_topk(q, emb, k=200)
    # every ANN hit must appear in the brute-force ranking with the same score
    a = {(r["query_id"], r["cand_id"]): r["cosine"] for r in ann.collect()}
    b = {(r["query_id"], r["cand_id"]): r["cosine"] for r in brute.collect()}
    overlap = [k for k in a if k in b]
    assert len(overlap) >= len(a) // 2
    for k in overlap:
        assert math.isclose(a[k], b[k], abs_tol=1e-12)


def test_embedding_near_dups_finds_planted(spark, sf_dir):
    corpus = embeddings_with_dups(spark, sf_dir)
    found = {(r["vec_a"], r["vec_b"]) for r in SIM.embedding_near_dups(corpus, 0.99).collect()}
    planted = [r[0] for r in corpus.filter(F.col("vec_id") >= 1_000_000).select("vec_id").collect()]
    for v in planted:
        assert (v - 1_000_000, v) in found


def test_ivf_topk_structure_and_recall_vs_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    cents = SIM.train_ivf_centroids(f"{sf_dir}/embeddings.parquet")
    ivf = SIM.ivf_topk(q, emb, k=5, probes=2, centroids=cents)
    rows = ivf.collect()
    by_q = {}
    for r in rows:
        assert r["query_id"] != r["cand_id"]
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cand_id"], r["cosine"]))
    assert set(by_q) == set(range(10))
    for ranked in by_q.values():
        ranked.sort()
        assert [rk for rk, _, _ in ranked] == list(range(1, len(ranked) + 1))
        cosines = [c for _, _, c in ranked]
        assert cosines == sorted(cosines, reverse=True)
    # IVF is approximate, but probing 2 of 16 cells on this data must still
    # find a sane share of the exact top-5 (planted structure => recall high)
    exact = {
        (r["query_id"], r["cand_id"]) for r in SIM.cosine_topk(q, emb, k=5).collect()
    }
    got = {(r["rank"] and r["query_id"], r["cand_id"]) for r in rows}
    recall = len(exact & {(qq, cc) for qq, cc in got}) / len(exact)
    assert recall >= 0.3, f"IVF recall collapsed: {recall}"


def test_ivf_candidate_in_exactly_one_cell(spark, sf_dir):
    # pair uniqueness: a candidate lives in one cell, so (query, cand)
    # appears at most once even with multi-probe
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    cents = SIM.train_ivf_centroids(f"{sf_dir}/embeddings.parquet", n_centroids=8)
    scored = SIM.ivf_topk(q, emb, k=1_000_000, probes=3, centroids=cents)
    dups = (
        scored.groupBy("query_id", "cand_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dups == 0


def test_pq_topk_recall_vs_exact(spark, sf_dir):
    """Flat-PQ with exact re-rank recovers most of the exact top-5 (recall
    is < 1 by construction; the codebooks and fixed-point ADC make whatever
    it returns fully deterministic)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    books = SIM.train_pq_codebooks(f"{sf_dir}/embeddings.parquet")
    assert len(books) == 16 and len(books[0]) == 16

    exact = {
        (r.query_id, r.cand_id)
        for r in SIM.cosine_topk(queries, emb, k=5).collect()
    }
    pq = SIM.pq_topk(queries, emb, k=5, codebooks=books)
    got = {(r.query_id, r.cand_id) for r in pq.collect()}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.8, f"recall@5 {recall:.2f}"
    # determinism: second run identical including ranks/cosines
    again = SIM.pq_topk(queries, emb, k=5, codebooks=books)
    assert sorted(map(tuple, pq.collect())) == sorted(map(tuple, again.collect()))


def test_pq_encode_codes_in_range(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = SIM.train_pq_codebooks(f"{sf_dir}/embeddings.parquet")
    codes = emb.select(SIM.pq_encode("embedding", books).alias("c"))
    stats = codes.select(
        F.min(F.array_min("c")).alias("lo"),
        F.max(F.array_max("c")).alias("hi"),
        F.min(F.size("c")).alias("m"),
    ).first()
    assert stats.lo >= 0 and stats.hi < 16 and stats.m == 16


def test_ivfpq_topk_recall_and_determinism(spark, sf_dir):
    """Composed IVF+PQ: coarse cell pruning + ADC + exact re-rank still
    recovers most of the exact top-5, deterministically."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    cents = SIM.train_ivf_centroids(f"{sf_dir}/embeddings.parquet")
    books = SIM.train_pq_codebooks(f"{sf_dir}/embeddings.parquet")

    out = SIM.ivfpq_topk(queries, emb, k=5, centroids=cents, codebooks=books)
    rows = out.collect()
    got = {(r.query_id, r.cand_id) for r in rows}
    # IVF-probe ceiling: the composed index cannot beat its own coarse
    # stage, so compare against ivf_topk (same cells), not exact
    ivf = {
        (r.query_id, r.cand_id)
        for r in SIM.ivf_topk(queries, emb, k=5, probes=2, centroids=cents).collect()
    }
    overlap = len(got & ivf) / len(ivf)
    assert overlap >= 0.8, f"vs-IVF overlap {overlap:.2f}"
    again = SIM.ivfpq_topk(queries, emb, k=5, centroids=cents, codebooks=books)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_ivf_topk_requires_centroids(spark, sf_dir):
    """The silent untrained fallback is gone (round-4 VERDICT nit): omitting
    centroids raises instead of training-by-accident with garbage recall."""
    import pytest

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with pytest.raises(ValueError, match="centroids"):
        SIM.ivf_topk(emb.filter(F.col("vec_id") < 3), emb, k=5)


def test_ivfpq_residual_recall_at_least_nonresidual(spark, sf_dir):
    """FAISS's by_residual=True exists because residuals quantize finer
    than raw vectors at the same code budget; pin that the residual
    composition's recall of the IVF-probe ceiling is >= the non-residual
    one on this (noise-like, adversarial) data, and that it is exactly
    reproducible."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    p = f"{sf_dir}/embeddings.parquet"
    cents = SIM.train_ivf_centroids(p)
    books_raw = SIM.train_pq_codebooks(p)
    books_res = SIM.train_pq_codebooks_residual(p, cents)

    ivf = {
        (r.query_id, r.cand_id)
        for r in SIM.ivf_topk(queries, emb, k=5, probes=2, centroids=cents).collect()
    }
    res_rows = SIM.ivfpq_topk(
        queries, emb, k=5, centroids=cents, codebooks=books_res, by_residual=True
    ).collect()
    res = {(r.query_id, r.cand_id) for r in res_rows}
    raw = {
        (r.query_id, r.cand_id)
        for r in SIM.ivfpq_topk(
            queries, emb, k=5, centroids=cents, codebooks=books_raw
        ).collect()
    }
    recall_res = len(res & ivf) / len(ivf)
    recall_raw = len(raw & ivf) / len(ivf)
    assert recall_res >= recall_raw, f"residual {recall_res:.2f} < raw {recall_raw:.2f}"
    assert recall_res >= 0.8
    again = SIM.ivfpq_topk(
        queries, emb, k=5, centroids=cents, codebooks=books_res, by_residual=True
    )
    assert sorted(map(tuple, res_rows)) == sorted(map(tuple, again.collect()))


def test_random_planes_beat_axis_aligned_on_correlated_data(spark):
    """The isotropy property the rp variant exists for: on embeddings whose
    leading dimensions have near-constant sign (correlated real-world
    shape), axis-aligned sign bits split nothing — every vector lands in
    one giant bucket per band and the blocking degenerates to ~all-pairs.
    Seeded random hyperplanes cut through any distribution. Pin both
    halves: recall of planted near-dup pairs stays perfect AND the
    candidate-pair workload shrinks by a large factor."""
    import numpy as np

    rng = np.random.RandomState(11)
    n, dim, bands, r = 120, 64, 3, 8
    # the axis-aligned bits read dims [0, bands*r) = [0, 24); make exactly
    # those dims positive-biased (constant sign, the correlated real-world
    # shape) while the remaining 40 dims stay well-spread, so vectors are
    # genuinely far apart (most pairwise cosines far below threshold) yet
    # axis bits cannot tell any of them apart
    vecs = []
    for i in range(n):
        lead = np.abs(rng.normal(0, 1, bands * r)) + 0.2
        tail = rng.normal(0, 1.5, dim - bands * r)
        v = np.concatenate([lead, tail])
        vecs.append(v / np.linalg.norm(v))
    # plant 10 exact duplicates (pairs (i, i+1000) with identical vectors)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    rows += [(1000 + i, rows[i][1]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    planted = {(float(i), float(1000 + i)) for i in range(10)}

    def stats(planes):
        pairs = SIM.embedding_near_dups(
            df, threshold=0.99, bands=bands, rows_per_band=r, planes=planes
        )
        found = {(r_.vec_a, r_.vec_b) for r_ in pairs.collect()}
        # candidate workload: same-bucket pair count across bands
        from pyspark.sql import functions as F2

        if planes is None:
            bits = [
                SIM.sign_bucket(F2.col("embedding"), r, offset=i * r).alias(f"b{i}")
                for i in range(bands)
            ]
        else:
            bits = [
                SIM.sign_bucket_planes(
                    F2.col("embedding"), planes[i * r : (i + 1) * r]
                ).alias(f"b{i}")
                for i in range(bands)
            ]
        banded = df.select(*bits)
        cand_pairs = 0
        for i in range(bands):
            counts = banded.groupBy(f"b{i}").count().collect()
            cand_pairs += sum(c["count"] * (c["count"] - 1) // 2 for c in counts)
        return found, cand_pairs

    axis_found, axis_pairs = stats(None)
    rp_found, rp_pairs = stats(SIM.random_planes(bands * r, dim, seed=7))
    assert planted <= {(float(a), float(b)) for a, b in rp_found}
    # axis-aligned collapses: essentially every vector shares every band
    # bucket (workload ~ bands * n^2/2); random planes must prune hard
    assert rp_pairs < axis_pairs / 4, (rp_pairs, axis_pairs)


def test_training_cache_invalidates_on_file_rewrite(tmp_path, sf_dir):
    """The training memos key on (path, size, mtime), not path alone —
    regenerating a parquet in-process must retrain instead of serving the
    stale literals to the correctness gate (round-4 ADVICE)."""
    import os
    import shutil
    import duckdb

    p = str(tmp_path / "emb.parquet")
    shutil.copy(f"{sf_dir}/embeddings.parquet", p)
    c1 = SIM.train_ivf_centroids(p)
    b1 = SIM.train_pq_codebooks(p)

    # rewrite with different content (half the rows), force a new mtime
    duckdb.sql(
        f"COPY (SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet') "
        f"WHERE vec_id % 2 = 0) TO '{p}' (FORMAT PARQUET)"
    )
    os.utime(p, ns=(os.stat(p).st_atime_ns, os.stat(p).st_mtime_ns + 1))
    c2 = SIM.train_ivf_centroids(p)
    b2 = SIM.train_pq_codebooks(p)
    assert c1 != c2
    assert b1 != b2
    # unchanged file still memoizes (same object back)
    assert SIM.train_ivf_centroids(p) is c2


def test_kmeans_cluster_stats_against_bruteforce(spark, sf_dir):
    """Every embedding is counted exactly once; the per-cluster
    representative is the true argmax-cosine member (ties to lowest id),
    verified against a driver-side numpy brute force."""
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = SIM.train_ivf_centroids(f"{sf_dir}/embeddings.parquet")
    got = {r.cid: r for r in SIM.kmeans_cluster_stats(emb, centroids=cents).collect()}

    rows = emb.select("vec_id", "embedding").collect()
    n_total = len(rows)
    assert sum(r.n_points for r in got.values()) == n_total

    cmat = np.array([v for _, v in sorted(cents)])
    cnorm = np.linalg.norm(cmat, axis=1)
    best = {}
    counts = {}
    for r in rows:
        x = np.array(r.embedding)
        cos = cmat @ x / (cnorm * np.linalg.norm(x))
        cid = int(np.argmax(np.round(cos, 9)))  # ties break to lowest cid
        counts[cid] = counts.get(cid, 0) + 1
        key = (round(float(cos[cid]), 9), -r.vec_id)
        if cid not in best or key > best[cid][0]:
            best[cid] = (key, r.vec_id)
    for cid, r in got.items():
        assert counts.get(cid, 0) == r.n_points, cid
        assert best[cid][1] == r.top_vec_id, cid


def test_sq_topk_recall_and_codes(spark, sf_dir):
    """8-bit scalar quantization is nearly rank-lossless — recall@5 should
    beat PQ's 4-dim subspaces on this noise-like data — and codes clamp
    to [0, 255] with one code per dimension."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    mm = SIM.train_sq_minmax(f"{sf_dir}/embeddings.parquet")
    assert len(mm[0]) == 64 and all(b > a for a, b in zip(mm[0], mm[1]))

    exact = {
        (r.query_id, r.cand_id)
        for r in SIM.cosine_topk(queries, emb, k=5).collect()
    }
    sq = SIM.sq_topk(queries, emb, k=5, minmax=mm)
    rows = sq.collect()
    got = {(r.query_id, r.cand_id) for r in rows}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9, f"SQ8 recall@5 {recall:.2f}"
    again = SIM.sq_topk(queries, emb, k=5, minmax=mm)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))

    codes = emb.select(F.expr(SIM.sq_encode_sql("embedding", mm)).alias("c"))
    stats = codes.select(
        F.min(F.array_min("c")).alias("lo"),
        F.max(F.array_max("c")).alias("hi"),
        F.min(F.size("c")).alias("n"),
    ).first()
    assert stats.lo >= 0 and stats.hi <= 255 and stats.n == 64


def test_sq_topk_requires_training():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="train_sq_minmax"):
        SIM.sq_topk(None, None, minmax=None)


def test_semantic_dedup_against_bruteforce(spark, sf_dir):
    """SemDeDup survivors equal a driver-side brute-force replay of the
    rule: assign to nearest trained centroid, drop any vec whose cluster
    holds a LOWER id at cosine >= threshold. Every seeded exact twin
    (vec_id + 1e6 copies) must be dropped; its original must survive
    unless itself semantically duplicated."""
    import math

    from avro_diff_spark.operators.similarity import semantic_dedup, train_ivf_centroids
    from avro_diff_spark.snapshots import embeddings_with_dups

    corpus = embeddings_with_dups(spark, sf_dir)
    cents = train_ivf_centroids(f"{sf_dir}/embeddings.parquet")
    got = {(r.vec_id, r.cid) for r in semantic_dedup(corpus, centroids=cents, threshold=0.95).collect()}

    rows = corpus.collect()

    def fdot(a, b):
        return sum(math.floor(float(x) * float(y) * 1e16) for x, y in zip(a, b)) / 1e16

    def cos(a, b):
        na, nb = math.sqrt(fdot(a, a)), math.sqrt(fdot(b, b))
        return fdot(a, b) / (na * nb)

    assign = {}
    for r in rows:
        ranked = sorted(
            ((-cos(r.embedding, v), cid) for cid, v in cents),
        )
        assign[r.vec_id] = ranked[0][1]
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(assign[r.vec_id], []).append(r)
    want = set()
    for cid, members in by_cluster.items():
        members.sort(key=lambda r: r.vec_id)
        for i, r in enumerate(members):
            if not any(cos(m.embedding, r.embedding) >= 0.95 for m in members[:i]):
                want.add((r.vec_id, cid))
    assert got == want
    # the seeded twins are exact copies of a surviving lower id -> all dropped
    twins = {r.vec_id for r in rows if r.vec_id >= 1_000_000}
    assert twins & {v for v, _ in got} == set()
    assert len(got) < len(rows)


def test_opq_rotation_orthonormal_and_recall(spark, sf_dir):
    """Round 15 (OPQ — Ge et al. 2013): the trained rotation is
    orthonormal to rounding precision, the rotated composition's recall
    against exact cosine is >= the unrotated one on this data, results
    are exactly reproducible, and the fixed-point rotation law makes
    the trainer's rotated sample equal the engine's rotated column
    bit-for-bit."""
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    p = f"{sf_dir}/embeddings.parquet"
    rot, books = SIM.train_opq(p)
    cents_r = SIM.train_ivf_centroids_rotated(p, rot)

    r = np.array(rot)
    assert np.abs(r @ r.T - np.eye(r.shape[0])).max() < 1e-9

    out = SIM.ivfpq_topk(
        queries, emb, k=5, centroids=cents_r, codebooks=books, rotation=rot
    )
    rows = out.collect()
    got = {(r_.query_id, r_.cand_id) for r_ in rows}
    exact = {
        (r_.query_id, r_.cand_id)
        for r_ in SIM.cosine_topk(queries, emb, k=5).collect()
    }
    cents = SIM.train_ivf_centroids(p)
    books0 = SIM.train_pq_codebooks(p)
    plain = {
        (r_.query_id, r_.cand_id)
        for r_ in SIM.ivfpq_topk(
            queries, emb, k=5, centroids=cents, codebooks=books0
        ).collect()
    }
    assert len(got & exact) >= len(plain & exact)
    again = SIM.ivfpq_topk(
        queries, emb, k=5, centroids=cents_r, codebooks=books, rotation=rot
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))

    # trainer-side fixed-point rotation == the engine's rotated column
    one = emb.where(F.col("vec_id") == 0).select(
        F.expr(SIM.opq_rotate_sql("embedding", rot)).alias("r")
    ).collect()[0].r
    x = np.array(
        [emb.where(F.col("vec_id") == 0).collect()[0].embedding],
        dtype=np.float64,
    )
    want = SIM._rotate_fixed(x, np.array(rot))[0]
    assert list(one) == list(want)
