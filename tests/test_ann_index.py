"""Persisted IVF index (operators/ann_index.py): versioned-table
centroids + cell-partitioned postings, incremental appends, and exact
equality with the in-memory ivf_topk path."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from avro_diff_spark.operators import ann_index as AI
from avro_diff_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def emb_path(sf_dir):
    return f"{sf_dir}/embeddings.parquet"


def _topk_set(df):
    return {
        (r.query_id, r.cand_id, r.rank)
        for r in df.collect()
    }


def test_stored_index_query_equals_in_memory_ivf(spark, tmp_path, emb_path):
    idx = str(tmp_path / "idx")
    cents = AI.build_ivf_index(spark, emb_path, idx)
    emb = spark.read.parquet(emb_path)
    queries = emb.filter(F.col("vec_id") < 10)

    got = AI.query_index(spark, queries, idx, k=5, probes=2)
    want = SIM.ivf_topk(queries, emb, k=5, probes=2, centroids=cents)
    assert _topk_set(got) == _topk_set(want)
    assert AI.load_centroids(spark, idx) == tuple(
        (c, tuple(v)) for c, v in cents
    )


def test_incremental_append_equals_full_index(spark, tmp_path, emb_path):
    """Daily-increment shape: build on the historical corpus, append the
    increment against STORED centroids — queries equal the in-memory IVF
    over the UNION with the same centroids, and the append reads zero
    historical postings files."""
    from avro_diff_spark.sources import versioned as V

    idx = str(tmp_path / "idx")
    emb = spark.read.parquet(emb_path)
    hist = emb.filter(F.col("vec_id") % 5 != 0)
    inc = emb.filter(F.col("vec_id") % 5 == 0)

    # build over the historical slice only (centroids trained on the full
    # parquet is fine — training input is a hyperparameter, postings are
    # what's under test)
    cents = AI.build_ivf_index(spark, emb_path, idx)
    # rebuild postings over hist only: overwrite with hist assignment
    V.commit_snapshot(
        AI._assign_cells(hist, cents),
        f"{idx}/postings",
        mode="overwrite",
        partition_by=["cell"],
    )
    v = AI.append_to_index(spark, inc, idx)
    assert v >= 2

    queries = emb.filter(F.col("vec_id") < 8)
    got = AI.query_index(spark, queries, idx, k=5, probes=2)
    want = SIM.ivf_topk(queries, emb, k=5, probes=2, centroids=cents)
    assert _topk_set(got) == _topk_set(want)

    # the append commit added only increment rows
    import json

    with open(os.path.join(idx, "postings", "_log", f"{v:06d}.json")) as fh:
        c = json.load(fh)
    assert c["mode"] == "append"
    assert c["n_rows"] == inc.count()


def test_probe_reads_only_probed_cells(spark, tmp_path, emb_path):
    """The scale claim, pinned physically: with the postings partitioned
    by cell, a probe-filtered read plans scans for ONLY the probed
    cells' files (Catalyst folds the other partitions' literal-cell
    branches away)."""
    from avro_diff_spark.sources import versioned as V

    idx = str(tmp_path / "idx")
    AI.build_ivf_index(spark, emb_path, idx)
    post = V.read_version(spark, f"{idx}/postings", _provenance="file")
    probed = post.filter(F.col("cell").isin(0, 1))
    files = {r["__file"] for r in probed.select("__file").distinct().collect()}
    assert files
    assert all("cell=0" in f or "cell=1" in f for f in files)
    # physical plan: non-probed partitions contribute no scan at all
    plan = probed._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("Scan parquet")
    all_files = {
        r["__file"]
        for r in V.read_version(spark, f"{idx}/postings", _provenance="file")
        .select("__file")
        .distinct()
        .collect()
    }
    assert len(files) < len(all_files)


def test_streaming_index_maintenance_matches_batch_append(spark, tmp_path, emb_path):
    """maintain_index_stream drains an increment into the postings table
    exactly-once; queries afterwards equal the batch append path."""
    from avro_diff_spark.sources import versioned as V

    idx, src, ck = (str(tmp_path / x) for x in ("idx", "src", "ck"))
    emb = spark.read.parquet(emb_path)
    hist = emb.filter(F.col("vec_id") % 7 != 0)
    inc = emb.filter(F.col("vec_id") % 7 == 0)

    cents = AI.build_ivf_index(spark, emb_path, idx)
    V.commit_snapshot(
        AI._assign_cells(hist, cents), f"{idx}/postings",
        mode="overwrite", partition_by=["cell"],
    )
    inc.write.parquet(src)
    stream = spark.readStream.schema(inc.schema).parquet(src)
    q = AI.maintain_index_stream(stream, idx, checkpoint=ck)
    q.awaitTermination(120)

    queries = emb.filter(F.col("vec_id") < 8)
    got = AI.query_index(spark, queries, idx, k=5, probes=2)
    want = SIM.ivf_topk(queries, emb, k=5, probes=2, centroids=cents)
    assert _topk_set(got) == _topk_set(want)

    # restart on the same checkpoint commits nothing new (exactly-once)
    v = V.latest_version(f"{idx}/postings")
    q2 = AI.maintain_index_stream(
        spark.readStream.schema(inc.schema).parquet(src), idx, checkpoint=ck
    )
    q2.awaitTermination(120)
    assert V.latest_version(f"{idx}/postings") == v


def test_delete_from_index_equals_survivor_candidates(spark, tmp_path, emb_path):
    """Round 12 (FAISS remove_ids contract): DV-delete a slice of the
    stored postings — queries equal the in-memory IVF over the SURVIVOR
    candidate set with the UNCHANGED trained centroids (cell geometry
    never moves on delete), list and DataFrame id forms agree, unknown
    ids are a no-op commit-wise."""
    from avro_diff_spark.sources import versioned as V

    idx = str(tmp_path / "idx")
    cents = AI.build_ivf_index(spark, emb_path, idx)
    emb = spark.read.parquet(emb_path)
    queries = emb.filter(F.col("vec_id") < 10)

    before = V.latest_version(f"{idx}/postings")
    assert AI.delete_from_index(spark, idx, []) == before
    assert AI.delete_from_index(spark, idx, [10**9, 10**9 + 1]) == before

    AI.delete_from_index(
        spark, idx, emb.where(F.col("vec_id") % 7 == 3).select("vec_id")
    )
    got = AI.query_index(spark, queries, idx, k=5, probes=2)
    want = SIM.ivf_topk(
        queries, emb.where(F.col("vec_id") % 7 != 3), k=5, probes=2, centroids=cents
    )
    assert _topk_set(got) == _topk_set(want)

    # the list form lands the same state from the same start
    idx2 = str(tmp_path / "idx2")
    AI.build_ivf_index(spark, emb_path, idx2)
    ids = [r.vec_id for r in emb.where(F.col("vec_id") % 7 == 3).collect()]
    AI.delete_from_index(spark, idx2, ids)
    got2 = AI.query_index(spark, queries, idx2, k=5, probes=2)
    assert _topk_set(got2) == _topk_set(got)


def test_delete_then_compact_preserves_queries(spark, tmp_path, emb_path):
    """OPTIMIZE after a delete materializes the DV away; probes are
    unchanged — the lifecycle matrix (build/append/delete/compact)
    closes for the IVF index too."""
    from avro_diff_spark.sources import versioned as V
    from avro_diff_spark.sources.versioned import compact_table

    idx = str(tmp_path / "idx")
    AI.build_ivf_index(spark, emb_path, idx)
    emb = spark.read.parquet(emb_path)
    queries = emb.filter(F.col("vec_id") < 10)
    AI.delete_from_index(
        spark, idx, emb.where(F.col("vec_id") % 7 == 3).select("vec_id")
    )
    before = _topk_set(AI.query_index(spark, queries, idx, k=5, probes=2))
    compact_table(spark, f"{idx}/postings")
    after = _topk_set(AI.query_index(spark, queries, idx, k=5, probes=2))
    assert before == after


def test_refresh_on_unchanged_data_full_probe_invariant(spark, tmp_path, emb_path):
    """Probing EVERY cell is exact cosine top-k regardless of cell
    geometry, so a refresh on unchanged data must leave full-probe
    results identical — the recall-invariance pin of refresh_index."""
    idx = str(tmp_path / "idx")
    cents = AI.build_ivf_index(spark, emb_path, idx, n_centroids=8)
    queries = spark.read.parquet(emb_path).filter(F.col("vec_id") < 8)

    before = _topk_set(AI.query_index(spark, queries, idx, k=5, probes=8))
    new_cents = AI.refresh_index(spark, idx)
    after = _topk_set(AI.query_index(spark, queries, idx, k=5, probes=8))
    assert before == after
    # the retrain really retrained (different sample law than build)
    assert len(new_cents) == len(cents)
    assert AI.load_centroids(spark, idx) == tuple(
        (c, tuple(v)) for c, v in new_cents
    )


def test_refresh_after_churn_matches_in_memory_and_rebalances(
    spark, tmp_path, emb_path
):
    """Churn (delete a third of the corpus), refresh, and pin: (a) the
    stored index equals the in-memory ivf_topk under the refreshed
    centroids over the survivor corpus — the standing exactness
    contract survives a retrain; (b) every posting is assigned to its
    nearest refreshed centroid (the re-balance actually happened)."""
    from avro_diff_spark.sources import versioned as V

    idx = str(tmp_path / "idx")
    AI.build_ivf_index(spark, emb_path, idx, n_centroids=8)
    emb = spark.read.parquet(emb_path)
    AI.delete_from_index(
        spark, idx, emb.where(F.col("vec_id") % 3 == 0).select("vec_id")
    )
    new_cents = AI.refresh_index(spark, idx)

    survivors = emb.where(F.col("vec_id") % 3 != 0)
    queries = emb.filter(F.col("vec_id") < 10)
    got = AI.query_index(spark, queries, idx, k=5, probes=2)
    want = SIM.ivf_topk(queries, survivors, k=5, probes=2, centroids=new_cents)
    assert _topk_set(got) == _topk_set(want)

    # (b) stored cells == nearest refreshed centroid for every survivor
    posts = V.read_version(spark, f"{idx}/postings").select("cell", "cand_id")
    expect = AI._assign_cells(
        survivors.select("vec_id", "embedding"), new_cents
    ).select("cell", "cand_id")
    assert posts.exceptAll(expect).count() == 0
    assert expect.exceptAll(posts).count() == 0


def test_refresh_is_idempotent(spark, tmp_path, emb_path):
    """Re-running a refresh (the crash-recovery story) reproduces the
    same centroids and postings bit-identically: the live id set is
    unchanged by a refresh, so the deterministic sample reproduces."""
    idx = str(tmp_path / "idx")
    AI.build_ivf_index(spark, emb_path, idx, n_centroids=8)
    c1 = AI.refresh_index(spark, idx)
    c2 = AI.refresh_index(spark, idx)
    assert c1 == c2


def test_refresh_oracle_replica_matches_engine(spark, tmp_path):
    """The ivf_refresh_topk oracle embeds centroids from a DuckDB
    replica of the retrain; pin the replica bit-equal to what
    refresh_index actually stores for the same fixture recipe."""
    from avro_diff_spark import pipelines as P

    src = f"{P.ORACLE_SF_DIR}/embeddings.parquet"
    idx = str(tmp_path / "idx")
    AI.build_ivf_index(spark, src, idx)
    AI.delete_from_index(
        spark,
        idx,
        spark.read.parquet(src).where(F.col("vec_id") % 7 == 3).select("vec_id"),
    )
    stored = AI.refresh_index(spark, idx)
    assert stored == P._refreshed_ivf_cents()


def test_closure_assignment_replicates_and_improves_recall(spark, tmp_path, emb_path):
    """SPANN boundary replication: (a) postings grow by a replication
    factor > 1, every vector's nearest cell still present; (b) recall
    against exact cosine top-k at fixed probes is >= the plain index's
    (border candidates stop vanishing); (c) replicated candidates are
    scored once (distinct) and results stay plan-layout-exact vs the
    oracle law (oracle-pinned in ivf_closure_topk)."""
    from avro_diff_spark.sources import versioned as V

    emb = spark.read.parquet(emb_path)
    n = emb.count()
    plain, closed = str(tmp_path / "plain"), str(tmp_path / "closed")
    cents = AI.build_ivf_index(spark, emb_path, plain, n_centroids=8)
    AI.build_ivf_index(spark, emb_path, closed, n_centroids=8, closure_eps=0.3)

    n_plain = V.read_version(spark, f"{plain}/postings").count()
    n_closed = V.read_version(spark, f"{closed}/postings").count()
    assert n_plain == n
    assert n_closed > n  # boundary vectors actually replicated

    # nearest cell is always kept: plain assignment is a subset
    p = V.read_version(spark, f"{plain}/postings").select("cell", "cand_id")
    c = V.read_version(spark, f"{closed}/postings").select("cell", "cand_id")
    assert p.exceptAll(c).count() == 0

    queries = emb.filter(F.col("vec_id") < 10)
    exact = SIM.cosine_topk(queries, emb, k=5)
    truth = {(r.query_id, r.cand_id) for r in exact.collect()}

    def recall(idx, distinct):
        got = {
            (r.query_id, r.cand_id)
            for r in AI.query_index(
                spark, queries, idx, k=5, probes=2, distinct_candidates=distinct
            ).collect()
        }
        return len(got & truth)

    assert recall(closed, True) >= recall(plain, False)


def test_sq_index_stores_bytes_only_and_ranks_sanely(spark, tmp_path, emb_path):
    """IVF-SQ8 postings carry ONLY tinyint codes (no float embeddings —
    the 4x storage contract), distances are deterministic int64, and
    the quantized ranking overlaps exact cosine top-k (8-bit SQ is
    nearly rank-lossless)."""
    from pyspark.sql import types as T

    from avro_diff_spark.sources import versioned as V

    idx = str(tmp_path / "sq")
    AI.build_ivf_sq_index(spark, emb_path, idx, n_centroids=8)
    post = V.read_version(spark, f"{idx}/postings")
    fields = {f.name: f.dataType for f in post.schema.fields}
    assert set(fields) == {"cell", "cand_id", "codes"}
    assert isinstance(fields["codes"], T.ArrayType)
    assert isinstance(fields["codes"].elementType, T.ByteType)

    emb = spark.read.parquet(emb_path)
    queries = emb.filter(F.col("vec_id") < 8)
    got = AI.query_sq_index(spark, queries, idx, k=5, probes=8)
    rows = got.collect()
    assert all(isinstance(r.dist, int) and r.dist >= 0 for r in rows)
    # deterministic: a second run is identical
    again = AI.query_sq_index(spark, queries, idx, k=5, probes=8)
    assert {(r.query_id, r.cand_id, r.rank, r.dist) for r in rows} == {
        (r.query_id, r.cand_id, r.rank, r.dist) for r in again.collect()
    }
    # full-probe SQ top-5 overlaps exact cosine top-5 (rank-lossless-ish)
    truth = {
        (r.query_id, r.cand_id)
        for r in SIM.cosine_topk(queries, emb, k=5).collect()
    }
    sq = {(r.query_id, r.cand_id) for r in rows}
    assert len(sq & truth) >= int(0.6 * len(truth))


def test_sq_append_equals_full_build_and_reads_zero_history(
    spark, tmp_path, emb_path
):
    """SQ CRUD (round 14): appending an increment against the STORED
    centroids+bounds reproduces the full build's postings and query
    results exactly, and the append commit contains only increment
    rows (work ∝ increment — historical postings never read)."""
    import json

    from avro_diff_spark.sources import versioned as V

    idx = str(tmp_path / "sq_app")
    AI.build_ivf_sq_index(spark, emb_path, idx)
    emb = spark.read.parquet(emb_path)
    queries = emb.filter(F.col("vec_id") < 8)
    want = {
        (r.query_id, r.cand_id, r.rank, r.dist)
        for r in AI.query_sq_index(spark, queries, idx, k=5, probes=2).collect()
    }

    # rewind postings to the historical slice, then append the increment
    hist = emb.filter(F.col("vec_id") % 5 != 0)
    inc = emb.filter(F.col("vec_id") % 5 == 0)
    cents = AI.load_centroids(spark, idx)
    minmax = AI.load_sq_bounds(spark, idx)
    V.commit_snapshot(
        AI._assign_cells(hist, cents)
        .withColumn("codes", AI._sq_codes(minmax))
        .select("cell", "cand_id", "codes"),
        f"{idx}/postings",
        mode="overwrite",
        partition_by=["cell"],
    )
    v = AI.append_to_sq_index(spark, inc, idx)
    assert v >= 2
    got = {
        (r.query_id, r.cand_id, r.rank, r.dist)
        for r in AI.query_sq_index(spark, queries, idx, k=5, probes=2).collect()
    }
    assert got == want

    with open(os.path.join(idx, "postings", "_log", f"{v:06d}.json")) as fh:
        c = json.load(fh)
    assert c["mode"] == "append"
    assert c["n_rows"] == inc.count()


def test_sq_delete_equals_never_indexed(spark, tmp_path, emb_path):
    """SQ delete law (the float index's pinned contract, round 14): a
    DV-delete removes candidates from results exactly as if they were
    never indexed — the post-delete top-k equals the pre-delete FULL
    ranking with deleted ids filtered out and re-ranked (cell geometry,
    code grid and probe routing untouched)."""
    idx = str(tmp_path / "sq_del")
    AI.build_ivf_sq_index(spark, emb_path, idx)
    emb = spark.read.parquet(emb_path)
    queries = emb.filter(F.col("vec_id") < 10)
    n = emb.count()
    full = AI.query_sq_index(spark, queries, idx, k=n, probes=2).collect()

    deleted = {int(r.vec_id) for r in emb.where(F.col("vec_id") % 7 == 3).collect()}
    AI.delete_from_index(spark, idx, sorted(deleted))
    got = {
        (r.query_id, r.cand_id, r.rank, r.dist)
        for r in AI.query_sq_index(spark, queries, idx, k=5, probes=2).collect()
    }

    want = set()
    by_q = {}
    for r in full:
        if r.cand_id not in deleted:
            by_q.setdefault(r.query_id, []).append((r.dist, r.cand_id))
    for qid, items in by_q.items():
        for rank, (dist, cand) in enumerate(sorted(items)[:5], start=1):
            want.add((qid, cand, rank, dist))
    assert got == want


def test_refresh_sq_structural_and_deterministic(spark, tmp_path, emb_path):
    """SQ refresh (round 14): after churn, refresh_sq_index retrains
    bounds+centroids from the decoded live postings and re-encodes —
    postings stay codes-only with exactly one row per survivor, deleted
    ids stay gone, all three tables land their REPLACE versions
    (metadata first, postings last), and the whole op is DETERMINISTIC
    from the index state (two identical index paths produce
    bit-identical tables)."""
    from pyspark.sql import types as T

    from avro_diff_spark.sources import versioned as V

    def build(path):
        AI.build_ivf_sq_index(spark, emb_path, path)
        AI.delete_from_index(
            spark,
            path,
            spark.read.parquet(emb_path)
            .where(F.col("vec_id") % 7 == 3)
            .select("vec_id"),
        )
        return AI.refresh_sq_index(spark, path)

    idx_a = str(tmp_path / "sq_ra")
    cents_a, minmax_a = build(idx_a)

    emb = spark.read.parquet(emb_path)
    survivors = emb.where(F.col("vec_id") % 7 != 3)
    post = V.read_version(spark, f"{idx_a}/postings")
    fields = {f.name: f.dataType for f in post.schema.fields}
    assert set(fields) == {"cell", "cand_id", "codes"}
    assert isinstance(fields["codes"].elementType, T.ByteType)
    assert post.count() == survivors.count()
    assert post.select("cand_id").distinct().count() == survivors.count()
    assert post.where(F.col("cand_id") % 7 == 3).count() == 0
    assert V.latest_version(f"{idx_a}/postings") == 2
    assert V.latest_version(f"{idx_a}/centroids") == 1
    assert V.latest_version(f"{idx_a}/sq_bounds") == 1

    queries = emb.filter(F.col("vec_id") < 8)
    got = AI.query_sq_index(spark, queries, idx_a, k=5, probes=2)
    assert got.count() == 8 * 5
    assert got.where(F.col("cand_id") % 7 == 3).count() == 0

    # determinism from state: an identical build+delete+refresh sequence
    # reproduces every table bit-for-bit (the crash-recovery property)
    idx_b = str(tmp_path / "sq_rb")
    cents_b, minmax_b = build(idx_b)
    assert cents_a == cents_b and minmax_a == minmax_b
    for table in ("postings", "centroids", "sq_bounds"):
        a = {tuple(map(str, r)) for r in V.read_version(spark, f"{idx_a}/{table}").collect()}
        b = {tuple(map(str, r)) for r in V.read_version(spark, f"{idx_b}/{table}").collect()}
        assert a == b, table

    # and a float index is rejected with a pointer to refresh_index
    import pytest as _pytest

    fidx = str(tmp_path / "float_idx")
    AI.build_ivf_index(spark, emb_path, fidx)
    with _pytest.raises(ValueError, match="refresh_index"):
        AI.refresh_sq_index(spark, fidx)


def test_sq_rerank_improves_recall_at_equal_probes(spark, tmp_path, emb_path):
    """The FAISS refine contract (round 14): the float re-rank stage
    never hurts recall against exact cosine truth at equal probes, and
    strictly improves it on this fixture (measured 44->45 @ probes=2,
    56->58 @ probes=4 over 20 queries at sf0.001)."""
    idx = str(tmp_path / "sq_rr")
    AI.build_ivf_sq_index(spark, emb_path, idx)
    emb = spark.read.parquet(emb_path)
    queries = emb.filter(F.col("vec_id") < 20)
    truth = {
        (r.query_id, r.cand_id)
        for r in SIM.cosine_topk(queries, emb, k=5).collect()
    }
    gains = []
    for probes in (2, 4):
        sq = {
            (r.query_id, r.cand_id)
            for r in AI.query_sq_index(spark, queries, idx, k=5, probes=probes).collect()
        }
        rr_df = AI.query_sq_index_rerank(
            spark, queries, idx, emb, k=5, probes=probes
        )
        rr = {(r.query_id, r.cand_id) for r in rr_df.collect()}
        assert len(rr & truth) >= len(sq & truth)
        gains.append(len(rr & truth) - len(sq & truth))
    assert sum(gains) > 0  # strictly better somewhere at equal probes

    import pytest as _pytest

    with _pytest.raises(ValueError, match="shortlist"):
        AI.query_sq_index_rerank(spark, queries, idx, emb, k=5, shortlist=3)


def test_sq_closure_index_replicates_and_full_probe_equals_plain(
    spark, tmp_path, emb_path
):
    """The combined closure + SQ8 + rerank config (round 14): a
    closure-built SQ index really replicates border vectors; queried
    with distinct_candidates the result has unique (query, cand) pairs;
    and at FULL probes the closure index's reranked top-k is IDENTICAL
    to the plain SQ index's — replication changes which cells hold a
    candidate, never the candidate set the full probe sees (the
    closure-exactness law the float index pins, carried to codes)."""
    from avro_diff_spark.sources import versioned as V

    plain, clos = str(tmp_path / "sq_p"), str(tmp_path / "sq_c")
    AI.build_ivf_sq_index(spark, emb_path, plain)
    AI.build_ivf_sq_index(spark, emb_path, clos, closure_eps=0.2)

    post = V.read_version(spark, f"{clos}/postings")
    n_vec = post.select("cand_id").distinct().count()
    assert post.count() > n_vec  # border replication happened
    assert post.count() == post.select("cell", "cand_id").distinct().count()

    emb = spark.read.parquet(emb_path)
    queries = emb.filter(F.col("vec_id") < 10)
    got = AI.query_sq_index_rerank(
        spark, queries, clos, emb, k=5, probes=2, distinct_candidates=True
    ).collect()
    assert len({(r.query_id, r.cand_id) for r in got}) == len(got)

    n_cells = V.read_version(spark, f"{clos}/centroids").count()
    full_c = AI.query_sq_index_rerank(
        spark, queries, clos, emb, k=5, probes=n_cells, distinct_candidates=True
    )
    full_p = AI.query_sq_index_rerank(
        spark, queries, plain, emb, k=5, probes=n_cells
    )
    key = lambda r: (r.query_id, r.cand_id, r.rank, float(r.cosine))
    assert sorted(map(key, full_c.collect())) == sorted(map(key, full_p.collect()))


def test_sq_refresh_oracle_replica_matches_engine(spark, tmp_path):
    """The ivf_sq_refresh_topk oracle embeds centroids AND bounds from
    a DuckDB replica of the SQ retrain (reconstruction -> 'sqr' sample
    -> Lloyd + min/max laws); pin the replica bit-equal to what
    refresh_sq_index actually stores for the same fixture recipe."""
    from avro_diff_spark import pipelines as P

    src = f"{P.ORACLE_SF_DIR}/embeddings.parquet"
    idx = str(tmp_path / "idx")
    AI.build_ivf_sq_index(spark, src, idx)
    AI.delete_from_index(
        spark,
        idx,
        spark.read.parquet(src).where(F.col("vec_id") % 7 == 3).select("vec_id"),
    )
    cents, minmax = AI.refresh_sq_index(spark, idx)
    o_cents, o_minmax = P._refreshed_sq_models()
    assert cents == o_cents
    assert minmax == o_minmax


def test_sq_delete_then_compact_preserves_queries(spark, tmp_path, emb_path):
    """OPTIMIZE after a delete materializes the DV away on the
    codes-only postings too; probes and int64 distances are unchanged —
    the lifecycle matrix (build/append/delete/refresh/compact) closes
    for the SQ index exactly as for the float index."""
    from avro_diff_spark.sources.versioned import compact_table

    idx = str(tmp_path / "sq_cp")
    AI.build_ivf_sq_index(spark, emb_path, idx)
    emb = spark.read.parquet(emb_path)
    queries = emb.filter(F.col("vec_id") < 10)
    AI.delete_from_index(
        spark, idx, emb.where(F.col("vec_id") % 7 == 3).select("vec_id")
    )

    def rows(df):
        return {(r.query_id, r.cand_id, r.rank, r.dist) for r in df.collect()}

    before = rows(AI.query_sq_index(spark, queries, idx, k=5, probes=2))
    compact_table(spark, f"{idx}/postings")
    after = rows(AI.query_sq_index(spark, queries, idx, k=5, probes=2))
    assert before == after


def test_append_preserves_stored_closure_rule(spark, tmp_path, emb_path):
    """Round 15 (ADVICE): an append to a SPANN-closure index replicates
    border vectors by the STORED rule without the caller re-passing
    eps — and an explicit ``closure_eps=None`` override forces plain
    single-cell assignment. Pinned on both posting layouts."""
    from avro_diff_spark.sources import versioned as V

    emb = spark.read.parquet(emb_path)
    hist = emb.filter(F.col("vec_id") % 5 != 0)
    inc = emb.filter(F.col("vec_id") % 5 == 0)

    for sq in (False, True):
        idx = str(tmp_path / ("sq" if sq else "fl"))
        build = AI.build_ivf_sq_index if sq else AI.build_ivf_index
        build(spark, emb_path, idx, n_centroids=8, closure_eps=0.3)
        assert AI.stored_closure_eps(idx) == 0.3
        cents = AI.load_centroids(spark, idx)

        # rewind postings to the historical slice (closure-assigned),
        # with the layout-appropriate payload
        assigned = AI._assign_cells_closure(hist, cents, 0.3)
        if sq:
            minmax = AI.load_sq_bounds(spark, idx)
            assigned = assigned.withColumn(
                "codes", AI._sq_codes(minmax)
            ).select("cell", "cand_id", "codes")
        V.commit_snapshot(
            assigned, f"{idx}/postings", mode="overwrite", partition_by=["cell"]
        )

        append = AI.append_to_sq_index if sq else AI.append_to_index
        append(spark, inc, idx)
        post = V.read_version(spark, f"{idx}/postings")
        inc_ids = {r.vec_id for r in inc.select("vec_id").collect()}
        per_cand = (
            post.where(F.col("cand_id").isin(list(inc_ids)))
            .groupBy("cand_id")
            .count()
            .collect()
        )
        # the increment got the closure rule: at least one appended
        # border vector replicated into >1 cell (eps=0.3 replicates on
        # this fixture — pinned by the build test above)
        assert max(r["count"] for r in per_cand) > 1
        # the stored rule survives the append commit too
        assert AI.stored_closure_eps(idx) == 0.3

        # explicit override back to plain: every appended vector lands once
        V.commit_snapshot(
            assigned, f"{idx}/postings", mode="overwrite", partition_by=["cell"]
        )
        append(spark, inc, idx, closure_eps=None)
        post = V.read_version(spark, f"{idx}/postings")
        per_cand = (
            post.where(F.col("cand_id").isin(list(inc_ids)))
            .groupBy("cand_id")
            .count()
            .collect()
        )
        assert max(r["count"] for r in per_cand) == 1


def test_refresh_keeps_stored_closure_rule(spark, tmp_path, emb_path):
    """Round 15: refresh without an explicit eps keeps the SPANN
    replication of a closure-built index (postings stay a strict
    superset of one-row-per-vector), instead of silently degrading to
    plain assignment."""
    from avro_diff_spark.sources import versioned as V

    emb = spark.read.parquet(emb_path)
    n = emb.count()
    idx = str(tmp_path / "cl")
    AI.build_ivf_index(spark, emb_path, idx, n_centroids=8, closure_eps=0.3)
    AI.refresh_index(spark, idx)
    assert V.read_version(spark, f"{idx}/postings").count() > n
    assert AI.stored_closure_eps(idx) == 0.3


def test_check_sq_index_raises_in_refresh_crash_window(spark, tmp_path, emb_path):
    """Round 15 (ADVICE): a crash between refresh_sq_index's metadata
    and postings commits leaves old codes under a new grid — the query
    path must refuse to score them (it used to return wrong distances
    silently). Simulated by committing a superseding sq_bounds snapshot
    without the matching postings commit."""
    from avro_diff_spark.sources import versioned as V

    idx = str(tmp_path / "sq")
    AI.build_ivf_sq_index(spark, emb_path, idx, n_centroids=8)
    emb = spark.read.parquet(emb_path)
    queries = emb.filter(F.col("vec_id") < 4)
    AI.query_sq_index(spark, queries, idx, k=3, probes=2).collect()  # consistent

    mins, maxs = AI.load_sq_bounds(spark, idx)
    V.commit_snapshot(
        spark.createDataFrame(
            [(list(mins), [m + 0.5 for m in maxs])],
            "mins array<double>, maxs array<double>",
        ).coalesce(1),
        f"{idx}/sq_bounds",
    )
    with pytest.raises(ValueError, match="inconsistent"):
        AI.query_sq_index(spark, queries, idx, k=3, probes=2)

    # re-running the refresh restores a consistent index (the recovery
    # contract) and the query path accepts it again
    AI.refresh_sq_index(spark, idx)
    AI.check_sq_index(spark, idx)
    assert AI.query_sq_index(spark, queries, idx, k=3, probes=2).count() > 0


def test_streaming_sq_maintenance_matches_batch_append(spark, tmp_path, emb_path):
    """Round 15 (round-14 verdict item 4): maintain_sq_index_stream
    drains an increment into the codes-only postings exactly-once —
    postings and queries equal the batch append_to_sq_index path
    row-for-row, the grid token keeps validating, and a checkpoint
    replay commits nothing new."""
    from avro_diff_spark.sources import versioned as V

    emb = spark.read.parquet(emb_path)
    hist = emb.filter(F.col("vec_id") % 7 != 0)
    inc = emb.filter(F.col("vec_id") % 7 == 0)

    def rewind(idx):
        cents = AI.load_centroids(spark, idx)
        minmax = AI.load_sq_bounds(spark, idx)
        V.commit_snapshot(
            AI._assign_cells(hist, cents)
            .withColumn("codes", AI._sq_codes(minmax))
            .select("cell", "cand_id", "codes"),
            f"{idx}/postings",
            mode="overwrite",
            partition_by=["cell"],
        )

    # batch reference
    bidx = str(tmp_path / "b")
    AI.build_ivf_sq_index(spark, emb_path, bidx, n_centroids=8)
    rewind(bidx)
    AI.append_to_sq_index(spark, inc, bidx)

    # streaming path over the SAME increment
    sidx, src, ck = (str(tmp_path / x) for x in ("s", "src", "ck"))
    AI.build_ivf_sq_index(spark, emb_path, sidx, n_centroids=8)
    rewind(sidx)
    inc.write.parquet(src)
    q = AI.maintain_sq_index_stream(
        spark.readStream.schema(inc.schema).parquet(src), sidx, checkpoint=ck
    )
    q.awaitTermination(120)

    def posts(idx):
        return {
            (r.cell, r.cand_id, tuple(r.codes))
            for r in V.read_version(spark, f"{idx}/postings").collect()
        }

    assert posts(sidx) == posts(bidx)
    AI.check_sq_index(spark, sidx)

    queries = emb.filter(F.col("vec_id") < 8)
    got = {
        (r.query_id, r.cand_id, r.rank, r.dist)
        for r in AI.query_sq_index(spark, queries, sidx, k=5, probes=2).collect()
    }
    want = {
        (r.query_id, r.cand_id, r.rank, r.dist)
        for r in AI.query_sq_index(spark, queries, bidx, k=5, probes=2).collect()
    }
    assert got == want

    # restart on the same checkpoint commits nothing new (exactly-once)
    v = V.latest_version(f"{sidx}/postings")
    q2 = AI.maintain_sq_index_stream(
        spark.readStream.schema(inc.schema).parquet(src), sidx, checkpoint=ck
    )
    q2.awaitTermination(120)
    assert V.latest_version(f"{sidx}/postings") == v


def test_pq_index_stored_equals_in_memory_and_codes_only(spark, tmp_path, emb_path):
    """Round 15 (stored OPQ-IVFPQ index): postings carry ONLY the m int
    codes (the 16-byte tier — no floats), the stored rerank query
    equals the in-memory ivfpq_topk(rotation=...) exactly, and the ADC
    stage's approx scores are deterministic int64."""
    from pyspark.sql import types as T

    from avro_diff_spark.operators import similarity as SIM2
    from avro_diff_spark.sources import versioned as V

    idx = str(tmp_path / "pq")
    rot, cents, books = AI.build_ivfpq_index(spark, emb_path, idx)
    post = V.read_version(spark, f"{idx}/postings")
    assert set(post.columns) == {"cell", "cand_id", "codes"}
    assert isinstance(post.schema["codes"].dataType.elementType, T.IntegerType)

    emb = spark.read.parquet(emb_path)
    queries = emb.filter(F.col("vec_id") < 10)
    got = {
        (r.query_id, r.cand_id, r.rank, r.cosine)
        for r in AI.query_pq_index_rerank(
            spark, queries, idx, emb, k=5, probes=2
        ).collect()
    }
    want = {
        (r.query_id, r.cand_id, r.rank, r.cosine)
        for r in SIM2.ivfpq_topk(
            queries, emb, k=5, centroids=cents, codebooks=books, rotation=rot
        ).collect()
    }
    assert got == want

    a1 = AI.query_pq_index(spark, queries, idx, k=5, probes=2).collect()
    a2 = AI.query_pq_index(spark, queries, idx, k=5, probes=2).collect()
    assert sorted(map(tuple, a1)) == sorted(map(tuple, a2))


def test_pq_index_append_equals_full_and_token_guards(spark, tmp_path, emb_path):
    """Append assigns/encodes against the STORED models (work ∝
    increment; the commit adds only increment rows) and lands the same
    queries as a full build; a model table superseded without a
    matching postings commit makes queries raise (pq_grid token)."""
    import json as _json

    from avro_diff_spark.sources import versioned as V

    emb = spark.read.parquet(emb_path)
    queries = emb.filter(F.col("vec_id") < 8)
    hist = emb.filter(F.col("vec_id") % 5 != 0)
    inc = emb.filter(F.col("vec_id") % 5 == 0)

    idx = str(tmp_path / "pq")
    rot, cents, books = AI.build_ivfpq_index(spark, emb_path, idx)
    want = {
        (r.query_id, r.cand_id, r.rank, r.approx)
        for r in AI.query_pq_index(spark, queries, idx, k=5, probes=2).collect()
    }
    V.commit_snapshot(
        AI._pq_assign_encode(hist, rot, cents, books),
        f"{idx}/postings",
        mode="overwrite",
        partition_by=["cell"],
    )
    v = AI.append_to_pq_index(spark, inc, idx)
    got = {
        (r.query_id, r.cand_id, r.rank, r.approx)
        for r in AI.query_pq_index(spark, queries, idx, k=5, probes=2).collect()
    }
    assert got == want
    with open(os.path.join(idx, "postings", "_log", f"{v:06d}.json")) as fh:
        c = _json.load(fh)
    assert c["mode"] == "append" and c["n_rows"] == inc.count()

    # supersede the codebooks without re-encoding -> queries refuse
    V.commit_snapshot(
        spark.createDataFrame(
            [(0, 0, [0.0, 0.0, 0.0, 0.0])], "j int, c int, vec array<double>"
        ).coalesce(1),
        f"{idx}/codebooks",
    )
    with pytest.raises(ValueError, match="inconsistent"):
        AI.query_pq_index(spark, queries, idx, k=3, probes=2)
