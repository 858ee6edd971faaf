"""Persisted, incrementally-maintained ANN index — the similarity-tier
sibling of operators/neardup_index.py: the IVF structure (trained
centroids + cell-partitioned postings) stored as VERSIONED TABLES, so a
corpus that grows daily assigns only its increment (append commits, no
retraining, no rebuild) and queries probe the stored cells.

Why this shape at 100 TB: a FAISS-style in-memory index cannot hold a
corpus that outgrows one machine, and rebuilding an index per batch
re-reads the corpus. Here the index IS a table: postings are
hive-partitioned by cell id, so a probe touches only its cells' files
(log-level partition pruning — the same skip read_version gives every
partitioned table), appends ride the commit log's optimistic
concurrency, and time travel/vacuum/compaction all apply to the index
like any other table.

Exactness contract: querying the stored index returns EXACTLY what
:func:`avro_diff_spark.operators.similarity.ivf_topk` returns for the
same centroids over the same candidate set (pytest-pinned), because both
sides share the assignment and scoring expressions verbatim.

No reference parity: yuana97/Avro_Diff has no similarity surface
(SURVEY.md §2); beyond-reference tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from avro_diff_spark.operators import similarity as S
from avro_diff_spark.sources import versioned as V
from avro_diff_spark.sources.tables import spread_small

__all__ = [
    "build_ivf_index",
    "build_ivf_sq_index",
    "append_to_index",
    "append_to_sq_index",
    "delete_from_index",
    "refresh_index",
    "refresh_sq_index",
    "load_centroids",
    "load_sq_bounds",
    "stored_closure_eps",
    "check_sq_index",
    "maintain_index_stream",
    "maintain_sq_index_stream",
    "build_ivfpq_index",
    "append_to_pq_index",
    "load_pq_model",
    "check_pq_index",
    "query_pq_index",
    "query_pq_index_rerank",
    "query_index",
    "query_sq_index",
    "query_sq_index_rerank",
]

#: sentinel default for append/refresh ``closure_eps``: "use the
#: assignment rule the index was BUILT with" (round 15 ADVICE — an
#: append to a SPANN-closure index must keep replicating border
#: vectors, or the increment's recall silently degrades relative to the
#: build). Pass an explicit float to override, or explicit ``None`` to
#: force plain nearest-cell assignment.
_STORED = object()


def stored_closure_eps(index_path: str) -> float | None:
    """The SPANN ``closure_eps`` the index's postings were last written
    with (``None`` = plain nearest-cell assignment) — stamped as commit
    ``app_meta`` by every build/append/refresh since round 15, read via
    the walk-past-meta-less-commits lookup so delete/compaction commits
    never amnesia it. Pre-round-15 indexes carry no stamp and read as
    plain (their builds defaulted to plain assignment)."""
    meta = V.latest_app_meta(f"{index_path}/postings", "closure_eps")
    eps = meta.get("closure_eps")
    return float(eps) if eps is not None else None


def _resolve_eps(index_path: str, closure_eps) -> float | None:
    if closure_eps is _STORED:
        return stored_closure_eps(index_path)
    return closure_eps


def _grid_meta(index_path: str) -> dict:
    """The postings-commit ``app_meta`` tying SQ postings to the exact
    metadata-table versions their codes were computed against — the
    single refresh token of round-15 ADVICE. ``check_sq_index`` compares
    it to the live table versions at query time. The float index needs
    no token: its stored embeddings are exact, so a stale assignment
    only affects probe recall, never a returned distance."""
    return {
        "centroids_v": V.latest_version(f"{index_path}/centroids"),
        "bounds_v": V.latest_version(f"{index_path}/sq_bounds"),
    }


def check_sq_index(spark: SparkSession, index_path: str) -> None:
    """Cheap consistency check (metadata reads only, no data IO): the
    live postings must have been encoded against the CURRENT centroids
    and sq_bounds versions. ``refresh_sq_index`` commits metadata first
    and postings last, so a crash between its commits leaves a window
    where old codes would silently score against the new grid (wrong
    distances, no error) — this raises instead, with the recovery
    pointer. Indexes written before the grid stamp existed (no
    ``sq_grid`` app_meta anywhere in the log) pass unchecked."""
    posts = f"{index_path}/postings"
    stamped = V.latest_app_meta(posts, "sq_grid").get("sq_grid")
    if stamped is None:
        return
    live = {
        "centroids_v": V.latest_version(f"{index_path}/centroids"),
        "bounds_v": V.latest_version(f"{index_path}/sq_bounds"),
    }
    if stamped != live:
        raise ValueError(
            f"IVF-SQ8 index at {index_path} is inconsistent: postings were "
            f"encoded against grid versions {stamped} but the live tables "
            f"are at {live} — a refresh_sq_index crashed between its "
            "metadata and postings commits; re-run refresh_sq_index to "
            "restore a consistent index"
        )


def _assign_cells(df: DataFrame, cents, *, spread: bool = True) -> DataFrame:
    """(cell, cand_id, embedding) — every vector to its nearest centroid
    (argmax cosine, ties to the lowest cid), the exact candidate-side
    expressions of :func:`similarity.ivf_topk`. ``spread=False`` skips
    the small-input split widening (which counts rows — illegal on a
    streaming DataFrame; micro-batches are already split-bounded)."""
    ranking = S._centroid_ranking(sorted((int(c), list(v)) for c, v in cents))
    return (
        (spread_small(df) if spread else df)
        .select(
            F.col("vec_id").alias("cand_id"),
            F.col("embedding").alias("c_emb"),
            S._dec_norm(F.col("embedding")).alias("c_norm"),
        )
        .select(
            F.element_at(ranking(F.col("c_emb"), F.col("c_norm")), 1)
            .getField("cid")
            .alias("cell"),
            "cand_id",
            F.col("c_emb").alias("embedding"),
        )
        # co-partition by cell before the partitioned commit: without
        # this every input split writes a sliver into every cell — a
        # files x cells small-file explosion that read-side probes then
        # pay for forever (the optimized-write rule every lakehouse
        # writer applies before partitionBy)
        .repartition("cell")
    )


def _assign_cells_closure(
    df: DataFrame, cents, eps: float, *, spread: bool = True
) -> DataFrame:
    """SPANN-style CLOSURE assignment (Chen et al., "SPANN: Highly-
    efficient Billion-scale Approximate Nearest Neighbor Search",
    NeurIPS 2021 — the boundary-replication rule of its posting-list
    construction): every vector lands in its nearest cell AND in every
    cell whose cosine distance is within a (1 + eps) factor of the
    nearest, i.e. ``(1 - cos_i) <= (1 + eps) * (1 - cos_best)``. Border
    vectors therefore replicate into their neighboring cells, so a
    fixed-probes query stops cliff-dropping candidates that sit just
    across a cell boundary; storage grows only by the replication
    factor (measured, typically small for moderate eps). The
    comparison runs on the same correctly-rounded doubles the oracle
    computes (1 + neg_cos ≡ 1 - cos exactly in IEEE), so assignment is
    engine-portable like the plain rule. ``spread=False`` as in
    :func:`_assign_cells` (streaming micro-batches)."""
    ranking = S._centroid_ranking(sorted((int(c), list(v)) for c, v in cents))
    lim = F.lit(float(1.0 + eps))
    r = F.col("__rank")
    best = F.element_at(r, 1)["neg_cos"]
    kept = F.when(best.isNull(), F.slice(r, 1, 1)).otherwise(
        F.filter(
            r,
            lambda s: (F.lit(1.0) + s["neg_cos"]) <= lim * (F.lit(1.0) + best),
        )
    )
    return (
        (spread_small(df) if spread else df)
        .select(
            F.col("vec_id").alias("cand_id"),
            F.col("embedding").alias("c_emb"),
            S._dec_norm(F.col("embedding")).alias("c_norm"),
        )
        .select(
            "cand_id",
            F.col("c_emb").alias("embedding"),
            ranking(F.col("c_emb"), F.col("c_norm")).alias("__rank"),
        )
        .select(
            F.explode(kept).alias("__cell"), "cand_id", "embedding"
        )
        .select(F.col("__cell.cid").alias("cell"), "cand_id", "embedding")
        .repartition("cell")  # same optimized-write rule as _assign_cells
    )


def build_ivf_index(
    spark: SparkSession,
    emb_parquet_path: str,
    index_path: str,
    *,
    n_centroids: int = 16,
    sample: int = 1024,
    iters: int = 5,
    closure_eps: float | None = None,
):
    """Train the coarse quantizer (deterministic sampled Lloyd —
    :func:`similarity.train_ivf_centroids`) and commit the index as two
    versioned tables under ``index_path``: ``centroids`` (cid → vector,
    a bounded metadata table) and ``postings`` (cell-PARTITIONED
    assignments with the embeddings), one distributed assignment pass.
    ``closure_eps`` switches the assignment to SPANN-style boundary
    replication (:func:`_assign_cells_closure`) — pass the SAME value's
    queries through ``query_index(distinct_candidates=True)`` so a
    replicated candidate is scored once. Returns the centroids for
    immediate querying."""
    cents = S.train_ivf_centroids(
        emb_parquet_path, n_centroids=n_centroids, sample=sample, iters=iters
    )
    V.commit_snapshot(
        spark.createDataFrame(
            [(int(c), list(v)) for c, v in cents], "cid int, embedding array<double>"
        ).coalesce(1),
        f"{index_path}/centroids",
    )
    emb = spark.read.parquet(emb_parquet_path)
    assigned = (
        _assign_cells_closure(emb, cents, closure_eps)
        if closure_eps is not None
        else _assign_cells(emb, cents)
    )
    V.commit_snapshot(
        assigned,
        f"{index_path}/postings",
        partition_by=["cell"],
        app_meta={"closure_eps": closure_eps},
    )
    return cents


def load_centroids(spark: SparkSession, index_path: str):
    rows = V.read_version(spark, f"{index_path}/centroids").collect()
    return tuple(
        (int(r.cid), tuple(float(v) for v in r.embedding))
        for r in sorted(rows, key=lambda r: r.cid)
    )


def _assign(df: DataFrame, cents, eps: float | None, *, spread: bool = True) -> DataFrame:
    return (
        _assign_cells_closure(df, cents, eps, spread=spread)
        if eps is not None
        else _assign_cells(df, cents, spread=spread)
    )


def append_to_index(
    spark: SparkSession, df: DataFrame, index_path: str, *, closure_eps=_STORED
) -> int:
    """Add new vectors to the stored index: assign against the STORED
    centroids (no retraining — FAISS's add() contract) and APPEND to the
    postings table. Work ∝ increment; the historical postings are never
    read. The assignment RULE defaults to the one the index was built
    with (round 15 ADVICE: an append to a SPANN-closure index keeps
    replicating border vectors — ``stored_closure_eps``); pass an
    explicit value/None to override. Returns the postings table's new
    version."""
    cents = load_centroids(spark, index_path)
    eps = _resolve_eps(index_path, closure_eps)
    return V.commit_snapshot(
        _assign(df, cents, eps),
        f"{index_path}/postings",
        mode="append",
        partition_by=["cell"],
        app_meta={"closure_eps": eps},
    )


def delete_from_index(
    spark: SparkSession,
    index_path: str,
    vec_ids: "list[int] | DataFrame",
    *,
    id_col: str = "vec_id",
) -> int:
    """Remove vectors from the stored index (round 12 — the FAISS
    ``remove_ids`` contract, completing CRUD parity with the text
    index): a merge-on-read deletion-vector commit on the postings
    table (``delete_where`` — a point-delete writes a KB sidecar, not
    the cell files), identified by predicate for a literal id list or
    by broadcast semi-join for a DataFrame id set (never collected).
    Centroids are untouched (no retraining on delete, exactly FAISS),
    and the IVF probe needs no collection stats, so ONE commit does it.
    ``delete-then-query == never-indexed-then-query`` is pytest-pinned.
    Ids not in the index are a no-op (no empty commit).

    Serves BOTH posting layouts unchanged — float (``embedding``) and
    IVF-SQ8 (``codes``) — because the delete touches only ``cand_id``
    (round 14: SQ CRUD parity; the SQ delete law is pinned in
    tests/test_ann_index.py and recorded as ``ivf_sq_delete_topk``)."""
    posts = f"{index_path}/postings"
    if isinstance(vec_ids, DataFrame):
        keys = vec_ids.select(F.col(id_col).alias("cand_id")).distinct()
        return V.delete_where(spark, posts, keys=keys, on=["cand_id"])
    ids = sorted({int(i) for i in vec_ids})
    if not ids:
        return V.latest_version(posts)
    return V.delete_where(spark, posts, F.col("cand_id").isin(ids))


def build_ivf_sq_index(
    spark: SparkSession,
    emb_parquet_path: str,
    index_path: str,
    *,
    n_centroids: int = 16,
    sample: int = 1024,
    iters: int = 5,
    closure_eps: float | None = None,
):
    """FAISS ``IVF..,SQ8``-shape index: coarse quantizer + postings that
    store ONLY 8-bit scalar-quantized codes — 1 byte per dimension
    instead of a 4-byte float, the 4x scan/shuffle saving that makes a
    100 TB vector corpus probeable (the most-deployed FAISS memory
    config). Three versioned tables: ``centroids``, ``sq_bounds`` (the
    trained per-dimension min/max — one bounded metadata row) and
    ``postings`` (cell-partitioned ``(cell, cand_id, codes)``).

    Codes persist SHIFTED by −128 as ``array<tinyint>`` (1-byte logical
    elements); search only ever uses code DIFFERENCES, which the shared
    shift cancels, so query-side codes use the same shift and the int64
    symmetric distances match the unshifted oracle arithmetic exactly.
    Search (:func:`query_sq_index`) returns those approximate distances
    — FAISS SQ semantics: no float re-rank is possible from the index
    alone, which is precisely its storage contract (re-ranking against
    the SOURCE embeddings table is :func:`query_sq_index_rerank`).

    ``closure_eps`` switches assignment to SPANN-style boundary
    replication (:func:`_assign_cells_closure`, round 14 — combined
    with the 1-byte codes and the float refine stage this is the
    deploy-grade config for a 100 TB corpus: replication repairs probe
    recall, SQ8 pays for it in storage, rerank removes the quantization
    error from the final order); query the same value's indexes with
    ``distinct_candidates=True`` so a replicated candidate scores
    once."""
    cents = S.train_ivf_centroids(
        emb_parquet_path, n_centroids=n_centroids, sample=sample, iters=iters
    )
    mins, maxs = S.train_sq_minmax(emb_parquet_path, sample=sample)
    V.commit_snapshot(
        spark.createDataFrame(
            [(int(c), list(v)) for c, v in cents], "cid int, embedding array<double>"
        ).coalesce(1),
        f"{index_path}/centroids",
    )
    V.commit_snapshot(
        spark.createDataFrame(
            [(list(mins), list(maxs))], "mins array<double>, maxs array<double>"
        ).coalesce(1),
        f"{index_path}/sq_bounds",
    )
    emb = spark.read.parquet(emb_parquet_path)
    # the assignment repartitions by cell and carries the embedding —
    # encode from it, then drop the floats (codes-only postings)
    raw = _assign(emb, cents, closure_eps)
    assigned = raw.withColumn("codes", _sq_codes((mins, maxs))).select(
        "cell", "cand_id", "codes"
    )
    V.commit_snapshot(
        assigned,
        f"{index_path}/postings",
        partition_by=["cell"],
        app_meta={"closure_eps": closure_eps, "sq_grid": _grid_meta(index_path)},
    )
    return cents, (mins, maxs)


def load_sq_bounds(spark: SparkSession, index_path: str):
    r = V.read_version(spark, f"{index_path}/sq_bounds").collect()[0]
    return tuple(float(v) for v in r.mins), tuple(float(v) for v in r.maxs)


def _sq_codes(minmax, emb_sql: str = "embedding"):
    """The stored-code Column for one embedding: sq_encode then the
    shared −128 shift to 1-byte ``array<tinyint>`` (module note on
    ``build_ivf_sq_index`` — distances only ever use code differences,
    which the shift cancels)."""
    enc = F.expr(S.sq_encode_sql(emb_sql, minmax))
    return F.transform(enc, lambda c: (c - 128).cast("byte"))


def append_to_sq_index(
    spark: SparkSession, df: DataFrame, index_path: str, *, closure_eps=_STORED
) -> int:
    """Add new vectors to the stored IVF-SQ8 index (round 14 — CRUD
    parity with the float index's :func:`append_to_index`): assign
    against the STORED centroids and encode against the STORED bounds
    (no retraining — FAISS's add() contract for a trained
    quantizer+SQ), then APPEND codes-only postings. Work ∝ increment;
    historical postings are never read (plan-pinned). The assignment
    rule defaults to the stored one like :func:`append_to_index`
    (round 15 ADVICE). Returns the postings table's new version."""
    cents = load_centroids(spark, index_path)
    minmax = load_sq_bounds(spark, index_path)
    eps = _resolve_eps(index_path, closure_eps)
    assigned = (
        _assign(df, cents, eps)
        .withColumn("codes", _sq_codes(minmax))
        .select("cell", "cand_id", "codes")
    )
    return V.commit_snapshot(
        assigned,
        f"{index_path}/postings",
        mode="append",
        partition_by=["cell"],
        app_meta={"closure_eps": eps, "sq_grid": _grid_meta(index_path)},
    )


def refresh_sq_index(
    spark: SparkSession,
    index_path: str,
    *,
    n_centroids: int | None = None,
    sample: int = 1024,
    iters: int = 5,
    closure_eps=_STORED,
):
    """Re-train the IVF-SQ8 index from its OWN live postings — the
    post-churn maintenance op completing SQ CRUD (round-13 verdict
    item 1), the sibling of :func:`refresh_index` for an index that
    stores no floats: live codes RECONSTRUCT deterministically through
    the SQ grid (:func:`similarity.sq_decode_sql` — code 0 → min, 255
    → max, pinned IEEE op order) and the reconstructed vectors are the
    retrain corpus, exactly FAISS's position that after quantization
    the codes ARE the data.

    Shape: dedup live postings on cand_id (append safety), decode
    against the STORED bounds, draw the bounded 'sqr'-tagged
    hash-sample distributed (``embedding_sample_df`` —
    TakeOrderedAndProject, O(sample·dim) to the driver), retrain BOTH
    models from that one sample — per-dimension min/max under
    ``train_sq_minmax``'s law (round 12 decimals, degenerate widen) and
    centroids under the shared seed-free Lloyd core — then re-assign
    and re-encode every reconstructed vector in one distributed pass.
    Commits metadata first (centroids, sq_bounds) and postings LAST,
    the refresh_index order, so a postings-version cache guard can
    never read a half-refresh as complete. The op is DETERMINISTIC from
    the index state (same codes + same bounds → bit-identical new
    models and postings, pinned in tests/test_ann_index.py); unlike the
    float refresh a crash-then-rerun is NOT bit-identical to the
    uncrashed outcome — the rerun decodes the still-old codes through
    whatever bounds are current — but it always restores a CONSISTENT
    index (codes, bounds and centroids from one retrain), which is the
    recovery contract; guards should validate all three tables'
    versions (the q_ivf_refresh_topk discipline). Returns
    ``(centroids, (mins, maxs))`` like :func:`build_ivf_sq_index`.

    Quantized distances CHANGE across a refresh by design (new grid,
    new geometry) — unlike the float index there is no full-probe
    invariance to pin; the pinned laws are state-determinism, posting
    uniqueness, and deleted ids staying gone."""
    import numpy as np

    posts = f"{index_path}/postings"
    stored = V.read_version(spark, posts)
    if "codes" not in stored.columns:
        raise ValueError(
            "refresh_sq_index needs codes-only SQ postings; "
            "a float IVF index refreshes via refresh_index"
        )
    old_minmax = load_sq_bounds(spark, index_path)
    old_cents = load_centroids(spark, index_path)
    eps = _resolve_eps(index_path, closure_eps)
    k = n_centroids if n_centroids is not None else len(old_cents)

    from avro_diff_spark.functions.fit import embedding_sample_df

    dec = F.expr(
        S.sq_decode_sql("transform(codes, c -> CAST(c AS INT) + 128)", old_minmax)
    )
    live = (
        stored.select("cand_id", "codes")
        .dropDuplicates(["cand_id"])
        .select("cand_id", dec.alias("embedding"))
    )
    x = embedding_sample_df(live, "sqr", sample)
    mins = np.round(x.min(axis=0), 12)
    maxs = np.round(x.max(axis=0), 12)
    maxs = np.where(maxs > mins, maxs, mins + 1.0)
    minmax = (
        tuple(float(v) for v in mins),
        tuple(float(v) for v in maxs),
    )
    cents = S._lloyd_cosine(x, k, iters)

    vecs = live.select(F.col("cand_id").alias("vec_id"), "embedding")
    reassigned = (
        _assign(vecs, cents, eps)
        .withColumn("codes", _sq_codes(minmax))
        .select("cell", "cand_id", "codes")
    )
    V.commit_snapshot(
        spark.createDataFrame(
            [(int(c), list(v)) for c, v in cents], "cid int, embedding array<double>"
        ).coalesce(1),
        f"{index_path}/centroids",
    )
    V.commit_snapshot(
        spark.createDataFrame(
            [(list(minmax[0]), list(minmax[1]))],
            "mins array<double>, maxs array<double>",
        ).coalesce(1),
        f"{index_path}/sq_bounds",
    )
    # postings LAST, stamped with the grid versions the codes were just
    # encoded against — check_sq_index validates this token at query time
    # (round 15 ADVICE: the crash window between these commits used to
    # score old codes against the new grid silently)
    V.commit_snapshot(
        reassigned,
        posts,
        partition_by=["cell"],
        app_meta={"closure_eps": eps, "sq_grid": _grid_meta(index_path)},
    )
    return cents, minmax


def query_sq_index(
    spark: SparkSession,
    queries: DataFrame,
    index_path: str,
    *,
    k: int = 5,
    probes: int = 2,
    distinct_candidates: bool = False,
) -> DataFrame:
    """IVF-SQ8 top-k against the STORED code-only index: each query
    fans out to its ``probes`` nearest cells (same stored-centroid
    routing as :func:`query_index`), candidates score by the symmetric
    int64 code distance Σ(c−q)² — pure integer arithmetic, so results
    are bit-exact on any engine and any partitioning — and rank by
    (distance ASC, cand_id ASC). Returns (query_id, cand_id, rank,
    dist); distances are the quantized approximation, FAISS SQ
    semantics (module note on ``build_ivf_sq_index``).
    ``distinct_candidates=True`` dedups (query, candidate, dist) rows
    before ranking — required over a closure-assigned index, where a
    border candidate lives in several probed cells; replicas carry
    identical codes hence identical distances, so the distinct is
    exact (the :func:`query_index` rule).

    Validates the grid token first (:func:`check_sq_index`, round 15
    ADVICE): postings encoded against a superseded grid — the
    refresh-crash window — raise instead of silently scoring old codes
    on the new bounds."""
    check_sq_index(spark, index_path)
    cents = load_centroids(spark, index_path)
    minmax = load_sq_bounds(spark, index_path)
    ranking = S._centroid_ranking(sorted((int(c), list(v)) for c, v in cents))
    qcodes = _sq_codes(minmax)
    q = (
        queries.select(
            F.col("vec_id").alias("query_id"),
            qcodes.alias("qcodes"),
            F.col("embedding").alias("q_emb"),
            S._dec_norm(F.col("embedding")).alias("q_norm"),
        )
        .select(
            "query_id",
            "qcodes",
            F.explode_outer(
                F.transform(
                    F.slice(ranking(F.col("q_emb"), F.col("q_norm")), 1, probes),
                    lambda s: s.getField("cid"),
                )
            ).alias("cell"),
        )
        .where(F.col("cell").isNotNull())
    )
    post = V.read_version(spark, f"{index_path}/postings")
    dist = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("qcodes"),
            lambda c, qc: ((c.cast("int") - qc.cast("int"))
                           * (c.cast("int") - qc.cast("int"))).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )
    scored = (
        F.broadcast(q)
        .join(post, "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", dist.alias("dist"))
    )
    if distinct_candidates:
        scored = scored.distinct()
    return S._topk_per_query(
        scored,
        k,
        [F.asc("dist"), F.asc("cand_id")],
        ["query_id", "cand_id", "rank", "dist"],
    )


def query_sq_index_rerank(
    spark: SparkSession,
    queries: DataFrame,
    index_path: str,
    embeddings: DataFrame,
    *,
    k: int = 5,
    probes: int = 2,
    shortlist: int | None = None,
    distinct_candidates: bool = False,
) -> DataFrame:
    """IVF-SQ8 search with a FLOAT re-rank stage (round-13 verdict item
    5 — the FAISS ``IndexRefineFlat`` idiom): the quantized scan
    shortlists ``shortlist`` (default 4·k) candidates per query by the
    int64 code distance, then ONE cand_id equi-join back to the
    ``embeddings`` table re-scores just those rows with the EXACT
    fixed-point cosine the float index uses, and the final top-k ranks
    by (cosine DESC, cand_id ASC) — quantization error decides only who
    makes the shortlist, never the final order. Returns (query_id,
    cand_id, rank, cosine), the :func:`query_index` contract.

    Scale shape: the shortlist is queries·shortlist rows — broadcast to
    the embeddings scan, so the re-rank reads the big table once
    through a broadcast semi-join (no shuffle of the corpus) and exact
    cosine runs on k' rows per query, not the cell population. Recall
    improvement over the pure code-distance ranking at equal probes is
    pinned in tests/test_ann_index.py."""
    shortlist = shortlist if shortlist is not None else 4 * k
    if shortlist < k:
        raise ValueError(f"shortlist {shortlist} must be >= k {k}")
    short = query_sq_index(
        spark,
        queries,
        index_path,
        k=shortlist,
        probes=probes,
        distinct_candidates=distinct_candidates,
    ).select("query_id", "cand_id")
    cand = embeddings.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        S._dec_norm(F.col("embedding")).alias("c_norm"),
    )
    qe = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        S._dec_norm(F.col("embedding")).alias("q_norm"),
    )
    dot = S._fixed_dot(F.col("q_emb"), F.col("c_emb"))
    cos = F.try_divide(dot, F.col("q_norm") * F.col("c_norm"))
    scored = (
        cand.join(F.broadcast(short), "cand_id")
        .join(F.broadcast(qe), "query_id")
        .select("query_id", "cand_id", cos.alias("cosine"))
    )
    return S.topk_per_query(scored, k)


def build_ivfpq_index(
    spark: SparkSession,
    emb_parquet_path: str,
    index_path: str,
    *,
    n_centroids: int = 16,
    m: int = 16,
    ksub: int = 16,
    sample: int = 1024,
    iters: int = 5,
    opq_iters: int = 4,
):
    """FAISS ``OPQ..,IVF..,PQ..``-shape index PERSISTED (round 15 —
    completing the stored-index matrix: float, SQ8, and now PQ codes):
    the OPQ rotation, rotated-space coarse centroids and per-subspace
    codebooks live as bounded metadata tables; postings store ONLY the
    ``m`` int codes per vector (``m`` bytes of information per vector —
    the deepest compression tier, 16 B vs SQ8's 64 B vs float's 256 B
    at dim 64), cell-partitioned like every index here. This is exactly
    the materialization :func:`similarity.ivfpq_topk(rotation=...)`
    performs per query, paid ONCE at build — the right shape for a
    100 TB corpus.

    Four versioned tables under ``index_path``: ``rotation`` (one row),
    ``centroids``, ``codebooks`` ((j, c, vec) rows) and ``postings``
    ((cell, cand_id, codes)); the postings commit carries a ``pq_grid``
    token tying it to the model-table versions (:func:`check_pq_index`,
    the SQ discipline). Returns ``(rotation, centroids, codebooks)``."""
    rot, books = S.train_opq(
        emb_parquet_path, m=m, ksub=ksub, sample=sample, iters=iters,
        opq_iters=opq_iters,
    )
    cents = S.train_ivf_centroids_rotated(
        emb_parquet_path, rot, n_centroids=n_centroids, sample=sample,
        iters=iters,
    )
    V.commit_snapshot(
        spark.createDataFrame(
            [(list(list(r) for r in rot),)], "rows array<array<double>>"
        ).coalesce(1),
        f"{index_path}/rotation",
    )
    V.commit_snapshot(
        spark.createDataFrame(
            [(int(c), list(v)) for c, v in cents], "cid int, embedding array<double>"
        ).coalesce(1),
        f"{index_path}/centroids",
    )
    V.commit_snapshot(
        spark.createDataFrame(
            [(j, c, list(books[j][c])) for j in range(m) for c in range(ksub)],
            "j int, c int, vec array<double>",
        ).coalesce(1),
        f"{index_path}/codebooks",
    )
    emb = spark.read.parquet(emb_parquet_path)
    V.commit_snapshot(
        _pq_assign_encode(emb, rot, cents, books),
        f"{index_path}/postings",
        partition_by=["cell"],
        app_meta={"pq_grid": _pq_grid_meta(index_path)},
    )
    return rot, cents, books


def _pq_assign_encode(df: DataFrame, rot, cents, books) -> DataFrame:
    """(cell, cand_id, codes) — rotate (fixed-point law), assign to the
    nearest rotated-space centroid, PQ-encode the rotated vector. The
    rotated column is materialized once (localCheckpoint) before the
    280+ downstream references — the ivfpq_topk staging note; here the
    cost is amortized over the index's lifetime."""
    ranking = S._centroid_ranking(sorted((int(c), list(v)) for c, v in cents))
    rotated = (
        spread_small(df)
        .select(
            F.col("vec_id").alias("cand_id"),
            F.expr(S.opq_rotate_sql("embedding", rot)).alias("__s"),
        )
        .localCheckpoint()
        .select("*", S._dec_norm(F.col("__s")).alias("__s_norm"))
    )
    return (
        rotated.select(
            "cand_id",
            "__s",
            F.element_at(ranking(F.col("__s"), F.col("__s_norm")), 1)
            .getField("cid")
            .alias("cell"),
        )
        .select("cell", "cand_id", S.pq_encode("__s", books).alias("codes"))
        .repartition("cell")  # the optimized-write rule (_assign_cells)
    )


def _pq_grid_meta(index_path: str) -> dict:
    return {
        "rotation_v": V.latest_version(f"{index_path}/rotation"),
        "centroids_v": V.latest_version(f"{index_path}/centroids"),
        "codebooks_v": V.latest_version(f"{index_path}/codebooks"),
    }


def check_pq_index(spark: SparkSession, index_path: str) -> None:
    """The :func:`check_sq_index` discipline for the PQ index: postings
    must have been encoded against the CURRENT rotation/centroids/
    codebooks versions; a model table superseded without a matching
    postings commit raises instead of silently decoding old codes
    against new models. Unstamped (pre-round-15) indexes pass."""
    stamped = V.latest_app_meta(f"{index_path}/postings", "pq_grid").get("pq_grid")
    if stamped is None:
        return
    live = _pq_grid_meta(index_path)
    if stamped != live:
        raise ValueError(
            f"OPQ-IVFPQ index at {index_path} is inconsistent: postings "
            f"were encoded against model versions {stamped} but the live "
            f"tables are at {live} — rebuild or re-encode before querying"
        )


def load_pq_model(spark: SparkSession, index_path: str):
    """(rotation, centroids, codebooks) from the metadata tables —
    bounded reads (dim + n_centroids + m·ksub rows)."""
    rrow = V.read_version(spark, f"{index_path}/rotation").collect()[0]
    rot = tuple(tuple(float(v) for v in row) for row in rrow.rows)
    cents = load_centroids(spark, index_path)
    brows = V.read_version(spark, f"{index_path}/codebooks").collect()
    mm = max(r.j for r in brows) + 1
    kk = max(r.c for r in brows) + 1
    books: list[list] = [[None] * kk for _ in range(mm)]
    for r in brows:
        books[r.j][r.c] = tuple(float(v) for v in r.vec)
    return rot, cents, tuple(tuple(b) for b in books)


def append_to_pq_index(spark: SparkSession, df: DataFrame, index_path: str) -> int:
    """Add new vectors to the stored OPQ-IVFPQ index: rotate/assign/
    encode against the STORED models (no retraining — FAISS's add()
    contract), append codes-only postings. Work ∝ increment. Returns
    the postings table's new version."""
    rot, cents, books = load_pq_model(spark, index_path)
    return V.commit_snapshot(
        _pq_assign_encode(df, rot, cents, books),
        f"{index_path}/postings",
        mode="append",
        partition_by=["cell"],
        app_meta={"pq_grid": _pq_grid_meta(index_path)},
    )


def query_pq_index(
    spark: SparkSession,
    queries: DataFrame,
    index_path: str,
    *,
    k: int = 5,
    probes: int = 2,
) -> DataFrame:
    """ADC top-k against the STORED code-only OPQ-IVFPQ index: each
    query rotates through the stored rotation, builds its per-subspace
    lookup table once, fans out to its ``probes`` nearest rotated-space
    cells, and candidates score by the int64 ADC sum Σ_j lut[j][code_j]
    — engine-portable fixed-point, ranked two-level by (approx DESC,
    cand_id ASC). Returns (query_id, cand_id, rank, approx); like the
    SQ index, the codes alone admit no exact re-rank —
    :func:`query_pq_index_rerank` refines against the source
    embeddings. Validates the ``pq_grid`` token first."""
    check_pq_index(spark, index_path)
    rot, cents, books = load_pq_model(spark, index_path)
    ranking = S._centroid_ranking(sorted((int(c), list(v)) for c, v in cents))
    q = (
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.expr(S.opq_rotate_sql("embedding", rot)).alias("__sq"),
        )
        .localCheckpoint()  # queries are small by contract; the LUT and
        # cell ranking reference the rotated vector ~290x (staging note)
        .select("*", S._dec_norm(F.col("__sq")).alias("__sq_norm"))
        .select(
            "query_id",
            F.expr(S.pq_adc_lut_sql("__sq", books)).alias("lut"),
            F.explode_outer(
                F.transform(
                    F.slice(ranking(F.col("__sq"), F.col("__sq_norm")), 1, probes),
                    lambda s_: s_.getField("cid"),
                )
            ).alias("cell"),
        )
        .where(F.col("cell").isNotNull())
    )
    post = V.read_version(spark, f"{index_path}/postings")
    approx = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("lut"),
            lambda code, row: F.element_at(row, code + 1),
        ),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )
    scored = (
        F.broadcast(q)
        .join(post, "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", approx.alias("approx"))
    )
    return S._topk_per_query(
        scored,
        k,
        [F.col("approx").desc(), F.col("cand_id").asc()],
        ["query_id", "cand_id", "rank", "approx"],
    )


def query_pq_index_rerank(
    spark: SparkSession,
    queries: DataFrame,
    index_path: str,
    embeddings: DataFrame,
    *,
    k: int = 5,
    probes: int = 2,
    shortlist: int | None = None,
) -> DataFrame:
    """OPQ-IVFPQ search with the FLOAT re-rank stage (the
    :func:`query_sq_index_rerank` idiom): ADC shortlists ``shortlist``
    (default 10·k) candidates per query, then ONE broadcast cand_id
    equi-join back to the ``embeddings`` table re-scores them with the
    exact fixed-point cosine — quantization and rotation decide only
    who makes the shortlist. Returns (query_id, cand_id, rank, cosine)
    — pinned exactly equal to the in-memory
    :func:`similarity.ivfpq_topk(rotation=...)` over the same models in
    tests/test_ann_index.py."""
    shortlist = shortlist if shortlist is not None else 10 * k
    if shortlist < k:
        raise ValueError(f"shortlist {shortlist} must be >= k {k}")
    short = query_pq_index(
        spark, queries, index_path, k=shortlist, probes=probes
    ).select("query_id", "cand_id")
    cand = embeddings.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        S._dec_norm(F.col("embedding")).alias("c_norm"),
    )
    qe = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        S._dec_norm(F.col("embedding")).alias("q_norm"),
    )
    dot = S._fixed_dot(F.col("q_emb"), F.col("c_emb"))
    cos = F.try_divide(dot, F.col("q_norm") * F.col("c_norm"))
    scored = (
        cand.join(F.broadcast(short), "cand_id")
        .join(F.broadcast(qe), "query_id")
        .select("query_id", "cand_id", cos.alias("cosine"))
    )
    return S.topk_per_query(scored, k)


def refresh_index(
    spark: SparkSession,
    index_path: str,
    *,
    n_centroids: int | None = None,
    sample: int = 1024,
    iters: int = 5,
    closure_eps=_STORED,
):
    """Re-train the coarse quantizer from the index's OWN live postings
    and re-balance the cells — the post-churn maintenance op (round-12
    verdict item 4): after heavy deletes/appends the stored centroids
    drift away from the live distribution, cells go lopsided, and probe
    recall decays; FAISS's answer is retrain-and-rebuild, and this is
    that operation expressed against the versioned index.

    Shape: live postings are first deduped on ``cand_id`` (a
    closure-assigned index replicates border vectors into several
    cells; the replicas carry IDENTICAL embeddings, so any single row
    represents the vector — without the dedup the Lloyd sample could
    double-weight border vectors and the re-assignment would emit
    duplicate ``(cell, cand_id)`` rows that double-count ranks in
    ``query_index``; round-13 ADVICE). The training sample is then
    selected DISTRIBUTED from those live vectors (deletion vectors
    already applied by ``read_version``) — the ``sample`` lowest
    (hash32('ivfr:' + cand_id), cand_id) rows, TakeOrderedAndProject
    (functions/fit.py ``embedding_sample_df``), so only O(sample·dim)
    values reach the driver for the seed-free Lloyd core
    (:func:`similarity._lloyd_cosine`, the exact trainer
    ``build_ivf_index`` uses). Every live vector then re-assigns to the
    new centroids in one distributed pass — ``closure_eps`` defaults to
    the index's STORED assignment rule (round 15 —
    ``stored_closure_eps``), so a SPANN-closure index keeps its boundary
    replication; pass an explicit value/None to change the rule — and
    BOTH tables commit as REPLACE snapshots,
    CENTROIDS FIRST (round-13 ADVICE: cache guards that key on the
    postings version see the final postings commit only after its
    matching centroids exist, so a crash between the commits can never
    read as a completed refresh). A crash between the two commits
    leaves probes routing by the new centroids over the old cell
    assignment; the recovery is simply re-running the refresh, which is
    IDEMPOTENT (the live id set is unchanged by a refresh, so the
    deterministic sample, the centroids, and the assignment all
    reproduce bit-identically).

    ``closure_eps`` defaults to the index's STORED assignment rule
    (round 15 — ``stored_closure_eps``): a SPANN-closure index keeps
    its boundary replication across refreshes without the caller
    re-supplying eps; pass an explicit value/None to change the rule.

    A codes-only IVF-SQ8 index stores no embeddings and cannot retrain
    from its own postings this way — :func:`refresh_sq_index` is its
    maintenance op; passing one here raises.

    Invariants pinned in tests/test_ann_index.py: (a) full-probe
    queries (probes = n_centroids) return IDENTICAL results before and
    after a refresh on unchanged data — probing every cell is exact
    cosine top-k, independent of cell geometry — and (b) the refreshed
    stored index stays exactly equal to the in-memory
    :func:`similarity.ivf_topk` under the refreshed centroids (the
    index's standing exactness contract). Returns the new centroids.
    """
    posts = f"{index_path}/postings"
    stored = V.read_version(spark, posts)
    if "embedding" not in stored.columns:
        raise ValueError(
            "refresh_index needs float postings with an 'embedding' column; "
            "a codes-only IVF-SQ8 index refreshes via refresh_sq_index"
        )
    # one row per live vector: closure replicas are identical, so any one
    # survives the dedup with the vector's exact embedding
    live = stored.select("cand_id", "embedding").dropDuplicates(["cand_id"])
    old = load_centroids(spark, index_path)
    k = n_centroids if n_centroids is not None else len(old)

    from avro_diff_spark.functions.fit import embedding_sample_df

    x = embedding_sample_df(live, "ivfr", sample)
    cents = S._lloyd_cosine(x, k, iters)
    eps = _resolve_eps(index_path, closure_eps)

    vecs = live.select(F.col("cand_id").alias("vec_id"), "embedding")
    reassigned = _assign(vecs, cents, eps)
    V.commit_snapshot(
        spark.createDataFrame(
            [(int(c), list(v)) for c, v in cents], "cid int, embedding array<double>"
        ).coalesce(1),
        f"{index_path}/centroids",
    )
    V.commit_snapshot(
        reassigned,
        posts,
        partition_by=["cell"],
        app_meta={"closure_eps": eps},
    )
    return cents


def maintain_index_stream(
    stream_df: DataFrame,
    index_path: str,
    *,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Stream new vectors into the stored index: each micro-batch is
    assigned against the STORED centroids (a pure Column transform over
    the stream — no state, no retraining) and lands as one exactly-once
    APPEND commit on the postings table via
    :func:`versioned.commit_stream`'s txn idempotence. The assignment
    rule is the index's stored one (round 15 — closure indexes keep
    replicating border vectors on the stream path too). The streaming
    sibling of :func:`append_to_index`; pinned batch-equivalent in
    tests/test_ann_index.py."""
    cents = load_centroids(stream_df.sparkSession, index_path)
    eps = stored_closure_eps(index_path)
    assigned = _assign(
        stream_df.select(F.col("vec_id"), F.col("embedding")),
        cents,
        eps,
        spread=False,
    )
    return V.commit_stream(
        assigned,
        f"{index_path}/postings",
        checkpoint=checkpoint,
        partition_by=["cell"],
        trigger_available_now=trigger_available_now,
    )


def maintain_sq_index_stream(
    stream_df: DataFrame,
    index_path: str,
    *,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Stream new vectors into the stored IVF-SQ8 index (round 15 —
    round-14 verdict item 4: the codes-only index is the config a
    100 TB deployment actually runs, and it only had batch appends):
    each micro-batch assigns against the STORED centroids under the
    STORED assignment rule, encodes 1-byte codes against the STORED
    bounds — all pure Column transforms, no state, no retraining — and
    lands as one exactly-once APPEND commit via
    :func:`versioned.commit_stream`'s txn idempotence, stamped with the
    same grid token batch appends carry so :func:`check_sq_index` keeps
    validating across stream commits. The streaming sibling of
    :func:`append_to_sq_index`; pinned batch-equivalent in
    tests/test_ann_index.py."""
    cents = load_centroids(stream_df.sparkSession, index_path)
    minmax = load_sq_bounds(stream_df.sparkSession, index_path)
    eps = stored_closure_eps(index_path)
    assigned = (
        _assign(
            stream_df.select(F.col("vec_id"), F.col("embedding")),
            cents,
            eps,
            spread=False,
        )
        .withColumn("codes", _sq_codes(minmax))
        .select("cell", "cand_id", "codes")
    )
    return V.commit_stream(
        assigned,
        f"{index_path}/postings",
        checkpoint=checkpoint,
        partition_by=["cell"],
        app_meta={"closure_eps": eps, "sq_grid": _grid_meta(index_path)},
        trigger_available_now=trigger_available_now,
    )


def query_index(
    spark: SparkSession,
    queries: DataFrame,
    index_path: str,
    *,
    k: int = 5,
    probes: int = 2,
    distinct_candidates: bool = False,
) -> DataFrame:
    """IVF top-k against the STORED index — same output contract as
    :func:`similarity.ivf_topk` (rank by cosine desc, cand_id asc),
    pinned exactly equal. Each query fans out to its ``probes`` nearest
    cells; the postings read filters on the literal cell ids, and
    because read_version reattaches each partition's cell as a literal,
    Catalyst folds non-probed partitions' scans away — the probe touches
    only its cells' files. ``distinct_candidates=True`` dedups
    (query, candidate) pairs before ranking — required over a
    closure-assigned index (``build_ivf_index(closure_eps=...)``), where
    a border candidate lives in several probed cells; the duplicate rows
    carry identical cosines, so the distinct is exact."""
    cents = load_centroids(spark, index_path)
    ranking = S._centroid_ranking(sorted((int(c), list(v)) for c, v in cents))
    q = (
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            S._dec_norm(F.col("embedding")).alias("q_norm"),
        )
        .select(
            "query_id",
            "q_emb",
            "q_norm",
            F.explode_outer(
                F.transform(
                    F.slice(ranking(F.col("q_emb"), F.col("q_norm")), 1, probes),
                    lambda s: s.getField("cid"),
                )
            ).alias("cell"),
        )
        .where(F.col("cell").isNotNull())
    )
    post = V.read_version(spark, f"{index_path}/postings").select(
        "cell",
        "cand_id",
        F.col("embedding").alias("c_emb"),
        S._dec_norm(F.col("embedding")).alias("c_norm"),
    )
    dot = S._fixed_dot(F.col("q_emb"), F.col("c_emb"))
    cos = F.try_divide(dot, F.col("q_norm") * F.col("c_norm"))
    scored = (
        F.broadcast(q)
        .join(post, "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", cos.alias("cosine"))
    )
    if distinct_candidates:
        scored = scored.distinct()
    return S.topk_per_query(scored, k)
