"""Incremental near-duplicate index: the MinHash/LSH bucket table
persisted as a VERSIONED TABLE, so a daily increment probes the stored
buckets instead of recomputing the full-corpus MinHash index per run —
the shape every production dedup pipeline converges on (a 1% daily
increment costs 1% signature work + one bucket equi-join, not a full
rescan of 100 TB of history).

Composition, not new machinery: the banding is byte-for-byte
``operators/dedup.py``'s (:func:`dedup.band_rows` — the factored banding
step of the batch pipeline), the storage is ``sources/versioned.py``
(append commits, optimistic concurrency, checkpoints, time travel all
apply to the index itself), and verification is the same exact-Jaccard
``_verify_pairs``. The index stores everything probing needs — per-doc
``(band_id, band_key)`` bucket rows plus the per-doc distinct shingle
hashes for verification — so the HISTORICAL CORPUS IS NEVER READ on the
incremental path (pytest-pinned by deleting the corpus before probing).

``near_dedup_stream`` (streaming/) holds the unbounded-stream half of
this shape; this module is its replayable batch/lakehouse counterpart.

No reference parity: yuana97/Avro_Diff has no dedup surface (SURVEY.md
§2); beyond-reference LLM-pipeline tier (round-8 brief item 6).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from avro_diff_spark.operators import dedup as DD
from avro_diff_spark.sources.versioned import (
    commit_app_meta,
    commit_snapshot,
    latest_version,
    read_version,
)

__all__ = [
    "build_neardup_index",
    "probe_neardup_index",
    "probe_neardup_index_stream",
    "delete_from_neardup_index",
    "index_params",
]


def _buckets_path(index_path: str) -> str:
    return os.path.join(index_path, "buckets")


def _shingles_path(index_path: str) -> str:
    return os.path.join(index_path, "shingles")


def index_params(index_path: str) -> dict:
    """The MinHash parameters the index was built with (recorded in the
    bucket table's commit metadata) — probes replay them so signature
    functions can never drift between build and probe."""
    meta = commit_app_meta(_buckets_path(index_path), 0)
    if not meta:
        raise ValueError(f"no near-dup index at {index_path!r}")
    return meta


def _derive(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n_hashes: int,
    bands: int,
    shingle_k: int,
) -> tuple[DataFrame, DataFrame]:
    """(bucket rows, shingle rows) for a document frame — the exact
    banding + shingle pipeline the batch ``minhash_near_dups`` runs."""
    doc_sh = DD._doc_shingles(df, text_col, id_col, shingle_k)
    sigs = DD._signatures_from_sh(doc_sh, n_hashes)
    banded = DD.band_rows(sigs, bands=bands, rows_per_band=n_hashes // bands)
    return banded, doc_sh


def build_neardup_index(
    spark: SparkSession,
    df: DataFrame,
    text_col: str,
    id_col: str,
    index_path: str,
    *,
    n_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
) -> int:
    """Create the index over an initial corpus: two versioned tables
    under ``index_path`` — ``buckets`` (doc_id, band_id, band_key) and
    ``shingles`` (doc_id, sh) — with the MinHash parameters recorded as
    commit metadata. One distributed pass over the corpus (the same
    signature work a single batch dedup run pays), then the corpus is
    never needed again. Returns the bucket table's version (0)."""
    if latest_version(_buckets_path(index_path)) >= 0:
        raise ValueError(f"near-dup index already exists at {index_path!r}")
    meta = {"n_hashes": n_hashes, "bands": bands, "shingle_k": shingle_k}
    banded, doc_sh = _derive(
        df, text_col, id_col, n_hashes=n_hashes, bands=bands, shingle_k=shingle_k
    )
    v = commit_snapshot(banded, _buckets_path(index_path), app_meta=meta)
    commit_snapshot(doc_sh, _shingles_path(index_path), app_meta=meta)
    return v


def _probe_frames(
    spark: SparkSession,
    inc_banded: DataFrame,
    inc_sh: DataFrame,
    index_path: str,
    threshold: float,
) -> DataFrame:
    """The shared probe: increment bucket rows joined against (stored ∪
    increment) buckets, ordered-pair dedup, exact-Jaccard verify.
    Shingles dedupe on doc_id so a REPLAYED batch whose rows already
    landed in the index (streaming crash recovery) cannot double-join —
    the per-doc rows are deterministic, so the pick is value-stable."""
    idx_banded = read_version(spark, _buckets_path(index_path))
    idx_sh = read_version(spark, _shingles_path(index_path))
    all_banded = idx_banded.unionByName(inc_banded)
    left = all_banded.select("band_id", "band_key", F.col("doc_id").alias("__l"))
    right = inc_banded.select("band_id", "band_key", F.col("doc_id").alias("__r"))
    cands = (
        left.join(right, ["band_id", "band_key"])
        .where(F.col("__l") != F.col("__r"))
        .select(
            F.least("__l", "__r").alias("doc_a"),
            F.greatest("__l", "__r").alias("doc_b"),
        )
        .distinct()
    )
    doc_sh = idx_sh.unionByName(inc_sh).dropDuplicates(["doc_id"])
    return DD._verify_pairs(cands, doc_sh, threshold)


def delete_from_neardup_index(
    spark: SparkSession,
    index_path: str,
    doc_ids: "list[int] | DataFrame",
    *,
    id_col: str = "doc_id",
) -> int:
    """Remove documents from the stored LSH index (round 12 — CRUD
    parity with the text/IVF indexes): one merge-on-read deletion-
    vector commit per table (buckets + shingles), identified by
    predicate for literal id lists or broadcast semi-join for DataFrame
    id sets (never collected). The parameter commit (v0 app_meta) is
    untouched, so ``index_params`` and every later probe replay the
    same signature functions. Probing after a delete equals probing an
    index built on the survivors (pytest-pinned). Unknown ids are
    no-ops. Returns the bucket table's version."""
    from avro_diff_spark.sources.versioned import delete_where

    paths = (_buckets_path(index_path), _shingles_path(index_path))
    if isinstance(doc_ids, DataFrame):
        keys = doc_ids.select(F.col(id_col).alias("doc_id")).distinct()
        for p in paths:
            delete_where(spark, p, keys=keys, on=["doc_id"])
    else:
        ids = sorted({int(i) for i in doc_ids})
        if not ids:
            return latest_version(paths[0])
        for p in paths:
            delete_where(spark, p, F.col("doc_id").isin(ids))
    return latest_version(paths[0])


def probe_neardup_index(
    spark: SparkSession,
    increment: DataFrame,
    text_col: str,
    id_col: str,
    index_path: str,
    *,
    threshold: float = 0.5,
    append: bool = True,
) -> DataFrame:
    """Near-dup pairs INVOLVING the increment — (doc_a, doc_b, n_a, n_b,
    n_common, jaccard), ``doc_a < doc_b``, exactly the rows a full
    ``minhash_near_dups`` recompute over (corpus ∪ increment) emits
    restricted to pairs touching an increment doc (pytest-pinned
    equality): banding collision is a pure per-doc function of the text,
    so probing stored buckets is lossless, not approximate.

    Scale shape: signature work ∝ increment only; ONE equi-join of the
    increment's bucket rows against the stored bucket table on
    (band_id, band_key) — index-side rows that collide with nothing are
    filtered by the join itself (AQE picks broadcast when the increment
    is small); exact-Jaccard verification joins shingles from the stored
    shingle table ∪ the increment. The historical corpus is never read.

    ``append=True`` commits the increment's bucket and shingle rows as
    APPEND commits (optimistic-concurrency rebase applies), so the next
    increment probes against the grown index. The probe result is
    computed BEFORE the append and is unaffected by it."""
    params = index_params(index_path)
    inc_banded, inc_sh = _derive(
        increment,
        text_col,
        id_col,
        n_hashes=int(params["n_hashes"]),
        bands=int(params["bands"]),
        shingle_k=int(params["shingle_k"]),
    )
    pairs = _probe_frames(spark, inc_banded, inc_sh, index_path, threshold)
    if append:
        # safe to grow the index after building the probe plan:
        # read_version pins its file list at construction, so the
        # returned frame reads the PRE-append snapshot even if executed
        # after these commits land
        commit_snapshot(inc_banded, _buckets_path(index_path), mode="append")
        commit_snapshot(inc_sh, _shingles_path(index_path), mode="append")
    return pairs


def probe_neardup_index_stream(
    stream_df: DataFrame,
    text_col: str,
    id_col: str,
    index_path: str,
    pairs_path: str,
    *,
    checkpoint: str,
    threshold: float = 0.5,
    trigger_available_now: bool = True,
):
    """The streaming half of the incremental index — the composition the
    round-7 review named: the LSH bucket table MAINTAINED BY a stream.
    Each micro-batch (a) probes the current index for near-dup pairs
    involving the batch, (b) appends the verified pairs to a versioned
    ``pairs_path`` table, and (c) appends the batch's bucket and shingle
    rows to the index — all three as APPEND commits carrying the
    (app, epoch) txn id, deduped per table via
    :func:`versioned.last_committed_epoch` on replay.

    Crash recovery is exactly-once by construction, in ANY interleaving:
    a replayed batch whose rows already landed in the index probes
    against an index that contains itself — candidates dedupe on the
    ordered pair and shingles dedupe on doc_id, so the recomputed pair
    set is identical — and each table's epoch guard skips the commits
    that already landed. Returns the started StreamingQuery
    (AvailableNow by default)."""
    from avro_diff_spark.sources import versioned as V

    app_id = os.path.abspath(checkpoint)

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        params = index_params(index_path)
        inc_banded, inc_sh = _derive(
            batch_df,
            text_col,
            id_col,
            n_hashes=int(params["n_hashes"]),
            bands=int(params["bands"]),
            shingle_k=int(params["shingle_k"]),
        )
        pairs = _probe_frames(spark, inc_banded, inc_sh, index_path, threshold)
        txn = (app_id, epoch_id)
        if V.last_committed_epoch(pairs_path, app_id) < epoch_id:
            commit_snapshot(pairs, pairs_path, mode="append", txn=txn)
        if V.last_committed_epoch(_buckets_path(index_path), app_id) < epoch_id:
            commit_snapshot(inc_banded, _buckets_path(index_path), mode="append", txn=txn)
        if V.last_committed_epoch(_shingles_path(index_path), app_id) < epoch_id:
            commit_snapshot(inc_sh, _shingles_path(index_path), mode="append", txn=txn)

    writer = stream_df.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
