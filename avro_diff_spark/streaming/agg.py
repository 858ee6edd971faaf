"""Streaming materialized-view maintenance: keep a count/sum aggregate
table continuously up to date from a versioned table's CHANGE FEED — the
Delta Live Tables / `foreachBatch`-MERGE pattern built entirely on the
engine's own primitives: :func:`stream_changes` delivers each commit's
insert/delete/update rows, every micro-batch folds its per-group delta
into the destination with one full-outer equi-join, and the applied
source version rides the destination commit's metadata so a replayed
batch is a no-op (the same exactly-once idiom ``commit_stream`` and
``refresh_agg_table`` use).

Scale shape: per batch, work ∝ changed rows (the CDF slice) plus the
group-cardinality rewrite — never a source rescan; the destination is
itself a versioned table, so downstream readers time-travel and diff it.

No reference parity: yuana97/Avro_Diff has no streaming surface
(SURVEY.md §2); beyond-reference tier.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from avro_diff_spark.sources.versioned import (
    _merge_agg_delta,
    commit_snapshot,
    latest_app_meta,
    latest_version,
)
from avro_diff_spark.streaming.table_source import stream_changes

__all__ = [
    "maintain_agg_stream",
    "maintain_hll_stream",
    "maintain_countmin_stream",
    "maintain_bloom_stream",
    "maintain_digest_stream",
    "maintain_drift_stream",
    "maintain_join_view_stream",
]


def _src_tracking_meta(dst_path: str) -> dict:
    """The newest commit's source-tracking app_meta (src_table,
    src_version) — walking PAST commits that carry none: a compaction /
    metadata commit on the DESTINATION must not reset the applied
    version to -1, which would make the next micro-batch overwrite the
    accumulated state with only its own delta (the same amnesia class
    the text index's collection stats had; caught by code review,
    pinned in tests/test_versioned_stream.py). O(log tail) via the
    checkpoint-folded :func:`versioned.latest_app_meta`."""
    return latest_app_meta(dst_path, "src_version")


def maintain_agg_stream(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    group_cols: list[str],
    *,
    sum_cols: list[str] | None = None,
    checkpoint: str,
    starting_version: int = 0,
    trigger_available_now: bool = True,
):
    """Start a streaming query that maintains ``dst_path`` as the
    per-group (``n_rows`` + ``<c>_sum``) aggregate of ``src_path``.
    Deltas derive from the change-type signs (+1 insert/update_postimage,
    −1 delete/update_preimage), identical to :func:`agg_delta`'s math;
    batch-equivalence against a full recompute is pytest-pinned. Returns
    the StreamingQuery."""
    scols = list(sum_cols or [])
    ch = stream_changes(spark, src_path, starting_version=starting_version)

    def _apply(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        import os

        applied = -1
        if latest_version(dst_path) >= 0:
            meta = _src_tracking_meta(dst_path)
            if meta.get("src_table") not in (None, os.path.abspath(src_path)):
                raise ValueError(
                    f"{dst_path!r} tracks {meta.get('src_table')!r}, not "
                    f"{src_path!r}"
                )
            applied = meta.get("src_version", -1)
        # exactly-once: the query checkpoint may replay a batch whose
        # versions the destination already committed — drop them
        fresh = batch_df.filter(F.col("_commit_version") > F.lit(applied))
        hi = fresh.agg(F.max("_commit_version")).collect()[0][0]
        if hi is None:
            return
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1))
        delta = fresh.groupBy(*group_cols).agg(
            F.sum(sign).cast("long").alias("n_rows_delta"),
            *[F.sum(sign * F.col(c)).alias(f"{c}_delta") for c in scols],
        )
        meta = {"src_table": os.path.abspath(src_path), "src_version": int(hi)}
        if applied < 0:
            merged = delta.select(
                *group_cols,
                F.col("n_rows_delta").alias("n_rows"),
                *[F.col(f"{c}_delta").alias(f"{c}_sum") for c in scols],
            ).filter(F.col("n_rows") > 0)
        else:
            merged = _merge_agg_delta(spark, dst_path, delta, group_cols, scols)
        commit_snapshot(merged, dst_path, mode="overwrite", app_meta=meta)

    writer = ch.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def maintain_hll_stream(
    stream_df,
    dst_path: str,
    col: str,
    group_cols: list[str] | None = None,
    *,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Maintain a RUNNING DISTINCT-COUNT sketch over an unbounded stream:
    each micro-batch's HLL registers (functions/sketches.py) merge into a
    versioned register table by per-register MAX — finite state (at most
    groups x 512 rows) for an infinite stream, where exact streaming
    COUNT(DISTINCT) would hold every key ever seen. The merge is
    algebraic (sketch(history ∪ batch) == merge(stored, sketch(batch)),
    pinned), so the stored table is bit-identical to sketching the full
    history in one batch — restarts and replays INCLUDED: a replayed
    micro-batch is dropped via the commit log's (app, epoch) idempotence
    before it can double-commit (max-merge would even be harmlessly
    idempotent, but the log guarantee keeps the version history clean).
    Read estimates any time with ``hll_estimate(read_version(...))``.
    Returns the started StreamingQuery."""
    import os

    from avro_diff_spark.functions import sketches as SK
    from avro_diff_spark.sources.versioned import last_committed_epoch

    gs = list(group_cols or [])
    app_id = os.path.abspath(checkpoint)

    def _apply(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if last_committed_epoch(dst_path, app_id) >= epoch_id:
            return  # replayed batch: already folded into the sketch
        regs = SK.hll_registers(batch_df, col, gs)
        if latest_version(dst_path) >= 0:
            spark = batch_df.sparkSession
            from avro_diff_spark.sources.versioned import read_version

            regs = SK.hll_merge(read_version(spark, dst_path), regs, gs)
        commit_snapshot(
            regs, dst_path, mode="overwrite", txn=(app_id, int(epoch_id))
        )

    writer = stream_df.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def maintain_countmin_stream(
    stream_df,
    dst_path: str,
    term_col: str,
    *,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Maintain a RUNNING FREQUENCY sketch over an unbounded term
    stream: each micro-batch's exact term counts fold into a count-min
    cell table (functions/sketches.py) kept as a versioned table —
    4x1024 integer cells answer any frequency probe over everything the
    stream has ever carried, where an exact running frequency table
    grows with the vocabulary. Cells merge by per-cell SUM — additive,
    NOT idempotent — so exactly-once matters here in a way the HLL
    max-merge never does: a replayed micro-batch is dropped via the
    commit log's (app, epoch) dedupe BEFORE it can double-count
    (restart-pinned). Probe with ``countmin_lookup(read_version(...))``.
    Returns the started StreamingQuery."""
    import os

    from avro_diff_spark.functions import sketches as SK
    from avro_diff_spark.sources.versioned import last_committed_epoch

    app_id = os.path.abspath(checkpoint)

    def _apply(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if last_committed_epoch(dst_path, app_id) >= epoch_id:
            return  # replayed batch: already summed into the sketch
        counts = (
            batch_df.where(F.col(term_col).isNotNull())
            .groupBy(term_col)
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        cells = SK.countmin_sketch(counts, term_col, "__n")
        if latest_version(dst_path) >= 0:
            from avro_diff_spark.sources.versioned import read_version

            cells = SK.countmin_merge(
                read_version(batch_df.sparkSession, dst_path), cells
            )
        commit_snapshot(
            cells, dst_path, mode="overwrite", txn=(app_id, int(epoch_id))
        )

    writer = stream_df.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def maintain_bloom_stream(
    stream_df,
    dst_path: str,
    col: str,
    *,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Maintain a RUNNING BLOOM FILTER over an unbounded stream: each
    micro-batch's filter words (functions/sketches.py bloom_build) OR
    into a <=128-row versioned word table — fixed-size state answering
    "might value v have ever appeared?" with zero false negatives for
    the stream's whole history. OR-merge is idempotent (like the HLL
    max), so a replayed batch would be harmless; the (app, epoch) commit
    dedupe still drops it to keep the version history clean. Probe any
    time with ``bloom_probe(read_version(...), probes, col)``. Returns
    the started StreamingQuery."""
    import os

    from avro_diff_spark.functions import sketches as SK
    from avro_diff_spark.sources.versioned import last_committed_epoch

    app_id = os.path.abspath(checkpoint)

    def _apply(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if last_committed_epoch(dst_path, app_id) >= epoch_id:
            return  # replayed batch: already OR-ed into the filter
        words = SK.bloom_build(batch_df, col)
        if latest_version(dst_path) >= 0:
            from avro_diff_spark.sources.versioned import read_version

            words = SK.bloom_merge(
                read_version(batch_df.sparkSession, dst_path), words
            )
        commit_snapshot(
            words, dst_path, mode="overwrite", txn=(app_id, int(epoch_id))
        )

    writer = stream_df.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def maintain_digest_stream(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    keys: list[str],
    *,
    num_buckets: int = 1024,
    payload_cols: list[str] | None = None,
    checkpoint: str,
    starting_version: int = 0,
    trigger_available_now: bool = True,
):
    """Maintain ``dst_path`` as the LIVE MERKLE FINGERPRINT (per-bucket
    row-count + xor digests, operators/digest.py) of the versioned table
    at ``src_path``, driven by its change feed: xor is its own inverse,
    so an insert and a delete fold with the SAME operation — each batch
    xors its change rows (pre- and post-images alike) into the stored
    buckets and adds the signed row-count delta, work ∝ changed rows,
    never a source rescan. The maintained table is bit-identical to
    ``bucket_digests(read_version(src))`` after every drain (pinned
    across append / DV-delete / merge histories), so two replicas —
    each maintaining its own fingerprint — are compared by diffing two
    <= ``num_buckets``-row tables, and a mismatch localizes to the
    buckets :func:`~avro_diff_spark.operators.digest.key_diff_pruned`
    then re-reads. xor/sum folds are NOT idempotent, so exactly-once
    rides the applied-src-version metadata exactly as
    :func:`maintain_agg_stream`. Returns the StreamingQuery."""
    import os

    from avro_diff_spark.operators import digest as dig

    pb = list(payload_cols) if payload_cols is not None else None
    ch = stream_changes(spark, src_path, starting_version=starting_version)

    def _apply(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        applied = -1
        if latest_version(dst_path) >= 0:
            meta = _src_tracking_meta(dst_path)
            if meta.get("src_table") not in (None, os.path.abspath(src_path)):
                raise ValueError(
                    f"{dst_path!r} fingerprints {meta.get('src_table')!r}, "
                    f"not {src_path!r}"
                )
            applied = meta.get("src_version", -1)
        fresh = batch_df.filter(F.col("_commit_version") > F.lit(applied))
        hi = fresh.agg(F.max("_commit_version")).collect()[0][0]
        if hi is None:
            return
        payload = pb if pb is not None else [
            c
            for c in fresh.columns
            if c not in keys and c not in ("_change_type", "_commit_version")
        ]
        h = dig._row_hash(fresh, keys, payload)
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1))
        delta = (
            fresh.select(
                dig.bucket_col(keys, num_buckets),
                sign.alias("_s"),
                dig._hex_long(h, 1).alias("_d1"),
                dig._hex_long(h, 16).alias("_d2"),
            )
            .groupBy("bucket")
            .agg(
                F.sum("_s").cast("long").alias("dn"),
                F.bit_xor("_d1").alias("dx1"),
                F.bit_xor("_d2").alias("dx2"),
            )
        )
        meta = {"src_table": os.path.abspath(src_path), "src_version": int(hi)}
        if applied < 0:
            merged = delta.select(
                "bucket",
                F.col("dn").alias("n_rows"),
                F.col("dx1").alias("xor1"),
                F.col("dx2").alias("xor2"),
            ).filter(F.col("n_rows") > 0)
        else:
            from avro_diff_spark.sources.versioned import read_version

            stored = read_version(spark, dst_path)
            z = F.lit(0).cast("long")
            merged = (
                stored.join(delta, "bucket", "full_outer")
                .select(
                    "bucket",
                    (F.coalesce(F.col("n_rows"), z) + F.coalesce(F.col("dn"), z))
                    .alias("n_rows"),
                    F.coalesce(F.col("xor1"), z)
                    .bitwiseXOR(F.coalesce(F.col("dx1"), z))
                    .alias("xor1"),
                    F.coalesce(F.col("xor2"), z)
                    .bitwiseXOR(F.coalesce(F.col("dx2"), z))
                    .alias("xor2"),
                )
                .filter(F.col("n_rows") > 0)
            )
        commit_snapshot(merged, dst_path, mode="overwrite", app_meta=meta)

    writer = ch.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def maintain_drift_stream(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    col: str,
    cuts,
    *,
    checkpoint: str,
    starting_version: int = 0,
    trigger_available_now: bool = True,
):
    """Maintain ``dst_path`` as the LIVE DRIFT HISTOGRAM — the per-bucket
    row counts of ``src_path``'s column under the declared
    ``functions.drift.bucketize`` cuts (NULL = bucket -1) — from the
    change feed: +1 for insert/update_postimage, −1 for
    delete/update_preimage, work ∝ changed rows, never a source rescan.
    After every drain the table is pinned EQUAL to the batch bucket
    counts of ``read_version(src)``, so the corpus-over-corpus monitor
    reduces to ``functions.drift.tv_distance_from_counts(live,
    reference_window)`` — two <= n_buckets-row tables folded at alert
    time, composing with the ``drift`` CLI gate; no raw scan on the
    alert path. Exactly-once rides the applied-src-version metadata
    (signed folds are not idempotent), the :func:`maintain_agg_stream`
    idiom. Returns the StreamingQuery."""
    import os

    from avro_diff_spark.functions.drift import bucketize

    cuts = tuple(cuts)
    ch = stream_changes(spark, src_path, starting_version=starting_version)

    def _apply(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        applied = -1
        if latest_version(dst_path) >= 0:
            meta = _src_tracking_meta(dst_path)
            if meta.get("src_table") not in (None, os.path.abspath(src_path)):
                raise ValueError(
                    f"{dst_path!r} tracks {meta.get('src_table')!r}, not "
                    f"{src_path!r}"
                )
            applied = meta.get("src_version", -1)
        fresh = batch_df.filter(F.col("_commit_version") > F.lit(applied))
        hi = fresh.agg(F.max("_commit_version")).collect()[0][0]
        if hi is None:
            return
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1))
        delta = (
            fresh.select(bucketize(F.col(col), cuts).alias("bucket"), sign.alias("_s"))
            .groupBy("bucket")
            .agg(F.sum("_s").cast("long").alias("n_rows_delta"))
        )
        meta = {"src_table": os.path.abspath(src_path), "src_version": int(hi)}
        if applied < 0:
            merged = delta.select(
                "bucket", F.col("n_rows_delta").alias("n_rows")
            ).filter(F.col("n_rows") > 0)
        else:
            merged = _merge_agg_delta(spark, dst_path, delta, ["bucket"], [])
        commit_snapshot(merged, dst_path, mode="overwrite", app_meta=meta)

    writer = ch.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def maintain_join_view_stream(
    spark: SparkSession,
    fact_path: str,
    dim_path: str,
    dst_path: str,
    fact_keys: list[str],
    fk: str,
    pk: str,
    *,
    checkpoint: str,
    starting_version: int = 0,
    trigger_available_now: bool = True,
):
    """Streaming twin of :func:`versioned.refresh_join_table`: keep the
    materialized ``fact ⋈ dim`` view continuously current from the FACT
    table's change feed, enriching each micro-batch against the dim's
    latest snapshot — Structured Streaming's stream-static join shape
    (the fact side is the high-volume one in every star schema; dim
    changes are applied by the batch refresher on its own cadence, the
    standard lakehouse split).

    Per batch: the LAST change per fact key wins (a key updated three
    times in one batch folds to one upsert; insert→…→delete folds to
    one delete), survivors re-join the dim (broadcast/AQE — delta-sized
    probe, never a fact rescan), upserts land via :func:`merge_into`,
    vanished keys (deletes + dangling fks) via :func:`delete_where`,
    and the applied source version rides a trailing
    :func:`commit_txn_marker` — written LAST, so a replayed batch (the
    query checkpoint's at-least-once) sees its versions already applied
    and is dropped, or re-applies idempotently if the crash hit the
    marker window. Batch-equivalence vs a full recompute and the
    delete/dangling paths are pytest-pinned.

    Source DML must be CDF-visible: merge/delete with ``rewrite='dv'``
    (a 'touched' REPLACE commit is indistinguishable from compaction to
    a change stream — the standing :func:`stream_changes` contract)."""
    import os

    from pyspark.sql import Window

    from avro_diff_spark.sources.versioned import (
        commit_txn_marker,
        delete_where,
        merge_into,
        read_version,
    )

    ch = stream_changes(spark, fact_path, starting_version=starting_version)

    def _apply(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        applied = -1
        if latest_version(dst_path) >= 0:
            meta = latest_app_meta(dst_path, "fact_version")
            if meta.get("fact_table") not in (None, os.path.abspath(fact_path)):
                raise ValueError(
                    f"{dst_path!r} tracks {meta.get('fact_table')!r}, not "
                    f"{fact_path!r}"
                )
            applied = meta.get("fact_version", -1)
        fresh = batch_df.filter(F.col("_commit_version") > F.lit(applied))
        hi = fresh.agg(F.max("_commit_version")).collect()[0][0]
        if hi is None:
            return

        dim = read_version(spark, dim_path)
        dim_meta = latest_app_meta(dst_path, "dim_version") if applied >= 0 else {}
        dv = dim_meta.get("dim_version", latest_version(dim_path))
        meta = {
            "fact_table": os.path.abspath(fact_path),
            "fact_version": int(hi),
            "dim_table": os.path.abspath(dim_path),
            "dim_version": int(dv),
        }

        # last change per key wins; at equal versions the post-image
        # outranks its pre-image (a merge emits both)
        pref = F.when(
            F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(0))
        w = Window.partitionBy(*fact_keys).orderBy(
            F.col("_commit_version").desc(), pref.desc()
        )
        last = (
            fresh.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        live = last.where(
            F.col("_change_type").isin("insert", "update_postimage")
        ).drop("_change_type", "_commit_version")
        d = dim.withColumnRenamed(pk, fk) if pk != fk else dim
        view_cols = [c for c in live.columns] + [c for c in d.columns if c != fk]
        upserts = live.join(d, [fk], "inner").select(*view_cols)

        if latest_version(dst_path) < 0:
            commit_snapshot(upserts, dst_path, app_meta=meta)
            return
        merge_into(spark, dst_path, upserts, fact_keys)
        # keys whose last change deleted them, plus survivors whose fk
        # no longer resolves (dangling after a dim delete)
        gone = last.select(*fact_keys).exceptAll(upserts.select(*fact_keys))
        delete_where(spark, dst_path, keys=gone, on=fact_keys)
        commit_txn_marker(dst_path, app_meta=meta)

    writer = ch.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
