"""Streaming exact dedup — first-seen survivor per content fingerprint.

North-star extension (no reference code): the streaming half of
:func:`avro_diff_spark.operators.dedup.exact_dedup`, for ingest pipelines
that must drop duplicate documents as they land rather than in a nightly
batch. Built on ``dropDuplicates``' keyed state store: one shuffle on the
16-byte fingerprint, then per-key state lookups.

State model (the 100 TB knob): without a watermark, one state row lives
per distinct fingerprint FOREVER — only right for bounded backfills
(AvailableNow). With ``ts_col``+``watermark``,
``dropDuplicatesWithinWatermark`` prunes fingerprints older than the
horizon: bounded memory, at the cost that duplicates separated by more
than the horizon pass through. That trade (dedup horizon vs state size)
is exactly how production streaming dedup is run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from avro_diff_spark.functions.text import fingerprint_md5


def contamination_stream(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    ngram_w: int = 8,
) -> DataFrame:
    """Streaming eval-decontamination — flag arriving documents sharing any
    word n-gram with a STATIC benchmark suite, at ingest time instead of in
    the nightly batch (:func:`avro_diff_spark.operators.dedup
    .contamination_check` is the batch twin; identical flags, pinned by
    tests).

    Shape: a stream-static broadcast join, fully STATELESS — every document
    carries all of its own n-grams in one row, so the shared-gram count is
    ``size(array_intersect(doc_grams, bench_grams))`` per row: no
    aggregation state, no watermark, append-mode safe into any sink. The
    benchmark gram set is collapsed to ONE static row (eval suites are
    bounded by construction — a few MB of int64 hashes at most) that
    broadcasts to every task; refresh it by restarting the query, the
    standard slowly-changing-static-side pattern.
    """
    from avro_diff_spark.functions.text import hash32, word_shingles

    bench_arr = benchmark.select(
        F.explode_outer(
            F.array_distinct(
                F.transform(word_shingles(F.col(text_col), ngram_w), hash32)
            )
        ).alias("gram_hash")
    ).where(F.col("gram_hash").isNotNull()).agg(
        F.array_sort(F.collect_set("gram_hash")).alias("__bench_grams")
    )

    d = docs.withColumn(
        "__grams",
        F.array_distinct(F.transform(word_shingles(F.col(text_col), ngram_w), hash32)),
    ).withColumn("__one", F.lit(1))
    joined = d.join(
        F.broadcast(bench_arr.withColumn("__one", F.lit(1))), "__one", "inner"
    )
    return (
        joined.withColumn(
            "n_contaminated_grams",
            F.size(F.array_intersect(F.col("__grams"), F.col("__bench_grams"))),
        )
        .where(F.col("n_contaminated_grams") > 0)
        # alias to doc_id regardless of id_col — the batch twin
        # (contamination_check) always emits doc_id, and the two operators
        # advertise identical output contracts
        .select(F.col(id_col).alias("doc_id"), "n_contaminated_grams")
    )


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """First-seen document per normalized-text fingerprint.

    The batch twin keeps the min-id survivor (deterministic); a stream
    keeps the FIRST-SEEN one — arrival order is the only meaningful
    "first" on an unbounded source. The surviving fingerprint set is
    identical either way (pinned by tests/test_streaming.py).
    """
    d = docs.withColumn("fingerprint", fingerprint_md5(F.col(text_col)))
    if ts_col is not None and watermark is not None:
        return d.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["fingerprint"]
        )
    return d.dropDuplicates(["fingerprint"])


def near_dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
) -> DataFrame:
    """Streaming near-duplicate CANDIDATE detection — MinHash LSH buckets
    as keyed state, flagging arriving documents whose sketch collides
    with any previously-seen document's, at ingest time.

    Shape: each document computes its MinHash signature and explodes to
    ``bands`` (band_id, band_key) bucket rows with the SAME signature and
    banding expressions the batch :func:`avro_diff_spark.operators.dedup
    .minhash_near_dups` uses (pure Column code, no Python, no shuffle
    until the state store's own exchange on the bucket key — small and
    uniformly distributed, exactly the batch LSH shuffle). State lives
    per bucket via ``applyInPandasWithState``: the first-seen doc id.
    Output is the bucket-collision EVENT stream — one row per (doc,
    band): ``is_first`` marks the bucket's founder; a later doc whose row
    reports ``first_doc_id != doc_id`` is a near-dup CANDIDATE exactly as
    in batch LSH. Exact-Jaccard verification of candidates stays a batch
    (or foreachBatch) concern, as in every production streaming
    near-dedup: the bucketed event stream is the scalable primitive —
    state is one row per DISTINCT bucket, never per pair.

    Determinism note: within one micro-batch a new bucket's founder is
    the minimum doc id (arrival order inside a batch is not defined);
    across batches it is first-seen, the only meaningful order on an
    unbounded source. The candidate SET equals the batch banding's
    (pinned by tests/test_streaming.py).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from avro_diff_spark.functions.text import char_codes, poly_shingle_hashes
    from avro_diff_spark.operators.dedup import _signatures_from_sh

    rows_per_band = n_hashes // bands
    doc_sh = docs.select(
        F.col(id_col).alias("doc_id"),
        char_codes(F.col(text_col)).alias("__codes"),
    ).select(
        "doc_id",
        F.array_distinct(poly_shingle_hashes(F.col("__codes"), shingle_k)).alias("sh"),
    )
    sigs = _signatures_from_sh(doc_sh, n_hashes)
    banded = (
        sigs.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_id"),
                            F.when(
                                F.element_at(F.col("sig"), 1).isNotNull(),
                                F.md5(
                                    F.array_join(
                                        F.slice(
                                            F.col("sig"),
                                            b * rows_per_band + 1,
                                            rows_per_band,
                                        ),
                                        ",",
                                    )
                                ),
                            ).alias("band_key"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("band"),
        )
        .select("doc_id", "band.band_id", "band.band_key")
        .where(F.col("band_key").isNotNull())
    )

    def track(key, pdfs, state):
        import pandas as pd

        ids = []
        for pdf in pdfs:
            ids.extend(int(v) for v in pdf["doc_id"])
        if state.exists:
            (first,) = state.get
            newly = False
        else:
            first = min(ids)
            newly = True
            state.update((first,))
        yield pd.DataFrame(
            {
                "band_id": [int(key[0])] * len(ids),
                "band_key": [str(key[1])] * len(ids),
                "doc_id": ids,
                "first_doc_id": [first] * len(ids),
                "is_first": [newly and i == first for i in ids],
            }
        )

    return banded.groupBy("band_id", "band_key").applyInPandasWithState(
        track,
        outputStructType="band_id int, band_key string, doc_id long, "
        "first_doc_id long, is_first boolean",
        stateStructType="first_doc_id long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
