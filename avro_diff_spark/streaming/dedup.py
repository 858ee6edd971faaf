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
