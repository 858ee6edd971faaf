"""Streaming keyed diff — classify rows against a static baseline at ingest.

North-star extension of the flagship batch operator
(:func:`avro_diff_spark.operators.key_diff.key_diff`, reference semantics
src/index.js:128-223): a CDC-shaped pipeline where a snapshot plays the
baseline and rows keep ARRIVING — each arriving row is classified the
moment it lands instead of in a nightly full diff.

Semantics per arriving row (stream-static LEFT join on the coerced key,
stateless — no watermark, append-safe):

- key absent from the baseline          → ``added``
- key present, any compared leaf differs → ``changed``
- key present, all compared leaves equal → ``unchanged``
- tombstone-flagged arrival (``tombstone_col``):
  key present → ``removed``; key absent → dropped (deleting a row the
  baseline never had is a no-op, matching the batch diff where such a row
  appears on neither side).

Without tombstones, ``removed`` is structurally undetectable row-at-a-time:
a deletion is the ABSENCE of an arrival, and an unbounded stream never
finishes so "never arrived" has no decision point. That is a property of
the problem, not the engine — CDC systems emit explicit tombstones for
exactly this reason, and ``tombstone_col`` is that input path. A closed
snapshot pair still gets ``removed`` for free from the batch
:func:`key_diff`.

Baseline-key precondition: classification assumes the baseline has at most
ONE row per coerced key — the same contract the batch diff documents
(duplicate keys there surface pre-diff via
:func:`avro_diff_spark.operators.collisions.key_collisions`; run it on the
baseline as the audit). A duplicated baseline key would emit each arriving
row once per duplicate (possibly with conflicting kinds). Pass
``dedupe_baseline=True`` to enforce the contract mechanically — an
arbitrary-survivor ``dropDuplicates`` on the coerced key, costing one
extra shuffle of the (static, usually broadcast-small) baseline.

Classification reuses the batch operator's own leaf machinery
(_diff_leaves/_leaf_changed — nested structs recursed to dot-path leaves),
so a row classifies identically here and in the batch diff; pinned by
tests/test_streaming.py, including the tombstone-replay ≡ batch-diff
equivalence.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from avro_diff_spark.operators.key_diff import (
    KIND_ADDED,
    KIND_CHANGED,
    KIND_REMOVED,
    KIND_UNCHANGED,
    MAX_STRUCT_DEPTH,
    _diff_leaves,
    _leaf_changed,
    coerce_key,
)


def key_diff_stream(
    stream: DataFrame,
    baseline: DataFrame,
    key: Sequence[str],
    *,
    compare_cols: Sequence[str] | None = None,
    tombstone_col: str | None = None,
    dedupe_baseline: bool = False,
    max_struct_depth: int = MAX_STRUCT_DEPTH,
) -> DataFrame:
    """Classify arriving rows against a static ``baseline`` snapshot.

    Output columns: the coerced key fields, ``diff_kind`` ∈
    {added, removed, changed, unchanged}, ``changed_fields`` (dot-path
    leaves; empty for unchanged, NULL for added/removed), ``new`` (the
    arriving row as a struct, minus the tombstone flag). ``removed`` rows
    carry the tombstone arrival in ``new``; their last-known payload lives
    in the baseline by definition (join it back by key when needed).

    ``tombstone_col``: name of a boolean-castable column on the stream
    marking delete events (CDC tombstones). It is excluded from leaf
    comparison and from the ``new`` struct; NULL flags read as false.

    Scale shape: the baseline joins broadcast when small, shuffled-hash
    otherwise (left to Catalyst — the stream side of a stream-static join
    is never shuffled by the static side's strategy choice); per-batch cost
    is one join probe + pure Column classification, no state store.
    """
    key = list(key)
    for k in key:
        if k not in stream.columns or k not in baseline.columns:
            raise ValueError(f"key column {k!r} missing from input")
    if tombstone_col is not None and tombstone_col not in stream.columns:
        raise ValueError(f"tombstone column {tombstone_col!r} missing from stream")

    data_cols = [c for c in stream.columns if c != tombstone_col]
    new_schema = {
        f.name: f.dataType for f in stream.schema.fields if f.name != tombstone_col
    }
    old_schema = {f.name: f.dataType for f in baseline.schema.fields}
    leaves = _diff_leaves(old_schema, new_schema, key, compare_cols, max_struct_depth)

    tomb = (
        F.coalesce(F.col(tombstone_col).cast("boolean"), F.lit(False))
        if tombstone_col is not None
        else F.lit(False)
    )
    s = stream.select(
        *[coerce_key(F.col(k)).alias(f"__k{i}") for i, k in enumerate(key)],
        tomb.alias("__tomb"),
        F.struct(*data_cols).alias("__new"),
    )
    b = baseline.select(
        *[coerce_key(F.col(k)).alias(f"__bk{i}") for i, k in enumerate(key)],
        F.lit(True).alias("__bp"),
        F.struct(*baseline.columns).alias("__old"),
    )
    if dedupe_baseline:
        b = b.dropDuplicates([f"__bk{i}" for i in range(len(key))])
    cond = None
    for i in range(len(key)):
        eq = s[f"__k{i}"] == b[f"__bk{i}"]
        cond = eq if cond is None else (cond & eq)
    j = s.join(b, cond, "left")

    in_baseline = j["__bp"].isNotNull()
    # tombstone for a key the baseline never had: a no-op delete, dropped
    j = j.where(~j["__tomb"] | in_baseline)
    field_changed: list[tuple[str, Column]] = [
        (".".join(p), _leaf_changed(j["__old"], j["__new"], p, ot, nt))
        for p, ot, nt in leaves
    ]
    any_changed = F.lit(False)
    for _, c in field_changed:
        any_changed = any_changed | c
    diff_kind = (
        F.when(j["__tomb"], F.lit(KIND_REMOVED))
        .when(~in_baseline, F.lit(KIND_ADDED))
        .when(any_changed, F.lit(KIND_CHANGED))
        .otherwise(F.lit(KIND_UNCHANGED))
    )
    changed_fields = F.when(
        in_baseline & ~j["__tomb"],
        F.filter(
            F.array(*[F.when(c, F.lit(n)) for n, c in field_changed])
            if field_changed
            else F.array().cast("array<string>"),
            lambda x: x.isNotNull(),
        ),
    )
    out = [j[f"__k{i}"].alias(k) for i, k in enumerate(key)]
    out.append(diff_kind.alias("diff_kind"))
    out.append(changed_fields.alias("changed_fields"))
    out.append(j["__new"].alias("new"))
    return j.select(*out)
