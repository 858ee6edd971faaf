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

``removed`` is structurally undetectable row-at-a-time: a deletion is the
ABSENCE of an arrival, and an unbounded stream never finishes so "never
arrived" has no decision point. That is a property of the problem, not the
engine — CDC systems emit explicit tombstones for exactly this reason. Get
removed rows either from a tombstone column upstream or from the batch
:func:`key_diff` over a closed snapshot pair.

Classification reuses the batch operator's own leaf machinery
(_diff_leaves/_leaf_changed — nested structs recursed to dot-path leaves),
so a row classifies identically here and in the batch diff; pinned by
tests/test_streaming.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from avro_diff_spark.operators.key_diff import (
    KIND_ADDED,
    KIND_CHANGED,
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
    max_struct_depth: int = MAX_STRUCT_DEPTH,
) -> DataFrame:
    """Classify arriving rows against a static ``baseline`` snapshot.

    Output columns: the coerced key fields, ``diff_kind`` ∈
    {added, changed, unchanged}, ``changed_fields`` (dot-path leaves, empty
    for unchanged, NULL for added), ``new`` (the arriving row as a struct).

    Scale shape: the baseline joins broadcast when small, shuffled-hash
    otherwise (left to Catalyst — the stream side of a stream-static join
    is never shuffled by the static side's strategy choice); per-batch cost
    is one join probe + pure Column classification, no state store.
    """
    key = list(key)
    for k in key:
        if k not in stream.columns or k not in baseline.columns:
            raise ValueError(f"key column {k!r} missing from input")

    new_schema = {f.name: f.dataType for f in stream.schema.fields}
    old_schema = {f.name: f.dataType for f in baseline.schema.fields}
    leaves = _diff_leaves(old_schema, new_schema, key, compare_cols, max_struct_depth)

    s = stream.select(
        *[coerce_key(F.col(k)).alias(f"__k{i}") for i, k in enumerate(key)],
        F.struct(*stream.columns).alias("__new"),
    )
    b = baseline.select(
        *[coerce_key(F.col(k)).alias(f"__bk{i}") for i, k in enumerate(key)],
        F.lit(True).alias("__bp"),
        F.struct(*baseline.columns).alias("__old"),
    )
    cond = None
    for i in range(len(key)):
        eq = s[f"__k{i}"] == b[f"__bk{i}"]
        cond = eq if cond is None else (cond & eq)
    j = s.join(b, cond, "left")

    in_baseline = j["__bp"].isNotNull()
    field_changed: list[tuple[str, Column]] = [
        (".".join(p), _leaf_changed(j["__old"], j["__new"], p, ot, nt))
        for p, ot, nt in leaves
    ]
    any_changed = F.lit(False)
    for _, c in field_changed:
        any_changed = any_changed | c
    diff_kind = (
        F.when(~in_baseline, F.lit(KIND_ADDED))
        .when(any_changed, F.lit(KIND_CHANGED))
        .otherwise(F.lit(KIND_UNCHANGED))
    )
    changed_fields = F.when(
        in_baseline,
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
