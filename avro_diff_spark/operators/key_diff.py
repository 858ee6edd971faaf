"""Keyed diff: full-outer join on a composite key + row classification.

Reference semantics (SURVEY.md §2.3; reference src/index.js:128-223):
sort both inputs by a stringified composite key, two-pointer merge, classify
each row as ``added`` (key only in new), ``removed`` (key only in old),
``changed`` / ``unchanged`` (matched, by deep recursive per-field diff).

Spark-first design — no sorting or merging by hand:

- The sort-merge is declared as ``old FULL OUTER JOIN new ON key`` and left
  to Catalyst: it picks SortMergeJoin for large inputs, broadcast/shuffled-hash
  when one side is small, and AQE splits skewed keys at runtime. At 100 TB the
  shuffle is on the key columns only; payload columns ride along as single
  struct columns, so the exchange is one row-sized record per side, no
  row-explosion.
- Key coercion parity: the reference compares ``String(row[field])`` per key
  field (src/index.js:272-278), so long ``1`` equals string ``"1"`` and a JS
  ``null``/``undefined`` key value becomes the literal string ``"null"`` /
  ``"undefined"`` and joins with itself. We reproduce this with
  ``coalesce(cast(col as string), 'null')`` — which also makes the join keys
  non-null, so plain equality works and no null-safe-join plan penalty
  (eqNullSafe disables some join optimizations) is paid.
- Classification and per-field comparison are pure Column expressions
  (``when``/``isNotDistinctFrom``-style) — JVM-side, codegen-eligible, no UDFs.
- The matched-pair equality test is the reference's ``detailedDiff`` deep
  object diff (src/index.js:205, lib deep-object-diff): here each column is
  compared null-safely on a canonicalized representation (maps sorted), which
  matches deep JSON equality.
- The result is itself a DataFrame with a ``diff_kind`` discriminator — fully
  queryable/writable, unlike the reference's print-only result object.

Duplicate keys are out of contract exactly as in the reference (its own test
asserts key uniqueness, src/index.test.js:7-25; its merge pairs dups 1:1
arbitrarily, src/index.js:202-219, while a relational FOJ cross-products
them). Use :func:`avro_diff_spark.operators.collisions.key_collisions` to
detect dups up front — better than the reference, which can only flag them
post-hoc across result buckets (src/dataTest.js:4-25).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from pyspark.sql import types as T

from avro_diff_spark.functions.canonical import canonical, has_map, stringify

#: JS ``String(null)`` parity sentinel (reference src/index.js:275).
NULL_KEY_SENTINEL = "null"

#: Recursion bound for nested-struct per-field diffing: structs deeper than
#: this are compared atomically (to_json payload). Matches the reference's
#: unbounded deep-object-diff in practice — no real schema nests past 8.
MAX_STRUCT_DEPTH = 8

KIND_ADDED = "added"
KIND_REMOVED = "removed"
KIND_CHANGED = "changed"
KIND_UNCHANGED = "unchanged"


def coerce_key(col: Column) -> Column:
    """``String(value)`` parity cast: stringify, null → the literal 'null'."""
    return F.coalesce(col.cast("string"), F.lit(NULL_KEY_SENTINEL))


def _walk_leaves(path, old_t, new_t, depth: int):
    """Yield (dot-path tuple, old dtype, new dtype) diffable leaves,
    recursing into StructType on both sides (reference ``detailedDiff``
    recurses into nested records, src/index.js:205). A side's dtype is None
    when the field exists only on the other side. Arrays and maps stay
    atomic leaves (compared canonically, reported as stable JSON)."""
    if isinstance(old_t, T.StructType) and isinstance(new_t, T.StructType) and depth > 0:
        of = {f.name: f.dataType for f in old_t.fields}
        nf = {f.name: f.dataType for f in new_t.fields}
        names = [f.name for f in old_t.fields] + [
            f.name for f in new_t.fields if f.name not in of
        ]
        for nm in names:
            yield from _walk_leaves(path + (nm,), of.get(nm), nf.get(nm), depth - 1)
    else:
        yield path, old_t, new_t


def _diff_leaves(old_schema, new_schema, key, compare_cols, max_depth: int):
    """Leaf list for a diff: shared columns recursed, one-side-only columns
    as single leaves (unless ``compare_cols`` restricts to shared)."""
    if compare_cols is not None:
        allowed = set(compare_cols)
        cols = [c for c in old_schema if c in new_schema and c not in key and c in allowed]
    else:
        cols = [c for c in old_schema if c not in key] + [
            c for c in new_schema if c not in old_schema and c not in key
        ]
    leaves = []
    for c in cols:
        leaves.extend(_walk_leaves((c,), old_schema.get(c), new_schema.get(c), max_depth))
    return leaves


def _get_path(base: Column, path) -> Column:
    for p in path:
        base = base.getField(p)
    return base


def _leaf_changed(j_old: Column, j_new: Column, path, old_t, new_t) -> Column:
    """Per-leaf change predicate. A leaf under a NULL intermediate struct
    reads as NULL (getField propagates), so a whole added/dropped subtree
    reports each non-null leaf as changed — the per-leaf rendering of
    deep-object-diff's added/deleted subtree buckets."""
    if old_t is None:
        return _get_path(j_new, path).isNotNull()
    if new_t is None:
        return _get_path(j_old, path).isNotNull()
    lhs, rhs = _get_path(j_old, path), _get_path(j_new, path)
    if old_t.simpleString() != new_t.simpleString():
        # heterogeneous types: compare on the stringified form (the JS
        # reference compares dynamic values; cross-type equality there is
        # value-based — string form is the engine-portable analogue)
        return ~stringify(lhs, old_t).eqNullSafe(stringify(rhs, new_t))
    if has_map(old_t):
        lhs, rhs = canonical(lhs, old_t), canonical(rhs, new_t)
    return ~lhs.eqNullSafe(rhs)


def key_diff(
    old: DataFrame,
    new: DataFrame,
    key: Sequence[str],
    *,
    compare_cols: Sequence[str] | None = None,
    include_payload: bool = True,
    max_struct_depth: int = MAX_STRUCT_DEPTH,
    raw_keys: bool = False,
) -> DataFrame:
    """Diff two DataFrames on a composite key.

    ``raw_keys=True`` joins on the NATIVE key columns (no String()
    coercion) under plain SQL equality — the 100 TB switch: bucketed or
    pre-partitioned tables then diff with ZERO shuffle (bucket-join /
    storage-partitioned join), which the string-coercion join forfeits
    because the join key becomes a derived expression. Semantics diverge
    from the reference exactly where SQL does: NULL keys never match
    (they land in added/removed), and cross-type keys (long 1 vs "1")
    don't join. Output key columns keep their native types.

    Returns a DataFrame with columns:

    - one string column per key field (coerced as the reference does),
    - ``diff_kind`` ∈ {added, removed, changed, unchanged},
    - ``changed_fields``: array of *leaf paths* whose values differ —
      nested StructType columns are recursed (dot-path names like
      ``submission.score``, parity with the reference's recursive
      ``detailedDiff``, src/index.js:205); arrays/maps compare atomically.
      NULL for added/removed rows; empty array for unchanged,
    - ``old`` / ``new``: full row payloads as structs (when
      ``include_payload``; NULL on the absent side).

    ``compare_cols`` defaults to all non-key columns present in *both*
    schemas. Columns (or nested fields) present in only one schema count as
    changed for a matched row when the present side's value is non-null
    (parity with the reference's per-row added/deleted field buckets,
    src/index.js:26-28).
    """
    key = list(key)
    for k in key:
        if k not in old.columns or k not in new.columns:
            raise ValueError(f"key column {k!r} missing from input")

    old_schema = {f.name: f.dataType for f in old.schema.fields}
    new_schema = {f.name: f.dataType for f in new.schema.fields}
    leaves = _diff_leaves(old_schema, new_schema, key, compare_cols, max_struct_depth)

    key_expr = (lambda c: c) if raw_keys else coerce_key
    o = old.select(
        *[key_expr(F.col(k)).alias(f"__ok{i}") for i, k in enumerate(key)],
        F.lit(True).alias("__op"),
        F.struct(*old.columns).alias("__old"),
    )
    n = new.select(
        *[key_expr(F.col(k)).alias(f"__nk{i}") for i, k in enumerate(key)],
        F.lit(True).alias("__np"),
        F.struct(*new.columns).alias("__new"),
    )
    cond = None
    for i in range(len(key)):
        eq = o[f"__ok{i}"] == n[f"__nk{i}"]
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")

    # presence via the literal flags, not key nullability: raw keys may be
    # legitimately NULL on a present row (such rows never join — SQL
    # semantics — and must still classify as removed/added, not vanish)
    old_present = j["__op"].isNotNull()
    new_present = j["__np"].isNotNull()

    field_changed: list[tuple[str, Column]] = [
        (".".join(p), _leaf_changed(j["__old"], j["__new"], p, ot, nt))
        for p, ot, nt in leaves
    ]

    any_changed = F.lit(False)
    for _, cond_c in field_changed:
        any_changed = any_changed | cond_c

    diff_kind = (
        F.when(~old_present, F.lit(KIND_ADDED))
        .when(~new_present, F.lit(KIND_REMOVED))
        .when(any_changed, F.lit(KIND_CHANGED))
        .otherwise(F.lit(KIND_UNCHANGED))
    )

    changed_fields = F.when(
        old_present & new_present,
        F.filter(
            F.array(
                *[F.when(cond_c, F.lit(name)) for name, cond_c in field_changed]
            )
            if field_changed
            else F.array().cast("array<string>"),
            lambda x: x.isNotNull(),
        ),
    )

    out = [
        F.coalesce(j[f"__ok{i}"], j[f"__nk{i}"]).alias(k) for i, k in enumerate(key)
    ]
    out.append(diff_kind.alias("diff_kind"))
    out.append(changed_fields.alias("changed_fields"))
    if include_payload:
        out.append(F.when(old_present, j["__old"]).alias("old"))
        out.append(F.when(new_present, j["__new"]).alias("new"))
    return j.select(*out)


def key_diff_detail(
    old: DataFrame,
    new: DataFrame,
    key: Sequence[str],
    *,
    compare_cols: Sequence[str] | None = None,
    max_struct_depth: int = MAX_STRUCT_DEPTH,
    explode_arrays: bool = False,
    explode_maps: bool = False,
) -> DataFrame:
    """Field-level diff payload for matched changed rows.

    ``explode_arrays=True`` reports changed ARRAY leaves per element
    instead of as one atomic JSON row — field names ``path.<index>``
    (0-based), exactly how the reference's deep-object-diff treats arrays
    (objects with numeric keys). Indices past the shorter array report
    NULL on the missing side. Element comparison is null-safe on the
    canonical form; rows emit only for differing indices.

    ``explode_maps=True`` does the same for string-keyed MAP leaves —
    field names ``path.<key>`` over the union of both sides' keys (maps
    ARE objects in the reference's JS data model, so deep-object-diff
    recurses into them identically); a key present on one side only
    reports NULL on the other.

    The Spark rendering of the reference's ``detailedDiff`` `updated` bucket
    (src/index.js:205): one output row per (matched row, changed *leaf*) —
    nested structs recursed to dot-path leaves exactly as
    :func:`key_diff`'s ``changed_fields`` — with the old and new values
    stringified (stable JSON for arrays/maps). The reference's known wart —
    deleted fields showing ``undefined`` instead of the old value (its TODO
    at src/index.js:26-28) — is fixed here: both sides are always reported
    (a side absent from the schema reports NULL).

    Columns: key fields (string), ``field``, ``old_value``, ``new_value``.
    """
    key = list(key)
    old_schema = {f.name: f.dataType for f in old.schema.fields}
    new_schema = {f.name: f.dataType for f in new.schema.fields}
    leaves = _diff_leaves(old_schema, new_schema, key, compare_cols, max_struct_depth)

    diff = key_diff(
        old, new, key, compare_cols=compare_cols, include_payload=True,
        max_struct_depth=max_struct_depth,
    )
    matched = diff.filter(F.col("diff_kind") == KIND_CHANGED)

    def _is_arr(t) -> bool:
        return isinstance(t, T.ArrayType)

    def _is_str_map(t) -> bool:
        return isinstance(t, T.MapType) and isinstance(t.keyType, T.StringType)

    array_leaves = (
        [l for l in leaves if _is_arr(l[1]) and _is_arr(l[2])] if explode_arrays else []
    )
    map_leaves = (
        [l for l in leaves if _is_str_map(l[1]) and _is_str_map(l[2])]
        if explode_maps
        else []
    )
    taken = {l[0] for l in array_leaves} | {l[0] for l in map_leaves}
    scalar_leaves = [l for l in leaves if l[0] not in taken]

    _null_str = F.lit(None).cast("string")
    parts: list[DataFrame] = []

    if scalar_leaves:
        pairs = F.array(
            *[
                F.struct(
                    F.lit(".".join(p)).alias("field"),
                    (
                        stringify(_get_path(F.col("old"), p), ot)
                        if ot is not None
                        else _null_str
                    ).alias("old_value"),
                    (
                        stringify(_get_path(F.col("new"), p), nt)
                        if nt is not None
                        else _null_str
                    ).alias("new_value"),
                )
                for p, ot, nt in scalar_leaves
            ]
        )
        exploded = matched.select(
            *[F.col(k) for k in key],
            F.col("changed_fields"),
            F.explode(pairs).alias("d"),
        )
        parts.append(
            exploded.filter(
                F.array_contains(F.col("changed_fields"), F.col("d.field"))
            ).select(
                *[F.col(k) for k in key],
                F.col("d.field").alias("field"),
                F.col("d.old_value").alias("old_value"),
                F.col("d.new_value").alias("new_value"),
            )
        )

    for p, ot, nt in array_leaves:
        dot = ".".join(p)
        a, b = _get_path(F.col("old"), p), _get_path(F.col("new"), p)
        et_o, et_n = ot.elementType, nt.elementType
        n = F.greatest(
            F.coalesce(F.size(a), F.lit(0)), F.coalesce(F.size(b), F.lit(0))
        )
        idxs = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
            F.array().cast("array<int>")
        )
        staged = (
            matched.filter(F.array_contains(F.col("changed_fields"), F.lit(dot)))
            .select(
                *[F.col(k) for k in key],
                a.alias("__a"),
                b.alias("__b"),
                F.explode(idxs).alias("__i"),
            )
        )
        # try_element_at: past-the-end indices read as NULL (ANSI element_at
        # throws); the missing side then reports NULL, deep-object-diff's
        # added/deleted index buckets rendered uniformly
        ea = F.try_element_at(F.col("__a"), F.col("__i") + 1)
        eb = F.try_element_at(F.col("__b"), F.col("__i") + 1)
        if et_o.simpleString() != et_n.simpleString():
            elem_changed = ~stringify(ea, et_o).eqNullSafe(stringify(eb, et_n))
        elif has_map(et_o):
            elem_changed = ~canonical(ea, et_o).eqNullSafe(canonical(eb, et_n))
        else:
            elem_changed = ~ea.eqNullSafe(eb)
        parts.append(
            staged.where(elem_changed).select(
                *[F.col(k) for k in key],
                F.concat(F.lit(dot + "."), F.col("__i").cast("string")).alias("field"),
                stringify(ea, et_o).alias("old_value"),
                stringify(eb, et_n).alias("new_value"),
            )
        )

    for p, ot, nt in map_leaves:
        dot = ".".join(p)
        a, b = _get_path(F.col("old"), p), _get_path(F.col("new"), p)
        vt_o, vt_n = ot.valueType, nt.valueType
        keys = F.array_distinct(
            F.concat(
                F.coalesce(F.map_keys(a), F.array().cast("array<string>")),
                F.coalesce(F.map_keys(b), F.array().cast("array<string>")),
            )
        )
        staged = (
            matched.filter(F.array_contains(F.col("changed_fields"), F.lit(dot)))
            .select(
                *[F.col(k) for k in key],
                a.alias("__a"),
                b.alias("__b"),
                F.explode(keys).alias("__k"),
            )
        )
        va = F.try_element_at(F.col("__a"), F.col("__k"))
        vb = F.try_element_at(F.col("__b"), F.col("__k"))
        if vt_o.simpleString() != vt_n.simpleString():
            v_changed = ~stringify(va, vt_o).eqNullSafe(stringify(vb, vt_n))
        elif has_map(vt_o):
            v_changed = ~canonical(va, vt_o).eqNullSafe(canonical(vb, vt_n))
        else:
            v_changed = ~va.eqNullSafe(vb)
        parts.append(
            staged.where(v_changed).select(
                *[F.col(k) for k in key],
                F.concat(F.lit(dot + "."), F.col("__k")).alias("field"),
                stringify(va, vt_o).alias("old_value"),
                stringify(vb, vt_n).alias("new_value"),
            )
        )

    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out
