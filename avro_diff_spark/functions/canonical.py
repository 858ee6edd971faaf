"""Canonical (orderable, comparable) representations of arbitrary columns.

The reference canonicalizes whole rows by stable JSON stringification with
sorted keys (``stableStringify``, reference src/index.js:91) so that
equivalent objects hash identically. In Spark, struct/array equality is
positional and native — but ``MapType`` columns are neither comparable nor
usable in set operations. These helpers rewrite any column into an
equivalent fully-orderable shape:

- ``MapType``  → sorted ``array<struct<key,value>>`` (deterministic entry order)
- ``ArrayType``/``StructType`` → recurse into elements/fields
- atomic types → unchanged

All expression-only (JVM-side, whole-stage-codegen eligible): no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T


def canonical(col: Column, dtype: T.DataType) -> Column:
    """Rewrite ``col`` of type ``dtype`` into an orderable equivalent."""
    if isinstance(dtype, T.MapType):
        entries = F.transform(
            F.map_entries(col),
            lambda e: F.struct(
                canonical(e["key"], dtype.keyType).alias("key"),
                canonical(e["value"], dtype.valueType).alias("value"),
            ),
        )
        return F.array_sort(entries)
    if isinstance(dtype, T.ArrayType):
        return F.transform(col, lambda x: canonical(x, dtype.elementType))
    if isinstance(dtype, T.StructType):
        return F.struct(
            *[canonical(col.getField(f.name), f.dataType).alias(f.name) for f in dtype.fields]
        )
    return col


def has_map(dtype: T.DataType) -> bool:
    if isinstance(dtype, T.MapType):
        return True
    if isinstance(dtype, T.ArrayType):
        return has_map(dtype.elementType)
    if isinstance(dtype, T.StructType):
        return any(has_map(f.dataType) for f in dtype.fields)
    return False


def canonicalize_rows(df: DataFrame) -> DataFrame:
    """Rewrite only the columns that contain maps; leave the rest untouched.

    Used before set operations (``exceptAll``/``intersectAll``) which require
    orderable row types.
    """
    out = []
    for f in df.schema.fields:
        c = F.col(f.name)
        out.append((canonical(c, f.dataType) if has_map(f.dataType) else c).alias(f.name))
    return df.select(*out)


def stringify(col: Column, dtype: T.DataType) -> Column:
    """Human/diff-payload string form of a value: cast for atomics, stable
    JSON for nested types (parity with the reference's JSON-object payloads)."""
    if isinstance(dtype, (T.StructType, T.ArrayType, T.MapType)):
        return F.to_json(col)
    return col.cast("string")


def ts_micros(col: Column) -> Column:
    """Epoch microseconds of a timestamp (TZ or NTZ) column.

    Engine-portable integer representation: with the session timezone pinned
    to UTC (see session.py), this equals DuckDB's ``epoch_us`` on the same
    parquet value — used wherever a timestamp must appear in an
    oracle-checked output.
    """
    return F.unix_micros(col.cast("timestamp"))


def stable_row_json(df: DataFrame) -> Column:
    """``to_json`` of the row with columns in sorted-name order — the Spark
    equivalent of the reference's ``stableStringify(row)`` (src/index.js:91)."""
    return F.to_json(F.struct(*[F.col(c) for c in sorted(df.columns)]))


def fold_single_rows(frames, cols):
    """Combine N single-row DataFrames, each carrying a SUBSET of
    ``cols``, into ONE row with all of them: union of null-padded
    projections + a max fold per column. This is the canonical way to
    sit several scalar aggregates side by side — the tempting
    alternative (joining the 1-row frames on a literal key) constant-
    folds into the BroadcastNestedLoopJoin shape the plan gate bans.
    Column dtypes are taken from whichever frame defines each column."""
    from pyspark.sql import functions as F

    dtypes = {}
    for fr in frames:
        for f in fr.schema.fields:
            dtypes.setdefault(f.name, f.dataType)
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"no input frame defines column(s) {missing}")
    stacked = None
    for fr in frames:
        have = set(fr.columns)
        proj = fr.select(
            *[
                (F.col(c) if c in have else F.lit(None).cast(dtypes[c])).alias(c)
                for c in cols
            ]
        )
        stacked = proj if stacked is None else stacked.unionByName(proj)
    return stacked.agg(*[F.max(c).alias(c) for c in cols])


def with_broadcast_totals(df, totals, df_key_col: str, totals_key_col: str):
    """Attach a 1-row ``totals`` frame onto every row of ``df`` via an
    equi-join on a DATA-DERIVED constant key (``x - x`` of a never-null
    numeric column on each side) — a BroadcastHashJoin. The tempting
    literal-key join constant-folds and plans as the
    BroadcastNestedLoopJoin the plan gate bans; deriving the key from a
    data column keeps Catalyst honest (the ``_fold_tvd`` idiom,
    functions/drift.py — this is the shared form). The joined frame
    keeps ``_k`` so callers can partition a bounded window on it."""
    from pyspark.sql import functions as F

    return df.withColumn("_k", F.col(df_key_col) - F.col(df_key_col)).join(
        F.broadcast(
            totals.withColumn("_k", F.col(totals_key_col) - F.col(totals_key_col))
        ),
        "_k",
    )
