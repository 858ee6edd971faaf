"""Data-layout operators: multi-dimensional clustering for scan pruning.

No reference parity (yuana97/Avro_Diff reads whole files and has no write
path beyond console output — SURVEY.md §2); this is north-star extension
surface for the 100 TB side of the engine. Parquet scans prune at two
granularities — files (via footer min/max) and row groups — and BOTH
depend on how rows are laid out on disk. Sorting by one column makes that
column's ranges tight but leaves every other filter column's ranges as
wide as the table. Z-ORDER clustering (bit-interleaving the dimensions,
the technique Delta/Iceberg expose as ``OPTIMIZE ... ZORDER BY``) keeps
EVERY clustered column's per-file range narrow, so a filter on ANY of
them prunes most files.

Everything here is pure Column expressions (quantile bucketize → bit
interleave) plus one ``repartitionByRange`` on the key — exactly one
extra shuffle over a plain write, which is what ``OPTIMIZE`` costs on the
managed platforms too. The quantile mapping computes per-column CUT
POINTS once (Spark's own distributed range-partitioner sampling over a
single-column projection — bounded driver state, ≤ one row per bucket)
and embeds them as a literal array bucketized by a branch-free
expression, so skewed value distributions still split into
equal-population buckets (raw min/max scaling would collapse under
skew) WITHOUT the unpartitioned ``ntile`` window an earlier version
used: Spark plans an unpartitioned window by moving the entire dataset
through ONE task — invisible at test scale, fatal at 100 TB. The
cut-point form is also value-deterministic (equal values always share a
bucket; ntile split ties arbitrarily) and reusable as literals by
incremental/streaming writers.

Verification is physical, not aspirational: tests/test_layout.py writes
the same data z-ordered and linearly sorted, reads the parquet FOOTERS
back with pyarrow, and asserts the z-ordered layout shrinks the average
per-file bounding box — i.e. real files a real scan would skip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "zorder_key",
    "write_zordered",
    "hilbert_key",
    "write_hilbert",
    "file_stats",
]

# Per-dimension quantile resolution cap: 2^8 = 256 population-quantile
# buckets per clustered column. Resolution beyond the output file count
# buys nothing (per-file ranges are set by files^(1/n_cols), not by the
# quantile grid), and the cap bounds BOTH the literal cut array each
# task evaluates and the driver state (≤ 255 values per column).
_MAX_BITS = 8


def _cut_points(df: DataFrame, col: str, buckets: int) -> list:
    """Driver-side sorted list of ≤ ``buckets``−1 upper-bound cut values
    for equal-population bucketing of ``col`` — computed by Spark's OWN
    distributed range partitioner (reservoir-sampled, deterministic
    seeds) over the single-column projection: one narrow shuffle, one
    max() per range, ≤ ``buckets`` rows to the driver. Works for any
    orderable type (numeric/temporal/string), never funnels data through
    one task, and scales to any input size — the planning pass every
    ``OPTIMIZE ZORDER`` implementation runs."""
    rows = (
        df.select(col)
        .where(F.col(col).isNotNull())
        .repartitionByRange(buckets, F.col(col))
        .select(F.spark_partition_id().alias("__p"), F.col(col).alias("__v"))
        .groupBy("__p")
        .agg(F.max("__v").alias("__hi"))
        .collect()
    )
    his = [r["__hi"] for r in sorted(rows, key=lambda r: r["__p"])]
    return sorted(set(his[:-1]))  # the last range's max is the global max


def _bucket_expr(col: str, cuts: list) -> Column:
    """Branch-free bucket id of ``col`` against literal ``cuts``: the
    count of cut points strictly below the value (one higher-order
    ``aggregate`` over a ≤255-element literal array — no window, no
    shuffle, no UDF). Nulls land in bucket 0, matching Spark's
    nulls-first default ordering."""
    if not cuts:
        return F.lit(0).cast("long")
    arr = F.array(*[F.lit(v) for v in cuts])
    z = F.lit(0).cast("long")
    return F.when(F.col(col).isNull(), z).otherwise(
        F.aggregate(
            arr,
            z,
            lambda acc, cut: acc
            + F.when(F.col(col) > cut, 1).otherwise(0).cast("long"),
        )
    )


def _quantile_buckets(
    df: DataFrame, cols: list[str], bits: int, cuts: dict | None = None
) -> tuple[DataFrame, list[str], int, dict]:
    """Shared quantization step of both curves: add a ``__q_{c}`` bucket
    column per clustering column (equal-population quantiles via
    :func:`_cut_points` + :func:`_bucket_expr`), returning the effective
    per-dimension bit width (``min(bits, _MAX_BITS)``) and the cut
    points used. Caller-provided ``cuts`` (``{col: [values]}``) skip the
    sampling pass entirely — the incremental-clustering path: new data
    buckets against the SAME grid the last full clustering established,
    so its files land in the established curve address space."""
    bits_eff = min(bits, _MAX_BITS)
    buckets = 1 << bits_eff
    out, qcols = df, []
    used: dict = {}
    for c in cols:
        qc = f"__q_{c}"
        cv = cuts[c] if cuts is not None and c in cuts else _cut_points(df, c, buckets)
        used[c] = cv
        out = out.withColumn(qc, _bucket_expr(c, cv))
        qcols.append(qc)
    return out, qcols, bits_eff, used


def zorder_key(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 16,
    cuts: dict | None = None,
    return_cuts: bool = False,
):
    """Add a ``__zkey`` column: the bit-interleaved Z-address of ``cols``.

    Each column is first mapped to an equal-population quantile bucket
    (driver-computed cut points embedded as a literal array — rank-based,
    so arbitrary numeric/temporal/string types and skewed distributions
    all spread evenly; resolution capped at ``min(bits, 8)`` bits per
    dimension), then the per-column bits are interleaved MSB-first: bit
    ``b`` of column ``i`` lands at position ``b * n_cols + i`` from the
    top. Nulls bucket lowest, matching Spark's default null ordering.

    Scale shape: one bounded sampling pass per column (Spark's range
    partitioner — the same planning pass a global sort runs) plus a
    map-only bucketize; NO unpartitioned window anywhere — the plan gate
    in tests/test_layout.py pins Window-free plans.
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    n = len(cols)
    out, qcols, bits_eff, used = _quantile_buckets(df, cols, bits, cuts)
    # interleave: result bit (bits*n - 1 - (b*n + i)) takes column i's
    # bit (bits - 1 - b) — classic Morton/Z-address, MSB-aligned
    key: Column = F.lit(0).cast("long")
    for b in range(bits_eff):
        for i, qc in enumerate(qcols):
            src_bit = bits_eff - 1 - b
            dst_bit = bits_eff * n - 1 - (b * n + i)
            key = key + F.shiftleft(
                F.shiftright(F.col(qc), src_bit).bitwiseAND(F.lit(1)), dst_bit
            )
    keyed = out.withColumn("__zkey", key).drop(*qcols)
    return (keyed, used) if return_cuts else keyed


def _hilbert_index_np(coords, bits: int):
    """Vectorized Skilling transform (J. Skilling, "Programming the
    Hilbert curve", AIP Conf. Proc. 707, 2004 — the public-domain
    algorithm every lakehouse Hilbert implementation uses): n-dim
    ``bits``-bit coordinates → Hilbert index, via inverse-undo +
    Gray-encode on the transposed axes, then MSB-first bit interleave.
    Verified in tests by exhaustive bijection + unit-step adjacency (the
    defining curve property: consecutive indices differ in exactly one
    coordinate by exactly 1)."""
    import numpy as np

    X = coords.astype(np.int64).copy()
    rows, n = X.shape
    M = 1 << (bits - 1)
    Q = M
    while Q > 1:
        P = Q - 1
        for i in range(n):
            mask = (X[:, i] & Q) != 0
            X[mask, 0] ^= P
            t = (X[~mask, 0] ^ X[~mask, i]) & P
            X[~mask, 0] ^= t
            X[~mask, i] ^= t
        Q >>= 1
    for i in range(1, n):
        X[:, i] ^= X[:, i - 1]
    t = np.zeros(rows, np.int64)
    Q = M
    while Q > 1:
        m = (X[:, n - 1] & Q) != 0
        t[m] ^= Q - 1
        Q >>= 1
    X ^= t[:, None]
    out = np.zeros(rows, np.int64)
    for b in range(bits):
        for i in range(n):
            src = bits - 1 - b
            dst = bits * n - 1 - (b * n + i)
            out |= ((X[:, i] >> src) & 1) << dst
    return out


def hilbert_key(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 16,
    cuts: dict | None = None,
    return_cuts: bool = False,
):
    """Add a ``__hkey`` column: the Hilbert-curve address of ``cols`` —
    the OTHER clustering curve lakehouses ship (Databricks liquid
    clustering moved from Z-order to Hilbert): unlike Z-order, every
    step of the curve is a unit step, so it has no Z-shaped "seams"
    where one file spans a huge range of one dimension, giving tighter
    per-file bounding boxes at the same file count.

    Quantile bucketing is byte-for-byte the Z-order path's (driver-
    computed cut points as literal arrays, skew-proof, no window); the
    curve transform itself runs as an Arrow-batched vectorized
    pandas_udf — a deliberate exception to the expressions-only rule:
    the Skilling transform's data-dependent per-bit swaps would explode
    a Column-expression tree, and layout writes are one-off
    OPTIMIZE-style jobs where the (numpy, batched) Python boundary is
    off every query's hot path.
    """
    from pyspark.sql.functions import pandas_udf

    if not cols:
        raise ValueError("hilbert_key needs at least one column")
    if bits * len(cols) > 62:
        raise ValueError("bits * len(cols) must fit a signed 64-bit key")
    out, qcols, bits_eff, used = _quantile_buckets(df, cols, bits, cuts)

    @pandas_udf("long")
    def hidx(*qs):
        import numpy as np
        import pandas as pd

        coords = np.stack([q.to_numpy(np.int64) for q in qs], axis=1)
        return pd.Series(_hilbert_index_np(coords, bits_eff))

    keyed = out.withColumn("__hkey", hidx(*[F.col(qc) for qc in qcols])).drop(*qcols)
    return (keyed, used) if return_cuts else keyed


def write_hilbert(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Hilbert address of
    ``cols`` — same one-shuffle cost profile as :func:`write_zordered`,
    tighter bounding boxes (no Z seams)."""
    keyed = hilbert_key(df, cols, bits=bits)
    (
        keyed.repartitionByRange(n_files, F.col("__hkey"))
        .sortWithinPartitions("__hkey")
        .drop("__hkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order of ``cols``:
    range-partition on the Z-address into ``n_files`` tasks, sort within
    each partition, drop the key. One shuffle; every file covers a
    contiguous Z-range, so each clustered column's footer min/max is
    ~n_files^(1/len(cols)) of the table range instead of all of it."""
    keyed = zorder_key(df, cols, bits=bits)
    (
        keyed.repartitionByRange(n_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats(path: str, cols: list[str]) -> list[dict]:
    """Per-file min/max of ``cols`` read straight from the parquet footers
    (pyarrow, driver-side metadata only — the same stats a Spark scan's
    file pruning consults). Returns one dict per data file."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        stats: dict = {"file": name, "rows": md.num_rows}
        for c in cols:
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(idx[c]).statistics
                if s is None or not s.has_min_max:
                    lo = hi = None
                    break
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
            stats[c] = (lo, hi)
        out.append(stats)
    return out
