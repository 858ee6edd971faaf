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

Everything here is pure Column expressions (rank → fixed-point quantile →
bit interleave) plus one ``repartitionByRange`` on the key — exactly one
extra shuffle over a plain write, which is what ``OPTIMIZE`` costs on the
managed platforms too. No UDFs, no driver materialization; the quantile
mapping uses ``ntile`` so skewed value distributions still split into
equal-population buckets (raw min/max scaling would collapse under skew).

Verification is physical, not aspirational: tests/test_layout.py writes
the same data z-ordered and linearly sorted, reads the parquet FOOTERS
back with pyarrow, and asserts the z-ordered layout shrinks the average
per-file bounding box — i.e. real files a real scan would skip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["zorder_key", "write_zordered", "file_stats"]


def zorder_key(df: DataFrame, cols: list[str], *, bits: int = 16) -> DataFrame:
    """Add a ``__zkey`` column: the bit-interleaved Z-address of ``cols``.

    Each column is first mapped to a ``bits``-bit integer by population
    quantile (``ntile(2^bits)`` over the column's order — rank-based, so
    arbitrary numeric/temporal/string types and skewed distributions all
    spread evenly), then the per-column bits are interleaved MSB-first:
    bit ``b`` of column ``i`` lands at position ``b * n_cols + i`` from
    the top. Nulls sort first (ntile bucket 0 side), matching Spark's
    default null ordering.

    The ntile windows are unpartitioned — one pass per column over the
    dataset being clustered, the same cost profile as the global sort an
    ``OPTIMIZE ZORDER`` job runs. For incremental/streaming variants,
    compute quantile cut points once and reuse them as literals.
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    n = len(cols)
    buckets = 1 << bits
    out = df
    qcols = []
    for c in cols:
        qc = f"__q_{c}"
        out = out.withColumn(
            qc, (F.ntile(buckets).over(Window.orderBy(F.col(c))) - 1).cast("long")
        )
        qcols.append(qc)
    # interleave: result bit (bits*n - 1 - (b*n + i)) takes column i's
    # bit (bits - 1 - b) — classic Morton/Z-address, MSB-aligned
    key: Column = F.lit(0).cast("long")
    for b in range(bits):
        for i, qc in enumerate(qcols):
            src_bit = bits - 1 - b
            dst_bit = bits * n - 1 - (b * n + i)
            key = key + F.shiftleft(
                F.shiftright(F.col(qc), src_bit).bitwiseAND(F.lit(1)), dst_bit
            )
    return out.withColumn("__zkey", key).drop(*qcols)


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
