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
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


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
