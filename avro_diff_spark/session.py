"""SparkSession construction with scale-appropriate defaults.

The reference is a single-threaded Node process (reference src/index.js:363-370
— the event-loop stream pump is its only concurrency). Here the execution
substrate is Spark; these defaults are chosen so the same logical plans run
on local[N] for tests and on a 1000-executor cluster unchanged:

- AQE on (runtime re-plan: join strategy demotion/promotion, skew-join split,
  partition coalescing) — the single biggest lever for 100 TB robustness.
- UTC session timezone for deterministic timestamp arithmetic across engines.
- Arrow enabled so any Pandas-UDF path is batch-vectorized, never row-at-a-time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_mem_gb() -> int:
    """min(24, max(2, half of physical RAM)) in GiB — 24g where the host
    allows it, a JVM that still starts where it doesn't."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    total_gb = int(line.split()[1]) / (1 << 20)
                    return max(2, min(24, int(total_gb * 0.5)))
    except OSError:  # non-Linux: keep the documented default
        pass
    return 24


def get_spark(
    app_name: str = "avro_diff_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    for local runs; on a real cluster leave it unset and let spark-submit
    inject the master.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local mode runs driver + all 32 task threads in ONE JVM: an 8g
        # heap GC-thrashes once a long session accumulates shuffle/broadcast
        # state (measured ~2x inflation on late-running dedup queries in a
        # 100-execution bench session); 24g removes it with headroom on the
        # 128 GiB target hosts. Clamped to half the physical RAM so the JVM
        # still starts on smaller machines (round-4 ADVICE); override with
        # SPARK_GRAFT_DRIVER_MEM. Real clusters size executors separately.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", f"{_default_driver_mem_gb()}g"),
        )
        # status-store retention: without the live UI the SQL listener still
        # keeps per-execution plan graphs/metrics; cap them so hundred-query
        # sessions (bench, oracle gate) don't grow driver heap linearly
        .config("spark.sql.ui.retainedExecutions", "20")
        .config("spark.ui.retainedJobs", "100")
        .config("spark.ui.retainedStages", "200")
        .config("spark.ui.retainedTasks", "5000")
        # Files: on a cluster, 128 MiB splits amortize task overhead; on
        # local[N] the testdata files are ~10 MiB so that would serialize the
        # scan — use small splits locally (row-group granularity) for
        # parallelism. Overridable via SPARK_GRAFT_MAX_PARTITION_BYTES.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get(
                "SPARK_GRAFT_MAX_PARTITION_BYTES",
                "8388608" if master.startswith("local") else "134217728",
            ),
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
