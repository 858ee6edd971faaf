"""Per-query profiling: build time vs execution time, job/stage counts.

Usage: python tools/profile_queries.py [sf_dir] query [query ...]

For each named registry query, in one warm session:
  t_build   — wall time of queries()[name](spark, sf_dir) (fixture jobs,
              localCheckpoints, training collects run HERE)
  t_exec1   — first noop-sink execution (codegen compile included)
  t_exec2   — second noop-sink execution (steady state)
  jobs      — Spark jobs launched during build+exec1 (fixture jobs count)

The bench's timed number per iteration ~ t_build + t_exec; the split says
whether to attack fixture/driver work or the plan itself.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1 and os.path.isdir(sys.argv[1])
        else "/root/testdata/sf0.1"
    )
    names = [a for a in sys.argv[1:] if not os.path.isdir(a)]

    import __spark_entry__ as ent
    from avro_diff_spark.session import get_spark

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    store = spark._jsparkSession.sharedState().statusStore()
    qs = ent.queries()

    del store
    tracker = spark.sparkContext.statusTracker()

    def njobs() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return (max(ids) + 1) if ids else 0

    print(
        f"{'query':36s} {'build1':>8s} {'exec1':>8s} {'build2':>8s} {'exec2':>8s} {'jobs':>5s}"
    )
    for name in names:
        if name not in qs:
            print(f"skip unknown {name}", file=sys.stderr)
            continue
        j0 = njobs()
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        j1 = njobs()
        # steady state: rebuild (fixtures cached where the query caches
        # them) and re-execute
        df2 = qs[name](spark, sf_dir)
        t3 = time.perf_counter()
        df2.write.format("noop").mode("overwrite").save()
        t4 = time.perf_counter()
        print(
            f"{name:36s} {t1 - t0:8.2f} {t2 - t1:8.2f} {t3 - t2:8.2f} {t4 - t3:8.2f} {j1 - j0:5d}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
