"""Physical-plan audit over every registered query.

Prints one line per query with the plan-shape health indicators the scale
contract cares about: parquet scans, shuffle exchanges, broadcast joins,
sort-merge joins, and nested-loop joins (should be none outside the
documented cosine brute-force). Planning only — no job
executes. Use it to eyeball shuffle-count regressions between rounds:

    python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as ent
    from avro_diff_spark.session import get_spark

    spark = get_spark("plan-audit", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    # no codegen column: AQE's pre-execution plan string doesn't carry
    # WholeStageCodegen annotations, so it would always read 0 here
    cols = ("scan", "exchange", "bcast", "smj", "shj", "bnlj", "window")
    print(f"{'query':32} " + " ".join(f"{c:>8}" for c in cols))
    for name, fn in sorted(ent.queries().items()):
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # surface, keep auditing the rest
            print(f"{name:32} ERROR: {type(e).__name__}: {e}")
            continue
        n_bcast = plan.count("BroadcastExchange")
        row = {
            "scan": plan.count("Scan parquet") + plan.count("Scan avro"),
            "exchange": plan.count("Exchange") - n_bcast,
            "bcast": plan.count("BroadcastHashJoin"),
            "smj": plan.count("SortMergeJoin"),
            "shj": plan.count("ShuffledHashJoin"),
            "bnlj": plan.count("BroadcastNestedLoopJoin") + plan.count("CartesianProduct"),
            # round-8: layout's unpartitioned-ntile funnel was caught by
            # eye, not the audit — count Window operators so a new one
            # on a hot path shows up here (layout plans pin ZERO windows
            # in tests/test_layout.py)
            "window": plan.count("Window"),
        }
        print(f"{name:32} " + " ".join(f"{row[c]:>8}" for c in cols))


if __name__ == "__main__":
    main()
