"""Headline-query benchmark. Prints ONE JSON line.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Each query is forced with the noop sink (full
computation, no driver collect — measures the engine, not result transfer).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from avro_diff_spark.session import get_spark  # noqa: E402


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as ent

    qs = ent.queries()
    headline = [
        "key_diff_orders",
        "key_diff_detail_orders",
        "venn_removed",
        "venn_intersection",
        "key_collisions_lineitem",
        "pricing_summary",
        "top_revenue_orders",
        "region_revenue",
        "top_customers_by_segment",
        "events_hourly",
        "sessionize",
    ]
    headline = [q for q in headline if q in qs]
    # any registered query not in the fixed headline list still runs (keeps
    # bench coverage in lockstep with operator coverage)
    headline += [q for q in qs if q not in headline]

    # warm the JVM/codegen path once on the cheapest query
    _force(qs["self_diff_counts"](spark, sf_dir)) if "self_diff_counts" in qs else None

    times: dict[str, float] = {}
    for name in headline:
        t0 = time.perf_counter()
        _force(qs[name](spark, sf_dir))
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
