"""Per-job breakdown of one registry query: build + noop-exec with the
UI REST API on, printing each Spark job's duration, stage count and name.

Usage: python tools/profile_jobs.py <query> [sf_dir] [--exec-only]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import __spark_entry__ as ent
    from avro_diff_spark.session import get_spark

    spark = get_spark("profile-jobs", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()

    # warm once (codegen, python workers) so the profiled pass is steady
    df = qs[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def jobs():
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs") as r:
            return json.load(r)

    seen = {j["jobId"] for j in jobs()}
    t0 = time.perf_counter()
    df = qs[name](spark, sf_dir)
    t1 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    t2 = time.perf_counter()
    print(f"build {t1 - t0:.2f}s  exec {t2 - t1:.2f}s")
    from datetime import datetime

    def ms(j, k):
        return datetime.strptime(j[k][:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    new = sorted(
        (j for j in jobs() if j["jobId"] not in seen), key=lambda j: j["jobId"]
    )
    for j in new:
        dur = ms(j, "completionTime") - ms(j, "submissionTime") if "completionTime" in j else -1
        desc = (j.get("description") or j.get("name") or "")[:110]
        print(
            f"job {j['jobId']:4d} {dur:7.2f}s stages={len(j['stageIds']):2d} "
            f"tasks={j['numTasks']:4d} {desc}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
