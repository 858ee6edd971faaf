"""Lineage/observability (operators/lineage.py): Observation harvest
from one action, versioned run accumulation, report arithmetic, and
edge totality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avro_diff_spark.operators.lineage import (
    lineage_report,
    observe_stage,
    record_run,
)
from avro_diff_spark.sources import versioned as V


def test_observe_stage_single_action_counts(spark):
    """A linear 3-stage funnel with observations on every stage: one
    final action fires them all with the exact per-stage counts, and
    extra aggregates ride along."""
    df = spark.createDataFrame(
        [(i, i % 3, i * 10) for i in range(30)], "k long, m long, x long"
    )
    s0, o0 = observe_stage(df, "s0", x_sum=F.sum("x"))
    s1, o1 = observe_stage(s0.where(F.col("m") != 0), "s1")
    s2, o2 = observe_stage(s1.where(F.col("k") >= 10), "s2")
    n_final = s2.groupBy("m").count().count()  # ONE action
    assert n_final == 2
    assert o0.get["n_rows"] == 30 and o0.get["x_sum"] == sum(i * 10 for i in range(30))
    assert o1.get["n_rows"] == 20
    assert o2.get["n_rows"] == 14  # k in 10..29 with k%3 != 0


def test_record_and_report_two_runs(spark, tmp_path):
    path = str(tmp_path / "lin")
    record_run(spark, path, 7, [("raw", 100), ("filtered", 40), ("dedup", 10)])
    record_run(spark, path, 8, [("raw", 50), ("filtered", 0), ("dedup", 0)])
    # run id rides app_meta
    assert V.latest_app_meta(path, "lineage_run")["lineage_run"] == 8
    rows = {
        (r.run_id, r.stage): (r.n_rows, r.n_dropped, r.retained_ppm, r.overall_ppm)
        for r in lineage_report(spark, path).collect()
    }
    assert rows[(7, "raw")] == (100, 0, 1_000_000, 1_000_000)
    assert rows[(7, "filtered")] == (40, 60, 400_000, 400_000)
    assert rows[(7, "dedup")] == (10, 30, 250_000, 100_000)
    # empty-stage totality: retention after a 0-count stage is 0, not an error
    assert rows[(8, "filtered")] == (0, 50, 0, 0)
    assert rows[(8, "dedup")] == (0, 0, 0, 0)
    # single-run selection
    only7 = lineage_report(spark, path, run_id=7)
    assert only7.count() == 3 and only7.where("run_id = 8").count() == 0


def test_record_run_is_a_versioned_table(spark, tmp_path):
    """Runs are commits: time travel sees run 0 alone at version 0, and
    the two-run diff is an ordinary keyed diff."""
    path = str(tmp_path / "lin")
    record_run(spark, path, 0, [("raw", 10), ("kept", 4)])
    record_run(spark, path, 1, [("raw", 12), ("kept", 3)])
    v0 = V.read_version(spark, path, 0)
    assert {r.run_id for r in v0.collect()} == {0}
    assert V.read_version(spark, path).count() == 4


def test_record_run_rejects_empty(spark, tmp_path):
    with pytest.raises(ValueError):
        record_run(spark, str(tmp_path / "x"), 0, [])
