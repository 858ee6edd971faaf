"""Two-level distributed running sum (operators/prefix.py): equality with
the single-window SQL semantics (incl. null keys/values), partitioning and
bucket-count invariance, the no-unpartitioned-window plan shape, and
empty-input totality."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window, functions as F

from avro_diff_spark.operators.prefix import running_sum


def _reference(df, order_cols, value_col):
    w = Window.orderBy(*[F.col(c).asc_nulls_first() for c in order_cols]).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("running", F.sum(value_col).over(w))


def _rows(df):
    return sorted(map(repr, df.collect()))


@pytest.mark.parametrize("seed", [2, 17])
def test_matches_single_window_semantics(spark, seed):
    rng = random.Random(seed)
    rows = [
        (i, rng.choice([None, rng.randrange(-50, 50)]))
        for i in rng.sample(range(4000), 1500)
    ]
    df = spark.createDataFrame(rows, "k long, x long").repartition(13)
    got = running_sum(df, ["k"], "x", buckets=16)
    want = _reference(df, ["k"], "x")
    assert _rows(got) == _rows(want)


def test_bucket_and_layout_invariance(spark):
    rows = [(i, i % 7) for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, x long")
    base = _rows(running_sum(df, ["k"], "x", buckets=4))
    assert _rows(running_sum(df, ["k"], "x", buckets=1)) == base
    assert _rows(running_sum(df.repartition(37), ["k"], "x", buckets=128)) == base


def test_no_unpartitioned_window(spark):
    df = spark.createDataFrame([(i, 1) for i in range(100)], "k long, x long")
    plan = (
        running_sum(df, ["k"], "x", buckets=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" in plan and "No Partition" not in plan


def test_empty_and_all_null_total(spark):
    empty = spark.createDataFrame([], "k long, x long")
    assert running_sum(empty, ["k"], "x").count() == 0
    nulls = spark.createDataFrame([(1, None), (2, None)], "k long, x long")
    got = sorted((r["k"], r["running"]) for r in running_sum(nulls, ["k"], "x").collect())
    assert got == [(1, None), (2, None)]


def test_global_row_number_matches_single_window(spark):
    rng = random.Random(9)
    rows = [(k, None) for k in rng.sample(range(10000), 2000)] + [(None, 1)]
    df = spark.createDataFrame(rows, "k long, x long").repartition(11)
    from avro_diff_spark.operators.prefix import global_row_number

    got = global_row_number(df, ["k"], buckets=16)
    w = Window.orderBy(F.col("k").asc_nulls_first())
    want = df.withColumn("rn", F.row_number().over(w).cast("long"))
    assert _rows(got) == _rows(want)
    # dense, 1-based, complete
    rns = sorted(r["rn"] for r in got.collect())
    assert rns == list(range(1, len(rows) + 1))
