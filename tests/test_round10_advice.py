"""Round-9 ADVICE fixes: compute_stats NDV on all-NULL columns,
kmv_overlap totality on empty inputs, commit_snapshot's rebase keeping
the stage-time physical partition spec, and exact integer bucketing in
the interval operators beyond the 2^53 double-precision bound."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

import avro_diff_spark.sources.versioned as V
from avro_diff_spark.functions import sketches as SK
from avro_diff_spark.operators.interval import _fdiv, interval_join, overlap_join
from avro_diff_spark.sources.versioned import (
    commit_snapshot,
    compute_stats,
    read_version,
    rename_column,
    table_ndv,
)


def test_compute_stats_ndv_all_null_column(spark, tmp_path):
    """ANALYZE NDV on a column with no non-null values: the global HLL
    fold yields est_x1000 NULL (no registers present); that is zero
    distinct values, not a TypeError from None/1000.0."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, None), (2, None)], "k long, v string")
    commit_snapshot(df, t)
    v = compute_stats(spark, t, [], ndv_cols=["v", "k"])
    assert v is not None
    nd = table_ndv(t)
    assert nd["v"] == 0
    assert nd["k"] == 2


def test_compute_stats_ndv_empty_snapshot(spark, tmp_path):
    """Same totality on an EMPTY table snapshot (every row deleted)."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    commit_snapshot(df, t)
    V.delete_where(spark, t, F.lit(True), rewrite="cow")
    v = compute_stats(spark, t, [], ndv_cols=["v"])
    assert v is not None
    assert table_ndv(t)["v"] == 0


def test_hll_corrected_estimate_total_on_empty(spark):
    """hll_corrected_estimate itself is total: an empty register table
    folds to est_x1000 NULL -> 0.0, never None/1000.0."""
    empty = spark.createDataFrame([], "v string")
    row = SK.hll_estimate(SK.hll_registers(empty, "v")).collect()[0]
    assert row.est_x1000 is None  # the shape that used to crash
    assert SK.hll_corrected_estimate(row) == 0.0


def test_kmv_overlap_empty_inputs(spark):
    """Two empty relations: the estimator returns (0, 0, 0) exactly like
    its DuckDB twin (count(*) is total; Spark's sum over an empty global
    agg is NULL and must be coalesced)."""
    empty = spark.createDataFrame([], "v string")
    row = SK.kmv_overlap(empty, empty, "v", k=16).collect()[0]
    assert (row.n_union_sketch, row.cnt_both, row.est_inter_x1000) == (0, 0, 0)


def test_kmv_overlap_one_empty_side(spark):
    """One empty side: union sketch is the other side, intersection 0."""
    empty = spark.createDataFrame([], "v string")
    other = spark.createDataFrame([("a",), ("b",)], "v string")
    row = SK.kmv_overlap(other, empty, "v", k=16).collect()[0]
    assert (row.n_union_sketch, row.cnt_both, row.est_inter_x1000) == (2, 0, 0)


def test_append_rebase_keeps_stage_time_partition_spec(spark, tmp_path):
    """commit_snapshot's lost-race rebase: the physical partition spec
    stays the STAGE-TIME translation (the hive layout is baked into the
    staged files). Re-translating the caller's logical names through the
    FRESH mapping would miss after a concurrent rename of the partition
    column the caller already addressed by its pre-race name, spuriously
    failing the partitioning guard."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "x", "a")], "k long, p string, v string")
    commit_snapshot(df, t, partition_by=["p"])
    rename_column(t, "p", "q")  # physical stays 'p'

    real_publish = V._publish_commit
    fired = {"n": 0}

    def racing_publish(table_path, version, commit):
        if commit["mode"] == "append" and fired["n"] == 0:
            fired["n"] = 1
            rename_column(t, "q", "r")
            raise V.CommitConflict("lost race to rename_column")
        return real_publish(table_path, version, commit)

    V._publish_commit = racing_publish
    try:
        commit_snapshot(
            spark.createDataFrame([(2, "y", "b")], "k long, q string, v string"),
            t,
            mode="append",
            partition_by=["q"],
        )
    finally:
        V._publish_commit = real_publish
    assert fired["n"] == 1, "race injection never fired"
    # the table partitioning is still the rename-stable physical 'p',
    # and both rows read back under the freshest logical name 'r'
    assert V._table_partitioning(t, V.latest_version(t)) == ["p"]
    got = {(r.k, r.r, r.v) for r in read_version(spark, t).collect()}
    assert got == {(1, "x", "a"), (2, "y", "b")}


# --------------------------------------------------- interval exactness ---


def test_fdiv_matches_python_floor_division(spark):
    """_fdiv == Python // across sign changes and beyond 2^53, where
    floor(long/long) through double division mis-buckets (pinned: the
    old formulation actually differs on 2^53 + 1)."""
    vals = [0, 1, -1, 7, -7, 2**53 - 1, 2**53, 2**53 + 1, -(2**53 + 1)]
    rng = random.Random(10)
    vals += [rng.randrange(-(2**62), 2**62) for _ in range(64)]
    for b in (1, 2, 3, 1000, 3_600_000_000):
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        rows = df.select(
            "v",
            _fdiv(F.col("v"), b).alias("fd"),
            F.floor(F.col("v") / F.lit(b)).alias("old"),
        ).collect()
        for r in rows:
            assert r.fd == r.v // b, (r.v, b)
        if b == 3:
            old = {r.v: r.old for r in rows}
            assert old[2**53 + 1] != (2**53 + 1) // 3


def test_interval_join_exact_beyond_2_53(spark):
    """interval_join at |v| >= 2^53 vs the brute-force inequality join
    (exact long comparisons): zero false negatives from bucketing."""
    rng = random.Random(11)
    base = 2**53
    pts = [(i, base + rng.randrange(-50, 50)) for i in range(80)]
    ivs = []
    for j in range(40):
        s = base + rng.randrange(-50, 40)
        ivs.append((j, s, s + rng.randrange(0, 9)))
    p = spark.createDataFrame(pts, "pid long, ts long")
    iv = spark.createDataFrame(ivs, "iid long, lo long, hi long")
    got = {
        (r.pid, r.iid)
        for r in interval_join(
            p, iv, point_col="ts", start_col="lo", end_col="hi", bucket_width=3
        ).collect()
    }
    want = {
        (r.pid, r.iid)
        for r in p.crossJoin(iv)
        .where((F.col("ts") >= F.col("lo")) & (F.col("ts") <= F.col("hi")))
        .collect()
    }
    assert got == want and want  # non-vacuous


def test_overlap_join_exact_beyond_2_53(spark):
    """overlap_join at |v| >= 2^53 vs brute force, half-open AND closed,
    including the emit-once dedup rule under exact bucketing."""
    rng = random.Random(12)
    base = 2**53
    rows_a, rows_b = [], []
    for j in range(40):
        s = base + rng.randrange(-40, 40)
        rows_a.append((j, s, s + rng.randrange(0, 9)))
        s = base + rng.randrange(-40, 40)
        rows_b.append((j, s, s + rng.randrange(0, 9)))
    a = spark.createDataFrame(rows_a, "aid long, a_lo long, a_hi long")
    b = spark.createDataFrame(rows_b, "bid long, b_lo long, b_hi long")
    for inclusive in (True, False):
        got_rows = overlap_join(
            a,
            b,
            left_start="a_lo",
            left_end="a_hi",
            right_start="b_lo",
            right_end="b_hi",
            bucket_width=3,
            end_inclusive=inclusive,
        ).collect()
        got = [(r.aid, r.bid) for r in got_rows]
        if inclusive:
            cond = (F.col("a_lo") <= F.col("b_hi")) & (F.col("b_lo") <= F.col("a_hi"))
        else:
            cond = (F.col("a_lo") < F.col("b_hi")) & (F.col("b_lo") < F.col("a_hi"))
        want = {(r.aid, r.bid) for r in a.crossJoin(b).where(cond).collect()}
        assert set(got) == want and want
        assert len(got) == len(want), "pair emitted more than once"
