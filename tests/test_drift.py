"""Total-variation drift (functions/drift.py): exactness vs a pure-Python
recompute, totality on empty inputs, NULL-bucket sensitivity, identity law,
and the no-window/no-join single-aggregation plan shape."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from avro_diff_spark.functions.drift import TVD_SCALE, bucketize, tv_distance

CUTS = (10.0, 20.0, 30.0)


def _py_tvd(avals, bvals, cuts=CUTS):
    def bucket(v):
        if v is None:
            return -1
        for i, c in enumerate(cuts):
            if v < c:
                return i
        return len(cuts)

    na, nb = {}, {}
    for v in avals:
        na[bucket(v)] = na.get(bucket(v), 0) + 1
    for v in bvals:
        nb[bucket(v)] = nb.get(bucket(v), 0) + 1
    n_a, n_b = len(avals), len(bvals)
    if n_a == 0 and n_b == 0:
        return 0
    if n_a == 0 or n_b == 0:
        return TVD_SCALE
    num = sum(
        abs(na.get(k, 0) * n_b - nb.get(k, 0) * n_a) for k in set(na) | set(nb)
    )
    return math.floor(num / (n_a * n_b) * (TVD_SCALE / 2.0))


def _run(spark, avals, bvals):
    a = spark.createDataFrame([(v,) for v in avals], "x double")
    b = spark.createDataFrame([(v,) for v in bvals], "x double")
    return tv_distance(a, b, "x", CUTS).collect()[0]


def test_matches_python_fuzz(spark):
    rng = random.Random(42)
    for _ in range(5):
        avals = [rng.choice([None, rng.uniform(0, 40)]) for _ in range(rng.randrange(1, 300))]
        bvals = [rng.choice([None, rng.uniform(5, 45)]) for _ in range(rng.randrange(1, 300))]
        got = _run(spark, avals, bvals)
        assert got["tvd_x1e6"] == _py_tvd(avals, bvals)
        assert got["n_a"] == len(avals) and got["n_b"] == len(bvals)


def test_identity_and_bounds(spark):
    vals = [float(i % 37) for i in range(200)]
    assert _run(spark, vals, vals)["tvd_x1e6"] == 0
    # disjoint buckets -> maximum distance
    got = _run(spark, [1.0] * 50, [35.0] * 80)
    assert got["tvd_x1e6"] == TVD_SCALE


def test_total_on_empty_inputs(spark):
    assert _run(spark, [], [])["tvd_x1e6"] == 0
    assert _run(spark, [], [1.0])["tvd_x1e6"] == TVD_SCALE
    assert _run(spark, [1.0], [])["tvd_x1e6"] == TVD_SCALE


def test_null_rate_shift_is_drift(spark):
    base = [5.0] * 100
    assert _run(spark, base, base)["tvd_x1e6"] == 0
    shifted = [None] * 50 + [5.0] * 50
    assert _run(spark, base, shifted)["tvd_x1e6"] == TVD_SCALE // 2


def test_bucketize_edges(spark):
    df = spark.createDataFrame(
        [(None,), (9.999,), (10.0,), (29.999,), (30.0,), (1e9,)], "x double"
    )
    got = [r[0] for r in df.select(bucketize(F.col("x"), CUTS)).collect()]
    assert got == [-1, 0, 1, 2, 3, 3]


def test_plan_no_window_broadcast_totals_only(spark):
    # The totals (always 1 row) broadcast onto the distributed per-bucket
    # counts via an equi-join on a literal key: BroadcastHashJoin, never
    # the BNLJ/Cartesian a keyless 1-row join plans as, and never a
    # driver-sized collect_list of the (unbounded-cardinality) buckets.
    a = spark.createDataFrame([(1.0,)], "x double")
    plan = tv_distance(a, a, "x", CUTS)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    assert "collect_list" not in plan


def test_categorical_matches_python_and_totality(spark):
    from avro_diff_spark.functions.drift import tv_distance_categorical

    import math as _m

    avals = ["en"] * 60 + ["de"] * 30 + [None] * 10
    bvals = ["en"] * 40 + ["de"] * 40 + ["fr"] * 20
    a = spark.createDataFrame([(v,) for v in avals], "x string")
    b = spark.createDataFrame([(v,) for v in bvals], "x string")
    got = tv_distance_categorical(a, b, "x").collect()[0]
    cats = set(avals) | set(bvals)
    num = sum(abs(avals.count(c) * len(bvals) - bvals.count(c) * len(avals)) for c in cats)
    assert got["tvd_x1e6"] == _m.floor(num / (len(avals) * len(bvals)) * (TVD_SCALE / 2.0))
    assert got["n_buckets"] == len(cats)
    empty = spark.createDataFrame([], "x string")
    assert tv_distance_categorical(empty, empty, "x").collect()[0]["tvd_x1e6"] == 0
    assert tv_distance_categorical(empty, b, "x").collect()[0]["tvd_x1e6"] == TVD_SCALE
    assert tv_distance_categorical(a, a, "x").collect()[0]["tvd_x1e6"] == 0


def test_cuts_must_be_strictly_increasing(spark):
    import pytest

    from avro_diff_spark.functions.drift import tv_distance, tv_distance_sql

    a = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError):
        tv_distance(a, a, "x", (30.0, 10.0))
    with pytest.raises(ValueError):
        tv_distance_sql("t", "t", "x", (5.0, 5.0))
    with pytest.raises(ValueError):
        tv_distance(a, a, "x", ())


def test_cli_drift_command(spark, tmp_path, capsys):
    from avro_diff_spark.cli import drift_main

    a_p, b_p = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    spark.createDataFrame([(float(i % 20),) for i in range(200)], "x double").write.parquet(a_p)
    spark.createDataFrame([(float(i % 20) + 15.0,) for i in range(200)], "x double").write.parquet(b_p)
    rc = drift_main([a_p, b_p, "x", "--format", "parquet", "--cuts", "10,20,30"])
    out = capsys.readouterr().out
    assert rc == 1 and "tvd_x1e6:" in out
    # identical -> no drift
    rc = drift_main([a_p, a_p, "x", "--format", "parquet", "--cuts", "10,20,30"])
    assert rc == 0
    # categorical mode + threshold tolerance
    c_p = str(tmp_path / "c.parquet")
    spark.createDataFrame([("en",)] * 99 + [("de",)], "lang string").write.parquet(c_p)
    d_p = str(tmp_path / "d.parquet")
    spark.createDataFrame([("en",)] * 98 + [("de",)] * 2, "lang string").write.parquet(d_p)
    assert drift_main([c_p, d_p, "lang", "--format", "parquet"]) == 1
    assert drift_main([c_p, d_p, "lang", "--format", "parquet", "--threshold", "50000"]) == 0


# ---------------------------------------------------------------------------
# Kolmogorov-Smirnov (round 11)
# ---------------------------------------------------------------------------


def _py_ks(avals, bvals):
    from avro_diff_spark.functions.drift import KS_SCALE

    a = sorted(v for v in avals if v is not None)
    b = sorted(v for v in bvals if v is not None)
    if not a and not b:
        return 0
    if not a or not b:
        return KS_SCALE
    points = sorted(set(a) | set(b))
    import bisect

    num = max(
        abs(bisect.bisect_right(a, v) * len(b) - bisect.bisect_right(b, v) * len(a))
        for v in points
    )
    return math.floor(num / (float(len(a)) * float(len(b))) * float(KS_SCALE))


def _run_ks(spark, avals, bvals, buckets=4):
    from avro_diff_spark.functions.drift import ks_distance

    a = spark.createDataFrame([(v,) for v in avals], "x double")
    b = spark.createDataFrame([(v,) for v in bvals], "x double")
    return ks_distance(a, b, "x", buckets=buckets).collect()[0]


def test_ks_matches_python_fuzz(spark):
    rng = random.Random(7)
    for _ in range(4):
        avals = [rng.choice([None, float(rng.randrange(0, 60))]) for _ in range(rng.randrange(1, 250))]
        bvals = [rng.choice([None, float(rng.randrange(20, 90))]) for _ in range(rng.randrange(1, 250))]
        got = _run_ks(spark, avals, bvals)
        assert got["ks_x1e6"] == _py_ks(avals, bvals)
        assert got["n_a"] == sum(v is not None for v in avals)
        assert got["n_b"] == sum(v is not None for v in bvals)
        assert got["n_points"] == len({v for v in avals + bvals if v is not None})


def test_ks_identity_disjoint_totality(spark):
    from avro_diff_spark.functions.drift import KS_SCALE

    vals = [float(i % 23) for i in range(150)]
    assert _run_ks(spark, vals, vals)["ks_x1e6"] == 0
    assert _run_ks(spark, [1.0] * 40, [99.0] * 70)["ks_x1e6"] == KS_SCALE
    assert _run_ks(spark, [], [])["ks_x1e6"] == 0
    assert _run_ks(spark, [], [1.0])["ks_x1e6"] == KS_SCALE
    assert _run_ks(spark, [None], [1.0, None])["ks_x1e6"] == KS_SCALE  # NULLs excluded


def test_ks_dominates_single_cut_tvd(spark):
    """KS = sup over ALL points >= the CDF gap at any one declared cut;
    a two-bucket TVD at cut c is exactly that gap, so tvd(c) <= ks + 1
    (floor slack). The sanity law the round-10 verdict asked to pin."""
    rng = random.Random(11)
    avals = [rng.uniform(0, 50) for _ in range(300)]
    bvals = [rng.uniform(10, 80) for _ in range(240)]
    ks = _run_ks(spark, avals, bvals)["ks_x1e6"]
    for cut in (15.0, 30.0, 45.0):
        a = spark.createDataFrame([(v,) for v in avals], "x double")
        b = spark.createDataFrame([(v,) for v in bvals], "x double")
        tvd = tv_distance(a, b, "x", (cut,)).collect()[0]["tvd_x1e6"]
        assert tvd <= ks + 1


def test_ks_bucket_invariance_and_plan(spark):
    """Bucket count affects only balance, never the statistic; every
    window in the plan is partitioned (no single-partition WindowExec)."""
    rng = random.Random(13)
    avals = [float(rng.randrange(0, 500)) for _ in range(400)]
    bvals = [float(rng.randrange(100, 700)) for _ in range(350)]
    r1 = _run_ks(spark, avals, bvals, buckets=2)
    r64 = _run_ks(spark, avals, bvals, buckets=64)
    assert r1["ks_x1e6"] == r64["ks_x1e6"] == _py_ks(avals, bvals)

    from avro_diff_spark.functions.drift import ks_distance

    a = spark.createDataFrame([(v,) for v in avals], "x double")
    q = ks_distance(a, a, "x")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "No Partition Defined" not in plan
    # the cumulative window is keyed by the range bucket
    assert "partitionBy=[_bk" in plan.replace(" ", "") or "_bk" in plan


def test_cli_drift_ks_mode(spark, tmp_path, capsys):
    from avro_diff_spark.cli import drift_main

    a_p, b_p = str(tmp_path / "ka.parquet"), str(tmp_path / "kb.parquet")
    spark.createDataFrame([(float(i % 20),) for i in range(200)], "x double").write.parquet(a_p)
    spark.createDataFrame([(float(i % 20) + 7.0,) for i in range(200)], "x double").write.parquet(b_p)
    rc = drift_main([a_p, b_p, "x", "--format", "parquet", "--stat", "ks"])
    out = capsys.readouterr().out
    assert rc == 1 and "ks_x1e6:" in out
    assert drift_main([a_p, a_p, "x", "--format", "parquet", "--stat", "ks"]) == 0
    # --stat ks rejects --cuts
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        drift_main([a_p, b_p, "x", "--format", "parquet", "--stat", "ks", "--cuts", "5"])


def test_grouped_tvd_matches_per_group_python(spark):
    from avro_diff_spark.functions.drift import tv_distance_by

    rng = random.Random(21)
    rows_a = [(f"g{i % 3}", rng.uniform(0, 40)) for i in range(300)]
    rows_b = [(f"g{i % 4}", rng.uniform(5, 45)) for i in range(260)]  # g3 only in b
    a = spark.createDataFrame(rows_a, "g string, x double")
    b = spark.createDataFrame(rows_b, "g string, x double")
    got = {
        r.g: (r.n_a, r.n_b, r.tvd_x1e6)
        for r in tv_distance_by(a, b, "x", CUTS, ["g"]).collect()
    }
    for g in ("g0", "g1", "g2", "g3"):
        av = [v for k, v in rows_a if k == g]
        bv = [v for k, v in rows_b if k == g]
        assert got[g] == (len(av), len(bv), _py_tvd(av, bv)), g
    assert got["g3"][2] == TVD_SCALE  # one-sided group scores maximum


def test_grouped_ks_matches_per_group_python(spark):
    from avro_diff_spark.functions.drift import KS_SCALE, ks_distance_by

    rng = random.Random(31)
    rows_a = [(f"g{i % 3}", float(rng.randrange(0, 60))) for i in range(280)]
    rows_b = [(f"g{i % 4}", float(rng.randrange(15, 90))) for i in range(240)]
    a = spark.createDataFrame(rows_a, "g string, x double")
    b = spark.createDataFrame(rows_b, "g string, x double")
    got = {
        r.g: (r.n_a, r.n_b, r.n_points, r.ks_x1e6)
        for r in ks_distance_by(a, b, "x", ["g"], buckets=4).collect()
    }
    for g in ("g0", "g1", "g2", "g3"):
        av = [v for k, v in rows_a if k == g]
        bv = [v for k, v in rows_b if k == g]
        want = (
            len(av),
            len(bv),
            len(set(av) | set(bv)),
            _py_ks(av, bv),
        )
        assert got[g] == want, g
    assert got["g3"][3] == KS_SCALE  # one-sided group -> maximum


def test_grouped_ks_plan_all_windows_keyed(spark):
    from avro_diff_spark.functions.drift import ks_distance_by

    a = spark.createDataFrame([("g", 1.0)], "g string, x double")
    q = ks_distance_by(a, a, "x", ["g"])
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "No Partition Defined" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_grouped_drift_keeps_null_group_slice(spark):
    """A NULL group key is a real slice and must appear in the output
    (null-safe group joins — a plain equi-join would silently drop it)."""
    from avro_diff_spark.functions.drift import ks_distance_by, tv_distance_by

    rows_a = [(None, 5.0)] * 30 + [("g", 5.0)] * 20
    rows_b = [(None, 35.0)] * 25 + [("g", 5.0)] * 20
    a = spark.createDataFrame(rows_a, "g string, x double")
    b = spark.createDataFrame(rows_b, "g string, x double")
    tv = {r.g: r.tvd_x1e6 for r in tv_distance_by(a, b, "x", CUTS, ["g"]).collect()}
    assert tv[None] == TVD_SCALE and tv["g"] == 0
    ks = {r.g: r.ks_x1e6 for r in ks_distance_by(a, b, "x", ["g"]).collect()}
    from avro_diff_spark.functions.drift import KS_SCALE

    assert ks[None] == KS_SCALE and ks["g"] == 0
