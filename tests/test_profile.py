"""Unit pins for the single-pass table profiler (operators/profile.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avro_diff_spark.operators.profile import profile_table


def _by_col(df):
    return {r["col_name"]: r.asDict() for r in df.collect()}


def test_profile_nulls_distinct_minmax(spark):
    df = spark.createDataFrame(
        [(1, 2.5, "b"), (2, None, "a"), (2, 0.07, None), (10, 2.5, "a")],
        "k bigint, v double, s string",
    )
    out = _by_col(profile_table(df))
    assert set(out) == {"k", "v", "s"}

    k = out["k"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (4, 0, 3)
    # native order, not text order: min is 1 and max is 10 (text max would be "2")
    assert (k["min_repr"], k["max_repr"]) == ("1", "10")

    v = out["v"]
    assert (v["n_rows"], v["n_nulls"], v["n_distinct"]) == (4, 1, 2)
    # doubles repr through DECIMAL(18,2): stable 2-dp text both engines
    assert (v["min_repr"], v["max_repr"]) == ("0.07", "2.50")

    s = out["s"]
    assert (s["n_rows"], s["n_nulls"], s["n_distinct"]) == (4, 1, 2)
    assert (s["min_repr"], s["max_repr"]) == ("a", "b")


def test_profile_all_null_column(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "k bigint, dead string")
    out = _by_col(profile_table(df, ["dead"]))
    d = out["dead"]
    assert (d["n_rows"], d["n_nulls"], d["n_distinct"]) == (2, 2, 0)
    assert d["min_repr"] is None and d["max_repr"] is None


def test_profile_timestamp_ntz_reprs_as_epoch_micros(spark):
    df = spark.createDataFrame([("1995-01-02 00:00:00",)], "t string").select(
        F.col("t").cast("timestamp_ntz").alias("t")
    )
    out = _by_col(profile_table(df))
    assert out["t"]["min_repr"] == "789004800000000"  # epoch_us under UTC


def test_profile_skips_complex_columns_by_default(spark):
    df = spark.createDataFrame([(1, [1, 2])], "k bigint, a array<bigint>")
    assert set(_by_col(profile_table(df))) == {"k"}
    with pytest.raises(ValueError):
        profile_table(df, ["nope"])


def test_column_histogram_clamps_and_sums(spark):
    from avro_diff_spark.operators.profile import column_histogram

    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (9.99,), (10.0,), (25.0,), (99.0,), (100.0,), (None,)],
        "v double",
    )
    out = {r["bucket"]: (r["n_rows"], r["sum_cents"]) for r in
           column_histogram(df, "v", 0.0, 100.0, 10).collect()}
    assert out[-1] == (1, -500)            # underflow
    assert out[0] == (2, 999)              # 0.0 and 9.99
    assert out[1] == (1, 1000)             # 10.0 lands in bucket 1 (floor law)
    assert out[2] == (1, 2500)
    assert out[9] == (1, 9900)
    assert out[10] == (1, 10000)           # hi is exclusive -> overflow bucket
    assert sum(n for n, _ in out.values()) == 7  # null excluded


def test_column_histogram_guards(spark):
    import pytest as _pytest

    from avro_diff_spark.operators.profile import column_histogram

    df = spark.createDataFrame([(1.0,)], "v double")
    with _pytest.raises(ValueError):
        column_histogram(df, "v", 0.0, 1.0, 0)
    with _pytest.raises(ValueError):
        column_histogram(df, "v", 1.0, 1.0, 4)


def test_equi_depth_histogram_bucket_law(spark):
    from avro_diff_spark.operators.profile import equi_depth_histogram

    # 10 rows, 4 buckets -> the (rank-1)*nb DIV total law gives 3,2,3,2
    df = spark.createDataFrame(
        [(float(i), i) for i in range(1, 11)] + [(None, 99)], "v double, k bigint"
    )
    out = {r["bucket"]: r for r in
           equi_depth_histogram(df, "v", ["k"], 4).collect()}
    assert [out[b]["n_rows"] for b in (0, 1, 2, 3)] == [3, 2, 3, 2]
    assert out[0]["lo_cents"] == 100 and out[0]["hi_cents"] == 300
    assert out[3]["lo_cents"] == 900 and out[3]["hi_cents"] == 1000
    assert sum(r["n_rows"] for r in out.values()) == 10  # null excluded
    assert out[1]["sum_cents"] == 400 + 500

    import pytest as _pytest

    with _pytest.raises(ValueError):
        equi_depth_histogram(df, "v", ["k"], 0)


def test_profile_empty_table_keeps_one_row_per_column(spark):
    df = spark.createDataFrame([], "k bigint, s string")
    out = _by_col(profile_table(df))
    assert set(out) == {"k", "s"}
    for c in ("k", "s"):
        r = out[c]
        assert (r["n_rows"], r["n_nulls"], r["n_distinct"]) == (0, 0, 0)
        assert r["min_repr"] is None and r["max_repr"] is None


# ------------------------------------------------------- approx (HLL) profile


def test_profile_approx_exact_fields_match_exact_profile(spark):
    """n_rows / n_nulls / min / max are identical to the exact profiler;
    only the distinct column changes representation (sketch state)."""
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    exact = _by_col(profile_table(df))
    approx = _by_col(profile_table(df, approx=True))
    assert set(exact) == set(approx)
    for c in exact:
        for f in ("n_rows", "n_nulls", "min_repr", "max_repr"):
            assert exact[c][f] == approx[c][f], (c, f)
        assert "n_distinct" not in approx[c]
        assert {"zero_registers", "s_scaled", "est_x1000"} <= set(approx[c])


def test_profile_approx_ndv_error_bounds(spark):
    """The corrected HLL estimate lands within the 512-register sketch's
    expected error (~1.04/sqrt(512) ≈ 4.6% standard error; pin at 15%)
    of the exact NDV for every profiled column."""
    from avro_diff_spark.functions.sketches import hll_corrected_estimate

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    exact = _by_col(profile_table(df))
    for row in profile_table(df, approx=True).collect():
        nd = exact[row["col_name"]]["n_distinct"]
        est = hll_corrected_estimate(row)
        assert abs(est - nd) <= max(2.0, 0.15 * nd), (row["col_name"], est, nd)


def test_profile_approx_all_null_column_gets_empty_sketch(spark):
    from avro_diff_spark.functions.sketches import hll_corrected_estimate
    from avro_diff_spark.operators.profile import empty_sketch_constants

    df = spark.createDataFrame([(1, None), (2, None)], "k bigint, dead string")
    out = _by_col(profile_table(df, ["dead"], approx=True))["dead"]
    ez, es, ee = empty_sketch_constants()
    assert (out["zero_registers"], out["s_scaled"], out["est_x1000"]) == (ez, es, ee)
    assert hll_corrected_estimate(
        type("R", (), {"est_x1000": ee, "zero_registers": ez})()
    ) < 1.0
