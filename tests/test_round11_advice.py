"""Round-10 ADVICE fixes: floored (sign-safe) hour bucketing in
events_anomalies/events_gapfill, the SCD2 oracle's NULL-robust run-start
detection, the drift fold's distributed (non-collected) numerator, and
fuzzy_join's documented multiplicity-collapse contract."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from avro_diff_spark import analytics as A
from avro_diff_spark.functions.drift import TVD_SCALE, tv_distance_categorical


def test_anomaly_gapfill_bucket_negative_epochs(spark):
    """events_anomalies / events_gapfill bucket with the floored
    ``_floor_us`` (pmod) form, not truncating ``us - us % w``: for
    pre-1970 micros the truncating form rounds toward zero (us=-1 ->
    bucket 0) while the oracle's floored SQL yields -3_600_000_000.
    Pin the Spark expression directly on negative inputs."""
    hour_us = 3_600_000_000
    df = spark.createDataFrame(
        [(-1,), (-3_600_000_000,), (-3_600_000_001,), (1,), (0,)], "us long"
    )
    got = [
        r[0]
        for r in df.select(A._floor_us(F.col("us"), hour_us)).collect()
    ]
    assert got == [-hour_us, -hour_us, -2 * hour_us, 0, 0]
    # and the two functions actually use it: no truncating modulo remains
    import inspect

    for fn in (A.events_anomalies, A.events_gapfill):
        src = inspect.getsource(fn)
        assert "us % hour_us" not in src
        assert "_floor_us" in src


def test_scd2_oracle_null_ts_matches_spark(spark, tmp_path):
    """A NULL ts_us observation must not desynchronize the engines: the
    oracle now detects run starts via row_number()=1 with NULLS FIRST
    (mirroring scd2_build) instead of lag(ts) IS NULL, which would also
    fire on a genuine NULL timestamp mid-partition."""
    from avro_diff_spark.operators.scd import scd2_build

    rows = [
        ("u1", None, "view"),
        ("u1", 10, "view"),
        ("u1", 20, "buy"),
        ("u2", None, None),
        ("u2", None, "view"),
        ("u2", 5, "view"),
    ]
    ev = spark.createDataFrame(rows, "user_id string, ts_us long, event_type string")
    got = (
        scd2_build(ev, key="user_id", ts="ts_us", tracked=["event_type"])
        .select(
            "user_id",
            "event_type",
            F.col("valid_from").alias("valid_from_us"),
            F.col("valid_to").alias("valid_to_us"),
            "version",
        )
        .toPandas()
    )
    con = duckdb.connect()
    # The registered oracle reads `events` with a real timestamp column;
    # re-express its post-CTE body over an obs relation with NULL ts_us.
    sql = A.SCD2_USER_STATES_SQL.replace(
        "SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events",
        "SELECT * FROM obs_in",
    )
    con.register(
        "obs_in",
        ev.toPandas().astype({"ts_us": "Int64"}),
    )
    want = con.execute(sql).df()

    def canon(df):
        cols = sorted(df.columns)
        return sorted(
            tuple("∅" if v is None or str(v) in ("nan", "<NA>") else str(int(v)) if isinstance(v, float) and v == v else str(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)
        )

    assert canon(got) == canon(want)


def test_drift_fold_never_collects_buckets(spark):
    """The categorical TVD numerator is a distributed keyed aggregate —
    no collect_list concentrating one row per distinct category into a
    single task (the high-cardinality blowup ADVICE flagged). Plan must
    show a BroadcastHashJoin of the 1-row totals, no collect_list, no
    BNLJ."""
    a = spark.createDataFrame([(str(i),) for i in range(500)], "x string")
    q = tv_distance_categorical(a, a, "x")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert q.collect()[0]["tvd_x1e6"] == 0
    # high-cardinality smoke: 5k distinct categories, disjoint -> max
    b = spark.createDataFrame([(f"b{i}",) for i in range(5000)], "x string")
    c = spark.createDataFrame([(f"c{i}",) for i in range(5000)], "x string")
    assert tv_distance_categorical(b, c, "x").collect()[0]["tvd_x1e6"] == TVD_SCALE


def test_fuzzy_join_multiplicity_contract_documented():
    """The distinct() collapse under duplicate projections is now an
    explicit documented contract, steering callers to keep a unique id."""
    from avro_diff_spark.operators.linkage import fuzzy_join

    doc = fuzzy_join.__doc__
    assert "Multiplicity contract" in doc
    assert "unique id" in doc
