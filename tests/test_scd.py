"""scd2_build (operators/scd.py): run collapsing, interval chaining,
null tracked values, composite keys/tracked, and a random fuzz against a
pure-Python reconstruction."""

from __future__ import annotations

import random

import pytest

from avro_diff_spark.operators.scd import scd2_build


def _rows(df):
    cols = ["k", "v", "valid_from", "valid_to", "version"]
    return sorted((tuple(r[c] for c in cols) for r in df.collect()), key=repr)


def test_collapse_and_chain(spark):
    df = spark.createDataFrame(
        [
            ("u", 10, "a"),
            ("u", 20, "a"),  # same value: collapses into the first run
            ("u", 30, "b"),  # change
            ("u", 40, "b"),
            ("u", 50, "a"),  # change back: NEW version, not merged
            ("v", 15, "x"),
        ],
        "k string, ts long, v string",
    )
    out = scd2_build(df, key="k", ts="ts", tracked=["v"])
    assert _rows(out) == sorted(
        [
            ("u", "a", 10, 30, 1),
            ("u", "a", 50, None, 3),
            ("u", "b", 30, 50, 2),
            ("v", "x", 15, None, 1),
        ],
        key=repr,
    )


def test_null_tracked_values_are_states(spark):
    df = spark.createDataFrame(
        [("u", 1, None), ("u", 2, None), ("u", 3, "a"), ("u", 4, None)],
        "k string, ts long, v string",
    )
    out = scd2_build(df, key="k", ts="ts", tracked=["v"])
    assert _rows(out) == sorted(
        [
            ("u", None, 1, 3, 1),
            ("u", None, 4, None, 3),
            ("u", "a", 3, 4, 2),
        ],
        key=repr,
    )


def test_composite_key_and_tracked(spark):
    df = spark.createDataFrame(
        [
            (1, "p", 10, "a", 1),
            (1, "p", 20, "a", 2),  # second tracked col changes
            (1, "q", 30, "a", 1),  # different key
        ],
        "k1 int, k2 string, ts long, v1 string, v2 int",
    )
    out = scd2_build(df, key=["k1", "k2"], ts="ts", tracked=["v1", "v2"])
    got = sorted(
        (r["k1"], r["k2"], r["v1"], r["v2"], r["valid_from"], r["valid_to"], r["version"])
        for r in out.collect()
    )
    assert got == [
        (1, "p", "a", 1, 10, 20, 1),
        (1, "p", "a", 2, 20, None, 2),
        (1, "q", "a", 1, 30, None, 1),
    ]


def test_errors(spark):
    df = spark.createDataFrame([(1, 2, 3)], "k int, ts int, v int")
    with pytest.raises(ValueError):
        scd2_build(df, key=[], ts="ts", tracked=["v"])
    with pytest.raises(ValueError):
        scd2_build(df, key="k", ts="ts", tracked=[])


def _python_scd2(rows):
    """Reference reconstruction: per key, sort by (ts, v), collapse runs."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, ts, v in rows:
        by_key[k].append((ts, v))
    out = []
    for k, obs in by_key.items():
        obs.sort(key=lambda t: (t[0], t[1] if t[1] is not None else ""))
        runs = []
        prev = object()
        for ts, v in obs:
            if v != prev:
                runs.append([ts, v])
                prev = v
        for i, (ts, v) in enumerate(runs):
            nxt = runs[i + 1][0] if i + 1 < len(runs) else None
            out.append((k, v, ts, nxt, i + 1))
    return sorted(out, key=repr)


def test_fuzz_against_python(spark):
    rng = random.Random(100)
    rows = []
    for k in range(12):
        ts = 0
        for _ in range(rng.randrange(0, 25)):
            ts += rng.randrange(1, 5)  # strictly increasing: no ts ties
            rows.append((f"k{k}", ts, rng.choice(["a", "b", "c", None])))
    df = spark.createDataFrame(rows, "k string, ts long, v string")
    out = scd2_build(df, key="k", ts="ts", tracked=["v"])
    assert _rows(out) == _python_scd2(rows)


def test_point_in_time_law(spark):
    """Each observation falls in EXACTLY ONE of its key's half-open
    validity intervals — the property that makes scd2 output safe for
    point-in-time (as-of / interval_join) fact attribution."""
    from pyspark.sql import functions as F

    rng = random.Random(101)
    rows = []
    for k in range(8):
        ts = 0
        for _ in range(rng.randrange(1, 20)):
            ts += rng.randrange(1, 4)
            rows.append((f"k{k}", ts, rng.choice(["a", "b", "c"])))
    df = spark.createDataFrame(rows, "k string, ts long, v string")
    iv = scd2_build(df, key="k", ts="ts", tracked=["v"]).withColumnRenamed(
        "v", "state"
    )
    matched = df.join(iv, "k").where(
        (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to")))
    )
    # exactly one interval per observation, and it carries the observed value
    assert matched.count() == len(rows)
    assert matched.where(F.col("state") != F.col("v")).count() == 0


def test_null_ts_value_does_not_split_a_run(spark):
    """A NULL ts VALUE (dirty data, ordered first by the window) must not
    make its successor open a new interval when tracked values match."""
    df = spark.createDataFrame(
        [("u", None, "a"), ("u", 5, "a"), ("u", 9, "b")],
        "k string, ts long, v string",
    )
    out = scd2_build(df, key="k", ts="ts", tracked=["v"]).orderBy("version").collect()
    assert [(r["v"], r["valid_from"], r["valid_to"], r["version"]) for r in out] == [
        ("a", None, 9, 1),
        ("b", 9, None, 2),
    ]
