"""salted_join (operators/skew.py): row-identity with the plain
equi-join under duplicates, null keys, outer probes, and heavy skew —
plus the determinism the invariance gate relies on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avro_diff_spark.operators.skew import salted_join


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(r[c] for c in cols) for r in df.collect()), key=repr
    )


def _probe(spark):
    # heavy skew: key 1 dominates; duplicates on both sides; null key
    rows = [(1, f"p{i}") for i in range(40)] + [
        (2, "x"),
        (2, "x"),  # exact duplicate rows
        (3, "y"),
        (None, "z"),
    ]
    return spark.createDataFrame(rows, "k int, pv string")


def _build(spark):
    rows = [(1, "a"), (1, "b"), (2, "c"), (4, "d"), (None, "e")]
    return spark.createDataFrame(rows, "k int, bv string")


@pytest.mark.parametrize("how", ["inner", "left"])
@pytest.mark.parametrize("salts", [1, 3, 16])
def test_salted_join_equals_plain_join(spark, how, salts):
    p, b = _probe(spark), _build(spark)
    got = salted_join(p, b, "k", salts=salts, how=how)
    want = p.join(b, ["k"], how)
    assert _rows(got) == _rows(want)
    assert sorted(got.columns) == sorted(want.columns)


def test_salted_join_composite_keys(spark):
    p = spark.createDataFrame(
        [(1, "a", 10), (1, "a", 11), (1, "b", 12), (2, "a", 13)],
        "k1 int, k2 string, pv int",
    )
    b = spark.createDataFrame(
        [(1, "a", "x"), (1, "b", "y"), (2, "b", "z")], "k1 int, k2 string, bv string"
    )
    got = salted_join(p, b, ["k1", "k2"], salts=4)
    want = p.join(b, ["k1", "k2"])
    assert _rows(got) == _rows(want)


def test_salted_join_salt_is_layout_invariant(spark):
    """The salt is a pure function of row content (no rand/partition id),
    so results are identical across wildly different partitionings."""
    p, b = _probe(spark), _build(spark)
    a = salted_join(p.repartition(1), b.repartition(7), "k", salts=8)
    c = salted_join(p.repartition(13, "pv"), b.coalesce(1), "k", salts=8)
    assert _rows(a) == _rows(c)


def test_salted_join_spreads_the_hot_key(spark):
    """The point of the operator: the hot key's rows occupy >1 salt
    slot, so no single reducer sees them all."""
    p = _probe(spark)
    salted = p.withColumn(
        "s", F.pmod(F.xxhash64(*[F.col(c) for c in p.columns]), F.lit(8))
    )
    n_slots = salted.filter(F.col("k") == 1).select("s").distinct().count()
    assert n_slots > 1


def test_salted_join_rejects_outer_build(spark):
    p, b = _probe(spark), _build(spark)
    with pytest.raises(ValueError, match="inner|left"):
        salted_join(p, b, "k", how="right")
    with pytest.raises(ValueError, match="salts"):
        salted_join(p, b, "k", salts=0)
    with pytest.raises(ValueError, match="at least one"):
        salted_join(p, b, [])


def test_salted_join_tolerates_map_columns(spark):
    """xxhash64 refuses MapType — the salt must hash only hashable
    columns and stay row-identical to the plain join."""
    probe = spark.createDataFrame(
        [(1, {"a": "x"}), (1, {"b": "y"}), (2, {"c": "z"})],
        "k long, attrs map<string,string>",
    )
    build = spark.createDataFrame([(1, "one"), (3, "three")], "k long, name string")
    got = salted_join(probe, build, "k", salts=4)
    want = probe.join(build, "k")
    assert sorted(map(repr, got.collect())) == sorted(map(repr, want.collect()))


def test_skew_report_exact_ratios(spark):
    from avro_diff_spark.operators.skew import skew_report

    rows = [("hot",)] * 6 + [("warm",)] * 3 + [("a",), ("b",), ("c",)]
    df = spark.createDataFrame(rows, "k string")
    out = {r["rank"]: r for r in skew_report(df, ["k"], top=3).collect()}
    assert [out[i]["k"] for i in (1, 2, 3)] == ["hot", "warm", "a"]
    r1 = out[1]
    assert (r1["n_rows"], r1["n_total"], r1["n_keys"]) == (6, 12, 5)
    assert r1["share_x1e6"] == 6 * 1_000_000 // 12
    assert r1["skew_x1e6"] == 6 * 5 * 1_000_000 // 12  # 2.5x the mean key
    # ties broken by key ascending
    assert out[3]["k"] == "a"

    import pytest as _pytest

    with _pytest.raises(ValueError):
        skew_report(df, [])
