"""Blocked fuzzy join (operators/linkage.py): correctness vs a brute-force
pair scan, blocking completeness under the declared error model, multi-pass
dedup, null handling, and the no-nested-loop plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from avro_diff_spark.operators.linkage import fuzzy_join


def _lev(a, b):
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(
                d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
            )
    return d[n]


def test_matches_brute_force_within_blocks(spark):
    names = [f"rec-{i:04d}-tail" for i in range(60)]
    dirty = [(i, n[:-1] + "X") for i, n in enumerate(names) if i % 3 == 0]
    a = spark.createDataFrame(dirty, "probe_key long, s string")
    b = spark.createDataFrame(list(enumerate(names)), "master_key long, s string")
    got = {
        (r["probe_key"], r["master_key"], r["dist"])
        for r in fuzzy_join(
            a, b, "s",
            blocks=[lambda c: F.substring(c, 1, 8)],
            max_dist=1,
            a_keep=["probe_key"], b_keep=["master_key"],
        ).collect()
    }
    want = {
        (pk, mk, _lev(ds, ms))
        for pk, ds in dirty
        for mk, ms in enumerate(names)
        if ds[:8] == ms[:8] and _lev(ds, ms) <= 1
    }
    assert got == want and got
    # the declared error model (tail typo) never escapes the head block:
    # every probe's true source is recovered
    assert {pk for pk, _ in dirty} <= {pk for pk, mk, _ in got if pk == mk}


def test_multi_pass_dedup_and_nulls(spark):
    a = spark.createDataFrame([(1, "abcdef"), (2, None)], "k long, s string")
    b = spark.createDataFrame([(10, "abcdeX"), (11, None)], "k long, s string")
    # two blocks that BOTH catch the same pair -> one output row
    out = fuzzy_join(
        a, b, "s",
        blocks=[lambda c: F.substring(c, 1, 3), lambda c: F.substring(c, 1, 4)],
        max_dist=1,
        a_keep=["k"], b_keep=[],
    ).collect()
    assert len(out) == 1 and out[0]["dist"] == 1


def test_plan_is_blocked_equi_join(spark):
    a = spark.createDataFrame([(1, "abc")], "k long, s string")
    plan = (
        fuzzy_join(a, a, "s", blocks=[lambda c: F.substring(c, 1, 2)], a_keep=["k"], b_keep=[])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_requires_a_block(spark):
    import pytest

    a = spark.createDataFrame([(1, "x")], "k long, s string")
    with pytest.raises(ValueError):
        fuzzy_join(a, a, "s", blocks=[])
