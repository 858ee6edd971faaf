"""Blocked fuzzy join (operators/linkage.py): correctness vs a brute-force
pair scan, blocking completeness under the declared error model, multi-pass
dedup, null handling, and the no-nested-loop plan shape."""

from __future__ import annotations

import pytest
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


# ---------------------------------------------------------------------------
# PassJoin general-edit blocking (round 11)
# ---------------------------------------------------------------------------


def _fuzz_strings(rng, n, alphabet="abcd", lo=0, hi=12):
    return [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(lo, hi)))
        for _ in range(n)
    ]


def _edit(rng, s, d):
    """Apply up to d random edits (sub/ins/del at random positions)."""
    for _ in range(rng.randrange(0, d + 1)):
        kind = rng.choice("sid")
        if kind == "s" and s:
            p = rng.randrange(len(s))
            s = s[:p] + rng.choice("abcdx") + s[p + 1 :]
        elif kind == "i":
            p = rng.randrange(len(s) + 1)
            s = s[:p] + rng.choice("abcdx") + s[p:]
        elif s:
            p = rng.randrange(len(s))
            s = s[:p] + s[p + 1 :]
    return s


@pytest.mark.parametrize("d", [1, 2])
def test_passjoin_completeness_brute_force(spark, d):
    """The pigeonhole law, fuzzed: EVERY (a, b) pair within levenshtein
    d — including pairs crossing the short-string regime and edits at
    arbitrary positions — must be returned; and nothing farther."""
    import random

    from avro_diff_spark.operators.linkage import fuzzy_join_passjoin

    rng = random.Random(100 + d)
    base = _fuzz_strings(rng, 40, lo=0, hi=14)
    a_rows = [(i, s) for i, s in enumerate(base)]
    # b = edited copies (guaranteed near pairs) + fresh noise
    b_rows = [(1000 + i, _edit(rng, s, d)) for i, s in enumerate(base)]
    b_rows += [(2000 + i, s) for i, s in enumerate(_fuzz_strings(rng, 30, lo=0, hi=14))]
    a = spark.createDataFrame(a_rows, "aid long, s string")
    b = spark.createDataFrame(b_rows, "bid long, s string")
    got = {
        (r.aid, r.bid)
        for r in fuzzy_join_passjoin(
            a, b, "s", max_dist=d, a_keep=["aid"], b_keep=["bid"]
        ).collect()
    }
    want = {
        (ai, bi)
        for ai, sa in a_rows
        for bi, sb in b_rows
        if _lev(sa, sb) <= d
    }
    assert got == want


def test_passjoin_dist_column_and_validation(spark):
    from avro_diff_spark.operators.linkage import fuzzy_join_passjoin

    a = spark.createDataFrame([(1, "abcdef")], "aid long, s string")
    b = spark.createDataFrame([(2, "abXdef"), (3, "abcdef")], "bid long, s string")
    rows = {
        (r.bid, r.dist)
        for r in fuzzy_join_passjoin(a, b, "s", a_keep=["aid"], b_keep=["bid"]).collect()
    }
    assert rows == {(2, 1), (3, 0)}
    with pytest.raises(ValueError):
        fuzzy_join_passjoin(a, b, "s", max_dist=0)


def test_passjoin_plan_no_nested_loop(spark):
    from avro_diff_spark.operators.linkage import fuzzy_join_passjoin

    a = spark.createDataFrame([(1, "abcdef")], "aid long, s string")
    plan = (
        fuzzy_join_passjoin(a, a.withColumnRenamed("aid", "bid"), "s",
                            a_keep=["aid"], b_keep=["bid"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
