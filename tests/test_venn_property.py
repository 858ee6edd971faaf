"""Property-based venn invariants (SURVEY §5 property f).

For every distinct row: removed + intersection = old multiplicity and
added + intersection = new multiplicity — the bag-conservation law the
reference's counting scheme guarantees by construction
(src/index.js:88-116). Checked over arbitrary duplicated/nullable inputs,
and cross-checked against exceptAll/intersectAll bag sizes.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings, strategies as st

from avro_diff_spark import venn_counts, venn_diff

_row = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.none() | st.integers(min_value=0, max_value=2),
)


def _df(spark, rows):
    return spark.createDataFrame([(a, b) for a, b in rows], "a int, b int")


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(old_rows=st.lists(_row, min_size=1, max_size=15), new_rows=st.lists(_row, min_size=1, max_size=15))
def test_bag_conservation(spark, old_rows, new_rows):
    old, new = _df(spark, old_rows), _df(spark, new_rows)
    got = {}
    for r in venn_counts(old, new).collect():
        got.setdefault((r["a"], r["b"]), {})[r["venn_kind"]] = r["n_occurrences"]

    old_c, new_c = Counter(old_rows), Counter(new_rows)
    for key in set(old_c) | set(new_c):
        g = got.get(key, {})
        assert g.get("removed", 0) + g.get("intersection", 0) == old_c.get(key, 0)
        assert g.get("added", 0) + g.get("intersection", 0) == new_c.get(key, 0)

    # totals agree with the exceptAll/intersectAll bag formulation
    v = venn_diff(old, new)
    sums = {k: 0 for k in ("removed", "added", "intersection")}
    for g in got.values():
        for k, n in g.items():
            sums[k] += n
    assert sums["removed"] == v.removed.count()
    assert sums["added"] == v.added.count()
    assert sums["intersection"] == v.intersection.count()


def test_venn_multi_matches_bruteforce_counters(spark):
    """Property: k=3 venn_multi equals a driver-side Counter replay for
    seeded random multisets (region bitstring, per-input multiplicities,
    distinct-row counts)."""
    import collections
    import random

    from avro_diff_spark.operators.venn_diff import venn_multi, venn_multi_summary

    for seed in range(4):
        rng = random.Random(seed)
        bags = [
            [rng.randint(0, 7) for _ in range(rng.randint(0, 12))] for _ in range(3)
        ]
        dfs = [
            spark.createDataFrame([(v,) for v in b] or [(None,)], "v int").filter(
                "v IS NOT NULL"
            )
            if not b
            else spark.createDataFrame([(v,) for v in b], "v int")
            for b in bags
        ]
        counters = [collections.Counter(b) for b in bags]
        universe = set().union(*[set(c) for c in counters])
        got = {r["v"]: r for r in venn_multi(dfs).collect()}
        assert set(got) == universe, seed
        for v in universe:
            exp_counts = tuple(c[v] for c in counters)
            exp_region = "".join("1" if c[v] else "0" for c in counters)
            r = got[v]
            assert (r["n_0"], r["n_1"], r["n_2"]) == exp_counts, (seed, v)
            assert r["region"] == exp_region, (seed, v)
        summ = {r["region"]: r for r in venn_multi_summary(dfs).collect()}
        regions = collections.Counter(
            "".join("1" if c[v] else "0" for c in counters) for v in universe
        )
        assert {k: v["n_distinct"] for k, v in summ.items()} == dict(regions), seed
