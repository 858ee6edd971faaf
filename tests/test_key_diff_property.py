"""Property-based key_diff invariants (SURVEY §5 implied properties a-f).

Hypothesis generates small keyed tables with nullable values and duplicate
content (unique keys, per the operator contract) and checks the algebraic
invariants the reference's own tests assert: bucket disjointness, count
conservation, and self-diff identity — over arbitrary data rather than the
fixed testdata snapshots.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from avro_diff_spark import key_diff

_val = st.none() | st.integers(min_value=-5, max_value=5)


@st.composite
def _table(draw):
    keys = draw(st.lists(st.integers(min_value=0, max_value=30), unique=True, max_size=12))
    return [(k, draw(_val), draw(_val)) for k in keys]


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, a int, b int")


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(old_rows=_table(), new_rows=_table())
def test_bucket_invariants(spark, old_rows, new_rows):
    if not old_rows and not new_rows:
        return
    old, new = _df(spark, old_rows), _df(spark, new_rows)
    d = key_diff(old, new, ["k"])
    rows = d.collect()

    # (a) bucket keys are disjoint and unique (unique-key inputs)
    keys = [r["k"] for r in rows]
    assert len(keys) == len(set(keys))

    # (e) count conservation
    kinds = {}
    for r in rows:
        kinds[r["diff_kind"]] = kinds.get(r["diff_kind"], 0) + 1
    assert kinds.get("added", 0) + kinds.get("changed", 0) + kinds.get("unchanged", 0) == len(new_rows)
    assert kinds.get("removed", 0) + kinds.get("changed", 0) + kinds.get("unchanged", 0) == len(old_rows)

    # classification matches a python reference evaluation
    old_map = {k: (a, b) for k, a, b in old_rows}
    new_map = {k: (a, b) for k, a, b in new_rows}
    for r in rows:
        k = int(r["k"])
        if k in old_map and k in new_map:
            want = "unchanged" if old_map[k] == new_map[k] else "changed"
        elif k in old_map:
            want = "removed"
        else:
            want = "added"
        assert r["diff_kind"] == want, (k, r["diff_kind"], want)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_table())
def test_self_diff_identity(spark, rows):
    if not rows:
        return
    df = _df(spark, rows)
    d = key_diff(df, df, ["k"])
    got = {r["diff_kind"] for r in d.collect()}
    assert got == {"unchanged"}
