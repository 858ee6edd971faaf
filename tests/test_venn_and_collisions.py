from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avro_diff_spark import key_collisions, venn_diff, venn_summary
from avro_diff_spark.operators.collisions import assert_unique_keys
from avro_diff_spark.snapshots import venn_new, venn_old


def test_venn_counts_conserve(spark, sf_dir):
    old, new = venn_old(spark, sf_dir), venn_new(spark, sf_dir)
    v = venn_diff(old, new)
    n_old, n_new = old.count(), new.count()
    n_rem, n_add, n_int = v.removed.count(), v.added.count(), v.intersection.count()
    # reference invariant (SURVEY.md §5f): removed+intersection=|old|, added+intersection=|new|
    assert n_rem + n_int == n_old
    assert n_add + n_int == n_new
    # modular structure: intersection = keys divisible by 6
    exp_int = old.filter(F.col("l_orderkey") % 3 == 0).count()
    assert n_int == exp_int


def test_venn_self_is_all_intersection(spark, sf_dir):
    old = venn_old(spark, sf_dir)
    v = venn_diff(old, old)
    assert v.removed.count() == 0
    assert v.added.count() == 0
    assert v.intersection.count() == old.count()


def test_venn_multiset_semantics(spark):
    # bag semantics: duplicates carry multiplicity (reference counts per canonical row)
    old = spark.createDataFrame([(1,), (1,), (1,), (2,)], "x int")
    new = spark.createDataFrame([(1,), (2,), (2,)], "x int")
    v = venn_diff(old, new)
    assert v.removed.collect() == [(1,), (1,)] or v.removed.count() == 2
    assert v.added.count() == 1
    assert v.intersection.count() == 2


def test_venn_map_columns_canonicalized(spark):
    old = spark.createDataFrame([(1, {"a": 1, "b": 2})], "k int, m map<string,int>")
    new = spark.createDataFrame([(1, {"b": 2, "a": 1})], "k int, m map<string,int>")
    v = venn_diff(old, new)
    assert v.removed.count() == 0 and v.added.count() == 0 and v.intersection.count() == 1


def test_venn_summary_multiplicities(spark):
    old = spark.createDataFrame([(1,), (1,), (2,)], "x int")
    new = spark.createDataFrame([(1,), (3,)], "x int")
    s = {(r["venn_kind"], r["row_json"]): r["n_occurrences"] for r in venn_summary(old, new).collect()}
    assert s == {
        ("removed", '{"x":1}'): 1,
        ("removed", '{"x":2}'): 1,
        ("added", '{"x":3}'): 1,
        ("intersection", '{"x":1}'): 1,
    }


def test_key_collisions(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # lineitem keys collide (multi-line orders, and the synthetic data even
    # duplicates (l_orderkey, l_linenumber)); orders primary key is unique.
    assert key_collisions(li, ["l_orderkey"]).count() > 0
    assert key_collisions(orders, ["o_orderkey"]).count() == 0
    assert_unique_keys(orders, ["o_orderkey"])
    with pytest.raises(ValueError):
        assert_unique_keys(li, ["l_orderkey"])


def test_null_keys_collide_with_sentinel(spark):
    df = spark.createDataFrame([(None, 1), (None, 2)], "k int, v int")
    dups = key_collisions(df, ["k"]).collect()
    assert len(dups) == 1 and dups[0]["k"] == "null" and dups[0]["n_rows"] == 2


# ---------------------------------------------------------------------------
# n-way venn (round 12)
# ---------------------------------------------------------------------------


def test_venn_multi_regions_and_multiplicities(spark):
    a = spark.createDataFrame([(1,), (1,), (2,), (4,)], "v bigint")
    b = spark.createDataFrame([(1,), (2,), (3,)], "v bigint")
    c = spark.createDataFrame([(2,), (3,), (3,), (5,)], "v bigint")
    from avro_diff_spark.operators.venn_diff import venn_multi, venn_multi_summary

    rows = {r["v"]: r for r in venn_multi([a, b, c]).collect()}
    assert rows[1]["region"] == "110" and rows[1]["n_0"] == 2 and rows[1]["n_1"] == 1
    assert rows[2]["region"] == "111"
    assert rows[3]["region"] == "011" and rows[3]["n_2"] == 2
    assert rows[4]["region"] == "100"
    assert rows[5]["region"] == "001"

    summ = {r["region"]: r for r in venn_multi_summary([a, b, c], ["a", "b", "c"]).collect()}
    assert summ["111"]["n_distinct"] == 1 and summ["111"]["occ_c"] == 1
    assert summ["110"]["occ_a"] == 2 and summ["110"]["occ_b"] == 1
    assert summ["011"]["occ_c"] == 2
    assert set(summ) == {"110", "111", "011", "100", "001"}


def test_venn_multi_rejects_bad_inputs(spark):
    import pytest as _pytest

    from avro_diff_spark.operators.venn_diff import venn_multi, venn_multi_summary

    a = spark.createDataFrame([(1,)], "v bigint")
    with _pytest.raises(ValueError):
        venn_multi([a])
    with _pytest.raises(ValueError):
        venn_multi([a, spark.createDataFrame([(1,)], "w bigint")])
    with _pytest.raises(ValueError):
        venn_multi_summary([a, a], ["onlyone"])


def test_venn_multi_two_way_matches_venn_counts(spark):
    """k=2 venn_multi carries exactly the same per-row multiplicities the
    2-way one-pass core produces (removed/added/intersection derivable)."""
    old = spark.createDataFrame([(1,), (1,), (2,)], "v bigint")
    new = spark.createDataFrame([(1,), (3,)], "v bigint")
    from avro_diff_spark import venn_counts
    from avro_diff_spark.operators.venn_diff import venn_multi

    m = {r["v"]: r for r in venn_multi([old, new]).collect()}
    for r in venn_counts(old, new).collect():
        n_old, n_new = m[r["v"]]["n_0"], m[r["v"]]["n_1"]
        expect = {
            "removed": max(n_old - n_new, 0),
            "added": max(n_new - n_old, 0),
            "intersection": min(n_old, n_new),
        }[r["venn_kind"]]
        assert r["n_occurrences"] == expect
