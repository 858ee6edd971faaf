"""key_diff unit tests — the reference's implied correctness properties
(SURVEY.md §5: bucket disjointness, self-diff identity, count conservation)
plus the null-key and nested-type parity rules."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from avro_diff_spark import key_diff, key_diff_detail
from avro_diff_spark.snapshots import orders_new, orders_old


def kinds(df):
    return {r["diff_kind"]: r["n"] for r in df.groupBy("diff_kind").agg(F.count("*").alias("n")).collect()}


def test_orders_snapshot_diff_buckets(spark, sf_dir):
    old, new = orders_old(spark, sf_dir), orders_new(spark, sf_dir)
    d = key_diff(old, new, ["o_orderkey"]).cache()
    got = kinds(d)

    # Recompute expectations directly from the modular predicates.
    keys = [r[0] for r in spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey").collect()]
    exp = {"added": 0, "removed": 0, "changed": 0, "unchanged": 0}
    for k in keys:
        in_old, in_new = k % 5 != 0, k % 7 != 0
        if in_old and not in_new:
            exp["removed"] += 1
        elif in_new and not in_old:
            exp["added"] += 1
        elif in_old and in_new:
            exp["changed" if k % 3 == 0 else "unchanged"] += 1
    assert got == {k: v for k, v in exp.items() if v > 0}

    # Changed rows differ exactly in o_totalprice.
    changed = d.filter(F.col("diff_kind") == "changed")
    assert changed.filter(F.col("changed_fields") != F.array(F.lit("o_totalprice"))).count() == 0
    # Count conservation (unique-key case): |added|+|changed|+|unchanged| = |new|.
    assert got.get("added", 0) + got.get("changed", 0) + got.get("unchanged", 0) == new.count()
    assert got.get("removed", 0) + got.get("changed", 0) + got.get("unchanged", 0) == old.count()
    d.unpersist()


def test_self_diff_all_unchanged(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    d = key_diff(o, o, ["o_orderkey"])
    assert kinds(d) == {"unchanged": o.count()}
    # unchanged rows carry an empty changed_fields array, not NULL
    assert d.filter(F.col("changed_fields").isNull()).count() == 0


def test_bucket_keys_disjoint_and_unique(spark, sf_dir):
    old, new = orders_old(spark, sf_dir), orders_new(spark, sf_dir)
    d = key_diff(old, new, ["o_orderkey"])
    assert d.groupBy("o_orderkey").count().filter("count > 1").count() == 0


def test_null_keys_join_each_other(spark):
    # JS String(null) == 'null': null keys match each other (reference src/index.js:275).
    old = spark.createDataFrame([Row(k=None, v=1), Row(k=7, v=2)], "k int, v int")
    new = spark.createDataFrame([Row(k=None, v=1), Row(k=7, v=3)], "k int, v int")
    d = key_diff(old, new, ["k"])
    rows = {r["k"]: r["diff_kind"] for r in d.collect()}
    assert rows == {"null": "unchanged", "7": "changed"}


def test_cross_type_keys_join_as_strings(spark):
    # long 1 joins string "1" (String() coercion parity).
    old = spark.createDataFrame([Row(k=1, v="a")], "k long, v string")
    new = spark.createDataFrame([Row(k="1", v="a")], "k string, v string")
    d = key_diff(old, new, ["k"])
    assert [r["diff_kind"] for r in d.collect()] == ["unchanged"]


def test_composite_key(spark):
    old = spark.createDataFrame([(1, 1, "x"), (1, 2, "y")], "a int, b int, v string")
    new = spark.createDataFrame([(1, 1, "x"), (2, 1, "z")], "a int, b int, v string")
    d = key_diff(old, new, ["a", "b"])
    got = {(r["a"], r["b"]): r["diff_kind"] for r in d.collect()}
    assert got == {("1", "1"): "unchanged", ("1", "2"): "removed", ("2", "1"): "added"}


def test_nested_and_map_columns(spark):
    schema = "k int, s struct<x:int,y:string>, m map<string,int>, arr array<int>"
    old = spark.createDataFrame(
        [(1, Row(x=1, y="a"), {"p": 1, "q": 2}, [1, 2]), (2, Row(x=2, y="b"), {"z": 9}, [3])],
        schema,
    )
    new = spark.createDataFrame(
        [(1, Row(x=1, y="a"), {"q": 2, "p": 1}, [1, 2]), (2, Row(x=2, y="B"), {"z": 9}, [3, 4])],
        schema,
    )
    d = key_diff(old, new, ["k"])
    got = {r["k"]: (r["diff_kind"], sorted(r["changed_fields"] or [])) for r in d.collect()}
    # map key order must not matter (stableStringify parity); struct columns
    # recurse to leaf paths (detailedDiff parity), arrays stay atomic
    assert got["1"] == ("unchanged", [])
    assert got["2"] == ("changed", ["arr", "s.y"])


def test_schema_drift_columns(spark):
    # A column present on only one side counts as changed when non-null.
    old = spark.createDataFrame([(1, "a", 10)], "k int, v string, gone int")
    new = spark.createDataFrame([(1, "a", 5.0)], "k int, v string, fresh double")
    d = key_diff(old, new, ["k"])
    r = d.collect()[0]
    assert r["diff_kind"] == "changed"
    assert sorted(r["changed_fields"]) == ["fresh", "gone"]


def test_key_diff_detail_values(spark, sf_dir):
    old, new = orders_old(spark, sf_dir), orders_new(spark, sf_dir)
    det = key_diff_detail(old, new, ["o_orderkey"])
    rows = det.collect()
    assert rows, "expected changed rows"
    assert all(r["field"] == "o_totalprice" for r in rows)
    for r in rows[:50]:
        assert abs(float(r["new_value"]) - float(r["old_value"]) - 100.0) < 1e-9


def test_nested_struct_leaf_paths(spark):
    # recursive per-leaf diff (reference detailedDiff, src/index.js:205):
    # depth-2 changes report dot-paths; a leaf present on one side only
    # counts as changed when the present side is non-null
    old_schema = "k int, sub struct<score:double, meta:struct<grade:string, published:boolean>>"
    new_schema = (
        "k int, sub struct<score:double, meta:struct<grade:string, "
        "published:boolean, late:boolean>>"
    )
    old = spark.createDataFrame(
        [
            (1, Row(score=1.5, meta=Row(grade="A", published=True))),
            (2, Row(score=2.0, meta=Row(grade="B", published=False))),
            (3, Row(score=3.0, meta=None)),
        ],
        old_schema,
    )
    new = spark.createDataFrame(
        [
            (1, Row(score=1.5, meta=Row(grade="A", published=True, late=None))),
            (2, Row(score=2.5, meta=Row(grade="C", published=False, late=True))),
            (3, Row(score=3.0, meta=Row(grade="D", published=None, late=None))),
        ],
        new_schema,
    )
    d = key_diff(old, new, ["k"])
    got = {r["k"]: (r["diff_kind"], sorted(r["changed_fields"] or [])) for r in d.collect()}
    assert got["1"] == ("unchanged", [])
    assert got["2"] == ("changed", ["sub.meta.grade", "sub.meta.late", "sub.score"])
    # NULL intermediate struct: each non-null new leaf reports changed
    assert got["3"] == ("changed", ["sub.meta.grade"])

    det = key_diff_detail(old, new, ["k"])
    rows = {(r["k"], r["field"]): (r["old_value"], r["new_value"]) for r in det.collect()}
    assert rows[("2", "sub.score")] == ("2.0", "2.5")
    assert rows[("2", "sub.meta.grade")] == ("B", "C")
    assert rows[("2", "sub.meta.late")] == (None, "true")
    assert rows[("3", "sub.meta.grade")] == (None, "D")
    assert ("1", "sub.score") not in rows


def test_detail_explode_arrays_per_index(spark):
    # deep-object-diff treats arrays as objects with numeric keys: per-index
    # rows for changed/added/deleted elements (missing side NULL)
    old = spark.createDataFrame(
        [(1, [10, 20, 30], "x"), (2, [1, 2], "y")], "k int, arr array<int>, v string"
    )
    new = spark.createDataFrame(
        [(1, [10, 25], "x"), (2, [1, 2], "z")], "k int, arr array<int>, v string"
    )
    det = key_diff_detail(old, new, ["k"], explode_arrays=True)
    rows = {(r["k"], r["field"]): (r["old_value"], r["new_value"]) for r in det.collect()}
    assert rows[("1", "arr.1")] == ("20", "25")
    assert rows[("1", "arr.2")] == ("30", None)  # deleted index
    assert ("1", "arr.0") not in rows  # unchanged index
    assert rows[("2", "v")] == ("y", "z")  # scalar rows still emitted
    assert ("2", "arr.0") not in rows  # unchanged array → no rows


def test_detail_explode_maps_per_key(spark):
    # maps are JS objects to the reference — deep-object-diff recurses per
    # key: union of both sides' keys, NULL on the absent side
    schema = "k int, m map<string,int>, v string"
    old = spark.createDataFrame([(1, {"a": 1, "b": 2, "gone": 9}, "x")], schema)
    new = spark.createDataFrame([(1, {"a": 1, "b": 3, "fresh": 7}, "x")], schema)
    det = key_diff_detail(old, new, ["k"], explode_maps=True)
    rows = {(r["k"], r["field"]): (r["old_value"], r["new_value"]) for r in det.collect()}
    assert rows[("1", "m.b")] == ("2", "3")
    assert rows[("1", "m.gone")] == ("9", None)
    assert rows[("1", "m.fresh")] == (None, "7")
    assert ("1", "m.a") not in rows
    assert ("1", "v") not in rows  # unchanged scalar


def test_raw_keys_semantics(spark):
    # raw_keys: native key types, SQL NULL semantics (null keys never
    # match — they classify as removed/added), cross-type keys don't join
    old = spark.createDataFrame([Row(k=None, v=1), Row(k=7, v=2)], "k int, v int")
    new = spark.createDataFrame([Row(k=None, v=1), Row(k=7, v=3)], "k int, v int")
    d = key_diff(old, new, ["k"], raw_keys=True)
    got = sorted(((r["k"], r["diff_kind"]) for r in d.collect()), key=str)
    assert got == sorted([(None, "added"), (None, "removed"), (7, "changed")], key=str)
    assert d.schema["k"].dataType.simpleString() == "int"


def test_bucketed_diff_has_no_shuffle(spark, sf_dir, tmp_path):
    """The 100 TB path: both snapshots bucketed on the key ⇒ raw_keys diff
    plans as a bucket join — ZERO Exchange in the physical plan (the
    string-coercion join cannot do this: its join key is a derived
    expression, so bucketing never lines up)."""
    from avro_diff_spark.snapshots import orders_new, orders_old

    import shutil

    for t in ("bd_old", "bd_new"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # the in-memory metastore forgets tables across sessions while the
        # warehouse dir persists — clear the location too
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    orders_old(spark, sf_dir).write.bucketBy(4, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("bd_old")
    orders_new(spark, sf_dir).write.bucketBy(4, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("bd_new")

    d = key_diff(
        spark.table("bd_old"), spark.table("bd_new"), ["o_orderkey"], raw_keys=True
    )
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # and the result still classifies correctly
    got = {r["diff_kind"] for r in d.select("diff_kind").distinct().collect()}
    assert got == {"added", "removed", "changed", "unchanged"}


def test_missing_key_raises(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    with pytest.raises(ValueError):
        key_diff(o, o, ["nope"])


def test_deeply_nested_map_of_struct_of_map(spark):
    # the reference's hardest fixture shape: students.weeklyMessageAggregates
    # is map<record{..., dailyMessageAggregates: map<record>}> (SURVEY.md §1.2)
    schema = (
        "k int, agg map<string, struct<startDate:string, nFrom:int, "
        "daily: map<string, struct<cnt:int>>>>"
    )

    def mk(cnt):
        return {
            "w1": Row(
                startDate="2020-01-06",
                nFrom=3,
                daily={"mon": Row(cnt=cnt), "tue": Row(cnt=2)},
            )
        }

    old = spark.createDataFrame([(1, mk(1)), (2, mk(5))], schema)
    new = spark.createDataFrame([(1, mk(1)), (2, mk(6))], schema)
    d = key_diff(old, new, ["k"])
    got = {r["k"]: (r["diff_kind"], list(r["changed_fields"] or [])) for r in d.collect()}
    assert got["1"] == ("unchanged", [])
    assert got["2"] == ("changed", ["agg"])

    # venn on the same deep schema: self-diff must be pure intersection
    from avro_diff_spark import venn_diff

    v = venn_diff(old, old)
    assert v.removed.count() == 0 and v.added.count() == 0
    assert v.intersection.count() == 2
