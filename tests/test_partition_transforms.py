"""Hidden partitioning (Iceberg partition transforms) on versioned
tables: days/hours/months/bucket/truncate specs in partition_by derive
the hive directory value while the source column stays in the data —
queries predicate on the SOURCE column and the log prunes through the
transform, zero file opens (sources/versioned.py)."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from avro_diff_spark.sources.versioned import (
    _parse_partition_spec,
    _transform_column,
    _transform_value,
    commit_snapshot,
    read_version,
)


def _files_read(spark, t, version=None, **kw):
    df = read_version(spark, t, version, _provenance="file", **kw)
    return {r["__file"] for r in df.select("__file").distinct().collect()}


def _events(spark, n=12):
    base = datetime.datetime(2024, 3, 1)
    rows = [
        (i, base + datetime.timedelta(days=i // 3, hours=i % 3), f"u{i % 4}")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "k long, ts timestamp, user string")


def test_parse_partition_spec_shapes():
    assert _parse_partition_spec("region") is None
    assert _parse_partition_spec("days(ts)") == ("days", "ts", None, "ts__day")
    assert _parse_partition_spec("bucket(16, uid)") == ("bucket", "uid", 16, "uid__bucket16")
    assert _parse_partition_spec("truncate(3,name)") == (
        "truncate", "name", 3, "name__trunc3"
    )
    with pytest.raises(ValueError, match="unknown partition transform"):
        _parse_partition_spec("years(ts)")
    with pytest.raises(ValueError, match="width"):
        _parse_partition_spec("bucket(ts)")
    with pytest.raises(ValueError, match="one argument"):
        _parse_partition_spec("days(3,ts)")


def test_days_transform_roundtrip_and_range_prune(spark, tmp_path):
    """The table reads back with its ORIGINAL schema (no derived column
    leaks); a range predicate on the source timestamp skips the other
    days' files entirely — answered from the manifest."""
    t = str(tmp_path / "tbl")
    df = _events(spark)
    commit_snapshot(df.repartition(1), t, partition_by=["days(ts)"])

    got = read_version(spark, t)
    assert got.columns == ["k", "ts", "user"]
    assert {(r.k, r.ts) for r in got.collect()} == {
        (r.k, r.ts) for r in df.collect()
    }
    # one hive dir per day on disk
    stage = [d for d in os.listdir(t) if d.startswith("v000000")][0]
    d0 = (datetime.date(2024, 3, 1) - datetime.date(1970, 1, 1)).days
    assert sorted(
        d for d in os.listdir(os.path.join(t, stage)) if d.startswith("ts__day=")
    ) == [f"ts__day={d0 + i}" for i in range(4)]

    day1 = datetime.datetime(2024, 3, 2)
    bounds = ("ts", day1, day1 + datetime.timedelta(hours=23))
    pruned = read_version(spark, t, prune=bounds)
    assert {r.k for r in pruned.collect()} == {3, 4, 5}
    assert len(_files_read(spark, t, prune=bounds)) == 1
    assert len(_files_read(spark, t)) == 4


def test_bucket_transform_point_lookup_prunes(spark, tmp_path):
    t = str(tmp_path / "tbl")
    commit_snapshot(_events(spark, 40), t, partition_by=["bucket(4,user)"])
    hit = read_version(spark, t, prune_eq=("user", "u2"))
    assert {r.user for r in hit.collect()} == {"u2"}
    assert {r.k for r in hit.collect()} == {i for i in range(40) if i % 4 == 2}
    assert len(_files_read(spark, t, prune_eq=("user", "u2"))) < len(
        _files_read(spark, t)
    )


def test_truncate_string_and_int(spark, tmp_path):
    t1, t2 = str(tmp_path / "s"), str(tmp_path / "i")
    sdf = spark.createDataFrame(
        [(1, "alpha"), (2, "alto"), (3, "beta"), (4, "bravo")], "k long, w string"
    )
    commit_snapshot(sdf, t1, partition_by=["truncate(2,w)"])
    hit = read_version(spark, t1, prune=("w", "alpha", "alto"))
    assert {r.k for r in hit.collect()} == {1, 2}
    assert len(_files_read(spark, t1, prune=("w", "alpha", "alto"))) < len(
        _files_read(spark, t1)
    )

    idf = spark.createDataFrame([(i, i * 7 - 40) for i in range(20)], "k long, n long")
    commit_snapshot(idf, t2, partition_by=["truncate(50,n)"])
    hit2 = read_version(spark, t2, prune=("n", 0, 49))
    assert {r.n for r in hit2.collect()} == {
        n for n in (i * 7 - 40 for i in range(20)) if 0 <= n <= 49
    }
    assert len(_files_read(spark, t2, prune=("n", 0, 49))) < len(
        _files_read(spark, t2)
    )


def test_driver_and_executor_transforms_agree(spark):
    """The prune-side python transform must produce exactly the value the
    write-side Column computed — else pruning silently drops files. One
    frame per kind, compared value-for-value."""
    rows = [
        (
            datetime.datetime(2024, 2, 29, 23, 45),
            datetime.date(1969, 12, 31),
            "smörgåsbord",
            -123,
        ),
        (datetime.datetime(1970, 1, 1, 0, 0), datetime.date(2024, 3, 1), "", 0),
        (datetime.datetime(1999, 12, 31, 1, 2), datetime.date(1970, 1, 2), "ab", 7),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, d date, s string, n long")
    cases = [
        ("days", "ts", None), ("days", "d", None), ("hours", "ts", None),
        ("months", "ts", None), ("months", "d", None),
        ("bucket", "s", 8), ("bucket", "n", 8), ("bucket", "d", 8),
        ("truncate", "s", 2), ("truncate", "n", 50),
    ]
    sel = [
        _transform_column(df, k, c, p).alias(f"{k}_{c}") for k, c, p in cases
    ]
    got = df.select(*sel).collect()
    for row, vals in zip(rows, got):
        by_col = dict(zip(["ts", "d", "s", "n"], row))
        for (k, c, p) in cases:
            assert vals[f"{k}_{c}"] == _transform_value(k, by_col[c], p), (k, c, row)


def test_append_keeps_transform_spec_and_dml_works(spark, tmp_path):
    from avro_diff_spark.sources.versioned import delete_where, update_where

    t = str(tmp_path / "tbl")
    commit_snapshot(_events(spark, 6), t, partition_by=["days(ts)"])
    commit_snapshot(
        _events(spark, 9), t, mode="append", partition_by=["days(ts)"]
    )
    with pytest.raises(ValueError, match="partitioning"):
        commit_snapshot(_events(spark, 3), t, mode="append", partition_by=["user"])

    delete_where(spark, t, "k = 2 AND ts = timestamp'2024-03-01 02:00:00'")
    update_where(spark, t, "k = 0", {"user": "'seen'"})
    got = read_version(spark, t)
    assert got.columns == ["k", "ts", "user"]
    rows = got.collect()
    # both commits held an identical (k=2, 02:00) row; the predicate masks both
    assert sum(1 for r in rows if r.k == 2) == 0
    assert {r.user for r in rows if r.k == 0} == {"seen"}

    # compaction preserves the hidden partitioning end-to-end
    from avro_diff_spark.sources.versioned import compact_table

    v = compact_table(spark, t, target_files=2)
    b2 = ("ts", datetime.datetime(2024, 3, 2), datetime.datetime(2024, 3, 2, 23))
    pruned = read_version(spark, t, v, prune=b2)
    assert {r.k for r in pruned.collect()} == {3, 4, 5}
    assert len(_files_read(spark, t, v, prune=b2)) < len(_files_read(spark, t, v))


def test_transform_null_source_and_collision_errors(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 3, 1)), (2, None)], "k long, ts timestamp"
    )
    commit_snapshot(df, t, partition_by=["days(ts)"])
    got = {(r.k, r.ts) for r in read_version(spark, t).collect()}
    assert got == {(r.k, r.ts) for r in df.collect()}
    # a range prune never returns the NULL-ts file
    hit = read_version(
        spark, t,
        prune=("ts", datetime.datetime(2024, 3, 1), datetime.datetime(2024, 3, 1, 23)),
    )
    assert {r.k for r in hit.collect()} == {1}
    assert len(
        _files_read(
            spark, t,
            prune=("ts", datetime.datetime(2024, 3, 1), datetime.datetime(2024, 3, 1, 23)),
        )
    ) == 1

    with pytest.raises(ValueError, match="no column"):
        commit_snapshot(df, str(tmp_path / "x"), partition_by=["days(nope)"])
    bad = df.withColumn("ts__day", F.lit(1))
    with pytest.raises(ValueError, match="already exists"):
        commit_snapshot(bad, str(tmp_path / "y"), partition_by=["days(ts)"])


def test_partition_evolution_prunes_each_generation_by_its_own_spec(spark, tmp_path):
    """Iceberg partition evolution: an append may change the partition
    spec (opt-in); old files keep their recorded transform and pruning
    consults each file's OWN pv key — both generations skip correctly
    for the same source-column predicate."""
    t = str(tmp_path / "tbl")
    commit_snapshot(_events(spark, 6), t, partition_by=["days(ts)"])
    # default: spec change refused
    with pytest.raises(ValueError, match="partition_evolution"):
        commit_snapshot(
            _events(spark, 9), t, mode="append", partition_by=["months(ts)"]
        )
    commit_snapshot(
        spark.createDataFrame(
            [(100 + i, datetime.datetime(2024, 4, 1 + i), f"u{i}") for i in range(3)],
            "k long, ts timestamp, user string",
        ),
        t,
        mode="append",
        partition_by=["months(ts)"],
        partition_evolution=True,
    )
    got = read_version(spark, t)
    assert {r.k for r in got.collect()} == set(range(6)) | {100, 101, 102}

    # prune inside the days() generation: only that day's file read
    b1 = ("ts", datetime.datetime(2024, 3, 2), datetime.datetime(2024, 3, 2, 23))
    assert {r.k for r in read_version(spark, t, prune=b1).collect()} == {3, 4, 5}
    f1 = _files_read(spark, t, prune=b1)
    assert f1 and all("ts__day=" in f for f in f1)

    # prune inside the months() generation: April files only
    b2 = ("ts", datetime.datetime(2024, 4, 1), datetime.datetime(2024, 4, 30))
    assert {r.k for r in read_version(spark, t, prune=b2).collect()} == {100, 101, 102}
    f2 = _files_read(spark, t, prune=b2)
    assert f2 and all("ts__month=" in f for f in f2)

    # a range spanning both generations still answers exactly (the
    # days generation holds nothing past 2024-03-02)
    b3 = ("ts", datetime.datetime(2024, 3, 4), datetime.datetime(2024, 4, 2))
    assert {r.k for r in read_version(spark, t, prune=b3).collect()} == {100, 101}


def test_property_driver_executor_transform_agreement(spark):
    """Hypothesis pin of the pruning-correctness invariant: for ANY
    value, the python transform equals the Column transform — a mismatch
    silently prunes files containing matching rows."""
    import datetime

    from hypothesis import given, settings, strategies as st

    ts_strategy = st.datetimes(
        min_value=datetime.datetime(1902, 1, 1),
        max_value=datetime.datetime(2200, 12, 31),
    ).map(lambda d: d.replace(microsecond=0))
    cases = st.lists(
        st.tuples(
            ts_strategy,
            st.dates(
                min_value=datetime.date(1902, 1, 1),
                max_value=datetime.date(2200, 12, 31),
            ),
            st.text(
                alphabet=st.characters(blacklist_categories=("Cs",)), max_size=12
            ),
            st.integers(min_value=-(2**40), max_value=2**40),
        ),
        min_size=1,
        max_size=8,
    )

    @settings(max_examples=20, deadline=None)
    @given(rows=cases)
    def check(rows):
        df = spark.createDataFrame(rows, "ts timestamp, d date, s string, n long")
        kinds = [
            ("days", "ts", None), ("days", "d", None), ("hours", "ts", None),
            ("months", "ts", None), ("months", "d", None),
            ("bucket", "s", 16), ("bucket", "n", 16), ("bucket", "d", 16),
            ("truncate", "s", 3), ("truncate", "n", 1000),
        ]
        got = df.select(
            *[_transform_column(df, k, c, p).alias(f"x{i}")
              for i, (k, c, p) in enumerate(kinds)]
        ).collect()
        for row, vals in zip(rows, got):
            by = dict(zip(["ts", "d", "s", "n"], row))
            for i, (k, c, p) in enumerate(kinds):
                assert vals[f"x{i}"] == _transform_value(k, by[c], p), (k, c, row)

    check()
