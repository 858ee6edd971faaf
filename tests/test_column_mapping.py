"""Column mapping (sources/versioned.py — Delta name-mapping semantics):
RENAME/DROP COLUMN as metadata-only commits over stable physical names.
Zero data files move at any scale; readers project physical → logical,
writers translate logical → physical; manifests (pv/stats/bloom) stay
keyed physically so every skip keeps working under the new names."""

from __future__ import annotations

import datetime
import json
import os

import pytest
from pyspark.sql import functions as F

from avro_diff_spark.sources.versioned import (
    commit_snapshot,
    drop_column,
    read_version,
    rename_column,
    latest_version,
    table_schema,
)


def _df(spark, rows, schema="k long, v string, x long"):
    return spark.createDataFrame(rows, schema)


def _data_files(root):
    out = set()
    for dp, _, names in os.walk(root):
        if "_log" in dp.split(os.sep):
            continue
        out.update(os.path.join(dp, n) for n in names)
    return out


def test_rename_is_metadata_only_and_time_travel_keeps_old_name(spark, tmp_path):
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a", 10), (2, "b", 20)]), t)
    disk = _data_files(t)
    v = rename_column(t, "v", "name")
    assert v == 1 and _data_files(t) == disk  # zero data files touched
    assert [f.name for f in table_schema(t).fields] == ["k", "name", "x"]
    got = read_version(spark, t)
    assert got.columns == ["k", "name", "x"]
    assert sorted((r.k, r.name) for r in got.collect()) == [(1, "a"), (2, "b")]
    # versions below the rename still show the old logical name
    assert read_version(spark, t, 0).columns == ["k", "v", "x"]

    with pytest.raises(ValueError, match="no column"):
        rename_column(t, "v", "z")
    with pytest.raises(ValueError, match="already exists"):
        rename_column(t, "k", "name")
    # a live physical name can never become another column's logical name
    with pytest.raises(ValueError, match="physical"):
        rename_column(t, "x", "v")


def test_append_and_dml_after_rename_stage_physical(spark, tmp_path):
    """New appends write the PHYSICAL column name into their files, so
    the whole table stays one consistent physical schema (no mergeSchema
    fan-out), and DML predicates on the logical name hit every file."""
    import pyarrow.parquet as pq

    from avro_diff_spark.sources.versioned import delete_where, update_where

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a", 10)]), t)
    rename_column(t, "v", "name")
    commit_snapshot(
        spark.createDataFrame([(2, "b", 20)], "k long, name string, x long"),
        t,
        mode="append",
    )
    new_files = [
        p for p in _data_files(t) if "v000002" in p and p.endswith(".parquet")
    ]
    assert new_files
    for p in new_files:  # staged under the PHYSICAL name
        assert "v" in pq.read_schema(p).names
        assert "name" not in pq.read_schema(p).names

    update_where(spark, t, "name = 'a'", {"name": "upper(name)"})
    delete_where(spark, t, "name = 'b'")
    got = sorted((r.k, r.name) for r in read_version(spark, t).collect())
    assert got == [(1, "A")]


def test_drop_column_hides_data_and_blocks_resurrection(spark, tmp_path):
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a", 10), (2, "b", 20)]), t)
    disk = _data_files(t)
    drop_column(t, "x")
    assert _data_files(t) == disk
    assert read_version(spark, t).columns == ["k", "v"]
    # the dropped name cannot come back via an evolving append
    with pytest.raises(ValueError, match="dropped"):
        commit_snapshot(
            _df(spark, [(3, "c", 99)]), t, mode="append", schema_evolution=True
        )
    # but a FRESH name evolves fine
    commit_snapshot(
        spark.createDataFrame([(3, "c", 7)], "k long, v string, y long"),
        t,
        mode="append",
        schema_evolution=True,
    )
    got = read_version(spark, t)
    assert set(got.columns) == {"k", "v", "y"}
    rows = {(r.k, r.v, r.y) for r in got.collect()}
    assert rows == {(1, "a", None), (2, "b", None), (3, "c", 7)}

    with pytest.raises(ValueError, match="only column"):
        d2 = str(tmp_path / "one")
        commit_snapshot(spark.createDataFrame([(1,)], "k long"), d2)
        drop_column(d2, "k")


def test_constraints_block_rename_and_drop(spark, tmp_path):
    from avro_diff_spark.sources.versioned import add_constraint

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a", 10)]), t)
    add_constraint(spark, t, "x_pos", "x > 0")
    with pytest.raises(ValueError, match="x_pos"):
        rename_column(t, "x", "amount")
    with pytest.raises(ValueError, match="x_pos"):
        drop_column(t, "x")
    # unrelated columns rename freely, and the constraint still enforces
    rename_column(t, "v", "name")
    with pytest.raises(ValueError, match="x_pos"):
        commit_snapshot(
            spark.createDataFrame([(9, "z", -1)], "k long, name string, x long"),
            t,
            mode="append",
        )


def test_pruning_survives_rename_of_partition_and_stats_columns(spark, tmp_path):
    """Manifest keys are physical: partitionValues, min/max stats, and
    hidden-transform values all keep pruning when queried by the NEW
    logical name — including bloom point lookups."""
    from avro_diff_spark.sources.versioned import _live_adds

    t = str(tmp_path / "p")
    df = spark.createDataFrame(
        [(1, "EU", 10), (2, "US", 20), (3, "EU", 30)], "k long, region string, x long"
    )
    commit_snapshot(
        df.repartitionByRange(3, "k"), t, partition_by=["region"],
        stats_cols=["k"], bloom_cols=["k"],
    )
    rename_column(t, "region", "zone")
    rename_column(t, "k", "id")

    got = read_version(spark, t, prune=("zone", "US", "US"))
    assert {(r.id, r.zone) for r in got.collect()} == {(2, "US")}
    stats_hit = read_version(spark, t, prune=("id", 3, 3), _provenance="file")
    assert {r["id"] for r in stats_hit.collect()} == {3}
    assert len({r["__file"] for r in stats_hit.collect()}) == 1
    eq_hit = read_version(spark, t, prune_eq=("id", 2))
    assert {r.id for r in eq_hit.collect()} == {2}

    # hidden transform partitioning prunes through the renamed source
    t2 = str(tmp_path / "h")
    ev = spark.createDataFrame(
        [(i, datetime.datetime(2024, 3, 1 + i // 2)) for i in range(6)],
        "k long, ts timestamp",
    )
    commit_snapshot(ev, t2, partition_by=["days(ts)"])
    rename_column(t2, "ts", "event_time")
    b = (
        "event_time",
        datetime.datetime(2024, 3, 2),
        datetime.datetime(2024, 3, 2, 23),
    )
    hit = read_version(spark, t2, prune=b, _provenance="file")
    assert {r.k for r in hit.collect()} == {2, 3}
    assert all("ts__day=19784" in r["__file"] for r in hit.collect())
    # append keeps working against the renamed transform spec
    commit_snapshot(
        spark.createDataFrame(
            [(9, datetime.datetime(2024, 3, 9))], "k long, event_time timestamp"
        ),
        t2,
        mode="append",
        partition_by=["days(event_time)"],
    )
    assert {r.k for r in read_version(spark, t2).collect()} == {0, 1, 2, 3, 4, 5, 9}


def test_merge_compaction_cdf_and_restore_after_rename(spark, tmp_path):
    from avro_diff_spark.sources.versioned import (
        compact_table,
        merge_into,
        read_changes,
        restore_table,
    )

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(i, f"r{i}", i * 10) for i in range(6)]), t)  # v0
    rename_column(t, "v", "name")                                            # v1
    src = spark.createDataFrame(
        [(0, "merged", 0), (42, "new", 420)], "k long, name string, x long"
    )
    merge_into(spark, t, src, ["k"], rewrite="dv")                           # v2
    got = {(r.k, r.name) for r in read_version(spark, t).collect()}
    assert (0, "merged") in got and (42, "new") in got

    ch = read_changes(spark, t, ["k"], v_from=0)  # skips the meta commit
    kinds = {(r.k, r._change_type) for r in ch.collect()}
    assert (42, "insert") in kinds and (0, "update_postimage") in kinds

    v = compact_table(spark, t, target_files=1)
    assert {(r.k, r.name) for r in read_version(spark, t, v).collect()} == got

    restore_table(t, 0)  # below the rename: logical name reverts too
    assert read_version(spark, t).columns == ["k", "v", "x"]
    assert {(r.k, r.v) for r in read_version(spark, t).collect()} == {
        (i, f"r{i}") for i in range(6)
    }
    # and restoring forward re-applies the mapping
    restore_table(t, 2)
    assert read_version(spark, t).columns == ["k", "name", "x"]


def test_clone_and_checkpoint_carry_mapping(spark, tmp_path):
    from avro_diff_spark.sources import versioned as V

    t, c = str(tmp_path / "src"), str(tmp_path / "clone")
    commit_snapshot(_df(spark, [(1, "a", 10)]), t)
    rename_column(t, "v", "name")
    V.clone_table(t, c)
    assert read_version(spark, c).columns == ["k", "name", "x"]
    assert [r.name for r in read_version(spark, c).collect()] == ["a"]

    # drive past a checkpoint and pin that mapping resolution uses it
    for i in range(2, 13):
        commit_snapshot(
            spark.createDataFrame([(i, f"r{i}", i)], "k long, name string, x long"),
            t,
            mode="append",
        )
    ck = os.path.join(t, "_log", "_last_checkpoint")
    assert os.path.exists(ck)
    n_opened = 0
    real = V._read_commit

    def counting(path):
        nonlocal n_opened
        n_opened += 1
        return real(path)

    try:
        V._read_commit = counting
        got = read_version(spark, t)
        assert got.columns == ["k", "name", "x"]
        assert got.count() == 12
        assert n_opened <= 8  # checkpoint + tail, not the full log
    finally:
        V._read_commit = real


def test_streaming_sources_read_physical_after_rename(spark, tmp_path):
    from avro_diff_spark.sources.versioned import delete_where
    from avro_diff_spark.streaming.table_source import stream_changes, stream_table

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a", 10)]), t)          # v0
    rename_column(t, "v", "name")                           # v1 (meta: skipped)
    commit_snapshot(
        spark.createDataFrame([(2, "b", 20)], "k long, name string, x long"),
        t,
        mode="append",
    )                                                       # v2
    delete_where(spark, t, "name = 'a'")                    # v3 (dv)

    def drain(df, name):
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain(stream_table(spark, t, ignore_changes=True), "cm_append")
    rows = spark.sql("SELECT * FROM cm_append").collect()
    assert {(r.k, r.name) for r in rows} == {(1, "a"), (2, "b")}

    drain(stream_changes(spark, t), "cm_cdf")
    ch = spark.sql("SELECT * FROM cm_cdf").collect()
    assert {(r.k, r.name, r._change_type, r._commit_version) for r in ch} == {
        (1, "a", "insert", 0),
        (2, "b", "insert", 2),
        (1, "a", "delete", 3),
    }


def test_table_cli_rename_and_drop_column(spark, tmp_path, capsys):
    from avro_diff_spark.cli import table_main

    t = str(tmp_path / "cli")
    commit_snapshot(_df(spark, [(1, "a", 10)]), t)
    assert table_main(["rename-column", t, "--column", "v", "--to", "name"]) == 0
    assert "renamed" in capsys.readouterr().out
    assert table_main(["drop-column", t, "--column", "x"]) == 0
    assert read_version(spark, t).columns == ["k", "name"]
    assert table_main(["rename-column", t, "--column", "name"]) == 2
