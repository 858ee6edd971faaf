"""The versioned-table STREAMING source (streaming/table_source.py):
append commits replay as micro-batches via the public Python Data
Source API; batch-equivalence against read_version; CDC composition
with key_diff_stream; Delta-source semantics for overwrites."""

from __future__ import annotations

import pytest

from avro_diff_spark.sources.versioned import commit_snapshot, read_version
from avro_diff_spark.streaming.table_source import stream_table


def _df(spark, rows, schema="k long, v string"):
    return spark.createDataFrame(rows, schema)


def _drain(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_replays_appends_batch_equivalent(spark, tmp_path):
    """AvailableNow drain of the stream == the batch read of the latest
    version (append-only table), the same batch-equivalence contract
    tests/test_streaming.py pins for every streaming operator."""
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a"), (2, "b")]), t)
    commit_snapshot(_df(spark, [(3, "c")]), t, mode="append")
    commit_snapshot(_df(spark, [(4, "d"), (5, "e")]), t, mode="append")

    _drain(stream_table(spark, t), "vt_all")
    got = {(r.k, r.v) for r in spark.sql("SELECT * FROM vt_all").collect()}
    want = {(r.k, r.v) for r in read_version(spark, t).collect()}
    assert got == want and len(got) == 5


def test_stream_starting_version_and_incremental_progress(spark, tmp_path):
    """starting_version skips history; a SECOND drain on the same
    checkpoint picks up only commits that landed in between (offsets =
    versions, tracked by the query checkpoint)."""
    t, ck, out = (str(tmp_path / d) for d in ("tbl", "ck", "out"))
    commit_snapshot(_df(spark, [(1, "a")]), t)
    commit_snapshot(_df(spark, [(2, "b")]), t, mode="append")

    def drain_to_parquet():
        q = (
            stream_table(spark, t, starting_version=1)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {(r.k, r.v) for r in spark.read.parquet(out).collect()}

    assert drain_to_parquet() == {(2, "b")}
    commit_snapshot(_df(spark, [(3, "c")]), t, mode="append")
    assert drain_to_parquet() == {(2, "b"), (3, "c")}  # no duplicates, no gaps


def test_stream_partitioned_table_reconstructs_pv(spark, tmp_path):
    """Partition columns come back typed from the log's partitionValues
    (the data files don't carry them) — same contract as read_version."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i % 2, f"r{i}") for i in range(10)], "k long, p long, v string"
    )
    commit_snapshot(df, t, partition_by=["p"])
    _drain(stream_table(spark, t), "vt_pv")
    out = spark.sql("SELECT * FROM vt_pv")
    assert out.schema.simpleString() == "struct<k:bigint,p:bigint,v:string>"
    assert {(r.k, r.p, r.v) for r in out.collect()} == {
        (i, i % 2, f"r{i}") for i in range(10)
    }


def test_stream_rejects_overwrite_unless_ignore_changes(spark, tmp_path):
    """Delta-source semantics: an overwrite inside the offset range
    fails the stream by default; ignore_changes=True skips the rewrite
    commit (its files are NOT replayed) and keeps streaming appends."""
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a")]), t)
    commit_snapshot(_df(spark, [(9, "z")]), t, mode="overwrite")
    commit_snapshot(_df(spark, [(2, "b")]), t, mode="append")

    q = (
        stream_table(spark, t)
        .writeStream.format("memory")
        .queryName("vt_fail")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="ignore_changes|overwrite"):
        q.awaitTermination(120)

    _drain(stream_table(spark, t, ignore_changes=True), "vt_skip")
    got = {(r.k, r.v) for r in spark.sql("SELECT * FROM vt_skip").collect()}
    assert got == {(1, "a"), (2, "b")}  # v1's rewrite files skipped


def test_stream_cdc_composition_with_key_diff_stream(spark, tmp_path):
    """Subsystem composition: tail-the-table -> key_diff_stream against
    a TIME-TRAVELED baseline — the streaming CDC pipeline entirely on
    green primitives (commit log + data source + stream-static diff)."""
    from avro_diff_spark.streaming.diff import key_diff_stream

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a"), (2, "b")]), t)  # v0: baseline
    commit_snapshot(_df(spark, [(2, "B"), (3, "c")]), t, mode="append")  # v1: changes

    feed = stream_table(spark, t, starting_version=1)
    out = key_diff_stream(feed, read_version(spark, t, 0), ["k"])
    _drain(out, "vt_cdc")
    got = {r.k: r.diff_kind for r in spark.sql("SELECT * FROM vt_cdc").collect()}
    assert got == {"2": "changed", "3": "added"}
