"""Round-8 ADVICE fixes (sources/versioned.py, streaming/table_source.py):
concurrent-rename survival in commit_stream and append rebase, Spark-cast
timestamp strings in bloom/bucket/stats pruning, compaction pinned to its
snapshot, full initial snapshots at non-append stream starts, and CDF
column projection across renames."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

import avro_diff_spark.sources.versioned as V
from avro_diff_spark.sources.versioned import (
    commit_snapshot,
    compact_table,
    read_changes,
    read_version,
    rename_column,
    table_schema,
)
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


def test_commit_stream_preserves_concurrent_rename(spark, tmp_path):
    """A rename_column committed between a micro-batch's staging and its
    publish must survive: the sink re-derives the column mapping inside
    the publish retry loop, so its set_mapping carries the NEW name
    (stale mapping would silently revert the rename — 'latest
    set_mapping wins')."""
    src, ckpt, t = (str(tmp_path / d) for d in ("src", "ck", "tbl"))
    os.makedirs(src)
    commit_snapshot(_df(spark, [(1, "a")]), t)
    # activate mapping BEFORE the stream so physical names differ from
    # logical ones (v -> v); then rename v->txt mid-publish
    rename_column(t, "v", "val")
    _df(spark, [(2, "b")], "k long, val string").coalesce(1).write.mode(
        "append"
    ).json(src)

    real_publish = V._publish_commit
    fired = {"n": 0}

    def racing_publish(table_path, version, commit):
        if commit.get("app") and fired["n"] == 0:
            fired["n"] = 1
            rename_column(t, "val", "txt")
            raise V.CommitConflict("lost race to rename_column")
        return real_publish(table_path, version, commit)

    stream = spark.readStream.schema("k long, val string").json(src)
    V._publish_commit = racing_publish
    try:
        q = V.commit_stream(stream, t, checkpoint=ckpt)
        q.awaitTermination(120)
    finally:
        V._publish_commit = real_publish
    assert fired["n"] == 1, "race injection never fired"
    # the rename survives the stream's commit, and the batch's rows read
    # under the NEW logical name (physical names are rename-stable)
    assert [f.name for f in table_schema(t).fields] == ["k", "txt"]
    got = {(r.k, r.txt) for r in read_version(spark, t).collect()}
    assert got == {(1, "a"), (2, "b")}


def test_append_rebase_preserves_concurrent_rename(spark, tmp_path):
    """commit_snapshot's append rebase: a concurrent rename between
    staging and publish must not be reverted by the rebased commit's
    identity entries — the stale logical name's physical is already
    addressed by the fresh mapping, so no identity entry is recorded."""
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a")]), t)
    rename_column(t, "v", "val")

    real_publish = V._publish_commit
    fired = {"n": 0}

    def racing_publish(table_path, version, commit):
        if commit["mode"] == "append" and fired["n"] == 0:
            fired["n"] = 1
            rename_column(t, "val", "txt")
            raise V.CommitConflict("lost race to rename_column")
        return real_publish(table_path, version, commit)

    V._publish_commit = racing_publish
    try:
        commit_snapshot(_df(spark, [(2, "b")], "k long, val string"), t, mode="append")
    finally:
        V._publish_commit = real_publish
    assert fired["n"] == 1
    assert [f.name for f in table_schema(t).fields] == ["k", "txt"]
    got = {(r.k, r.txt) for r in read_version(spark, t).collect()}
    assert got == {(1, "a"), (2, "b")}


def test_bloom_prunes_fractional_second_timestamps(spark, tmp_path):
    """Bloom point-lookup pruning for a timestamp WITH microseconds: the
    write side hashed Spark's cast ('…00.5'); the probe must hash the
    same bytes, not Python isoformat ('…00.500000') — the mismatch
    silently pruned files CONTAINING the matching row."""
    t = str(tmp_path / "tbl")
    ts = datetime.datetime(2024, 1, 1, 0, 0, 0, 500000)
    other = datetime.datetime(2024, 6, 1, 12, 30, 15, 123000)
    df = spark.createDataFrame([(1, ts), (2, other)], "k long, ts timestamp")
    commit_snapshot(df.repartition(2, "k"), t, bloom_cols=["ts"], stats_cols=["ts"])
    got = read_version(spark, t, prune_eq=("ts", ts)).collect()
    assert {(r.k, r.ts) for r in got if r.ts == ts} == {(1, ts)}
    # range pruning with a fractional bound keeps the row too
    got = read_version(spark, t, prune=("ts", ts, ts)).collect()
    assert (1, ts) in {(r.k, r.ts) for r in got}


def test_bucket_transform_prunes_fractional_second_timestamps(spark, tmp_path):
    """bucket(N, ts) hidden-partition pruning hashes Spark's string cast
    driver-side — a fractional-second probe must land in the same bucket
    the write side put the row in (zero missing rows), while still
    skipping at least one non-matching bucket at this N."""
    t = str(tmp_path / "tbl")
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, base + datetime.timedelta(seconds=i, microseconds=500000 * (i % 2)))
        for i in range(16)
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp")
    commit_snapshot(df, t, partition_by=["bucket(4,ts)"])
    for k, ts in rows[:6]:
        got = {(r.k, r.ts) for r in read_version(spark, t, prune_eq=("ts", ts)).collect()}
        assert (k, ts) in got, f"row {k} pruned away at ts={ts!r}"


def test_tz_aware_probe_keeps_file(spark, tmp_path):
    """A tz-aware datetime probe has a session-dependent Spark rendering:
    bloom/bucket must SKIP (keep the file), never hash a mismatched
    string and prune it."""
    t = str(tmp_path / "tbl")
    ts = datetime.datetime(2024, 1, 1, 0, 0, 0, 500000)
    df = spark.createDataFrame([(1, ts)], "k long, ts timestamp")
    commit_snapshot(df, t, bloom_cols=["ts"])
    aware = ts.replace(tzinfo=datetime.timezone.utc)
    assert V._spark_cast_str(aware) is None
    got = read_version(spark, t, prune_eq=("ts", aware)).count()
    assert got == 1  # conservative: file kept


def test_compact_table_pins_snapshot_against_concurrent_append(spark, tmp_path):
    """Full compaction reads the SNAPSHOTTED version: an append landing
    between the version snapshot and the rewrite's read stays additive —
    unpinned, its rows would be folded into the rewrite while its file
    also stayed live (duplicates)."""
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a"), (2, "b")]), t)
    commit_snapshot(_df(spark, [(3, "c")]), t, mode="append")

    real_read = V.read_version
    fired = {"n": 0}

    def racing_read(spark_, table_path, version=None, **kw):
        if fired["n"] == 0 and table_path == t:
            fired["n"] = 1
            commit_snapshot(_df(spark, [(4, "d")]), t, mode="append")
        return real_read(spark_, table_path, version, **kw)

    V.read_version = racing_read
    try:
        compact_table(spark, t, target_files=1)
    finally:
        V.read_version = real_read
    assert fired["n"] == 1
    rows = [(r.k, r.v) for r in read_version(spark, t).collect()]
    assert sorted(rows) == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]  # no dupes


def test_stream_start_at_replace_commit_is_full_snapshot(spark, tmp_path):
    """starting_version pointing at an incremental REPLACE (compaction)
    commit: its own adds are only the packed tail — the stream's initial
    snapshot must be the full live set at that version."""
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(i, f"r{i}") for i in range(50)]), t)
    # small tail file, then an incremental bin-pack replace that touches
    # ONLY the tail — well-sized files stay as metadata
    commit_snapshot(_df(spark, [(100, "x")]), t, mode="append")
    commit_snapshot(_df(spark, [(101, "y")]), t, mode="append")
    v = compact_table(spark, t, target_files=1, min_file_rows=10)
    assert v == 3  # the replace commit landed

    _drain(stream_table(spark, t, starting_version=v), "r9_replace_start")
    got = {(r.k, r.v) for r in spark.sql("SELECT * FROM r9_replace_start").collect()}
    want = {(r.k, r.v) for r in read_version(spark, t, v).collect()}
    assert got == want and len(got) == 52


def test_stream_start_at_meta_commit_is_full_snapshot(spark, tmp_path):
    """starting_version pointing at a META commit (constraint/rename):
    it adds no files — previously the stream emitted NOTHING; now the
    initial snapshot is the live set at that version."""
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a"), (2, "b")]), t)
    V.add_constraint(spark, t, "k_pos", "k > 0")  # meta commit, version 1
    _drain(stream_table(spark, t, starting_version=1), "r9_meta_start")
    got = {(r.k, r.v) for r in spark.sql("SELECT * FROM r9_meta_start").collect()}
    assert got == {(1, "a"), (2, "b")}


def test_stream_start_with_live_dvs_raises(spark, tmp_path):
    """The snapshot-at-start path cannot apply deletion vectors — it must
    refuse with a clear message rather than resurrect deleted rows."""
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), t)
    v = V.delete_where(spark, t, "k = 2", rewrite="dv")
    with pytest.raises(Exception, match="deletion vectors"):
        _drain(stream_table(spark, t, starting_version=v), "r9_dv_start")


def test_read_changes_across_rename_projects_to_latest_names(spark, tmp_path):
    """A CDF range spanning a rename_column: pre-rename steps project to
    v_to's logical names through the stable physical names — one 'txt'
    column with real values, never a (v, txt) pair of half-null columns."""
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a")]), t)  # v0
    commit_snapshot(_df(spark, [(2, "b")]), t, mode="append")  # v1
    rename_column(t, "v", "txt")  # v2 (meta)
    commit_snapshot(_df(spark, [(3, "c")], "k long, txt string"), t, mode="append")  # v3

    ch = read_changes(spark, t, ["k"], v_from=0)
    assert sorted(ch.columns) == ["_change_type", "_commit_version", "k", "txt"]
    rows = {(r.k, r.txt, r._change_type, r._commit_version) for r in ch.collect()}
    assert rows == {
        (2, "b", "insert", 1),
        (3, "c", "insert", 3),
    }
    # keys given in CURRENT names also work when the KEY itself renamed
    rename_column(t, "k", "id")  # v4
    commit_snapshot(_df(spark, [(4, "d")], "id long, txt string"), t, mode="append")  # v5
    ch2 = read_changes(spark, t, ["id"], v_from=0)
    assert sorted(ch2.columns) == ["_change_type", "_commit_version", "id", "txt"]
    rows2 = {(r.id, r.txt, r._commit_version) for r in ch2.collect()}
    assert rows2 == {(2, "b", 1), (3, "c", 3), (4, "d", 5)}


def test_table_files_manifest_surface(spark, tmp_path, capsys):
    """table_files answers the live-file inspection from the log alone:
    per-file row counts, partition values, skipping coverage, DV state —
    and the CLI prints it."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i % 2, f"r{i}") for i in range(20)], "k long, p long, v string"
    )
    commit_snapshot(df, t, partition_by=["p"], stats_cols=["k"], bloom_cols=["v"])
    V.delete_where(spark, t, "k = 3", rewrite="dv")

    files = V.table_files(spark, t).collect()
    assert sum(r.n_rows for r in files) == 20
    assert all(r.partition_values and "p" in r.partition_values for r in files)
    assert all(r.stats_cols == ["k"] and r.bloom_cols == ["v"] for r in files)
    assert sum(r.n_dvs for r in files) == 1
    assert sum(r.dv_deleted_rows for r in files) == 1
    # time travel: the pre-delete manifest carries no DVs
    v0 = V.table_files(spark, t, 0).collect()
    assert sum(r.n_dvs for r in v0) == 0

    from avro_diff_spark.cli import table_main

    assert table_main(["files", t]) == 0
    out = capsys.readouterr().out
    assert f"{len(files)} live files" in out and "dvs=1(-1 rows)" in out


def test_null_count_stats_and_is_null_pruning(spark, tmp_path, monkeypatch):
    """stats_cols now record the Delta nullCount: prune_eq=(col, None) is
    the IS NULL lookup — files recording zero nulls are skipped from the
    manifest (zero footer fetches), files with nulls are kept, and the
    residual filter is isNull (== NULL would drop every row)."""
    t = str(tmp_path / "tbl")
    a = spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string")
    b = spark.createDataFrame([(3, None), (4, "z")], "k long, v string")
    commit_snapshot(a.coalesce(1), t, stats_cols=["v"])
    commit_snapshot(b.coalesce(1), t, mode="append", stats_cols=["v"])

    import pyarrow.parquet as pq

    def explode(*a, **k):
        raise AssertionError("footer fetched during manifest-only pruning")

    monkeypatch.setattr(pq, "ParquetFile", explode)
    monkeypatch.setattr(pq, "read_table", explode)
    got = read_version(spark, t, prune_eq=("v", None))
    rows = {(r.k, r.v) for r in got.collect()}
    assert rows == {(3, None)}
    # the all-nonnull file was pruned at the manifest: only one FileScan input
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert plan.count("parquet") >= 1


def test_distributed_harvest_records_null_counts(spark, tmp_path):
    """The one-pass distributed stats harvest (>32 files) carries the
    same nullCount third element as the footer path."""
    import avro_diff_spark.sources.versioned as VV

    t = str(tmp_path / "tbl")
    rows = [(i, None if i % 3 == 0 else f"v{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "k long, v string").repartition(40)
    commit_snapshot(df, t, stats_cols=["v"])
    adds, _ = VV._live_adds(t, 0)
    ns = [info["stats"]["v"][2] for info in adds.values() if info.get("stats", {}).get("v")]
    assert sum(ns) == sum(1 for _, v in rows if v is None)


def test_table_count_is_metadata_only(spark, tmp_path, monkeypatch):
    """COUNT(*) from the manifest: row counts net of deletion vectors,
    zero file opens, correct across appends, DV deletes, and time
    travel."""
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(i, f"r{i}") for i in range(10)]), t)
    commit_snapshot(_df(spark, [(100, "x")]), t, mode="append")
    V.delete_where(spark, t, "k < 3", rewrite="dv")

    import pyarrow.parquet as pq

    def explode(*a, **k):
        raise AssertionError("file opened during metadata count")

    monkeypatch.setattr(pq, "ParquetFile", explode)
    monkeypatch.setattr(pq, "read_table", explode)
    assert V.table_count(t) == 8
    assert V.table_count(t, 1) == 11
    assert V.table_count(t, 0) == 10
    assert V.table_count(t) == read_version(spark, t).count()


def test_multi_predicate_and_in_list_pruning(spark, tmp_path, monkeypatch):
    """prune=/prune_eq= accept lists of specs and IN-list values: each
    extra predicate is another manifest-only intersection (strict file
    subset, zero footer fetches), and the residual filters reproduce an
    unpruned filtered read exactly."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i % 4, f"g{i % 5}", f"r{i}") for i in range(64)],
        "k long, p long, g string, v string",
    )
    commit_snapshot(
        df.repartition(8, "k"), t, stats_cols=["k", "g"], bloom_cols=["v"]
    )
    base = read_version(spark, t)
    want = {
        (r.k, r.p, r.g, r.v)
        for r in base.filter(
            (F.col("k") >= 10) & (F.col("k") <= 40)
            & F.col("g").isin(["g1", "g2"]) & (F.col("v") == "r11")
        ).collect()
    }

    import pyarrow.parquet as pq

    def explode(*a, **k):
        raise AssertionError("footer fetched during manifest-only pruning")

    monkeypatch.setattr(pq, "ParquetFile", explode)
    got_df = read_version(
        spark,
        t,
        prune=[("k", 10, 40)],
        prune_eq=[("g", ("g1", "g2")), ("v", "r11")],
    )
    got = {(r.k, r.p, r.g, r.v) for r in got_df.collect()}
    assert got == want and got == {(11, 3, "g1", "r11")}
    # the bloom point-lookup pruned to a strict subset of the 8 files
    n_open = got_df.select(F.input_file_name()).distinct().count()
    assert n_open < 8


def test_in_list_with_null_candidate(spark, tmp_path):
    """An IN-list containing None matches rows by isNull alongside the
    non-null candidates."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], "k long, v string"
    )
    commit_snapshot(df.coalesce(1), t, stats_cols=["v"])
    got = {
        (r.k, r.v)
        for r in read_version(spark, t, prune_eq=("v", ["a", None])).collect()
    }
    assert got == {(1, "a"), (2, None)}


def test_merge_stream_upserts_exactly_once(spark, tmp_path):
    """Streaming MERGE: each micro-batch applies as one idempotent MERGE
    commit — updates and inserts land, a restart on the same checkpoint
    re-commits nothing, and a later wave merges incrementally."""
    src, ckpt, t = (str(tmp_path / d) for d in ("src", "ck", "tbl"))
    os.makedirs(src)
    commit_snapshot(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), t)
    _df(spark, [(2, "B"), (4, "d")]).coalesce(1).write.mode("append").json(src)

    def drain():
        q = V.merge_stream(
            spark.readStream.schema("k long, v string").json(src),
            t,
            ["k"],
            checkpoint=ckpt,
        )
        q.awaitTermination(120)

    drain()
    v1 = V.latest_version(t)
    got = {(r.k, r.v) for r in read_version(spark, t).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}

    drain()  # restart with nothing new: no commit
    assert V.latest_version(t) == v1

    _df(spark, [(1, "A")]).coalesce(1).write.mode("append").json(src)
    drain()
    got = {(r.k, r.v) for r in read_version(spark, t).collect()}
    assert got == {(1, "A"), (2, "B"), (3, "c"), (4, "d")}


def test_vacuum_older_than_timestamp_retention(spark, tmp_path):
    """Time-based retention: versions still readable as of the timestamp
    survive; combining with keep_versions keeps the MORE retentive."""
    import time as _t

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a")]), t)  # v0
    _t.sleep(0.01)
    cut = datetime.datetime.now()
    _t.sleep(0.01)
    commit_snapshot(_df(spark, [(2, "b")]), t, mode="overwrite")  # v1
    commit_snapshot(_df(spark, [(3, "c")]), t, mode="overwrite")  # v2

    # older_than=now keeps only the latest... but keep_versions=3 wins
    assert V.vacuum(t, keep_versions=3, older_than=datetime.datetime.now()) == []
    assert {r.k for r in read_version(spark, t, 0).collect()} == {1}

    # older_than=cut keeps v0 (the snapshot in force at cut) even though
    # keep_versions=1 alone would drop it
    assert V.vacuum(t, keep_versions=1, older_than=cut) == []
    assert {r.k for r in read_version(spark, t, 0).collect()} == {1}

    # retention expired: keep_versions=1 with a recent older_than drops v0/v1
    deleted = V.vacuum(t, keep_versions=1, older_than=datetime.datetime.now())
    assert deleted
    with pytest.raises(Exception, match="vacuum"):
        read_version(spark, t, 0).collect()


def test_compact_target_rows_per_file(spark, tmp_path):
    """Row-targeted compaction sizing: the rewrite's file count derives
    from the manifest's live row total."""
    t = str(tmp_path / "tbl")
    commit_snapshot(
        spark.createDataFrame([(i, f"r{i}") for i in range(100)], "k long, v string"),
        t,
    )
    V.compact_table(spark, t, target_rows_per_file=25)
    files = V.table_files(spark, t).collect()
    assert len(files) == 4
    assert sum(r.n_rows for r in files) == 100


def test_cli_table_count_and_vacuum_older_than(spark, tmp_path, capsys):
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a"), (2, "b")]), t)
    from avro_diff_spark.cli import table_main

    assert table_main(["count", t]) == 0
    assert capsys.readouterr().out.strip() == "2"
    # --older-than in the far past keeps everything
    commit_snapshot(_df(spark, [(3, "c")]), t, mode="overwrite")
    assert table_main(
        ["vacuum", t, "--keep-versions", "1", "--older-than", "2000-01-01T00:00:00"]
    ) == 0
    assert {r.k for r in read_version(spark, t, 0).collect()} == {1, 2}


def test_type_widening_append_int_to_long(spark, tmp_path):
    """schema_evolution='widen': a long append into an int table widens
    the table schema to long; old int32 files read natively under the
    wide requested schema — zero files rewritten — and values past 2^31
    round-trip."""
    t = str(tmp_path / "tbl")
    commit_snapshot(
        spark.createDataFrame([(1, 10)], "k long, x int").coalesce(1), t
    )
    with pytest.raises(ValueError, match="widen"):
        commit_snapshot(
            spark.createDataFrame([(2, 2**40)], "k long, x long"),
            t,
            mode="append",
        )
    files_before = {r.file for r in V.table_files(spark, t).collect()}
    commit_snapshot(
        spark.createDataFrame([(2, 2**40)], "k long, x long").coalesce(1),
        t,
        mode="append",
        schema_evolution="widen",
    )
    assert [f.dataType.typeName() for f in table_schema(t).fields] == [
        "long",
        "long",
    ]
    got = {(r.k, r.x) for r in read_version(spark, t).collect()}
    assert got == {(1, 10), (2, 2**40)}
    # no old file was rewritten
    assert files_before <= {r.file for r in V.table_files(spark, t).collect()}
    # time travel shows the pre-widen version with its original type
    v0 = read_version(spark, t, 0)
    assert dict(v0.dtypes)["x"] == "int"


def test_type_widening_narrower_append_and_float_chain(spark, tmp_path):
    """The other direction (int into a long table) and float->double
    both ride the same chains; incompatible drift is still refused."""
    t = str(tmp_path / "tbl")
    commit_snapshot(
        spark.createDataFrame([(2**40, 1.5)], "k long, x double").coalesce(1), t
    )
    commit_snapshot(
        spark.createDataFrame([(7, 2.5)], "k int, x float").coalesce(1),
        t,
        mode="append",
        schema_evolution="widen",
    )
    assert dict(read_version(spark, t).dtypes) == {"k": "bigint", "x": "double"}
    got = {(r.k, r.x) for r in read_version(spark, t).collect()}
    assert got == {(2**40, 1.5), (7, 2.5)}
    with pytest.raises(ValueError, match="chain"):
        commit_snapshot(
            spark.createDataFrame([("s", 1.0)], "k string, x double"),
            t,
            mode="append",
            schema_evolution="widen",
        )


def test_type_widening_composes_with_stats_and_dedup_paths(spark, tmp_path):
    """Widened tables keep pruning (int-file stats probed with long
    bounds), keyed diff, and additive evolution working."""
    t = str(tmp_path / "tbl")
    commit_snapshot(
        spark.createDataFrame(
            [(i, i * 10) for i in range(10)], "k long, x int"
        ).coalesce(1),
        t,
        stats_cols=["x"],
    )
    commit_snapshot(
        spark.createDataFrame([(100, 2**41)], "k long, x long").coalesce(1),
        t,
        mode="append",
        schema_evolution="widen",
        stats_cols=["x"],
    )
    got = read_version(spark, t, prune=("x", 2**40, 2**42)).collect()
    assert {(r.k, r.x) for r in got} == {(100, 2**41)}
    # log-level skip actually pruned the int file
    n_files = (
        read_version(spark, t, prune=("x", 2**40, 2**42))
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    assert n_files == 1
    # keyed diff across the widen boundary
    d = V.key_diff_versions(spark, t, ["k"], v_old=0)
    kinds = {r["diff_kind"] for r in d.collect()}
    assert kinds == {"unchanged", "added"}


def test_analyze_ndv_columns(spark, tmp_path):
    """compute_stats(ndv_cols=) records table-level HLL distinct counts:
    accurate at sketch tolerance, rename-stable (physical keys),
    checkpoint-surviving, and surfaced by table_detail."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"u{i % 137}") for i in range(2000)], "k long, u string"
    )
    commit_snapshot(df, t)
    v = V.compute_stats(spark, t, [], ndv_cols=["k", "u"])
    assert v == 1
    ndv = V.table_ndv(t)
    assert abs(ndv["k"] - 2000) / 2000 < 0.2
    assert abs(ndv["u"] - 137) / 137 < 0.15
    assert V.table_detail(t)["ndv"] == ndv
    # rename: the recorded numbers follow the column to its new name
    rename_column(t, "u", "user")
    assert V.table_ndv(t)["user"] == ndv["u"]
    # survive a checkpoint + tail replay
    for i in range(12):
        commit_snapshot(_df(spark, [(1000 + i, "x")], "k long, user string"), t, mode="append")
    assert V.table_ndv(t)["user"] == ndv["u"]
    # re-analyze refreshes (latest per column wins)
    V.compute_stats(spark, t, [], ndv_cols=["user"])
    assert V.table_ndv(t)["user"] >= ndv["u"]


def test_widened_table_composes_with_stream_and_cdf(spark, tmp_path):
    """A widened table still streams (the per-file pyarrow reader feeds
    typed rows into the WIDE declared schema) and still derives its
    change feed across the widen boundary."""
    t = str(tmp_path / "tbl")
    commit_snapshot(
        spark.createDataFrame([(1, 10)], "k long, x int").coalesce(1), t
    )
    commit_snapshot(
        spark.createDataFrame([(2, 2**40)], "k long, x long").coalesce(1),
        t,
        mode="append",
        schema_evolution="widen",
    )
    _drain(stream_table(spark, t), "r9_widened_stream")
    got = {(r.k, r.x) for r in spark.sql("SELECT * FROM r9_widened_stream").collect()}
    assert got == {(1, 10), (2, 2**40)}

    ch = read_changes(spark, t, ["k"], v_from=0)
    rows = {(r.k, r.x, r._change_type, r._commit_version) for r in ch.collect()}
    assert rows == {(2, 2**40, "insert", 1)}


def test_spark_cast_str_matches_spark_exactly(spark):
    """_spark_cast_str must reproduce Spark's CAST(x AS STRING) byte for
    byte — pinned against Spark itself over the tricky fraction shapes
    (zero, trailing-zero-trimmed, full precision) plus date/bool/int."""
    vals = [
        datetime.datetime(2024, 1, 1, 0, 0, 0, us)
        for us in (0, 1, 10, 100, 1000, 10000, 100000, 500000,
                   123456, 120000, 999999, 900000, 305000)
    ] + [datetime.datetime(1999, 12, 31, 23, 59, 59, 5)]
    df = spark.createDataFrame([(v,) for v in vals], "ts timestamp")
    got = {
        r.ts: r.s
        for r in df.select("ts", F.col("ts").cast("string").alias("s")).collect()
    }
    for v in vals:
        assert V._spark_cast_str(v) == got[v], v
    # non-temporal domains the bloom/bucket paths hash
    other = spark.createDataFrame(
        [(7, True, datetime.date(2024, 2, 29), "x y")],
        "i long, b boolean, d date, s string",
    ).select(
        *[F.col(c).cast("string").alias(c) for c in ("i", "b", "d", "s")]
    ).collect()[0]
    assert V._spark_cast_str(7) == other.i
    assert V._spark_cast_str(True) == other.b
    assert V._spark_cast_str(datetime.date(2024, 2, 29)) == other.d
    assert V._spark_cast_str("x y") == other.s
