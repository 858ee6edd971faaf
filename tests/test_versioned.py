"""Versioned-table commit log (sources/versioned.py): snapshot commits,
time travel, history, crash-safety, and the cross-version keyed diff."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from avro_diff_spark.sources.versioned import (
    commit_snapshot,
    key_diff_versions,
    latest_version,
    read_version,
    table_history,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_commit_read_overwrite_append_history(spark, tmp_path):
    t = str(tmp_path / "tbl")
    assert latest_version(t) == -1
    v0 = commit_snapshot(_df(spark, [(1, "a"), (2, "b")]), t)
    v1 = commit_snapshot(_df(spark, [(3, "c")]), t, mode="append")
    v2 = commit_snapshot(_df(spark, [(1, "z")]), t, mode="overwrite")
    assert (v0, v1, v2) == (0, 1, 2)
    assert latest_version(t) == 2

    # time travel reads every version exactly
    assert {(r.k, r.v) for r in read_version(spark, t, 0).collect()} == {(1, "a"), (2, "b")}
    assert {(r.k, r.v) for r in read_version(spark, t, 1).collect()} == {
        (1, "a"), (2, "b"), (3, "c")
    }
    assert {(r.k, r.v) for r in read_version(spark, t).collect()} == {(1, "z")}

    hist = table_history(t)
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert [h["mode"] for h in hist] == ["overwrite", "append", "overwrite"]
    assert [h["n_rows"] for h in hist] == [2, 1, 1]
    assert hist[2]["n_removed"] == hist[0]["n_added"] + hist[1]["n_added"]


def test_staged_but_uncommitted_files_are_invisible(spark, tmp_path):
    """The crash-safety contract: data files without a published commit
    never appear in any read — the log, not the directory listing, is
    the source of truth."""
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a")]), t)
    # simulate a writer that crashed after staging data, before publishing
    _df(spark, [(9, "ghost")]).write.parquet(os.path.join(t, "v000001-deadbeef"))
    assert {r.k for r in read_version(spark, t).collect()} == {1}
    # the next commit just takes the next version number
    commit_snapshot(_df(spark, [(2, "b")]), t, mode="append")
    assert {r.k for r in read_version(spark, t).collect()} == {1, 2}


def test_torn_commit_tmp_file_ignored(spark, tmp_path):
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a")]), t)
    with open(os.path.join(t, "_log", ".000001.json.tmp"), "w") as fh:
        fh.write('{"version": 1, "actions": [')  # torn write, never renamed
    assert latest_version(t) == 0
    assert {r.k for r in read_version(spark, t).collect()} == {1}


def test_read_errors(spark, tmp_path):
    t = str(tmp_path / "none")
    with pytest.raises(ValueError, match="no commits"):
        read_version(spark, t)


def test_key_diff_versions_classification(spark, tmp_path):
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), t)
    commit_snapshot(_df(spark, [(2, "b"), (3, "C"), (4, "d")]), t, mode="overwrite")
    d = key_diff_versions(spark, t, ["k"], v_old=0, v_new=1, include_payload=False)
    got = {r.k: r.diff_kind for r in d.collect()}
    assert got == {"1": "removed", "2": "unchanged", "3": "changed", "4": "added"}


def test_compact_and_vacuum_lifecycle(spark, tmp_path):
    """Compaction rewrites the live set smaller without changing content;
    vacuum reclaims files of truncated versions plus crashed-writer
    staging, while the kept version still reads exactly."""
    from avro_diff_spark.sources.versioned import compact_table, vacuum

    t = str(tmp_path / "tbl")
    big = spark.range(500).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("v")
    ).repartition(10)
    commit_snapshot(big, t)
    commit_snapshot(_df(spark, [(1000, "x")]), t, mode="append")
    before = {(r.k, r.v) for r in read_version(spark, t).collect()}

    v2 = compact_table(spark, t, target_files=2)
    assert v2 == 2
    assert {(r.k, r.v) for r in read_version(spark, t).collect()} == before
    hist = table_history(t)
    assert hist[2]["n_added"] <= 2 and hist[2]["n_removed"] >= 10

    # a crashed writer's staged-but-unpublished directory
    _df(spark, [(9, "ghost")]).write.parquet(os.path.join(t, "v000099-dead"))

    deleted = vacuum(t, keep_versions=1)
    assert len(deleted) >= 11  # the pre-compaction files + ghost files
    assert {(r.k, r.v) for r in read_version(spark, t).collect()} == before
    assert not os.path.isdir(os.path.join(t, "v000099-dead"))
    with pytest.raises(Exception):
        read_version(spark, t, 0).collect()  # time travel truncated by vacuum


def test_commit_stream_appends_and_restart_does_not_duplicate(spark, tmp_path):
    """File-source stream -> one append commit per micro-batch; a restart
    on the same checkpoint commits ONLY newly landed files; commits carry
    the (app, epoch) pair the idempotence dedup keys on."""
    from avro_diff_spark.sources.versioned import commit_stream

    src, ckpt, t = (str(tmp_path / d) for d in ("src", "ck", "tbl"))
    os.makedirs(src)
    _df(spark, [(1, "a"), (2, "b")]).coalesce(1).write.mode("append").json(src)
    stream = spark.readStream.schema("k long, v string").json(src)
    q = commit_stream(stream, t, checkpoint=ckpt)
    q.awaitTermination(120)
    assert {(r.k, r.v) for r in read_version(spark, t).collect()} == {(1, "a"), (2, "b")}
    n_commits_first = latest_version(t) + 1

    # more files land; the restarted query drains only those
    _df(spark, [(3, "c")]).coalesce(1).write.mode("append").json(src)
    q = commit_stream(
        spark.readStream.schema("k long, v string").json(src), t, checkpoint=ckpt
    )
    q.awaitTermination(120)
    rows = [(r.k, r.v) for r in read_version(spark, t).collect()]
    assert sorted(rows) == [(1, "a"), (2, "b"), (3, "c")]  # no duplicates
    hist = table_history(t)
    assert len(hist) == n_commits_first + 1
    with open(os.path.join(t, "_log", "000000.json")) as fh:
        c = json.load(fh)
    assert c["mode"] == "append" and "epoch" in c and "app" in c


def test_commit_stats_enable_log_level_pruning(spark, tmp_path):
    """stats_cols harvests per-file min/max into the commit; a pruned
    read opens ONLY intersecting files and equals the filtered full
    read exactly. Range-partitioned data makes the skipping decisive."""
    from avro_diff_spark.sources.versioned import _live_adds

    t = str(tmp_path / "tbl")
    df = (
        spark.range(1000)
        .select(F.col("id").alias("k"), (F.col("id") % 17).alias("v"))
        .repartitionByRange(8, "k")
        .sortWithinPartitions("k")
    )
    commit_snapshot(df, t, stats_cols=["k"])
    adds, _schemas = _live_adds(t, 0)
    assert len(adds) == 8 and all("k" in s for s in adds.values())

    pruned = read_version(spark, t, prune=("k", 100, 150))
    full = read_version(spark, t).filter((F.col("k") >= 100) & (F.col("k") <= 150))
    assert sorted(r.k for r in pruned.collect()) == sorted(r.k for r in full.collect())
    # the pruned plan reads strictly fewer files than the table holds
    n_pruned_files = len(
        [f for f, s in adds.items() if not (s["k"][1] < 100 or s["k"][0] > 150)]
    )
    assert 0 < n_pruned_files < 8
    assert f"{n_pruned_files}" and pruned.count() == 51

    # empty intersection: schema preserved, zero rows, zero files matched
    none = read_version(spark, t, prune=("k", 5000, 6000))
    assert none.count() == 0 and none.schema == full.schema


def test_prune_accepts_native_date_bounds(spark, tmp_path):
    """Stats for temporal columns land as ISO strings in the JSON log;
    prune= must accept the column's NATIVE python types and still skip
    files (round-6 review: str-vs-date comparison raised TypeError)."""
    import datetime

    t = str(tmp_path / "tbl")
    df = (
        spark.range(200)
        .select(
            F.col("id").alias("k"),
            F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")).alias("d"),
        )
        .repartitionByRange(4, "d")
        .sortWithinPartitions("d")
    )
    commit_snapshot(df, t, stats_cols=["d"])
    lo, hi = datetime.date(2024, 2, 1), datetime.date(2024, 2, 10)
    pruned = read_version(spark, t, prune=("d", lo, hi))
    want = sorted(
        r.k for r in read_version(spark, t).filter((F.col("d") >= F.lit(lo)) & (F.col("d") <= F.lit(hi))).collect()
    )
    assert sorted(r.k for r in pruned.collect()) == want and len(want) == 10


def test_cli_table_history_diff_compact_vacuum(spark, tmp_path, capsys):
    """The table CLI end-to-end: history lines, version diff stats with
    key ordering, compaction, vacuum accounting."""
    from avro_diff_spark import cli

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), t)
    commit_snapshot(_df(spark, [(2, "b"), (3, "C"), (4, "d")]), t, mode="overwrite")

    assert cli.table_main(["history", t]) == 0
    out = capsys.readouterr().out
    assert "v0: overwrite, 3 rows" in out and "v1: overwrite, 3 rows" in out

    assert cli.table_main(["diff", t, "--key", "k", "--limit", "5"]) == 0
    out = capsys.readouterr().out
    assert "diff v0 -> v1" in out
    assert "# of added rows: 1" in out and "# of removed rows: 1" in out
    assert "# of changed rows: 1" in out and "# of unchanged rows: 1" in out

    assert cli.table_main(["compact", t, "--target-files", "1"]) == 0
    assert "compacted as version 2" in capsys.readouterr().out
    assert cli.table_main(["vacuum", t]) == 0
    out = capsys.readouterr().out
    assert "# of data files deleted:" in out
    assert {(r.k, r.v) for r in read_version(spark, t).collect()} == {
        (2, "b"), (3, "C"), (4, "d")
    }
    assert cli.table_main(["diff", t]) == 2  # --key required


def test_schema_enforcement_and_additive_evolution(spark, tmp_path):
    """Appends are checked against the committed schema: mismatches fail
    loudly, additive evolution is opt-in (old files read as nulls for the
    new column via schema merge), and type changes always require an
    overwrite."""
    from avro_diff_spark.sources.versioned import table_schema

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a")]), t)
    assert [f.name for f in table_schema(t).fields] == ["k", "v"]

    with pytest.raises(ValueError, match="schema mismatch"):
        commit_snapshot(
            spark.createDataFrame([(2, "b", 9.0)], "k long, v string, w double"),
            t,
            mode="append",
        )
    with pytest.raises(ValueError, match="column types"):
        commit_snapshot(
            spark.createDataFrame([(2, 3)], "k long, v long"),
            t,
            mode="append",
            schema_evolution=True,
        )

    commit_snapshot(
        spark.createDataFrame([(2, "b", 9.0)], "k long, v string, w double"),
        t,
        mode="append",
        schema_evolution=True,
    )
    out = {r.k: (r.v, r.w) for r in read_version(spark, t).collect()}
    assert out == {1: ("a", None), 2: ("b", 9.0)}
    assert [f.name for f in table_schema(t).fields] == ["k", "v", "w"]

    # overwrite resets the schema wholesale
    commit_snapshot(spark.createDataFrame([(5,)], "k long"), t)
    assert [f.name for f in table_schema(t).fields] == ["k"]
    assert {r.k for r in read_version(spark, t).collect()} == {5}


def test_streaming_qa_metrics_into_versioned_table(spark, tmp_path):
    """Subsystem composition: a document stream's per-batch quality
    aggregate lands as append commits of a versioned METRICS table via
    commit_stream — the monitoring sink a production corpus pipeline
    runs, fully on green primitives. Metrics equal the batch-computed
    aggregate; history shows one commit per micro-batch."""
    from pyspark.sql import functions as F

    from avro_diff_spark.functions.text import quality_score
    from avro_diff_spark.sources.versioned import commit_stream

    src, ckpt, t = (str(tmp_path / d) for d in ("src", "ck", "metrics"))
    os.makedirs(src)
    rows = [(i, ("a decent sentence here. " * (1 + i % 3)).strip()) for i in range(30)]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).json(src)

    stream = spark.readStream.schema("doc_id long, text string").json(src)
    # the realistic shape: raw per-doc scores land as append commits,
    # rollups query the table afterwards (complete-mode aggregates don't
    # fit an append-only log by definition)
    per_doc = stream.select(
        "doc_id", quality_score(F.col("text")).alias("quality")
    )
    sq = commit_stream(per_doc, t, checkpoint=ckpt)
    sq.awaitTermination(120)

    got = {r.doc_id: r.quality for r in read_version(spark, t).collect()}
    want = {
        r.doc_id: r.q
        for r in spark.read.json(src)
        .select("doc_id", quality_score(F.col("text")).alias("q"))
        .collect()
    }
    assert got == want and len(got) == 30
    assert all(h["mode"] == "append" for h in table_history(t))


def test_cdc_stream_against_time_traveled_baseline(spark, tmp_path):
    """Subsystem composition: key_diff_stream classifies arriving CDC
    rows against read_version(v0) — the 'diff the firehose against last
    night's committed snapshot' pipeline, on green primitives only."""
    from avro_diff_spark.streaming.diff import key_diff_stream

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), t)
    commit_snapshot(_df(spark, [(9, "z")]), t, mode="overwrite")  # later version

    src = str(tmp_path / "cdc")
    os.makedirs(src)
    spark.createDataFrame(
        [(2, "b"), (3, "C"), (4, "d")], "k long, v string"
    ).coalesce(1).write.mode("append").json(src)

    stream = spark.readStream.schema("k long, v string").json(src)
    baseline = read_version(spark, t, 0)  # time travel: diff against v0, not latest
    out = key_diff_stream(stream, baseline, ["k"])
    q = (
        out.writeStream.format("memory")
        .queryName("cdc_vs_v0")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.k: r.diff_kind for r in spark.sql("SELECT * FROM cdc_vs_v0").collect()}
    assert got == {"2": "unchanged", "3": "changed", "4": "added"}
