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
    assert len(adds) == 8 and all("k" in s["stats"] for s in adds.values())

    pruned = read_version(spark, t, prune=("k", 100, 150))
    full = read_version(spark, t).filter((F.col("k") >= 100) & (F.col("k") <= 150))
    assert sorted(r.k for r in pruned.collect()) == sorted(r.k for r in full.collect())
    # the pruned plan reads strictly fewer files than the table holds
    n_pruned_files = len(
        [
            f
            for f, s in adds.items()
            if not (s["stats"]["k"][1] < 100 or s["stats"]["k"][0] > 150)
        ]
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


# --------------------------------------------------------------------------
# round 7: partitioned tables, optimistic concurrency, clustered
# compaction, vacuum watermark, CDC
# --------------------------------------------------------------------------

def test_partitioned_commit_records_pv_and_prunes_from_log(spark, tmp_path):
    """partition_by commits record Delta-style partitionValues per add;
    a partition-pruned read opens a STRICT SUBSET of files (only the
    matching partition's), reconstructs the partition column typed per
    the committed schema, and equals the filtered full read."""
    from avro_diff_spark.sources.versioned import _live_adds

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i % 3, f"r{i}") for i in range(60)], "k long, p long, v string"
    )
    commit_snapshot(df, t, partition_by=["p"])
    adds, _ = _live_adds(t, 0)
    assert all(a["pv"] is not None and set(a["pv"]) == {"p"} for a in adds.values())
    assert {a["pv"]["p"] for a in adds.values()} == {"0", "1", "2"}

    full = read_version(spark, t)
    # partition column reconstructed, original type and column order
    assert full.schema.simpleString() == "struct<k:bigint,p:bigint,v:string>"
    assert {(r.k, r.p, r.v) for r in full.collect()} == {
        (i, i % 3, f"r{i}") for i in range(60)
    }

    pruned = read_version(spark, t, prune=("p", 1, 1))
    got = {(r.k, r.p) for r in pruned.collect()}
    assert got == {(i, 1) for i in range(60) if i % 3 == 1}
    opened = set(pruned.inputFiles())
    all_files = set(full.inputFiles())
    assert opened < all_files
    assert all("p=1" in f for f in opened)


def test_partition_prune_reads_zero_footers(spark, tmp_path, monkeypatch):
    """The log alone answers partition pruning: after commit, ANY footer
    fetch (pyarrow ParquetFile) during read_version(prune=...) would
    blow up — the pruned read must still plan and return exact rows."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i % 4, float(i)) for i in range(40)], "k long, p int, x double"
    )
    commit_snapshot(df, t, partition_by=["p"])

    import pyarrow.parquet as pq

    def boom(*a, **kw):
        raise AssertionError("footer fetched during log-level pruning")

    monkeypatch.setattr(pq, "ParquetFile", boom)
    pruned = read_version(spark, t, prune=("p", 2, 3))
    assert sorted(r.k for r in pruned.collect()) == [
        i for i in range(40) if i % 4 in (2, 3)
    ]


def test_partitioned_null_and_date_values(spark, tmp_path):
    """Hive null sentinel round-trips to a real NULL; date partition
    values prune with native date bounds; range predicates skip the
    null partition (SQL comparison semantics)."""
    import datetime

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [
            (1, datetime.date(2024, 1, 1), "a"),
            (2, datetime.date(2024, 2, 1), "b"),
            (3, None, "c"),
        ],
        "k long, d date, v string",
    )
    commit_snapshot(df, t, partition_by=["d"])
    full = {(r.k, r.d) for r in read_version(spark, t).collect()}
    assert full == {
        (1, datetime.date(2024, 1, 1)),
        (2, datetime.date(2024, 2, 1)),
        (3, None),
    }
    pruned = read_version(
        spark, t, prune=("d", datetime.date(2024, 1, 15), datetime.date(2024, 3, 1))
    )
    assert {r.k for r in pruned.collect()} == {2}
    assert all("d=2024-02-01" in f for f in pruned.inputFiles())


def test_append_must_keep_table_partitioning(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, 0, "a")], "k long, p long, v string")
    commit_snapshot(df, t, partition_by=["p"])
    with pytest.raises(ValueError, match="partitioning"):
        commit_snapshot(
            spark.createDataFrame([(2, 1, "b")], "k long, p long, v string"),
            t,
            mode="append",
        )
    commit_snapshot(
        spark.createDataFrame([(2, 1, "b")], "k long, p long, v string"),
        t,
        mode="append",
        partition_by=["p"],
    )
    assert {(r.k, r.p) for r in read_version(spark, t).collect()} == {(1, 0), (2, 1)}
    # overwrite may change partitioning wholesale
    commit_snapshot(df.drop("p"), t, mode="overwrite")
    assert read_version(spark, t).columns == ["k", "v"]


def test_clustered_compaction_zorder_tightens_file_ranges(spark, tmp_path):
    """compact_table(cluster_by=...) is OPTIMIZE ... ZORDER BY: one
    overwrite commit whose files carry TIGHT per-file ranges on every
    clustered column (pyarrow footer assertion via the recorded stats),
    so log-level pruning opens a strict file subset on either column;
    content identical; vacuum reclaims the old files."""
    import random

    from avro_diff_spark.sources.versioned import _live_adds, compact_table, vacuum

    rng = random.Random(7)
    rows = [(rng.randrange(1000), rng.randrange(1000), i) for i in range(4000)]
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(rows, "x long, y long, i long").repartition(8)
    commit_snapshot(df, t, stats_cols=["x", "y"])
    before = {(r.x, r.y, r.i) for r in read_version(spark, t).collect()}

    v = compact_table(spark, t, target_files=4, cluster_by=["x", "y"])
    assert v == 1
    assert {(r.x, r.y, r.i) for r in read_version(spark, t).collect()} == before
    hist = table_history(t)
    # compactions publish as REPLACE (dataChange=false) so streams skip them
    assert hist[1]["mode"] == "replace" and hist[1]["n_added"] <= 4

    # recorded stats (== footer stats) must shrink: average per-file
    # range on each clustered dim well below the full-table range
    adds0, _ = _live_adds(t, 0)
    adds1, _ = _live_adds(t, 1)

    def avg_range(adds, col):
        spans = [s["stats"][col][1] - s["stats"][col][0] for s in adds.values()]
        return sum(spans) / len(spans)

    for col in ("x", "y"):
        assert avg_range(adds1, col) < avg_range(adds0, col) * 0.8

    # pruning now opens a strict subset on BOTH clustered columns
    for col in ("x", "y"):
        pruned = read_version(spark, t, prune=(col, 0, 99))
        assert 0 < len(pruned.inputFiles()) < len(read_version(spark, t).inputFiles()) + 1
        assert len(pruned.inputFiles()) < 4
    deleted = vacuum(t, keep_versions=1)
    assert len(deleted) >= 8
    assert {(r.x, r.y, r.i) for r in read_version(spark, t).collect()} == before


def test_concurrent_appends_both_land(spark, tmp_path):
    """Two writers racing the SAME version slot: the os.link claim is
    atomic, the loser rebases its append onto the next slot, and the log
    replays to the union — the Delta optimistic-concurrency behavior
    for blind appends."""
    import threading

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(0, "base")]), t)
    dfs = {
        "a": _df(spark, [(1, "a")]),
        "b": _df(spark, [(2, "b")]),
    }
    errs = []
    barrier = threading.Barrier(2)

    def go(name):
        try:
            barrier.wait(10)
            commit_snapshot(dfs[name], t, mode="append")
        except Exception as e:  # noqa: BLE001
            errs.append((name, e))

    ts = [threading.Thread(target=go, args=(n,)) for n in dfs]
    [x.start() for x in ts]
    [x.join(120) for x in ts]
    assert not errs
    assert latest_version(t) == 2
    assert {(r.k, r.v) for r in read_version(spark, t).collect()} == {
        (0, "base"), (1, "a"), (2, "b")
    }
    assert [h["mode"] for h in table_history(t)] == ["overwrite", "append", "append"]


def test_overwrite_conflict_raises(spark, tmp_path, monkeypatch):
    """An overwrite that loses the race — a competing commit lands
    between its snapshot read and its publish — fails with
    CommitConflict (its remove-set is stale) instead of silently
    clobbering; a racing APPEND in the same window rebases instead."""
    from avro_diff_spark.sources import versioned as V

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a")]), t)
    real_stage = V._stage_data

    def stage_then_lose_race(df_, path, version, partition_by=None):
        out = real_stage(df_, path, version, partition_by)
        V._publish_commit(
            path,
            version,
            {
                "version": version,
                "mode": "append",
                "n_rows": 0,
                "schema": df_.schema.json(),
                "actions": [],
            },
        )
        return out

    monkeypatch.setattr(V, "_stage_data", stage_then_lose_race)
    with pytest.raises(V.CommitConflict):
        V.commit_snapshot(_df(spark, [(9, "z")]), t, mode="overwrite", max_retries=1)
    # the same lost race on an APPEND rebases onto the next slot
    v = V.commit_snapshot(_df(spark, [(5, "e")]), t, mode="append")
    assert v == latest_version(t)
    assert (5, "e") in {(r.k, r.v) for r in read_version(spark, t).collect()}


def test_append_type_gate_checks_all_live_schemas(spark, tmp_path):
    """Round-6 ADVICE: a column legally omitted by a later evolved
    append must NOT be reintroducible with a different type — the gate
    validates against the union of live schemas, not just the newest
    commit's."""
    t = str(tmp_path / "tbl")
    commit_snapshot(
        spark.createDataFrame([(1, "a", 1.5)], "k long, v string, w double"), t
    )
    commit_snapshot(  # legally omits w
        _df(spark, [(2, "b")]), t, mode="append", schema_evolution=True
    )
    with pytest.raises(ValueError, match="column types"):
        commit_snapshot(
            spark.createDataFrame([(3, "c", 7)], "k long, v string, w long"),
            t,
            mode="append",
            schema_evolution=True,
        )
    # same type is still fine
    commit_snapshot(
        spark.createDataFrame([(3, "c", 7.0)], "k long, v string, w double"),
        t,
        mode="append",
        schema_evolution=True,
    )
    out = {r.k: r.w for r in read_version(spark, t).collect()}
    assert out == {1: 1.5, 2: None, 3: 7.0}


def test_vacuum_watermark_gives_clear_error(spark, tmp_path):
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a")]), t)
    commit_snapshot(_df(spark, [(2, "b")]), t, mode="overwrite")
    commit_snapshot(_df(spark, [(3, "c")]), t, mode="overwrite")
    from avro_diff_spark.sources.versioned import vacuum

    vacuum(t, keep_versions=1)
    with pytest.raises(ValueError, match="vacuumed; earliest readable version is 2"):
        read_version(spark, t, 0)
    hist = table_history(t)
    assert [h["vacuumed"] for h in hist] == [True, True, False]
    assert {r.k for r in read_version(spark, t, 2).collect()} == {3}


def test_read_changes_cdc_between_versions(spark, tmp_path):
    """Delta-CDF semantics from the log + keyed diff: per-commit change
    rows tagged insert/delete/update_preimage/update_postimage with
    _commit_version; a multi-version range is the union of per-commit
    feeds (an intermediate state is NOT collapsed away)."""
    from avro_diff_spark.sources.versioned import read_changes

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), t)
    commit_snapshot(_df(spark, [(1, "a"), (2, "B"), (4, "d")]), t, mode="overwrite")
    commit_snapshot(_df(spark, [(1, "a"), (2, "B"), (4, "d"), (5, "e")]), t, mode="overwrite")

    one = read_changes(spark, t, ["k"], v_from=0, v_to=1)
    got = {(r.k, r.v, r._change_type, r._commit_version) for r in one.collect()}
    assert got == {
        (2, "b", "update_preimage", 1),
        (2, "B", "update_postimage", 1),
        (3, "c", "delete", 1),
        (4, "d", "insert", 1),
    }

    both = read_changes(spark, t, ["k"], v_from=0)  # v_to defaults latest
    got2 = {(r.k, r.v, r._change_type, r._commit_version) for r in both.collect()}
    assert got2 == got | {(5, "e", "insert", 2)}

    with pytest.raises(ValueError, match="v_to > v_from"):
        read_changes(spark, t, ["k"], v_from=2, v_to=2)


def test_merge_into_upsert_semantics(spark, tmp_path):
    """MERGE INTO whole-row clauses: matched->update, not-matched->
    insert, not-matched-by-source->keep/delete; one overwrite commit;
    time travel keeps the pre-merge state."""
    from avro_diff_spark.sources.versioned import merge_into

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), t)
    src = _df(spark, [(2, "B"), (4, "d")])

    v = merge_into(spark, t, src, ["k"])
    assert v == 1
    assert {(r.k, r.v) for r in read_version(spark, t).collect()} == {
        (1, "a"), (2, "B"), (3, "c"), (4, "d")
    }
    assert {(r.k, r.v) for r in read_version(spark, t, 0).collect()} == {
        (1, "a"), (2, "b"), (3, "c")
    }

    # delete rows the source doesn't carry (the full-sync variant)
    merge_into(spark, t, src, ["k"], when_not_matched_by_source="delete")
    assert {(r.k, r.v) for r in read_version(spark, t).collect()} == {(2, "B"), (4, "d")}

    # keep-matched + ignore-unmatched = no-op on content
    before = {(r.k, r.v) for r in read_version(spark, t).collect()}
    merge_into(
        spark, t, _df(spark, [(2, "zzz"), (9, "x")]), ["k"],
        when_matched="keep", when_not_matched="ignore",
    )
    assert {(r.k, r.v) for r in read_version(spark, t).collect()} == before

    with pytest.raises(ValueError, match="source columns"):
        merge_into(spark, t, src.drop("v"), ["k"])


def test_delete_and_update_where(spark, tmp_path):
    from avro_diff_spark.sources.versioned import delete_where, update_where

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(i, f"r{i}") for i in range(6)]), t)
    delete_where(spark, t, "k % 2 = 0")
    assert {r.k for r in read_version(spark, t).collect()} == {1, 3, 5}
    update_where(spark, t, F.col("k") > 2, {"v": F.upper(F.col("v"))})
    assert {(r.k, r.v) for r in read_version(spark, t).collect()} == {
        (1, "r1"), (3, "R3"), (5, "R5")
    }
    # history: base + delete + update, all readable via time travel
    assert [h["version"] for h in table_history(t)] == [0, 1, 2]
    assert {r.v for r in read_version(spark, t, 1).collect()} == {"r1", "r3", "r5"}
    with pytest.raises(ValueError, match="unknown column"):
        update_where(spark, t, "k = 1", {"nope": F.lit(1)})


def test_merge_into_partitioned_table_keeps_partitioning(spark, tmp_path):
    """A merge on a partitioned table re-commits partitioned (the
    rewrite stays prunable) and the pv reconstruction round-trips."""
    from avro_diff_spark.sources.versioned import _live_adds, merge_into

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i % 2, f"r{i}") for i in range(8)], "k long, p long, v string"
    )
    commit_snapshot(df, t, partition_by=["p"])
    src = spark.createDataFrame([(0, 0, "NEW"), (100, 1, "ins")], "k long, p long, v string")
    merge_into(spark, t, src, ["k"], partition_by=["p"])
    adds, _ = _live_adds(t, 1)
    assert all(a["pv"] for a in adds.values())
    got = {(r.k, r.p, r.v) for r in read_version(spark, t).collect()}
    want = {(i, i % 2, f"r{i}") for i in range(1, 8)} | {(0, 0, "NEW"), (100, 1, "ins")}
    assert got == want


def test_as_of_timestamp_time_travel(spark, tmp_path):
    """AS OF TIMESTAMP: commits record ts_us; a timestamp resolves to the
    latest commit at-or-before it (Delta's rule), errors before the
    first commit, and read_version(as_of=) equals the version read."""
    import datetime
    import json as _json

    from avro_diff_spark.sources.versioned import version_as_of

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a")]), t)
    commit_snapshot(_df(spark, [(2, "b")]), t, mode="overwrite")
    # pin distinct commit times deterministically (wall clock can tie)
    for v, us in ((0, 1_000_000), (1, 2_000_000)):
        p = os.path.join(t, "_log", f"{v:06d}.json")
        with open(p) as fh:
            c = _json.load(fh)
        c["ts_us"] = us
        with open(p, "w") as fh:
            _json.dump(c, fh)

    assert version_as_of(t, 1_500_000) == 0
    assert version_as_of(t, 2_000_000) == 1
    assert version_as_of(t, datetime.datetime.fromtimestamp(9.0)) == 1
    with pytest.raises(ValueError, match="predates"):
        version_as_of(t, 999_999)
    assert {r.k for r in read_version(spark, t, as_of=1_500_000).collect()} == {1}
    with pytest.raises(ValueError, match="not both"):
        read_version(spark, t, 0, as_of=1_500_000)
    assert all(h["ts_us"] is not None for h in table_history(t))


def _pin_commit_ts(table_path, ts_by_version):
    """Rewrite commits' ts_us deterministically (wall clock can tie)."""
    import json as _json

    for v, us in ts_by_version.items():
        p = os.path.join(table_path, "_log", f"{v:06d}.json")
        with open(p) as fh:
            c = _json.load(fh)
        c["ts_us"] = us
        with open(p, "w") as fh:
            _json.dump(c, fh)


def test_first_version_at_or_after_boundaries(spark, tmp_path):
    """Delta's inclusive startingTimestamp rule: the earliest commit at
    or after ts; before the first commit -> 0; after the last ->
    latest + 1 (an empty stream that picks up future commits)."""
    import datetime

    from avro_diff_spark.sources.versioned import first_version_at_or_after as f

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a")]), t)
    commit_snapshot(_df(spark, [(2, "b")]), t, mode="append")
    _pin_commit_ts(t, {0: 1_000_000, 1: 2_000_000})

    assert f(t, 999_999) == 0  # before the first commit: whole table
    assert f(t, 1_000_000) == 0  # exactly at a commit: inclusive
    assert f(t, 1_000_001) == 1
    assert f(t, 2_000_000) == 1
    assert f(t, 2_000_001) == 2  # past the last commit: future only
    assert f(t, datetime.datetime.fromtimestamp(1.5)) == 1


def test_first_version_at_or_after_uses_checkpoint_ts_index(
    spark, tmp_path, monkeypatch
):
    """Resolution inside the checkpointed range answers from the
    checkpoint's commit-time index — zero commit opens at or below it."""
    import avro_diff_spark.sources.versioned as V

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(0, "base")]), t)
    ts_of = {}
    for i in range(1, 25):
        v = commit_snapshot(_df(spark, [(i, f"r{i}")]), t, mode="append")
        with open(os.path.join(t, "_log", f"{v:06d}.json")) as fh:
            ts_of[v] = json.load(fh)["ts_us"]

    opened: list[str] = []
    real = V._read_commit

    def counting(path):
        opened.append(os.path.basename(path))
        return real(path)

    monkeypatch.setattr(V, "_read_commit", counting)
    assert V.first_version_at_or_after(t, ts_of[7]) == 7
    assert V.first_version_at_or_after(t, ts_of[7] + 1) == 8
    assert all(int(n[:6]) > 20 for n in opened), opened


def test_read_changes_timestamp_bounds(spark, tmp_path):
    """ts_from/ts_to resolve through version_as_of (each names the
    snapshot the table was at that time) and equal the explicit
    version-bound feed; mixing a version and a timestamp bound errors."""
    from avro_diff_spark.sources.versioned import read_changes

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a")]), t)
    commit_snapshot(_df(spark, [(1, "A"), (2, "b")]), t, mode="overwrite")
    commit_snapshot(_df(spark, [(1, "A"), (2, "b"), (3, "c")]), t, mode="overwrite")
    _pin_commit_ts(t, {0: 1_000_000, 1: 2_000_000, 2: 3_000_000})

    def rows(df):
        return {(r.k, r.v, r._change_type, r._commit_version) for r in df.collect()}

    want_all = rows(read_changes(spark, t, ["k"], v_from=0))
    assert rows(read_changes(spark, t, ["k"], ts_from=1_500_000)) == want_all
    assert rows(
        read_changes(spark, t, ["k"], ts_from=1_000_000, ts_to=2_500_000)
    ) == rows(read_changes(spark, t, ["k"], v_from=0, v_to=1))

    with pytest.raises(ValueError, match="not both"):
        read_changes(spark, t, ["k"], v_from=0, ts_from=1_000_000)
    with pytest.raises(ValueError, match="not both"):
        read_changes(spark, t, ["k"], ts_from=1_000_000, v_to=2, ts_to=3_000_000)
    with pytest.raises(ValueError, match="v_from= or ts_from="):
        read_changes(spark, t, ["k"])


def test_merge_touched_rewrites_only_touched_files(spark, tmp_path):
    """rewrite='touched' (Delta's optimized MERGE): only files containing
    a source key are removed; untouched files survive the commit
    verbatim; the result equals the full-FOJ semantics."""
    from avro_diff_spark.sources.versioned import _live_files, merge_into

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(30)], "k long, v string"
    ).repartitionByRange(3, "k")
    commit_snapshot(df, t)
    files_before = set(_live_files(t, 0))
    assert len(files_before) == 3

    # keys 0..9 live in one range file; 100 is a pure insert
    src = spark.createDataFrame([(2, "X"), (7, "Y"), (100, "ins")], "k long, v string")
    v = merge_into(spark, t, src, ["k"], rewrite="touched")
    assert v == 1
    with open(os.path.join(t, "_log", "000001.json")) as fh:
        commit = json.load(fh)
    assert commit["mode"] == "replace"
    removed = {a["remove"] for a in commit["actions"] if "remove" in a}
    assert len(removed) == 1 and removed < files_before
    # untouched files still live, referenced by the ORIGINAL add actions
    assert files_before - removed < set(_live_files(t, 1))
    got = {(r.k, r.v) for r in read_version(spark, t).collect()}
    want = {(i, f"r{i}") for i in range(30) if i not in (2, 7)} | {
        (2, "X"), (7, "Y"), (100, "ins")
    }
    assert got == want
    # time travel unaffected
    assert {r.v for r in read_version(spark, t, 0).collect()} == {
        f"r{i}" for i in range(30)
    }


def test_merge_touched_matches_all_semantics(spark, tmp_path):
    """'touched' and 'all' produce identical tables for the same merge,
    and source-only keys insert even when no file is touched."""
    from avro_diff_spark.sources.versioned import merge_into

    rows = [(i, f"r{i}") for i in range(20)]
    src_rows = [(5, "U5"), (17, "U17"), (40, "I40"), (41, "I41")]
    tables = {}
    for mode in ("touched", "all"):
        t = str(tmp_path / mode)
        commit_snapshot(_df(spark, rows).repartitionByRange(4, "k"), t)
        merge_into(spark, t, _df(spark, src_rows), ["k"], rewrite=mode)
        tables[mode] = {(r.k, r.v) for r in read_version(spark, t).collect()}
    assert tables["touched"] == tables["all"]

    # pure-insert source: zero files touched, replace commit removes none
    t = str(tmp_path / "insonly")
    commit_snapshot(_df(spark, rows).repartitionByRange(4, "k"), t)
    merge_into(spark, t, _df(spark, [(99, "new")]), ["k"], rewrite="touched")
    with open(os.path.join(t, "_log", "000001.json")) as fh:
        commit = json.load(fh)
    assert not any("remove" in a for a in commit["actions"])
    assert (99, "new") in {(r.k, r.v) for r in read_version(spark, t).collect()}


def test_merge_touched_delete_clause_drops_untouched_files_as_metadata(
    spark, tmp_path
):
    """Round 8 (restriction lifted): with a not-matched-by-source DELETE
    clause, untouched files contain zero source keys, so every one of
    their rows is deleted — they are removed as pure metadata while only
    the touched subset is rewritten; results equal rewrite='all'."""
    from avro_diff_spark.sources.versioned import merge_into

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(30)], "k long, v string"
    ).repartitionByRange(3, "k")
    commit_snapshot(df, t)
    src = _df(spark, [(2, "A"), (7, "B"), (100, "ins")])
    v = merge_into(
        spark, t, src, ["k"],
        when_not_matched_by_source="delete", rewrite="touched",
    )
    assert {(r.k, r.v) for r in read_version(spark, t, v).collect()} == {
        (2, "A"), (7, "B"), (100, "ins")
    }
    with open(os.path.join(t, "_log", f"{v:06d}.json")) as fh:
        commit = json.load(fh)
    # ALL pre-merge files removed (untouched ones as metadata-only),
    # but only the touched subset + inserts was actually rewritten
    assert sum(1 for a in commit["actions"] if "remove" in a) == 3
    assert sum(a["n"] for a in commit["actions"] if "add" in a) == 3

    # parity with the full-FOJ path
    t2 = str(tmp_path / "all")
    commit_snapshot(df, t2)
    merge_into(
        spark, t2, src, ["k"],
        when_not_matched_by_source="delete", rewrite="all",
    )
    assert {(r.k, r.v) for r in read_version(spark, t2).collect()} == {
        (2, "A"), (7, "B"), (100, "ins")
    }


def test_dml_preserves_partitioning(spark, tmp_path):
    """merge_into / delete_where / update_where / compact_table on a
    partitioned table re-commit PARTITIONED by default — pruning
    survives every DML rewrite without the caller restating layout."""
    from avro_diff_spark.sources.versioned import (
        _live_adds,
        _table_partitioning,
        compact_table,
        delete_where,
        merge_into,
        update_where,
    )

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i % 2, f"r{i}") for i in range(12)], "k long, p long, v string"
    )
    commit_snapshot(df, t, partition_by=["p"])

    merge_into(spark, t, spark.createDataFrame(
        [(0, 0, "M")], "k long, p long, v string"), ["k"])
    delete_where(spark, t, "k = 11")
    update_where(spark, t, "k = 1", {"v": F.lit("U")})
    compact_table(spark, t)
    v = latest_version(t)
    assert _table_partitioning(t, v) == ["p"]
    adds, _ = _live_adds(t, v)
    assert adds and all(a["pv"] and set(a["pv"]) == {"p"} for a in adds.values())

    pruned = read_version(spark, t, prune=("p", 0, 0))
    got = {(r.k, r.v) for r in pruned.collect()}
    want = {(i, "U" if i == 1 else f"r{i}") for i in range(12) if i % 2 == 0 and i != 11}
    want = {(k, ("M" if k == 0 else v)) for k, v in want}
    assert got == want
    assert all("p=0" in f for f in pruned.inputFiles())


def test_check_constraints_lifecycle(spark, tmp_path):
    """ALTER TABLE ADD/DROP CONSTRAINT with Delta CHECK semantics:
    existing data validated at add time, every later data commit
    validated before publish, NULL predicate results pass, constraints
    survive overwrites, drop lifts enforcement."""
    from avro_diff_spark.sources.versioned import (
        add_constraint,
        drop_constraint,
        table_constraints,
    )

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a"), (2, "b")]), t)

    # existing violations refuse the constraint itself
    with pytest.raises(ValueError, match="existing rows violate"):
        add_constraint(spark, t, "k_big", "k > 1")
    v = add_constraint(spark, t, "k_pos", "k > 0")
    assert table_constraints(t) == {"k_pos": "k > 0"}
    assert table_history(t)[v]["mode"] == "meta"
    with pytest.raises(ValueError, match="already exists"):
        add_constraint(spark, t, "k_pos", "k > 0")

    # violating commits are refused on every data path, by name
    with pytest.raises(ValueError, match="k_pos"):
        commit_snapshot(_df(spark, [(-1, "bad")]), t, mode="append")
    with pytest.raises(ValueError, match="k_pos"):
        commit_snapshot(_df(spark, [(-1, "bad")]), t, mode="overwrite")
    # valid commits (and NULLs — SQL CHECK passes UNKNOWN) land
    commit_snapshot(_df(spark, [(3, "c"), (None, "n")]), t, mode="append")
    commit_snapshot(_df(spark, [(9, "z")]), t, mode="overwrite")
    assert table_constraints(t) == {"k_pos": "k > 0"}  # survives overwrite

    drop_constraint(t, "k_pos")
    assert table_constraints(t) == {}
    commit_snapshot(_df(spark, [(-5, "now ok")]), t, mode="append")
    with pytest.raises(ValueError, match="no constraint"):
        drop_constraint(t, "k_pos")


def test_constraints_gate_merge_and_dml(spark, tmp_path):
    """The targeted-rewrite MERGE and DELETE/UPDATE rewrites run the
    same pre-publish constraint gate as plain commits."""
    from avro_diff_spark.sources.versioned import (
        add_constraint,
        merge_into,
        update_where,
    )

    t = str(tmp_path / "tbl")
    commit_snapshot(
        _df(spark, [(i, f"r{i}") for i in range(1, 9)]).repartitionByRange(2, "k"), t
    )
    add_constraint(spark, t, "v_nonempty", "length(v) > 0")
    with pytest.raises(ValueError, match="v_nonempty"):
        merge_into(spark, t, _df(spark, [(2, "")]), ["k"], rewrite="touched")
    with pytest.raises(ValueError, match="v_nonempty"):
        update_where(spark, t, "k = 3", {"v": F.lit("")})
    merge_into(spark, t, _df(spark, [(2, "ok")]), ["k"], rewrite="touched")
    got = {(r.k, r.v) for r in read_version(spark, t).collect()}
    assert (2, "ok") in got and len(got) == 8


def test_shallow_clone_zero_copy(spark, tmp_path):
    """Shallow clone: one metadata commit referencing the source's files
    absolutely — no data copied; reads/pruning/constraints carry over;
    writes diverge; vacuum on the clone never touches source files."""
    from avro_diff_spark.sources.versioned import (
        _live_files,
        add_constraint,
        clone_table,
        table_constraints,
        vacuum,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    df = spark.createDataFrame(
        [(i, i % 2, f"r{i}") for i in range(12)], "k long, p long, v string"
    )
    commit_snapshot(df, src, partition_by=["p"], stats_cols=["k"])
    add_constraint(spark, src, "k_pos", "k >= 0")

    assert clone_table(src, dst) == 0
    # no data files under dst — log only
    data_files = [
        f for dp, _, fns in os.walk(dst) for f in fns if f.endswith(".parquet")
    ]
    assert data_files == []
    assert all(os.path.isabs(f) for f in _live_files(dst, 0))
    got = {(r.k, r.p, r.v) for r in read_version(spark, dst).collect()}
    want = {(r.k, r.p, r.v) for r in read_version(spark, src).collect()}
    assert got == want
    # partition pruning works from the cloned manifest
    pruned = read_version(spark, dst, prune=("p", 1, 1))
    assert {r.k % 2 for r in pruned.collect()} == {1}
    # constraints carried over and enforced on the clone
    assert table_constraints(dst) == {"k_pos": "k >= 0"}
    with pytest.raises(ValueError, match="k_pos"):
        commit_snapshot(
            spark.createDataFrame([(-1, 0, "bad")], "k long, p long, v string"),
            dst,
            mode="append",
            partition_by=["p"],
        )
    # writes to the clone diverge; the source is untouched
    commit_snapshot(
        spark.createDataFrame([(100, 0, "new")], "k long, p long, v string"),
        dst,
        mode="append",
        partition_by=["p"],
    )
    assert read_version(spark, dst).count() == 13
    assert read_version(spark, src).count() == 12
    # vacuum on the clone reclaims nothing of the source
    before = set(_live_files(src, latest_version(src)))
    vacuum(dst, keep_versions=1)
    assert set(_live_files(src, latest_version(src))) == before
    assert read_version(spark, src).count() == 12

    with pytest.raises(ValueError, match="already has commits"):
        clone_table(src, dst)


def test_shallow_clone_time_travel_and_evolution(spark, tmp_path):
    """Cloning a PAST version snapshots it; cloning a table whose live
    files span an additive schema evolution keeps per-file owner schemas
    so the clone still reads union-schema'd."""
    from avro_diff_spark.sources.versioned import clone_table

    src = str(tmp_path / "src")
    commit_snapshot(_df(spark, [(1, "a")]), src)
    commit_snapshot(
        spark.createDataFrame([(2, "b", 7)], "k long, v string, extra long"),
        src,
        mode="append",
        schema_evolution=True,
    )

    old = str(tmp_path / "old")
    clone_table(src, old, version=0)
    assert {(r.k, r.v) for r in read_version(spark, old).collect()} == {(1, "a")}

    cur = str(tmp_path / "cur")
    clone_table(src, cur)
    rows = {(r.k, r.v, r.extra) for r in read_version(spark, cur).collect()}
    assert rows == {(1, "a", None), (2, "b", 7)}


def test_agg_delta_maintains_aggregate(spark, tmp_path):
    """Incremental aggregate maintenance: state(v_from) + agg_delta ==
    state(v_to) for per-group count and sum, across MERGE/DELETE/UPDATE."""
    from avro_diff_spark.sources.versioned import (
        agg_delta,
        delete_where,
        merge_into,
        update_where,
    )

    t = str(tmp_path / "tbl")
    rows = [(i, i % 3, i * 10) for i in range(12)]
    sch = "k long, g long, x long"
    commit_snapshot(spark.createDataFrame(rows, sch), t)
    v_from = 0
    merge_into(
        spark, t, spark.createDataFrame([(0, 0, 999), (50, 1, 7)], sch), ["k"]
    )
    delete_where(spark, t, "k = 5")
    update_where(spark, t, "k = 7", {"x": F.expr("x + 1")})
    v_to = latest_version(t)

    def full(v):
        return {
            r.g: (r.n, r.s)
            for r in read_version(spark, t, v)
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
            .collect()
        }

    delta = {
        r.g: (r.n_rows_delta, r.x_delta or 0)
        for r in agg_delta(
            spark, t, ["k"], ["g"], v_from=v_from, v_to=v_to, sum_cols=["x"]
        ).collect()
    }
    base, want = full(v_from), full(v_to)
    merged = {
        g: (
            base.get(g, (0, 0))[0] + delta.get(g, (0, 0))[0],
            base.get(g, (0, 0))[1] + delta.get(g, (0, 0))[1],
        )
        for g in set(base) | set(delta)
    }
    merged = {g: v for g, v in merged.items() if v[0] > 0}
    assert merged == want


def test_table_cli_constraints_and_clone(spark, tmp_path, capsys):
    """The `table` CLI fronts the constraint and clone surface."""
    from avro_diff_spark import cli
    from avro_diff_spark.sources.versioned import table_constraints

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a"), (2, "b")]), t)
    assert cli.table_main(["constraint-add", t, "--name", "k_pos", "--expr", "k > 0"]) == 0
    assert table_constraints(t) == {"k_pos": "k > 0"}
    assert cli.table_main(["constraints", t]) == 0
    assert "k_pos: CHECK (k > 0)" in capsys.readouterr().out

    dst = str(tmp_path / "dst")
    assert cli.table_main(["clone", t, "--dest", dst]) == 0
    assert {(r.k, r.v) for r in read_version(spark, dst).collect()} == {(1, "a"), (2, "b")}
    assert table_constraints(dst) == {"k_pos": "k > 0"}

    assert cli.table_main(["constraint-drop", t, "--name", "k_pos"]) == 0
    assert table_constraints(t) == {}
    assert cli.table_main(["constraint-add", t]) == 2
    assert cli.table_main(["constraint-drop", t]) == 2
    assert cli.table_main(["clone", t]) == 2


def test_bloom_point_lookup_skips_files_zero_footers(spark, tmp_path, monkeypatch):
    """bloom_cols harvests per-file bloom bitmaps at commit time (one
    distributed pass, no driver data read); prune_eq= answers point
    lookups from the log alone: no false negatives ever, real skipping
    on values min/max can't rule out, zero footer fetches at read."""
    from avro_diff_spark.sources.versioned import _live_adds

    t = str(tmp_path / "tbl")
    # v values INTERLEAVE across files: every file's [min, max] covers
    # every v, so stats pruning is useless and only the bloom can skip.
    df = (
        spark.range(400)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit("val"), (F.col("id") % 100)).alias("v"),
        )
        .repartitionByRange(8, "k")
    )
    commit_snapshot(df, t, bloom_cols=["v"])
    adds, _ = _live_adds(t, 0)
    assert len(adds) == 8 and all("v" in a.get("bloom", {}) for a in adds.values())

    import pyarrow.parquet as pq

    def boom(*a, **kw):
        raise AssertionError("footer fetched during log-level bloom pruning")

    monkeypatch.setattr(pq, "ParquetFile", boom)
    # no false negatives: every present value returns its exact rows
    for needle, n_want in (("val7", 4), ("val99", 4), ("nope", 0)):
        got = read_version(spark, t, prune_eq=("v", needle)).count()
        assert got == n_want, needle
    # an absent value prunes to zero files (md5 positions of 'nope'
    # would need a 4-bit coincidence in all 8 filters to survive; if a
    # filter keeps it, the row filter still returns 0 rows — asserted
    # above — so this only pins that skipping actually engages)
    monkeypatch.undo()
    from avro_diff_spark.sources.versioned import _may_match_eq

    kept = [f for f in adds if _may_match_eq(adds[f], "v", "nope")]
    assert len(kept) < 8


def test_bloom_integer_keys_and_append(spark, tmp_path):
    """Integer bloom keys match across writer (Column cast) and reader
    (str()); appends carry their own blooms; files without a bloom are
    may-match (never skipped)."""
    from avro_diff_spark.sources.versioned import _live_adds, _may_match_eq

    t = str(tmp_path / "tbl")
    commit_snapshot(
        spark.createDataFrame([(i, i * 10) for i in range(20)], "k long, x long"),
        t,
        bloom_cols=["k"],
    )
    # append WITHOUT blooms: its file must stay may-match for any key
    commit_snapshot(
        spark.createDataFrame([(1000, 1)], "k long, x long"), t, mode="append"
    )
    adds, _ = _live_adds(t, 1)
    no_bloom = [f for f, a in adds.items() if not a.get("bloom")]
    assert no_bloom and all(f.startswith("v000001") for f in no_bloom)
    assert all(_may_match_eq(adds[f], "k", 424242) for f in no_bloom)

    assert read_version(spark, t, prune_eq=("k", 7)).count() == 1
    assert read_version(spark, t, prune_eq=("k", 1000)).count() == 1
    assert read_version(spark, t, prune_eq=("k", 424242)).count() == 0


def test_refresh_agg_table_incremental_matches_full(spark, tmp_path):
    """Materialized aggregate maintenance: refresh applies only the
    unapplied commits' deltas, equals a full recompute after arbitrary
    DML, is a no-op when current, and records its applied source
    version atomically with the data."""
    from avro_diff_spark.sources.versioned import (
        commit_app_meta,
        delete_where,
        merge_into,
        refresh_agg_table,
        update_where,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "agg")
    sch = "k long, g long, x long"
    commit_snapshot(
        spark.createDataFrame([(i, i % 3, i * 10) for i in range(12)], sch), src
    )

    # initial refresh = full aggregate
    assert refresh_agg_table(spark, src, dst, ["k"], ["g"], sum_cols=["x"]) == 0
    assert commit_app_meta(dst)["src_version"] == 0

    def full():
        return {
            r.g: (r.n, r.s)
            for r in read_version(spark, src)
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
            .collect()
        }

    def mat():
        return {
            r.g: (r.n_rows, r.x_sum)
            for r in read_version(spark, dst).collect()
        }

    assert mat() == full()
    # no-op when current: no new commit
    assert refresh_agg_table(spark, src, dst, ["k"], ["g"], sum_cols=["x"]) is None
    assert latest_version(dst) == 0

    # arbitrary DML, then one incremental refresh
    merge_into(spark, src, spark.createDataFrame([(0, 0, 999), (50, 2, 7)], sch), ["k"])
    delete_where(spark, src, "g = 1")  # kills a whole group
    update_where(spark, src, "k = 6", {"x": F.expr("x + 5")})
    v = refresh_agg_table(spark, src, dst, ["k"], ["g"], sum_cols=["x"])
    assert v == 1 and commit_app_meta(dst)["src_version"] == latest_version(src)
    assert mat() == full()  # incremental == recompute, deleted group gone
    assert 1 not in mat()

    # another round: append-only change
    commit_snapshot(
        spark.createDataFrame([(100, 1, 1), (101, 1, 2)], sch), src, mode="append"
    )
    assert refresh_agg_table(spark, src, dst, ["k"], ["g"], sum_cols=["x"]) == 2
    assert mat() == full()


def test_string_prune_never_mangles_ordinary_strings(spark, tmp_path):
    """Round-7 ADVICE (high): the ISO-timestamp T→space normalization
    must apply ONLY to temporal bounds. Ordinary strings containing 'T'
    ('CAT' stats pruned for range ['CAR','CAZ']; pv 'TOKYO' pruned for
    range ['S','U']) were silently skipped — missing rows, the worst
    lakehouse read failure."""
    t = str(tmp_path / "strs")
    df = spark.createDataFrame(
        [(1, "CAT"), (2, "DOG"), (3, "EMU")], "k long, w string"
    ).repartitionByRange(3, "w")
    commit_snapshot(df, t, stats_cols=["w"])
    got = read_version(spark, t, prune=("w", "CAR", "CAZ"))
    assert [(r.k, r.w) for r in got.collect()] == [(1, "CAT")]
    # point lookup through the same stats path
    assert [r.k for r in read_version(spark, t, prune_eq=("w", "CAT")).collect()] == [1]

    # partition-value path: pv 'TOKYO' must survive a ['S','U'] range
    t2 = str(tmp_path / "pv")
    pdf = spark.createDataFrame(
        [(1, "TOKYO"), (2, "OSAKA")], "k long, city string"
    )
    commit_snapshot(pdf, t2, partition_by=["city"])
    got2 = read_version(spark, t2, prune=("city", "S", "U"))
    assert [(r.k, r.city) for r in got2.collect()] == [(1, "TOKYO")]
    assert [r.k for r in read_version(spark, t2, prune_eq=("city", "TOKYO")).collect()] == [1]

    # temporal bounds still normalize across the T/space separator
    import datetime

    t3 = str(tmp_path / "ts")
    tdf = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1, 12)), (2, datetime.datetime(2024, 6, 1, 12))],
        "k long, ts timestamp",
    ).repartitionByRange(2, "ts")
    commit_snapshot(tdf, t3, stats_cols=["ts"])
    got3 = read_version(
        spark,
        t3,
        prune=("ts", datetime.datetime(2024, 1, 1), datetime.datetime(2024, 2, 1)),
    )
    assert [r.k for r in got3.collect()] == [1]


def test_bloom_rejects_boolean_columns(spark, tmp_path):
    """Round-7 ADVICE: Spark's string cast ('true') and Python str()
    ('True') disagree, so a boolean bloom silently never matches —
    refuse it at the writer."""
    t = str(tmp_path / "b")
    df = spark.createDataFrame([(1, True), (2, False)], "k long, flag boolean")
    with pytest.raises(ValueError, match="boolean"):
        commit_snapshot(df, t, bloom_cols=["flag"])


def test_commit_stream_rechecks_constraints_after_lost_race(spark, tmp_path):
    """Round-7 ADVICE: a constraint added by a concurrent writer between
    a micro-batch's first validation and its publish must refuse the
    rebased publish — the re-check runs INSIDE the retry loop."""
    import avro_diff_spark.sources.versioned as V

    src, ckpt, t = (str(tmp_path / d) for d in ("src", "ck", "tbl"))
    os.makedirs(src)
    commit_snapshot(_df(spark, [(1, "a")]), t)
    _df(spark, [(-7, "bad")]).coalesce(1).write.mode("append").json(src)

    real_publish = V._publish_commit
    fired = {"n": 0}

    def racing_publish(table_path, version, commit):
        # the streaming sink's FIRST publish attempt loses the race to a
        # concurrent ADD CONSTRAINT the batch violates
        if commit.get("app") and fired["n"] == 0:
            fired["n"] = 1
            V.add_constraint(spark, t, "k_pos", "k > 0")
            raise V.CommitConflict("lost race to add_constraint")
        return real_publish(table_path, version, commit)

    stream = spark.readStream.schema("k long, v string").json(src)
    old = V._publish_commit
    V._publish_commit = racing_publish
    try:
        q = V.commit_stream(stream, t, checkpoint=ckpt)
        with pytest.raises(Exception, match="k_pos"):
            q.awaitTermination(120)
            q.processAllAvailable()
    finally:
        V._publish_commit = old
    # the violating batch never landed; only the constraint commit did
    assert {r.k for r in read_version(spark, t).collect()} == {1}
    assert V.table_constraints(t) == {"k_pos": "k > 0"}


def test_checkpoint_bounds_log_replay(spark, tmp_path, monkeypatch):
    """Commit-log checkpoints (round-8 brief): every 10th commit writes
    a checkpoint of the full table state; a read then opens ONLY the
    checkpoint plus the tail commits after it — O(tail), not
    O(n-commits). Pinned by counting commit-JSON opens."""
    import avro_diff_spark.sources.versioned as V

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(0, "base")]), t, stats_cols=["k"])
    for i in range(1, 25):
        commit_snapshot(_df(spark, [(i, f"r{i}")]), t, mode="append", stats_cols=["k"])
    assert latest_version(t) == 24
    assert os.path.exists(os.path.join(t, "_log", "000010.checkpoint.json"))
    assert os.path.exists(os.path.join(t, "_log", "000020.checkpoint.json"))
    with open(os.path.join(t, "_log", "_last_checkpoint")) as fh:
        assert json.load(fh)["version"] == 20

    opened: list[str] = []
    real = V._read_commit

    def counting(path):
        opened.append(os.path.basename(path))
        return real(path)

    monkeypatch.setattr(V, "_read_commit", counting)
    df = read_version(spark, t)
    assert df.count() == 25
    assert {r.k for r in df.collect()} == set(range(25))
    tail_only = [n for n in opened if int(n[:6]) <= 20]
    assert tail_only == [], opened
    assert opened, "expected SOME tail commits to be read"

    # stats pruning still works off the checkpointed add metadata
    opened.clear()
    pruned = read_version(spark, t, prune=("k", 3, 3))
    assert [r.k for r in pruned.collect()] == [3]
    # strictly fewer files than the unpruned read (stats-bearing files
    # with k != 3 skipped; stat-less empty part files stay, as designed)
    assert len(pruned.inputFiles()) < len(read_version(spark, t).inputFiles())
    assert all(int(n[:6]) > 20 for n in opened)


def test_checkpoint_time_travel_and_lifecycle(spark, tmp_path):
    """Time travel below/above the checkpoint, constraints and
    partitioning recovered FROM the checkpoint, overwrites after a
    checkpoint, and the vacuum watermark all still behave."""
    import avro_diff_spark.sources.versioned as V

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a")]), t)
    V.add_constraint(spark, t, "k_pos", "k > 0")
    for i in range(2, 14):
        commit_snapshot(_df(spark, [(i, f"r{i}")]), t, mode="append")
    # versions: 0 data, 1 meta, 2..13 appends -> checkpoint at 10
    assert os.path.exists(os.path.join(t, "_log", "000010.checkpoint.json"))

    # below the checkpoint: exact historical reads
    assert {r.k for r in read_version(spark, t, 0).collect()} == {1}
    assert {r.k for r in read_version(spark, t, 4).collect()} == {1, 2, 3, 4}
    # above: full state
    assert {r.k for r in read_version(spark, t, 13).collect()} == set(range(1, 14))
    # constraints ride the checkpoint (enforced post-checkpoint)
    assert V.table_constraints(t) == {"k_pos": "k > 0"}
    with pytest.raises(ValueError, match="k_pos"):
        commit_snapshot(_df(spark, [(-1, "bad")]), t, mode="append")

    # an overwrite after the checkpoint resets schema/live set correctly
    commit_snapshot(
        spark.createDataFrame([(100, "x", 1.5)], "k long, v string, w double"), t
    )
    assert {r.k for r in read_version(spark, t).collect()} == {100}
    assert [f.name for f in V.table_schema(t).fields] == ["k", "v", "w"]

    # vacuum truncation still refuses old versions clearly
    V.vacuum(t, keep_versions=1)
    with pytest.raises(ValueError, match="vacuumed"):
        read_version(spark, t, 3)


def test_checkpointed_partitioned_table_and_clone(spark, tmp_path):
    """Partition values, partitioning metadata, and shallow clones all
    survive the checkpointed replay path."""
    import avro_diff_spark.sources.versioned as V

    t = str(tmp_path / "tbl")
    mk = lambda i: spark.createDataFrame([(i, i % 2)], "k long, p long")
    commit_snapshot(mk(0), t, partition_by=["p"])
    for i in range(1, 12):
        commit_snapshot(mk(i), t, mode="append", partition_by=["p"])
    assert os.path.exists(os.path.join(t, "_log", "000010.checkpoint.json"))
    assert V._table_partitioning(t, latest_version(t)) == ["p"]
    pruned = read_version(spark, t, prune=("p", 1, 1))
    assert {r.k for r in pruned.collect()} == {i for i in range(12) if i % 2 == 1}

    c = str(tmp_path / "clone")
    V.clone_table(t, c)
    assert {(r.k, r.p) for r in read_version(spark, c).collect()} == {
        (i, i % 2) for i in range(12)
    }
    assert V._table_partitioning(c, 0) == ["p"]


def test_large_commit_harvests_stats_with_zero_driver_footer_reads(
    spark, tmp_path, monkeypatch
):
    """Round-8 brief: per-file min/max and row counts for a large add
    set come from ONE distributed aggregation, never a serial driver
    pyarrow loop — a 50k-file commit must cost one Spark job. Pinned by
    exploding pyarrow.parquet.ParquetFile during the commit."""
    import pyarrow.parquet as pq

    import avro_diff_spark.sources.versioned as V

    t = str(tmp_path / "big")
    df = spark.createDataFrame(
        [(i, f"s{i:03d}") for i in range(400)], "k long, w string"
    ).repartition(40)

    def boom(*a, **kw):
        raise AssertionError("driver footer fetch during a large commit")

    monkeypatch.setattr(pq, "ParquetFile", boom)
    commit_snapshot(df, t, stats_cols=["k", "w"])
    monkeypatch.undo()

    with open(os.path.join(t, "_log", "000000.json")) as fh:
        c = json.load(fh)
    assert c["n_rows"] == 400
    adds = [a for a in c["actions"] if "add" in a]
    assert len(adds) == 40 and all("n" in a for a in adds)
    assert sum(a["n"] for a in adds) == 400
    # harvested stats enable pruning exactly like the footer path
    pruned = read_version(spark, t, prune=("k", 7, 7))
    assert [r.k for r in pruned.collect()] == [7]
    assert len(pruned.inputFiles()) < 40


def test_distributed_stats_match_driver_footer_stats(spark, tmp_path, monkeypatch):
    """Both harvest paths record identical stats for int/string/date —
    the distributed path is a drop-in for the footer loop."""
    import datetime

    import avro_diff_spark.sources.versioned as V

    rows = [
        (i, f"w{i:02d}", datetime.date(2024, 1, 1 + i % 28)) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "k long, w string, d date").repartitionByRange(
        5, "k"
    )
    t1, t2 = str(tmp_path / "drv"), str(tmp_path / "dist")
    commit_snapshot(df, t1, stats_cols=["k", "w", "d"])  # 5 files: driver path
    monkeypatch.setattr(V, "_DRIVER_FOOTER_MAX_FILES", -1)  # force distributed
    commit_snapshot(df, t2, stats_cols=["k", "w", "d"])

    def stats_by_sig(t):
        with open(os.path.join(t, "_log", "000000.json")) as fh:
            c = json.load(fh)
        out = {}
        for a in c["actions"]:
            if "add" in a and "stats" in a:
                out[json.dumps(a["stats"]["k"])] = (a["stats"], a["n"])
        return out

    s1, s2 = stats_by_sig(t1), stats_by_sig(t2)
    assert s1 and set(s1) == set(s2)
    for sig in s1:
        assert s1[sig] == s2[sig], (sig, s1[sig], s2[sig])


def test_clone_of_round8_table_fetches_zero_footers(spark, tmp_path, monkeypatch):
    """Per-add row counts ride the log, so a shallow clone of a 100 TB
    table is pure metadata — no footer opens at all."""
    import pyarrow.parquet as pq

    from avro_diff_spark.sources.versioned import clone_table

    t, c = str(tmp_path / "src"), str(tmp_path / "dst")
    commit_snapshot(_df(spark, [(1, "a"), (2, "b")]), t)
    commit_snapshot(_df(spark, [(3, "c")]), t, mode="append")

    def boom(*a, **kw):
        raise AssertionError("footer fetch during shallow clone")

    monkeypatch.setattr(pq, "ParquetFile", boom)
    clone_table(t, c)
    monkeypatch.undo()
    assert {r.k for r in read_version(spark, c).collect()} == {1, 2, 3}
    assert table_history(c)[0]["n_rows"] == 3


def test_dv_point_delete_writes_no_data_files(spark, tmp_path):
    """Deletion vectors (round-8 brief): a point delete on a multi-file
    table publishes a metadata commit + a KB-scale sidecar — ZERO data
    files rewritten or removed — and reads mask the rows exactly like
    the copy-on-write path."""
    from avro_diff_spark.sources.versioned import _live_files, delete_where

    rows = [(i, f"r{i}") for i in range(30)]
    t, t2 = str(tmp_path / "dv"), str(tmp_path / "cow")
    for p in (t, t2):
        commit_snapshot(_df(spark, rows).repartitionByRange(3, "k"), p)
    files_before = set(_live_files(t, 0))

    v = delete_where(spark, t, "k = 7")  # auto -> dv
    assert v == 1
    delete_where(spark, t2, "k = 7", rewrite="cow")

    with open(os.path.join(t, "_log", "000001.json")) as fh:
        c = json.load(fh)
    assert c["mode"] == "delete" and c["n_rows"] == 1
    assert not any("add" in a for a in c["actions"])
    assert not any("remove" in a for a in c["actions"])
    dv = [a["dv"] for a in c["actions"] if "dv" in a]
    assert len(dv) == 1 and dv[0]["n"] == 1 and dv[0]["for"] in files_before
    assert set(_live_files(t, 1)) == files_before  # same data files live

    got = {(r.k, r.v) for r in read_version(spark, t).collect()}
    want = {(r.k, r.v) for r in read_version(spark, t2).collect()}
    assert got == want == {(i, f"r{i}") for i in range(30) if i != 7}
    # time travel: the pre-delete version still shows the row
    assert (7, "r7") in {(r.k, r.v) for r in read_version(spark, t, 0).collect()}


def test_dv_deletes_accumulate_and_empty_delete_is_noop(spark, tmp_path):
    """Successive DV deletes stack (each masks its rows on top of prior
    vectors); a delete matching nothing publishes no commit."""
    from avro_diff_spark.sources.versioned import delete_where

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(i, f"r{i}") for i in range(10)]), t)
    v1 = delete_where(spark, t, "k in (1, 2)")
    v2 = delete_where(spark, t, "k in (2, 3)")  # 2 already gone: masks 3
    assert (v1, v2) == (1, 2)
    with open(os.path.join(t, "_log", "000002.json")) as fh:
        assert json.load(fh)["n_rows"] == 1  # only row 3 newly deleted
    assert {r.k for r in read_version(spark, t).collect()} == {0, 4, 5, 6, 7, 8, 9}
    assert delete_where(spark, t, "k = 999") == 2  # no-op, no commit
    assert latest_version(t) == 2


def test_dv_cdf_compaction_and_vacuum(spark, tmp_path):
    """The change feed classifies DV deletes as deletes; compaction
    materializes the vectors away; vacuum never sweeps live sidecars but
    reclaims them once compaction supersedes the DV versions."""
    import glob

    from avro_diff_spark.sources.versioned import (
        compact_table,
        delete_where,
        read_changes,
        vacuum,
    )

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(i, f"r{i}") for i in range(12)]), t)
    delete_where(spark, t, "k in (4, 5)")
    ch = read_changes(spark, t, ["k"], v_from=0, v_to=1)
    assert {(r.k, r._change_type) for r in ch.collect()} == {
        (4, "delete"), (5, "delete")
    }

    # vacuum keeping the DV version must preserve its sidecar
    vacuum(t, keep_versions=1)
    assert glob.glob(os.path.join(t, "dv*", "*.parquet"))
    assert {r.k for r in read_version(spark, t).collect()} == set(range(12)) - {4, 5}

    v = compact_table(spark, t, target_files=2)
    assert {r.k for r in read_version(spark, t, v).collect()} == set(range(12)) - {4, 5}
    with open(os.path.join(t, "_log", f"{v:06d}.json")) as fh:
        assert all("dv" not in a for a in json.load(fh)["actions"])
    vacuum(t, keep_versions=1)
    assert not glob.glob(os.path.join(t, "dv*", "*.parquet"))
    assert {r.k for r in read_version(spark, t).collect()} == set(range(12)) - {4, 5}


def test_dv_update_where_merge_on_read(spark, tmp_path):
    """update_where(rewrite='dv'): writes ONLY the updated rows as new
    files and masks their old positions — one atomic commit, results
    identical to copy-on-write, partitioning preserved."""
    from avro_diff_spark.sources.versioned import _live_files, update_where

    rows = [(i, i % 2, float(i)) for i in range(20)]
    t, t2 = str(tmp_path / "dv"), str(tmp_path / "cow")
    for p in (t, t2):
        commit_snapshot(
            spark.createDataFrame(rows, "k long, p long, x double"),
            p,
            partition_by=["p"],
        )
    files_before = set(_live_files(t, 0))
    v = update_where(spark, t, "k in (3, 8)", {"x": F.col("x") * 100})
    update_where(spark, t2, "k in (3, 8)", {"x": F.col("x") * 100}, rewrite="cow")
    got = {(r.k, r.p, r.x) for r in read_version(spark, t, v).collect()}
    want = {(r.k, r.p, r.x) for r in read_version(spark, t2).collect()}
    assert got == want and (3, 1, 300.0) in got and (8, 0, 800.0) in got
    with open(os.path.join(t, "_log", f"{v:06d}.json")) as fh:
        c = json.load(fh)
    assert c["mode"] == "update"
    assert files_before <= set(_live_files(t, v))  # originals still live
    assert sum(a["n"] for a in c["actions"] if "add" in a) == 2  # only 2 rows rewritten
    # updated rows landed in hive partition dirs (partitioning preserved)
    assert all(
        "p=" in a["add"] for a in c["actions"] if "add" in a
    )
    # update matching nothing: no commit
    assert update_where(spark, t, "k = 999", {"x": F.lit(0.0)}) == v


def test_dv_clone_reattaches_vectors(spark, tmp_path):
    """A shallow clone of a DV table masks the same rows (sidecars
    re-attached by absolute path with the source's sidecar key)."""
    from avro_diff_spark.sources.versioned import clone_table, delete_where

    t, c = str(tmp_path / "src"), str(tmp_path / "dst")
    commit_snapshot(_df(spark, [(i, f"r{i}") for i in range(8)]), t)
    delete_where(spark, t, "k in (2, 6)")
    clone_table(t, c)
    assert {r.k for r in read_version(spark, c).collect()} == {0, 1, 3, 4, 5, 7}
    assert table_history(c)[0]["n_rows"] == 6  # live rows, net of DVs

    # deleting on the CLONE must not touch the source
    delete_where(spark, c, "k = 0")
    assert {r.k for r in read_version(spark, c).collect()} == {1, 3, 4, 5, 7}
    assert {r.k for r in read_version(spark, t).collect()} == {0, 1, 3, 4, 5, 7}


def test_dv_delete_on_partitioned_table_and_key_diff(spark, tmp_path):
    """DV deletes compose with partition reconstruction (the condition
    may reference partition columns) and with key_diff_versions."""
    from avro_diff_spark.sources.versioned import delete_where, key_diff_versions

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i % 3, f"r{i}") for i in range(15)], "k long, p long, v string"
    )
    commit_snapshot(df, t, partition_by=["p"])
    v = delete_where(spark, t, "p = 1 and k < 9")  # partition-col predicate
    got = {(r.k, r.p) for r in read_version(spark, t, v).collect()}
    assert got == {(i, i % 3) for i in range(15) if not (i % 3 == 1 and i < 9)}
    d = key_diff_versions(spark, t, ["k"], v_old=0, v_new=v)
    assert {r.k for r in d.filter(F.col("diff_kind") == "removed").collect()} == {
        "1", "4", "7"
    }


def test_table_cli_delete_and_checkpoint(spark, tmp_path, capsys):
    """CLI surface for the round-8 additions: `table delete --where`
    (deletion-vector default) and `table checkpoint`."""
    from avro_diff_spark.cli import table_main

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(i, f"r{i}") for i in range(6)]), t)
    assert table_main(["delete", t, "--where", "k = 3"]) == 0
    out = capsys.readouterr().out
    assert "version 1" in out
    assert {r.k for r in read_version(spark, t).collect()} == {0, 1, 2, 4, 5}
    with open(os.path.join(t, "_log", "000001.json")) as fh:
        assert json.load(fh)["mode"] == "delete"  # DV, not a rewrite

    assert table_main(["delete", t, "--where", "k = 99"]) == 0
    assert "matched nothing" in capsys.readouterr().out

    assert table_main(["checkpoint", t]) == 0
    assert "checkpointed" in capsys.readouterr().out
    assert os.path.exists(os.path.join(t, "_log", "000001.checkpoint.json"))
    assert {r.k for r in read_version(spark, t).collect()} == {0, 1, 2, 4, 5}


def test_merge_dv_matches_all_semantics_and_writes_only_changes(spark, tmp_path):
    """Merge-on-read MERGE (round 8): rewrite='dv' equals rewrite='all'
    row-for-row across every clause combination, while an upsert removes
    ZERO existing data files and writes only the changed rows."""
    from avro_diff_spark.sources.versioned import _live_files, merge_into

    rows = [(i, f"r{i}") for i in range(30)]
    src_rows = [(5, "U5"), (17, "U17"), (40, "I40")]
    combos = [
        ("update", "insert", "keep"),
        ("update", "insert", "delete"),
        ("keep", "insert", "keep"),
        ("update", "ignore", "keep"),
        ("update", "ignore", "delete"),
    ]
    for i, (wm, wnm, wnmbs) in enumerate(combos):
        ta, tb = str(tmp_path / f"dv{i}"), str(tmp_path / f"all{i}")
        for t in (ta, tb):
            commit_snapshot(_df(spark, rows).repartitionByRange(3, "k"), t)
        va = merge_into(
            spark, ta, _df(spark, src_rows), ["k"],
            when_matched=wm, when_not_matched=wnm,
            when_not_matched_by_source=wnmbs, rewrite="dv",
        )
        merge_into(
            spark, tb, _df(spark, src_rows), ["k"],
            when_matched=wm, when_not_matched=wnm,
            when_not_matched_by_source=wnmbs, rewrite="all",
        )
        got = sorted((r.k, r.v) for r in read_version(spark, ta, va).collect())
        want = sorted((r.k, r.v) for r in read_version(spark, tb).collect())
        assert got == want, (wm, wnm, wnmbs, got[:5], want[:5])

    # the upsert commit shape: no removes, original files still live,
    # new files hold exactly the 3 source rows
    t = str(tmp_path / "shape")
    commit_snapshot(_df(spark, rows).repartitionByRange(3, "k"), t)
    before = set(_live_files(t, 0))
    v = merge_into(spark, t, _df(spark, src_rows), ["k"], rewrite="dv")
    with open(os.path.join(t, "_log", f"{v:06d}.json")) as fh:
        c = json.load(fh)
    assert c["mode"] == "merge"
    assert not any("remove" in a for a in c["actions"])
    assert sum(a["n"] for a in c["actions"] if "add" in a) == 3
    assert sum(a["dv"]["n"] for a in c["actions"] if "dv" in a) == 2  # 5, 17
    assert before <= set(_live_files(t, v))

    # a source matching nothing with no insert clause is a no-op
    assert merge_into(
        spark, t, _df(spark, [(999, "x")]), ["k"],
        when_not_matched="ignore", rewrite="dv",
    ) == v


def test_merge_dv_partitioned_and_cdf(spark, tmp_path):
    """DV merges keep partitioning (new rows land in hive dirs) and the
    change feed classifies them as updates/inserts/deletes."""
    from avro_diff_spark.sources.versioned import merge_into, read_changes

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i % 2, f"r{i}") for i in range(10)], "k long, p long, v string"
    )
    commit_snapshot(df, t, partition_by=["p"])
    src = spark.createDataFrame([(4, 0, "U4"), (77, 1, "I77")], "k long, p long, v string")
    v = merge_into(spark, t, src, ["k"], rewrite="dv")
    with open(os.path.join(t, "_log", f"{v:06d}.json")) as fh:
        c = json.load(fh)
    assert all("p=" in a["add"] for a in c["actions"] if "add" in a)
    got = {(r.k, r.p, r.v) for r in read_version(spark, t, v).collect()}
    assert (4, 0, "U4") in got and (77, 1, "I77") in got and len(got) == 11
    ch = read_changes(spark, t, ["k"], v_from=0, v_to=v)
    kinds = {(r.k, r._change_type) for r in ch.collect()}
    assert kinds == {
        (4, "update_preimage"), (4, "update_postimage"), (77, "insert")
    }


def test_checkpoint_carries_deletion_vectors(spark, tmp_path, monkeypatch):
    """A checkpoint taken after DV commits must carry the vectors: a
    read served from the checkpoint (zero pre-checkpoint commit opens)
    still masks the deleted rows."""
    import avro_diff_spark.sources.versioned as V

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(i, f"r{i}") for i in range(10)]), t)
    V.delete_where(spark, t, "k in (2, 7)")  # v1: DV commit
    for i in range(10, 19):
        commit_snapshot(_df(spark, [(i, f"r{i}")]), t, mode="append")
    assert latest_version(t) == 10
    assert os.path.exists(os.path.join(t, "_log", "000010.checkpoint.json"))

    opened: list[str] = []
    real = V._read_commit

    def counting(path):
        opened.append(os.path.basename(path))
        return real(path)

    monkeypatch.setattr(V, "_read_commit", counting)
    got = {r.k for r in read_version(spark, t).collect()}
    assert got == set(range(19)) - {2, 7}
    assert all(int(n[:6]) > 10 for n in opened), opened


def test_random_dml_sequence_matches_model(spark, tmp_path):
    """Model-based pin of the whole DML surface: a deterministic
    pseudo-random sequence of append / DV delete / DV update / DV merge
    / COW delete / compact / checkpoint operations must keep
    read_version equal to a driver-side dict model after EVERY step —
    the composition coverage individual tests can't give."""
    import random

    import avro_diff_spark.sources.versioned as V

    rng = random.Random(8)  # deterministic
    t = str(tmp_path / "tbl")
    model: dict[int, str] = {i: f"r{i}" for i in range(20)}
    commit_snapshot(
        _df(spark, sorted(model.items())).repartitionByRange(3, "k"), t
    )
    next_k = 100
    for step in range(14):
        op = rng.choice(["append", "delete_dv", "update_dv", "merge_dv", "delete_cow", "compact"])
        if op == "append":
            rows = [(next_k + j, f"a{next_k + j}") for j in range(3)]
            next_k += 3
            commit_snapshot(_df(spark, rows), t, mode="append")
            model.update(rows)
        elif op == "delete_dv":
            ks = rng.sample(sorted(model), min(3, len(model)))
            V.delete_where(spark, t, f"k in ({','.join(map(str, ks))})")
            for k in ks:
                model.pop(k)
        elif op == "delete_cow":
            ks = rng.sample(sorted(model), min(2, len(model)))
            V.delete_where(
                spark, t, f"k in ({','.join(map(str, ks))})", rewrite="cow"
            )
            for k in ks:
                model.pop(k)
        elif op == "update_dv":
            ks = rng.sample(sorted(model), min(2, len(model)))
            V.update_where(
                spark, t, f"k in ({','.join(map(str, ks))})",
                {"v": F.concat(F.col("v"), F.lit("!"))},
            )
            for k in ks:
                model[k] = model[k] + "!"
        elif op == "merge_dv":
            upd = rng.sample(sorted(model), min(2, len(model)))
            ins = [next_k]
            next_k += 1
            src = [(k, f"m{k}") for k in upd] + [(k, f"m{k}") for k in ins]
            V.merge_into(spark, t, _df(spark, src), ["k"], rewrite="dv")
            for k, v in src:
                model[k] = v
        elif op == "compact":
            V.compact_table(spark, t, target_files=2)
        got = dict(
            (r.k, r.v) for r in read_version(spark, t).collect()
        )
        assert got == model, (step, op, len(got), len(model))
    # checkpoints were written along the way; a final fresh read agrees
    assert latest_version(t) >= 10
    got = {(r.k, r.v) for r in read_version(spark, t).collect()}
    assert got == set(model.items())


def test_high_cardinality_partitioning_reads_bounded_plan(spark, tmp_path):
    """Above _MAX_LITERAL_PV_GROUPS live partition values, read_version
    groups scans by STAGING DIRECTORY with native hive-partition
    discovery instead of one scan per pv combination — a 10k-partition
    table must not build 10k plan nodes. Results, types, pruning, DV
    masking, and the leading-zero string-value hazard are all pinned."""
    import avro_diff_spark.sources.versioned as V

    t = str(tmp_path / "tbl")
    # 120 string partitions with leading zeros: type inference would
    # corrupt 'p003' -> ... (and '007' -> 7); the committed type wins
    rows = [(i, f"{i % 120:03d}", f"r{i}") for i in range(360)]
    df = spark.createDataFrame(rows, "k long, p string, v string")
    commit_snapshot(df, t, partition_by=["p"])
    assert V._MAX_LITERAL_PV_GROUPS < 120

    got = read_version(spark, t)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") <= 4, plan.count("FileScan")
    assert dict(got.dtypes)["p"] == "string"
    assert {(r.k, r.p, r.v) for r in got.collect()} == set(rows)

    # appends add a second staging dir -> still bounded
    commit_snapshot(
        spark.createDataFrame(
            [(1000 + i, f"{i % 120:03d}", "x") for i in range(120)],
            "k long, p string, v string",
        ),
        t,
        mode="append",
        partition_by=["p"],
    )
    got2 = read_version(spark, t)
    assert got2._jdf.queryExecution().executedPlan().toString().count("FileScan") <= 8
    assert got2.count() == 480

    # log-level pruning composes (prune on the partition column)
    pruned = read_version(spark, t, prune=("p", "007", "007"))
    assert {r.k for r in pruned.collect()} == {7, 127, 247, 1007}

    # deletion vectors compose with the staged-dir read path
    V.delete_where(spark, t, "k in (7, 1007)")
    assert {r.k for r in read_version(spark, t, prune=("p", "007", "007")).collect()} == {
        127, 247
    }


def test_version_as_of_uses_checkpoint_ts_index(spark, tmp_path, monkeypatch):
    """version_as_of answers from the checkpoint's commit-time index +
    tail — zero commit opens at or below the checkpoint — and resolves
    identically to a full-log walk."""
    import avro_diff_spark.sources.versioned as V

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(0, "base")]), t)
    ts_of = {}
    for i in range(1, 25):
        v = commit_snapshot(_df(spark, [(i, f"r{i}")]), t, mode="append")
        with open(os.path.join(t, "_log", f"{v:06d}.json")) as fh:
            ts_of[v] = json.load(fh)["ts_us"]

    opened: list[str] = []
    real = V._read_commit

    def counting(path):
        opened.append(os.path.basename(path))
        return real(path)

    monkeypatch.setattr(V, "_read_commit", counting)
    # a timestamp inside the checkpointed range resolves exactly
    assert V.version_as_of(t, ts_of[7]) == 7
    assert V.version_as_of(t, ts_of[7] + 1) == 7
    assert all(int(n[:6]) > 20 for n in opened), opened
    # and composes with read_version(as_of=): resolution reads only the
    # tail; the HISTORICAL read of v3 then replays 0..3 (below any
    # checkpoint — the correct fallback), never the 4..20 middle
    opened.clear()
    got = read_version(spark, t, as_of=ts_of[3])
    assert {r.k for r in got.collect()} == {0, 1, 2, 3}
    assert all(int(n[:6]) > 20 or int(n[:6]) <= 3 for n in opened), opened


def test_incremental_compaction_packs_only_small_files(spark, tmp_path):
    """compact_table(min_file_rows=): well-sized files are untouched
    metadata; the small-file tail (and DV-bearing files, which the
    rewrite materializes) is packed via a REPLACE commit."""
    from avro_diff_spark.sources.versioned import (
        _live_files,
        compact_table,
        delete_where,
    )

    t = str(tmp_path / "tbl")
    big = _df(spark, [(i, f"r{i}") for i in range(500)]).coalesce(1)
    commit_snapshot(big, t)
    for i in range(500, 505):
        commit_snapshot(_df(spark, [(i, f"r{i}")]), t, mode="append")
    files_before = _live_files(t, latest_version(t))
    big_files = [f for f in files_before if f.startswith("v000000")]

    v = compact_table(spark, t, target_files=1, min_file_rows=10)
    with open(os.path.join(t, "_log", f"{v:06d}.json")) as fh:
        c = json.load(fh)
    assert c["mode"] == "replace"
    removed = {a["remove"] for a in c["actions"] if "remove" in a}
    assert removed and not any(f in removed for f in big_files)
    live = set(_live_files(t, v))
    assert set(big_files) <= live  # the big file survives as metadata
    assert {r.k for r in read_version(spark, t, v).collect()} == set(range(505))
    # idempotent: nothing small remains
    assert compact_table(spark, t, target_files=1, min_file_rows=10) == v

    # a DV on the big file qualifies it for the next incremental pass,
    # which materializes the vector away
    delete_where(spark, t, "k = 7")
    v3 = compact_table(spark, t, target_files=1, min_file_rows=10)
    assert v3 > v
    assert {r.k for r in read_version(spark, t, v3).collect()} == set(range(505)) - {7}
    with open(os.path.join(t, "_log", f"{v3:06d}.json")) as fh:
        assert all("dv" not in a for a in json.load(fh)["actions"])

    with pytest.raises(ValueError, match="cluster_by"):
        compact_table(spark, t, min_file_rows=10, cluster_by=["k"])


def _data_files(root: str) -> set[str]:
    out = set()
    for dirpath, _, names in os.walk(root):
        if "_log" in dirpath.split(os.sep):
            continue
        for n in names:
            out.add(os.path.relpath(os.path.join(dirpath, n), root))
    return out


def test_restore_table_rolls_back_data_preserving_history(spark, tmp_path):
    """RESTORE publishes a metadata-only commit equal to the target
    version's state: zero data files written, bad versions still
    time-travelable, history moves forward."""
    from avro_diff_spark.sources.versioned import restore_table

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a"), (2, "b")]), t)                 # v0
    commit_snapshot(_df(spark, [(3, "c")]), t, mode="append")            # v1
    commit_snapshot(_df(spark, [(9, "oops")]), t, mode="overwrite")      # v2

    disk_before = _data_files(t)
    v = restore_table(t, 1)
    assert v == 3 and latest_version(t) == 3
    assert _data_files(t) == disk_before  # metadata-only

    assert {(r.k, r.v) for r in read_version(spark, t).collect()} == {
        (1, "a"), (2, "b"), (3, "c")
    }
    # the bad version is preserved, not truncated
    assert {(r.k, r.v) for r in read_version(spark, t, 2).collect()} == {(9, "oops")}
    with open(os.path.join(t, "_log", "000003.json")) as fh:
        c = json.load(fh)
    assert c["restore_of"] == 1 and c["n_rows"] == 3
    assert not any(a.get("add", "").startswith("v000003") for a in c["actions"])

    # restore-of-restore returns to the bad state too
    restore_table(t, 2)
    assert {(r.k, r.v) for r in read_version(spark, t).collect()} == {(9, "oops")}

    with pytest.raises(ValueError, match="exactly one"):
        restore_table(t)
    with pytest.raises(ValueError, match="no version"):
        restore_table(t, 99)


def test_restore_resets_deletion_vectors_and_cdf(spark, tmp_path):
    """Restoring across a DV delete resurrects the masked rows (forward)
    and re-attaches the vectors (backward); the restore commit emits the
    compensating CDF rows."""
    from avro_diff_spark.sources.versioned import delete_where, read_changes, restore_table

    t = str(tmp_path / "dv")
    rows = [(i, f"r{i}") for i in range(10)]
    commit_snapshot(_df(spark, rows).repartitionByRange(2, "k"), t)      # v0
    delete_where(spark, t, "k = 4")                                      # v1 (dv)

    v = restore_table(t, 0)                                             # v2
    assert {r.k for r in read_version(spark, t).collect()} == set(range(10))
    ch = read_changes(spark, t, ["k"], v_from=1, v_to=v).collect()
    assert {(r.k, r._change_type) for r in ch} == {(4, "insert")}

    # restore forward to the deleted state: the vector re-attaches
    disk_before = _data_files(t)
    restore_table(t, 1)                                                 # v3
    assert _data_files(t) == disk_before
    assert {r.k for r in read_version(spark, t).collect()} == set(range(10)) - {4}


def test_restore_constraints_partitioning_and_ts(spark, tmp_path):
    """RESTORE rolls table METADATA back too: constraints in force and
    partitioning return to the target version's; ts= routes through
    version_as_of."""
    from avro_diff_spark.sources.versioned import (
        add_constraint,
        restore_table,
        table_constraints,
        version_as_of,
    )

    t = str(tmp_path / "ptbl")
    df = spark.createDataFrame(
        [(1, "EU", "a"), (2, "US", "b")], "k long, region string, v string"
    )
    commit_snapshot(df, t, partition_by=["region"])                      # v0
    add_constraint(spark, t, "k_pos", "k > 0")                           # v1
    commit_snapshot(
        spark.createDataFrame([(3, "AS", "c")], "k long, region string, v string"),
        t, mode="append", partition_by=["region"],
    )                                                                    # v2

    restore_table(t, 0)                                                  # v3
    assert table_constraints(t) == {}
    from avro_diff_spark.sources.versioned import _table_partitioning

    assert _table_partitioning(t, latest_version(t)) == ["region"]
    assert {r.k for r in read_version(spark, t).collect()} == {1, 2}
    # partition pruning still answers from the restored manifest
    pruned = read_version(spark, t, prune=("region", "US", "US"))
    assert {r.k for r in pruned.collect()} == {2}

    # ts= routes through version_as_of: restore to the constraint era
    import datetime

    with open(os.path.join(t, "_log", "000002.json")) as fh:
        ts2 = json.load(fh)["ts_us"]
    when = datetime.datetime.fromtimestamp(ts2 / 1e6)
    v = restore_table(t, ts=when)
    assert version_as_of(t, when) == 2
    assert table_constraints(t) == {"k_pos": "k > 0"}
    assert {r.k for r in read_version(spark, t).collect()} == {1, 2, 3}
    # the restored constraint actually gates new commits
    with pytest.raises(ValueError, match="k_pos"):
        commit_snapshot(
            spark.createDataFrame([(-1, "EU", "x")], "k long, region string, v string"),
            t, mode="append", partition_by=["region"],
        )


def test_restore_below_vacuum_watermark_raises(spark, tmp_path):
    from avro_diff_spark.sources.versioned import restore_table, vacuum

    t = str(tmp_path / "vac")
    commit_snapshot(_df(spark, [(1, "a")]), t)
    commit_snapshot(_df(spark, [(2, "b")]), t, mode="overwrite")
    vacuum(t, keep_versions=1)
    with pytest.raises(ValueError, match="vacuumed"):
        restore_table(t, 0)


def test_table_cli_restore(spark, tmp_path, capsys):
    from avro_diff_spark.cli import table_main

    t = str(tmp_path / "cli")
    commit_snapshot(_df(spark, [(1, "a")]), t)
    commit_snapshot(_df(spark, [(2, "b")]), t, mode="overwrite")
    assert table_main(["restore", t, "--version", "0"]) == 0
    assert "restored" in capsys.readouterr().out
    assert {r.k for r in read_version(spark, t).collect()} == {1}
    assert table_main(["restore", t]) == 2


def test_incremental_clustered_compaction_reuses_recorded_grid(
    spark, tmp_path, monkeypatch
):
    """Liquid-clustering shape: a FULL clustered compaction records its
    cut-point grid in the commit; later min_file_rows passes re-cluster
    ONLY the small-file tail against the SAME grid — zero re-sampling
    (pinned by exploding the sampler), big clustered files untouched."""
    import random

    from avro_diff_spark.operators import layout as L
    from avro_diff_spark.sources.versioned import (
        _live_files,
        _table_clustering,
        compact_table,
    )

    rng = random.Random(11)
    rows = [(rng.randrange(1000), rng.randrange(1000), i) for i in range(3000)]
    t = str(tmp_path / "tbl")
    commit_snapshot(
        spark.createDataFrame(rows, "x long, y long, i long").repartition(6), t
    )
    # incremental clustering before any full clustering must refuse
    with pytest.raises(ValueError, match="full clustered compaction"):
        compact_table(spark, t, min_file_rows=10, cluster_by=["x", "y"])

    v1 = compact_table(spark, t, target_files=4, cluster_by=["x", "y"])
    rec = _table_clustering(t, v1)
    assert rec and rec["cols"] == ["x", "y"] and rec["curve"] == "zorder"
    assert all(len(cuts) > 100 for cuts in rec["cuts"].values())
    clustered = set(_live_files(t, v1))

    extra = [(rng.randrange(1000), rng.randrange(1000), 9000 + i) for i in range(40)]
    for chunk in (extra[:20], extra[20:]):
        commit_snapshot(
            spark.createDataFrame(chunk, "x long, y long, i long").coalesce(1),
            t,
            mode="append",
        )

    def boom(*a, **k):
        raise AssertionError("incremental pass re-sampled cut points")

    monkeypatch.setattr(L, "_cut_points", boom)
    with pytest.raises(ValueError, match="full clustered"):
        compact_table(spark, t, min_file_rows=100, cluster_by=["x"], curve="zorder")
    with pytest.raises(ValueError, match="full clustered"):
        compact_table(
            spark, t, min_file_rows=100, cluster_by=["x", "y"], curve="hilbert"
        )
    v2 = compact_table(spark, t, min_file_rows=100, cluster_by=["x", "y"])
    assert v2 > v1
    live = set(_live_files(t, v2))
    assert clustered <= live  # the big clustered files were not rewritten
    assert {r.i for r in read_version(spark, t, v2).collect()} == set(
        range(3000)
    ) | {9000 + i for i in range(40)}
    # the grid record survives the replace commit for the NEXT pass
    assert _table_clustering(t, v2) == rec
    # an unclustered overwrite clears the record
    commit_snapshot(
        spark.createDataFrame(rows[:10], "x long, y long, i long"), t
    )
    assert _table_clustering(t, latest_version(t)) is None


def test_commit_stream_auto_compaction_bounds_small_files(spark, tmp_path):
    """auto_compact_every=N: the streaming sink runs the incremental
    bin-packing pass after every Nth batch — rows identical, small-file
    tail bounded, maintenance commits are REPLACE (skipped by table
    streams)."""
    from avro_diff_spark.sources.versioned import _live_adds, commit_stream

    src, t, ck = (str(tmp_path / x) for x in ("src", "tbl", "ck"))
    os.makedirs(src)
    df = (
        spark.readStream.schema("k long, v string")
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    for i in range(6):
        with open(os.path.join(src, f"{i}.json"), "w") as fh:
            fh.write(f'{{"k": {i}, "v": "r{i}"}}\n')

    q = commit_stream(
        df,
        t,
        checkpoint=ck,
        auto_compact_every=2,
        auto_compact_min_rows=100,
        trigger_available_now=True,
    )
    q.awaitTermination(120)
    assert {(r.k, r.v) for r in read_version(spark, t).collect()} == {
        (i, f"r{i}") for i in range(6)
    }
    hist = table_history(t)
    assert any(h["mode"] == "replace" for h in hist)  # maintenance ran
    # the live set is packed: fewer files than data commits
    n_appends = sum(1 for h in hist if h["mode"] == "append")
    live = _live_adds(t, latest_version(t))[0]
    if n_appends > 1:
        assert len(live) < n_appends or len(live) == 1


def test_vacuum_dry_run_and_table_detail(spark, tmp_path, capsys):
    """dry_run lists exactly what a real vacuum then deletes (and moves
    no watermark); table_detail summarizes the manifest with zero footer
    opens."""
    from avro_diff_spark.cli import table_main
    from avro_diff_spark.sources.versioned import (
        _vacuum_watermark,
        delete_where,
        table_detail,
        vacuum,
    )

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(i, f"r{i}") for i in range(8)]).coalesce(2), t)
    commit_snapshot(_df(spark, [(9, "z")]).coalesce(1), t, mode="overwrite")
    delete_where(spark, t, "k = 9")  # dv on the live file

    would = vacuum(t, dry_run=True)
    assert would and _vacuum_watermark(t) == 0
    assert set(vacuum(t)) == set(would)
    assert _vacuum_watermark(t) > 0
    assert vacuum(t, dry_run=True) == []

    d = table_detail(t)
    assert d["version"] == 2 and d["num_files"] == 1
    assert d["num_rows"] == 0  # one row, one DV mask
    assert d["num_deletion_vectors"] == 1
    assert d["columns"] == ["k", "v"] and d["constraints"] == {}
    assert d["vacuum_watermark"] > 0 and d["size_bytes"] > 0

    assert table_main(["detail", t]) == 0
    assert '"num_files": 1' in capsys.readouterr().out
    assert table_main(["vacuum", t, "--dry-run"]) == 0
    assert "would delete: 0" in capsys.readouterr().out


def test_compute_stats_backfills_pruning_without_rewrite(spark, tmp_path, monkeypatch):
    """ANALYZE-style backfill: a table committed WITHOUT stats gains
    min/max + bloom skipping retroactively via one metadata commit —
    zero data files touched, pruned reads then open zero footers."""
    from avro_diff_spark.sources import versioned as V
    from avro_diff_spark.sources.versioned import compute_stats, rename_column

    t = str(tmp_path / "tbl")
    rows = [(i, f"r{i}") for i in range(30)]
    commit_snapshot(_df(spark, rows).repartitionByRange(3, "k"), t)  # no stats
    files_before = set(V._live_files(t, 0))

    def may_match_count(version, col, lo, hi):
        adds = V._live_adds(t, version)[0]
        return sum(1 for f in adds if V._may_match(adds[f], col, lo, hi))

    # without stats every file is may-match
    assert may_match_count(0, "k", 25, 29) == 3

    v = compute_stats(spark, t, ["k"], bloom_cols=["v"])
    assert v == 1
    assert set(V._live_files(t, v)) == files_before  # metadata only
    assert compute_stats(spark, t, ["k"], bloom_cols=["v"]) is None  # idempotent

    # pruning now answers from the manifest alone: explode footer reads
    import pyarrow.parquet as pq

    real = pq.ParquetFile

    def boom(*a, **k):
        raise AssertionError("footer fetched during pruned read planning")

    monkeypatch.setattr(pq, "ParquetFile", boom)
    assert may_match_count(v, "k", 25, 29) == 1
    hit = read_version(spark, t, prune=("k", 25, 29))
    assert {r.k for r in hit.collect()} == {25, 26, 27, 28, 29}
    eq = read_version(spark, t, prune_eq=("v", "r7"))
    assert [(r.k, r.v) for r in eq.collect()] == [(7, "r7")]
    monkeypatch.setattr(pq, "ParquetFile", real)

    # composes with column mapping: backfill by the NEW logical name
    t2 = str(tmp_path / "ren")
    commit_snapshot(_df(spark, rows).repartitionByRange(3, "k"), t2)
    rename_column(t2, "k", "id")
    v2 = compute_stats(spark, t2, ["id"])
    adds2 = V._live_adds(t2, v2)[0]
    assert sum(1 for f in adds2 if V._may_match(adds2[f], "k", 0, 5)) == 1

    # checkpoints summarize the backfilled stats
    from avro_diff_spark.sources.versioned import checkpoint_log

    checkpoint_log(t)
    assert may_match_count(latest_version(t), "k", 25, 29) == 1


def test_random_dml_with_restore_matches_model(spark, tmp_path):
    """Model-based pin extended with RESTORE and metadata ops: the model
    keeps one snapshot per published version; a restore rewinds the
    model to the target's snapshot and the table must follow — across
    interleaved appends, DV deletes/updates, merges, compactions, stats
    backfills, and restore-of-restore."""
    import random

    import avro_diff_spark.sources.versioned as V

    rng = random.Random(21)
    t = str(tmp_path / "tbl")
    model: dict[int, str] = {i: f"r{i}" for i in range(15)}
    commit_snapshot(
        _df(spark, sorted(model.items())).repartitionByRange(3, "k"), t
    )
    history: dict[int, dict] = {0: dict(model)}
    next_k = 100
    for step in range(16):
        op = rng.choice(
            ["append", "delete_dv", "update_dv", "merge_dv", "compact",
             "stats", "restore"]
        )
        if op == "append":
            rows = [(next_k + j, f"a{next_k + j}") for j in range(2)]
            next_k += 2
            commit_snapshot(_df(spark, rows), t, mode="append")
            model.update(rows)
        elif op == "delete_dv" and model:
            ks = rng.sample(sorted(model), min(2, len(model)))
            V.delete_where(spark, t, f"k in ({','.join(map(str, ks))})")
            for k in ks:
                model.pop(k)
        elif op == "update_dv" and model:
            ks = rng.sample(sorted(model), min(2, len(model)))
            V.update_where(
                spark, t, f"k in ({','.join(map(str, ks))})",
                {"v": F.concat(F.col("v"), F.lit("!"))},
            )
            for k in ks:
                model[k] = model[k] + "!"
        elif op == "merge_dv" and model:
            upd = rng.sample(sorted(model), min(2, len(model)))
            src = [(k, f"m{k}") for k in upd] + [(next_k, f"m{next_k}")]
            next_k += 1
            V.merge_into(spark, t, _df(spark, src), ["k"], rewrite="dv")
            for k, v in src:
                model[k] = v
        elif op == "compact":
            V.compact_table(spark, t, target_files=2)
        elif op == "stats":
            V.compute_stats(spark, t, ["k"])
        elif op == "restore":
            v = rng.choice(sorted(history))
            V.restore_table(t, v)
            model = dict(history[v])
        history[latest_version(t)] = dict(model)
        got = dict((r.k, r.v) for r in read_version(spark, t).collect())
        assert got == model, (step, op, len(got), len(model))
    # every recorded version is still exactly time-travelable
    for v in sorted(history)[-5:]:
        got = dict((r.k, r.v) for r in read_version(spark, t, v).collect())
        assert got == history[v], v
