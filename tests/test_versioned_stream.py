"""The versioned-table STREAMING source (streaming/table_source.py):
append commits replay as micro-batches via the public Python Data
Source API; batch-equivalence against read_version; CDC composition
with key_diff_stream; Delta-source semantics for overwrites."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


def test_stream_starting_ts_inclusive(spark, tmp_path):
    """starting_ts follows Delta's inclusive startingTimestamp: the
    stream begins at the earliest commit at-or-after the timestamp;
    before the first commit -> full history; after the last -> empty.
    stream_changes shares the resolution."""
    import json
    import os

    from avro_diff_spark.streaming.table_source import stream_changes

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a")]), t)
    commit_snapshot(_df(spark, [(2, "b")]), t, mode="append")
    commit_snapshot(_df(spark, [(3, "c")]), t, mode="append")
    for v, us in ((0, 1_000_000), (1, 2_000_000), (2, 3_000_000)):
        p = os.path.join(t, "_log", f"{v:06d}.json")
        with open(p) as fh:
            c = json.load(fh)
        c["ts_us"] = us
        with open(p, "w") as fh:
            json.dump(c, fh)

    def drained(name, **kw):
        _drain(stream_table(spark, t, **kw), name)
        return {r.k for r in spark.sql(f"SELECT * FROM {name}").collect()}

    assert drained("ts_exact", starting_ts=2_000_000) == {2, 3}  # inclusive
    assert drained("ts_between", starting_ts=2_000_001) == {3}
    assert drained("ts_early", starting_ts=1) == {1, 2, 3}
    assert drained("ts_late", starting_ts=9_000_000) == set()

    _drain(stream_changes(spark, t, starting_ts=3_000_000), "ts_cdf")
    got = {
        (r.k, r._change_type, r._commit_version)
        for r in spark.sql("SELECT * FROM ts_cdf").collect()
    }
    assert got == {(3, "insert", 2)}


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


def test_probe_neardup_index_stream_exactly_once(spark, sf_dir, tmp_path):
    """Streaming maintenance of the near-dup index (round 8): each
    micro-batch probes the stored buckets, lands verified pairs in a
    versioned pairs table, and grows the index — restart on the same
    checkpoint commits nothing new; newly arrived docs probe the GROWN
    index; results equal the batch probe."""
    import os

    from pyspark.sql import functions as F

    from avro_diff_spark import snapshots as snap
    from avro_diff_spark.operators.neardup_index import (
        build_neardup_index,
        probe_neardup_index_stream,
    )
    from avro_diff_spark.sources.versioned import latest_version, read_version

    corpus = snap.documents_with_dups(spark, sf_dir)
    base = corpus.filter(F.col("doc_id") < 1_000_000)
    idx, pairs_t, src, ckpt = (
        str(tmp_path / d) for d in ("idx", "pairs", "src", "ck")
    )
    build_neardup_index(spark, base, "text", "doc_id", idx)
    os.makedirs(src)

    inc1 = corpus.filter(
        (F.col("doc_id") >= 1_000_000) & (F.col("doc_id") < 2_000_000)
    ).select("doc_id", "text")
    inc1.coalesce(1).write.mode("append").json(src)
    stream = spark.readStream.schema("doc_id long, text string").json(src)
    q = probe_neardup_index_stream(
        stream, "text", "doc_id", idx, pairs_t, checkpoint=ckpt
    )
    q.awaitTermination(180)
    got1 = {
        (r.doc_a, r.doc_b) for r in read_version(spark, pairs_t).collect()
    }
    assert got1 and all(b >= 1_000_000 for _, b in got1)
    n_pairs_v = latest_version(pairs_t)
    n_bkt_v = latest_version(os.path.join(idx, "buckets"))

    # restart, nothing new: zero commits anywhere
    q = probe_neardup_index_stream(
        spark.readStream.schema("doc_id long, text string").json(src),
        "text", "doc_id", idx, pairs_t, checkpoint=ckpt,
    )
    q.awaitTermination(180)
    assert latest_version(pairs_t) == n_pairs_v
    assert latest_version(os.path.join(idx, "buckets")) == n_bkt_v

    # a second wave of docs probes the GROWN index (pairs vs inc1 too)
    inc2 = corpus.filter(F.col("doc_id") >= 2_000_000).select("doc_id", "text")
    inc2.coalesce(1).write.mode("append").json(src)
    q = probe_neardup_index_stream(
        spark.readStream.schema("doc_id long, text string").json(src),
        "text", "doc_id", idx, pairs_t, checkpoint=ckpt,
    )
    q.awaitTermination(180)
    got2 = {
        (r.doc_a, r.doc_b) for r in read_version(spark, pairs_t).collect()
    }
    new = got2 - got1
    assert new and all(b >= 2_000_000 for _, b in new)

    # stream total == one batch probe over the same increments
    from avro_diff_spark.operators.dedup import minhash_near_dups

    full = minhash_near_dups(corpus, "text", "doc_id")
    want = {
        (r.doc_a, r.doc_b)
        for r in full.filter(
            (F.col("doc_a") >= 1_000_000) | (F.col("doc_b") >= 1_000_000)
        ).collect()
    }
    assert got2 == want


def test_stream_changes_matches_batch_cdf_over_dml_sequence(spark, tmp_path):
    """Streaming CDF (structural, from commit actions) drains to the
    same change rows as batch read_changes (keyed diff) across append +
    DV delete + DV update + merge-on-read — the batch-equivalence
    contract, on the key-unique tables CDC presumes."""
    from avro_diff_spark.sources.versioned import (
        delete_where,
        merge_into,
        read_changes,
        update_where,
    )
    from avro_diff_spark.streaming.table_source import stream_changes

    t = str(tmp_path / "tbl")
    commit_snapshot(
        _df(spark, [(i, f"r{i}") for i in range(8)]).repartitionByRange(2, "k"), t
    )                                                                    # v0
    commit_snapshot(_df(spark, [(8, "r8"), (9, "r9")]), t, mode="append")  # v1
    delete_where(spark, t, "k = 3")                                      # v2 dv
    update_where(spark, t, "k = 5", {"v": "upper(v)"})                   # v3 dv
    merge_into(
        spark, t, _df(spark, [(0, "merged"), (42, "new")]), ["k"],
        rewrite="dv",
    )                                                                    # v4

    _drain(stream_changes(spark, t, starting_version=1), "cdf_stream")
    got = {
        (r.k, r.v, r._change_type, r._commit_version)
        for r in spark.sql("SELECT * FROM cdf_stream").collect()
    }
    want = {
        (r.k, r.v, r._change_type, r._commit_version)
        for r in read_changes(spark, t, ["k"], v_from=0).collect()
    }
    assert got == want
    # spot anchors: every change type appears, versions line up
    cts = {ct for _, _, ct, _ in got}
    assert cts == {"insert", "delete", "update_preimage", "update_postimage"}
    assert (3, "r3", "delete", 2) in got
    assert (5, "r5", "update_preimage", 3) in got and (5, "R5", "update_postimage", 3) in got
    assert (0, "r0", "update_preimage", 4) in got and (42, "new", "insert", 4) in got


def test_stream_changes_skips_compaction_rejects_overwrite(spark, tmp_path):
    """replace (compaction) commits stream as NOTHING (dataChange=false);
    an overwrite fails the stream unless ignore_changes, exactly like the
    append source."""
    from avro_diff_spark.sources.versioned import compact_table
    from avro_diff_spark.streaming.table_source import stream_changes

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, [(1, "a")]), t)
    commit_snapshot(_df(spark, [(2, "b")]), t, mode="append")
    commit_snapshot(_df(spark, [(3, "c")]), t, mode="append")
    compact_table(spark, t, target_files=1)

    _drain(stream_changes(spark, t), "cdf_compact")
    got = [
        (r.k, r._change_type, r._commit_version)
        for r in spark.sql("SELECT * FROM cdf_compact").collect()
    ]
    assert sorted(got) == [(1, "insert", 0), (2, "insert", 1), (3, "insert", 2)]

    commit_snapshot(_df(spark, [(9, "z")]), t, mode="overwrite")
    with pytest.raises(Exception, match="ignore_changes|overwrite"):
        _drain(stream_changes(spark, t), "cdf_fail")
    _drain(stream_changes(spark, t, ignore_changes=True), "cdf_skip")
    rows = spark.sql("SELECT * FROM cdf_skip").collect()
    assert {r._commit_version for r in rows} == {0, 1, 2}


def test_stream_table_skips_compaction_commits(spark, tmp_path):
    """The append stream never replays compaction rewrites: drain,
    compact, drain again on the same checkpoint -> no duplicates."""
    from avro_diff_spark.sources.versioned import compact_table

    t, ck, out = (str(tmp_path / d) for d in ("tbl", "ck", "out"))
    commit_snapshot(_df(spark, [(1, "a")]), t)
    commit_snapshot(_df(spark, [(2, "b")]), t, mode="append")

    def drain():
        q = (
            stream_table(spark, t)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    compact_table(spark, t, target_files=1)
    commit_snapshot(_df(spark, [(3, "c")]), t, mode="append")
    drain()
    got = sorted((r.k, r.v) for r in spark.read.parquet(out).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]


def test_stream_changes_partitioned_table_pv_on_dv_rows(spark, tmp_path):
    """Change rows read at DV positions reattach the partition values the
    data file's directory encodes (they are not stored in the file)."""
    from avro_diff_spark.sources.versioned import delete_where
    from avro_diff_spark.streaming.table_source import stream_changes

    t = str(tmp_path / "p")
    df = spark.createDataFrame(
        [(1, "EU", "a"), (2, "US", "b"), (3, "EU", "c")],
        "k long, region string, v string",
    )
    commit_snapshot(df, t, partition_by=["region"])
    delete_where(spark, t, "k = 3")

    _drain(stream_changes(spark, t, starting_version=1), "cdf_pv")
    rows = spark.sql("SELECT * FROM cdf_pv").collect()
    assert [(r.k, r.region, r.v, r._change_type) for r in rows] == [
        (3, "EU", "c", "delete")
    ]


def test_maintain_agg_stream_tracks_dml_exactly_once(spark, tmp_path):
    """Streaming materialized view: the aggregate table equals a full
    recompute after every maintenance drain across append + DV delete +
    merge-on-read histories, and re-draining the same checkpoint without
    new commits publishes nothing (exactly-once via applied-version
    metadata)."""
    from avro_diff_spark.sources.versioned import (
        commit_app_meta,
        delete_where,
        latest_version,
        merge_into,
        read_version,
    )
    from avro_diff_spark.streaming.agg import maintain_agg_stream

    t, d, ck = (str(tmp_path / x) for x in ("src", "agg", "ck"))
    rows = [(i, f"g{i % 3}", i * 10) for i in range(9)]
    commit_snapshot(
        _df(spark, rows, "k long, g string, x long").repartitionByRange(2, "k"), t
    )                                                                    # v0
    commit_snapshot(
        _df(spark, [(9, "g0", 90)], "k long, g string, x long"), t, mode="append"
    )                                                                    # v1

    def drain():
        q = maintain_agg_stream(
            spark, t, d, ["g"], sum_cols=["x"], checkpoint=ck
        )
        q.awaitTermination(120)

    def recompute():
        return {
            (r.g, r.n_rows, r.x_sum)
            for r in read_version(spark, t)
            .groupBy("g")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("x").alias("x_sum"),
            )
            .collect()
        }

    def state():
        return {
            (r.g, r.n_rows, r.x_sum) for r in read_version(spark, d).collect()
        }

    drain()
    assert state() == recompute()
    assert commit_app_meta(d)["src_version"] == 1

    # no new source commits: another drain publishes nothing
    v_before = latest_version(d)
    drain()
    assert latest_version(d) == v_before

    delete_where(spark, t, "k IN (0, 3)")                                # v2 dv
    merge_into(
        spark, t,
        _df(spark, [(1, "g1", 1000), (42, "g2", 7)], "k long, g string, x long"),
        ["k"], rewrite="dv",
    )                                                                    # v3
    drain()
    assert state() == recompute()
    assert commit_app_meta(d)["src_version"] == 3


def test_maintain_digest_stream_matches_recompute_and_localizes(spark, tmp_path):
    """Live merkle fingerprint: after every drain the maintained digest
    table is BIT-IDENTICAL to bucket_digests() over the source snapshot —
    across append, DV delete, and merge-on-read histories — so replica
    comparison never rescans; and diffing the fingerprints of a mutated
    copy localizes to exactly the touched buckets."""
    from avro_diff_spark.operators import digest as dig
    from avro_diff_spark.sources.versioned import (
        commit_app_meta,
        delete_where,
        latest_version,
        merge_into,
    )
    from avro_diff_spark.streaming.agg import maintain_digest_stream

    t, d, ck = (str(tmp_path / x) for x in ("src", "dig", "ck"))
    rows = [(i, f"v{i % 5}") for i in range(40)]
    commit_snapshot(
        _df(spark, rows).repartitionByRange(2, "k"), t
    )                                                                    # v0
    commit_snapshot(_df(spark, [(100, "new")]), t, mode="append")        # v1

    def drain():
        q = maintain_digest_stream(
            spark, t, d, ["k"], num_buckets=64, checkpoint=ck
        )
        q.awaitTermination(120)

    def recompute():
        return {
            tuple(r)
            for r in dig.bucket_digests(
                read_version(spark, t), ["k"], 64
            ).collect()
        }

    def state():
        return {tuple(r) for r in read_version(spark, d).collect()}

    drain()
    assert state() == recompute()
    assert commit_app_meta(d)["src_version"] == 1

    v_before = latest_version(d)
    drain()  # nothing new: no publish
    assert latest_version(d) == v_before

    delete_where(spark, t, "k IN (3, 17)")                               # v2 dv
    merge_into(
        spark, t,
        _df(spark, [(5, "EDITED"), (200, "brand_new")]),
        ["k"], rewrite="dv",
    )                                                                    # v3
    drain()
    assert state() == recompute()
    assert commit_app_meta(d)["src_version"] == 3

    # replica comparison via stored fingerprints: identical copy -> 0
    # mismatched buckets; one edited key -> exactly that key's bucket
    src_now = read_version(spark, t)
    mutated = src_now.withColumn(
        "v", F.when(F.col("k") == 7, F.lit("DRIFTED")).otherwise(F.col("v"))
    )
    stored = read_version(spark, d)
    assert dig.compare_digests(stored, dig.bucket_digests(mutated, ["k"], 64)).count() == 1
    assert dig.compare_digests(stored, dig.bucket_digests(src_now, ["k"], 64)).count() == 0


def test_maintain_drift_stream_pinned_to_batch_and_composes(spark, tmp_path):
    """Streaming drift monitor: after every drain across append + DML
    histories the maintained histogram equals the batch bucket counts of
    the live table, tv_distance_from_counts(live, reference) equals
    tv_distance on the raw samples, replays publish nothing
    (exactly-once), and a wrong-source destination is refused."""
    import pytest as _pytest

    from avro_diff_spark.functions.drift import (
        bucketize,
        tv_distance,
        tv_distance_from_counts,
    )
    from avro_diff_spark.sources.versioned import (
        commit_app_meta,
        delete_where,
        latest_version,
        merge_into,
    )
    from avro_diff_spark.streaming.agg import maintain_drift_stream

    cuts = (10.0, 20.0, 30.0)
    t, d, ck = (str(tmp_path / x) for x in ("src", "hist", "ck"))
    rows = [(i, float(i % 40) if i % 7 else None) for i in range(30)]
    commit_snapshot(_df(spark, rows, "k long, x double"), t)            # v0
    commit_snapshot(
        _df(spark, [(100, 5.0), (101, 35.0)], "k long, x double"), t, mode="append"
    )                                                                   # v1

    def drain():
        q = maintain_drift_stream(spark, t, d, "x", cuts, checkpoint=ck)
        q.awaitTermination(120)

    def batch_counts():
        return {
            (r.bucket, r.n)
            for r in read_version(spark, t)
            .groupBy(bucketize(F.col("x"), cuts).alias("bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .collect()
        }

    def state():
        return {(r.bucket, r.n_rows) for r in read_version(spark, d).collect()}

    drain()
    assert state() == batch_counts()
    v_first = latest_version(d)

    # exactly-once: no new commits -> re-drain publishes nothing
    drain()
    assert latest_version(d) == v_first

    # DML history: delete + merge, then re-drain
    delete_where(spark, t, "k % 5 = 0")                                 # v2 dv
    merge_into(
        spark,
        t,
        _df(spark, [(3, 39.0), (200, None)], "k long, x double"),
        ["k"],
        rewrite="dv",
    )                                                                   # v3
    drain()
    assert state() == batch_counts()

    # composition: drift score from the maintained counts == raw-sample
    # score against a pinned reference window
    ref = _df(spark, [(i, float(i % 25)) for i in range(40)], "k long, x double")
    ref_counts = ref.groupBy(bucketize(F.col("x"), cuts).alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    got = tv_distance_from_counts(
        read_version(spark, d), ref_counts
    ).collect()[0]
    want = tv_distance(
        read_version(spark, t).select("x"), ref.select("x"), "x", cuts
    ).collect()[0]
    assert tuple(got) == tuple(want)

    # wrong-source refusal
    t2 = str(tmp_path / "other")
    commit_snapshot(_df(spark, [(1, 1.0)], "k long, x double"), t2)
    with _pytest.raises(Exception, match="tracks"):
        q = maintain_drift_stream(
            spark, t2, d, "x", cuts, checkpoint=str(tmp_path / "ck2")
        )
        try:
            q.awaitTermination(120)
        finally:
            q.stop()


def test_maintenance_survives_destination_compaction(spark, tmp_path):
    """A meta-less commit on the DESTINATION (compaction) between drains
    must not reset the applied version: the next micro-batch folds its
    delta into the accumulated state instead of overwriting it (the
    text-index collection-stats amnesia class, fixed by the
    _src_tracking_meta walk-back)."""
    from avro_diff_spark.functions.drift import bucketize
    from avro_diff_spark.sources.versioned import compact_table, latest_version
    from avro_diff_spark.streaming.agg import maintain_drift_stream

    cuts = (10.0, 20.0)
    t, d, ck = (str(tmp_path / x) for x in ("src", "hist", "ck"))
    commit_snapshot(
        _df(spark, [(i, float(i % 30)) for i in range(20)], "k long, x double"), t
    )

    def drain():
        q = maintain_drift_stream(spark, t, d, "x", cuts, checkpoint=ck)
        q.awaitTermination(120)

    def batch_counts():
        return {
            (r.bucket, r.n)
            for r in read_version(spark, t)
            .groupBy(bucketize(F.col("x"), cuts).alias("bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .collect()
        }

    drain()
    # destination compaction: a commit with NO app_meta
    compact_table(spark, d)
    assert latest_version(d) >= 1
    # new source commit, re-drain: state must fold, not reset
    commit_snapshot(
        _df(spark, [(100 + i, 25.0) for i in range(5)], "k long, x double"),
        t,
        mode="append",
    )
    drain()
    got = {(r.bucket, r.n_rows) for r in read_version(spark, d).collect()}
    assert got == batch_counts()
