"""Structured Streaming equivalence + watermark semantics tests.

Strategy: feed the driver's events testdata through file-source streams with
Trigger.AvailableNow and pin the results to the batch twins. The
append-mode watermark test replays in two runs sharing a checkpoint — run 2
advances the watermark past run 1's data, which finalizes and emits run 1's
windows: the actual late-data contract, tested deterministically.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avro_diff_spark.streaming import (
    hourly_counts_stream,
    read_event_stream,
    running_user_totals,
    sessionize_stream,
)


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    # load_events handles the testdata's TIMESTAMP(NANOS) quirk; re-emit ts
    # as a proper micros timestamp so Spark's own parquet writer produces
    # the stream-source files (the shape a live ingest dir would have).
    from avro_diff_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).cache()


@pytest.fixture(scope="module")
def events_dir(events_batch, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_stream") / "in")
    events_batch.write.parquet(d)
    return d


def _run_to_memory(df, name, mode, tmp_path):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_hourly_stream_matches_batch(spark, events_batch, events_dir, tmp_path):
    stream = hourly_counts_stream(read_event_stream(spark, events_dir))
    _run_to_memory(stream, "hourly", "complete", tmp_path)
    got = {
        (r["window_start_us"], r["event_type"]): (r["n_events"], round(r["sum_value"], 4))
        for r in spark.table("hourly").collect()
    }
    hour_us = 3_600_000_000
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    want = {
        (r["w"], r["event_type"]): (r["n"], round(r["s"], 4))
        for r in events_batch.groupBy(
            (us - us % hour_us).alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want


def test_sessionize_stream_matches_batch_session_window(
    spark, events_batch, events_dir, tmp_path
):
    # session-window streaming aggs support complete/append, not update
    stream = sessionize_stream(read_event_stream(spark, events_dir), gap_minutes=30)
    _run_to_memory(stream, "sessions", "complete", tmp_path)
    got = {
        (r["user_id"], r["session_start_us"]): r["n_events"]
        for r in spark.table("sessions").collect()
    }
    ts = F.col("ts").cast("timestamp")
    want = {
        (r["user_id"], r["w"]): r["n"]
        for r in events_batch.withColumn("ts", ts)
        .groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_micros(F.col("win.start")).alias("w"), "user_id", "n")
        .collect()
    }
    assert got == want


def test_running_user_totals_stateful(spark, events_batch, events_dir, tmp_path):
    stream = running_user_totals(read_event_stream(spark, events_dir))
    _run_to_memory(stream, "totals", "update", tmp_path)
    # AvailableNow may split into several micro-batches, re-emitting a user's
    # row per batch; the LAST emission per user must equal the batch totals.
    got = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 4))
        for r in spark.table("totals").collect()  # memory sink appends updates in order
    }
    want = {
        r["user_id"]: (r["n"], round(r["s"], 4))
        for r in events_batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want


def test_streaming_dedup_matches_batch_fingerprints(spark, sf_dir, tmp_path):
    """Streaming first-seen dedup must keep exactly the batch survivor
    fingerprint set (survivor IDENTITY legitimately differs: min-id in
    batch vs arrival order in a stream)."""
    from avro_diff_spark.functions.text import fingerprint_md5
    from avro_diff_spark.operators.dedup import exact_dedup
    from avro_diff_spark.snapshots import documents_with_dups
    from avro_diff_spark.streaming import dedup_stream

    corpus = documents_with_dups(spark, sf_dir)
    src = str(tmp_path / "docs_in")
    corpus.write.parquet(src)
    stream = spark.readStream.schema(corpus.schema).parquet(src)
    _run_to_memory(dedup_stream(stream), "dedup", "append", tmp_path)
    got = spark.table("dedup")
    batch = exact_dedup(corpus, "text", "doc_id")
    assert got.count() == batch.count()
    gf = {r["fingerprint"] for r in got.select("fingerprint").collect()}
    bf = {
        r["fp"]
        for r in batch.select(fingerprint_md5(F.col("text")).alias("fp")).collect()
    }
    assert gf == bf


def test_append_mode_watermark_finalizes_old_windows(spark, events_batch, tmp_path):
    """Two AvailableNow runs over a shared checkpoint: run 2's new data
    advances the watermark, finalizing (emitting) run 1's closed windows."""
    src = str(tmp_path / "wm_in")
    sink = str(tmp_path / "wm_out")
    ckpt = str(tmp_path / "wm_ckpt")
    cutoff = events_batch.select(
        F.min(F.col("ts").cast("timestamp")).alias("m")
    ).first()["m"]
    early = events_batch.filter(
        F.col("ts").cast("timestamp") < F.lit(cutoff) + F.expr("INTERVAL 6 HOURS")
    )
    late = events_batch.filter(
        F.col("ts").cast("timestamp") >= F.lit(cutoff) + F.expr("INTERVAL 48 HOURS")
    )
    assert early.count() > 0 and late.count() > 0

    def run_once():
        q = (
            hourly_counts_stream(read_event_stream(spark, src), watermark="2 hours")
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    early.write.mode("overwrite").parquet(src)
    run_once()
    # run 1: watermark starts at 0 → nothing finalized yet
    n_after_run1 = spark.read.schema(
        "window_start_us long, event_type string, n_events long, sum_value double"
    ).parquet(sink).count()

    late.write.mode("append").parquet(src)
    run_once()
    emitted = spark.read.parquet(sink)
    n_after_run2 = emitted.count()
    assert n_after_run2 > n_after_run1, "advancing watermark must finalize windows"

    # every finalized early window must match the batch aggregation exactly
    hour_us = 3_600_000_000
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    want = {
        (r["w"], r["event_type"]): r["n"]
        for r in early.groupBy((us - us % hour_us).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in emitted.collect():
        key = (r["window_start_us"], r["event_type"])
        if key in want:  # late-run windows may still be open; early ones must agree
            assert r["n_events"] == want[key]


def test_contamination_stream_matches_batch(spark, sf_dir, tmp_path):
    """Stream-static decontamination flags exactly the docs the batch
    operator flags, with identical shared-gram counts — and stays
    stateless (append mode, no watermark)."""
    from avro_diff_spark.operators.dedup import contamination_check
    from avro_diff_spark.snapshots import documents_with_dups
    from avro_diff_spark.streaming import contamination_stream

    corpus = documents_with_dups(spark, sf_dir)
    bench = corpus.filter(F.col("doc_id") % 97 == 0)
    rest = corpus.filter(F.col("doc_id") % 97 != 0)

    src = str(tmp_path / "contam_in")
    rest.write.parquet(src)
    stream = spark.readStream.schema(rest.schema).parquet(src)
    _run_to_memory(
        contamination_stream(stream, bench), "contam", "append", tmp_path
    )
    got = {
        (r.doc_id, r.n_contaminated_grams) for r in spark.table("contam").collect()
    }
    want = {
        (r.doc_id, r.n_contaminated_grams)
        for r in contamination_check(rest, bench, "text", "doc_id").collect()
    }
    assert got == want and got


def test_key_diff_stream_matches_batch_classification(spark, sf_dir, tmp_path):
    """Arriving rows classify exactly as the batch key_diff classifies them
    (added/changed/unchanged with identical dot-path changed_fields);
    'removed' is structurally absent from a stream (documented)."""
    from avro_diff_spark import key_diff
    from avro_diff_spark.snapshots import orders_new, orders_old
    from avro_diff_spark.streaming import key_diff_stream

    baseline = orders_old(spark, sf_dir)
    arriving = orders_new(spark, sf_dir)

    src = str(tmp_path / "orders_in")
    arriving.write.parquet(src)
    stream = spark.readStream.schema(arriving.schema).parquet(src)
    _run_to_memory(
        key_diff_stream(stream, baseline, ["o_orderkey"]), "kds", "append", tmp_path
    )
    got = {
        (r.o_orderkey, r.diff_kind, tuple(r.changed_fields or []))
        for r in spark.table("kds").collect()
    }
    batch = key_diff(baseline, arriving, ["o_orderkey"], include_payload=False)
    want = {
        (r.o_orderkey, r.diff_kind, tuple(r.changed_fields or []))
        for r in batch.filter(F.col("diff_kind") != "removed").collect()
    }
    assert got == want and got


def test_key_diff_stream_tombstones_match_batch(spark, sf_dir, tmp_path):
    """A tombstone-bearing replay of a closed snapshot pair classifies
    identically to the batch diff of the same pair — the CDC contract:
    replay = every row of the new snapshot (upserts) + one tombstone per
    key that disappeared, and the per-kind (key, kind) sets must be equal,
    including 'removed'. Tombstones for never-seen keys must drop."""
    from avro_diff_spark import key_diff
    from avro_diff_spark.snapshots import orders_new, orders_old
    from avro_diff_spark.streaming import key_diff_stream

    baseline = orders_old(spark, sf_dir)
    new = orders_new(spark, sf_dir)

    # replay: upserts carry the tombstone flag false; deletions arrive as
    # key-only tombstone rows (payload nulls); plus no-op deletes for keys
    # neither snapshot has (max key + offset), which must vanish.
    upserts = new.withColumn("__deleted", F.lit(False))
    gone = (
        baseline.join(new.select("o_orderkey"), "o_orderkey", "left_anti")
        .select("o_orderkey")
        .withColumn("__deleted", F.lit(True))
    )
    max_key = baseline.agg(F.max("o_orderkey")).first()[0]
    noop = spark.range(max_key + 1, max_key + 40).select(
        F.col("id").alias("o_orderkey"), F.lit(True).alias("__deleted")
    )
    for c in new.columns:
        if c != "o_orderkey":
            gone = gone.withColumn(c, F.lit(None).cast(dict(new.dtypes)[c]))
            noop = noop.withColumn(c, F.lit(None).cast(dict(new.dtypes)[c]))
    replay = upserts.unionByName(gone.select(upserts.columns)).unionByName(
        noop.select(upserts.columns)
    )

    src = str(tmp_path / "replay_in")
    replay.write.parquet(src)
    stream = spark.readStream.schema(replay.schema).parquet(src)
    _run_to_memory(
        key_diff_stream(stream, baseline, ["o_orderkey"], tombstone_col="__deleted"),
        "kds_tomb",
        "append",
        tmp_path,
    )
    got = {
        (r.o_orderkey, r.diff_kind) for r in spark.table("kds_tomb").collect()
    }
    batch = key_diff(baseline, new, ["o_orderkey"], include_payload=False)
    want = {(r.o_orderkey, r.diff_kind) for r in batch.collect()}
    assert got == want and got
    # the tombstone flag never leaks into the output payload struct
    assert "__deleted" not in spark.table("kds_tomb").schema["new"].dataType.names
    kinds = {k for _, k in got}
    assert "removed" in kinds and "added" in kinds and "changed" in kinds


def test_key_diff_stream_dedupe_baseline(spark, tmp_path):
    """A duplicated baseline key emits each arrival once per duplicate by
    default (the documented hazard); dedupe_baseline=True restores the
    one-row-per-arrival contract."""
    from avro_diff_spark.streaming import key_diff_stream

    baseline = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "k int, v string"
    )
    arrivals = spark.createDataFrame([(1, "a"), (2, "x")], "k int, v string")
    src = str(tmp_path / "dup_in")
    arrivals.write.parquet(src)

    stream = spark.readStream.schema(arrivals.schema).parquet(src)
    _run_to_memory(
        key_diff_stream(stream, baseline, ["k"]), "kds_dup", "append", tmp_path
    )
    assert spark.table("kds_dup").count() == 3  # key 1 doubled: the hazard

    stream2 = spark.readStream.schema(arrivals.schema).parquet(src)
    _run_to_memory(
        key_diff_stream(stream2, baseline, ["k"], dedupe_baseline=True),
        "kds_dedup",
        "append",
        tmp_path,
    )
    rows = {(r.k, r.diff_kind) for r in spark.table("kds_dedup").collect()}
    assert rows == {("1", "unchanged"), ("2", "changed")}


def test_contamination_stream_id_col_aliases_to_doc_id(spark, sf_dir, tmp_path):
    """Output id column is doc_id even when the input id column is not —
    matching the batch twin's contract (round-4 ADVICE)."""
    from avro_diff_spark.snapshots import documents_with_dups
    from avro_diff_spark.streaming import contamination_stream

    corpus = documents_with_dups(spark, sf_dir)
    bench = corpus.filter(F.col("doc_id") % 97 == 0)
    rest = corpus.filter(F.col("doc_id") % 97 != 0).withColumnRenamed(
        "doc_id", "document_id"
    )
    src = str(tmp_path / "contam_alias_in")
    rest.write.parquet(src)
    stream = spark.readStream.schema(rest.schema).parquet(src)
    _run_to_memory(
        contamination_stream(stream, bench, id_col="document_id"),
        "contam_alias",
        "append",
        tmp_path,
    )
    out = spark.table("contam_alias")
    assert out.columns == ["doc_id", "n_contaminated_grams"]
    assert out.count() > 0

# ---------------------------------------------------------------------------
# transformWithStateInPandas sessionization
# ---------------------------------------------------------------------------


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class _FakeHandle:
    def __init__(self):
        self.state = _FakeValueState()
        self.timers = set()

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.state

    def listTimers(self):
        return iter(sorted(self.timers))

    def deleteTimer(self, ms):
        self.timers.discard(ms)

    def registerTimer(self, ms):
        self.timers.add(ms)


class _FakeExpiredTimer:
    def __init__(self, ms):
        self._ms = ms

    def getExpiryTimeInMs(self):
        return self._ms


def _drive_session_processor(batches, gap_minutes=30, close_at_end=True):
    """Unit-drive the StatefulProcessor exactly the way the TWS runtime
    would: per micro-batch handleInputRows, then fire any timer whose
    expiry the (simulated) watermark passed; optionally a final no-data
    batch that fires remaining timers."""
    import pandas as pd

    from avro_diff_spark.streaming.events import make_session_processor

    proc = make_session_processor(gap_minutes)
    handle = _FakeHandle()
    proc.init(handle)
    out = []
    wm_ms = 0
    for batch in batches:
        pdf = pd.DataFrame({"ts_us": batch})
        out.extend(
            r for df in proc.handleInputRows((7,), iter([pdf]), None)
            for r in df.itertuples(index=False)
        )
        wm_ms = max(wm_ms, max(batch) // 1000 - 1000)  # watermark delay 1s
        for t in sorted(handle.timers):
            if t <= wm_ms:
                handle.timers.discard(t)
                out.extend(
                    r for df in proc.handleExpiredTimer((7,), None, _FakeExpiredTimer(t))
                    for r in df.itertuples(index=False)
                )
    if close_at_end:
        for t in sorted(handle.timers):
            handle.timers.discard(t)
            out.extend(
                r for df in proc.handleExpiredTimer((7,), None, _FakeExpiredTimer(t))
                for r in df.itertuples(index=False)
            )
    return [(r.session_start_us, r.session_end_us, r.n_events) for r in out]


def test_tws_session_processor_semantics():
    """Gap splits match the batch formulation (strict >gap), sessions span
    micro-batches, each closed session is emitted exactly once, and the
    final timer closes the tail session."""
    m = 60_000_000  # one minute in us
    # user timeline: [0, 10m, 20m] .. gap .. [60m, 65m] .. gap .. [120m]
    batches = [
        [0, 10 * m],
        [20 * m, 60 * m, 65 * m],   # 60m is exactly 40m after 20m: > 30m gap
        [120 * m],
    ]
    got = _drive_session_processor(batches, gap_minutes=30)
    assert got == [
        (0, 20 * m, 3),
        (60 * m, 65 * m, 2),
        (120 * m, 120 * m, 1),
    ]


def test_tws_session_processor_boundary_is_strict():
    """An event exactly gap after the last does NOT open a new session —
    identical to analytics.sessionize's strict > comparison."""
    m = 60_000_000
    got = _drive_session_processor([[0, 30 * m, 60 * m + 1]], gap_minutes=30)
    # 30m after 0: same session; 30m+1us after that: strictly greater -> split
    assert got == [(0, 30 * m, 2), (60 * m + 1, 60 * m + 1, 1)]


def test_tws_session_processor_open_session_not_emitted():
    """Without the closing timer, an open tail session stays in state —
    append-only output never emits a session twice or early."""
    m = 60_000_000
    got = _drive_session_processor([[0, 5 * m]], gap_minutes=30, close_at_end=False)
    assert got == []


def _has_protobuf():
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState's JVM<->Python state server needs protobuf "
    "(not shipped in this container); the processor logic is unit-pinned above",
)
def test_sessionize_tws_end_to_end(spark, events_batch, tmp_path):
    from avro_diff_spark.streaming.events import sessionize_stream_tws

    src = str(tmp_path / "in")
    events_batch.write.parquet(src)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    stream = spark.readStream.schema(events_batch.schema).parquet(src)
    _run_to_memory(
        sessionize_stream_tws(stream, gap_minutes=30), "tws_e2e", "append", tmp_path
    )
    assert spark.table("tws_e2e").count() >= 0


def test_near_dedup_stream_matches_batch_banding(spark, sf_dir, tmp_path):
    """The streaming LSH bucket-collision events must reproduce the batch
    banding exactly: same (bucket -> member set) relation, one founder per
    bucket, and the candidate-document set (docs colliding with an
    earlier doc) equal to the batch LSH candidate set."""
    from avro_diff_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from avro_diff_spark.snapshots import documents_with_dups
    from avro_diff_spark.streaming import near_dedup_stream

    corpus = documents_with_dups(spark, sf_dir)
    src = str(tmp_path / "nd_in")
    corpus.write.parquet(src)
    stream = spark.readStream.schema(corpus.schema).parquet(src)
    _run_to_memory(near_dedup_stream(stream), "near_dedup", "append", tmp_path)
    got = spark.table("near_dedup").collect()

    # one founder per bucket, and the founder is a member of the bucket
    buckets: dict = {}
    for r in got:
        buckets.setdefault((r.band_id, r.band_key), []).append(r)
    for rows in buckets.values():
        firsts = {r.first_doc_id for r in rows}
        assert len(firsts) == 1
        founders = [r for r in rows if r.is_first]
        assert len(founders) == 1 and founders[0].doc_id in firsts

    # candidate set == batch LSH candidate set (pairs flattened to docs
    # that collide with a smaller-id doc; streaming founder is min-id here
    # because the replay is one micro-batch)
    stream_cands = {
        r.doc_id for r in got if not r.is_first and r.first_doc_id != r.doc_id
    }
    sigs = minhash_signatures(corpus, "text", "doc_id")
    pairs = lsh_candidate_pairs(sigs, bands=8, rows_per_band=4)
    batch_cands = {r.doc_b for r in pairs.collect()}
    assert stream_cands == batch_cands


def test_near_dedup_stream_state_across_batches(spark, sf_dir, tmp_path):
    """A second AvailableNow run over the same checkpoint sees the first
    run's buckets: re-sent documents collide with persisted state instead
    of founding new buckets."""
    from avro_diff_spark.snapshots import documents_with_dups
    from avro_diff_spark.streaming import near_dedup_stream

    corpus = documents_with_dups(spark, sf_dir).limit(40).cache()
    src = str(tmp_path / "nd2_in")
    sink = str(tmp_path / "nd2_out")
    ckpt = str(tmp_path / "nd2_ckpt")

    def run_once():
        stream = spark.readStream.schema(corpus.schema).parquet(src)
        q = (
            near_dedup_stream(stream)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    corpus.write.mode("overwrite").parquet(src)
    run_once()
    first = spark.read.parquet(sink)
    n_buckets = first.filter("is_first").count()
    assert n_buckets > 0

    # replay the same docs with shifted ids: every band key already has
    # state, so NO new founders may appear
    shifted = corpus.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    shifted.write.mode("append").parquet(src)
    run_once()
    out = spark.read.parquet(sink)
    assert out.filter("is_first").count() == n_buckets
    replay = out.filter(F.col("doc_id") >= 1_000_000)
    assert replay.count() > 0
    assert replay.filter("is_first").count() == 0
    assert replay.filter(F.col("first_doc_id") >= 1_000_000).count() == 0


def test_read_avro_stream_matches_batch_and_tracks_files(spark, tmp_path):
    """Streaming Avro ingest: decoded rows equal the batch read, schema
    resolution applies per arriving file, and the checkpoint ensures a
    restart decodes only files that landed since."""
    from avro_diff_spark.sources import ocf
    from avro_diff_spark.sources.avro import read_avro, read_avro_stream

    writer_v1 = {
        "type": "record",
        "name": "topLevelRecord",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "qty", "type": "int"},
            {"name": "old_name", "type": "string"},
        ],
    }
    reader = {
        "type": "record",
        "name": "topLevelRecord",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "qty", "type": "long"},  # int -> long promotion
            {"name": "name", "type": "string", "aliases": ["old_name"]},
            {"name": "tag", "type": "string", "default": "none"},
        ],
    }
    src = str(tmp_path / "avro_in")
    sink = str(tmp_path / "avro_out")
    ckpt = str(tmp_path / "avro_ckpt")
    import os

    os.makedirs(src)
    rows1 = [{"id": i, "qty": i % 7, "old_name": f"n{i}"} for i in range(100)]
    ocf.write_ocf(f"{src}/a.avro", writer_v1, rows1, codec="deflate")

    def run_once():
        q = (
            read_avro_stream(spark, src, avro_schema=reader)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got = spark.read.parquet(sink)
    assert got.count() == 100
    assert [f.name for f in got.schema.fields] == ["id", "qty", "name", "tag"]
    r7 = got.filter("id = 7").first()
    assert r7.qty == 0 and r7.name == "n7" and r7.tag == "none"
    # matches the batch read under the same reader schema
    batch = read_avro(spark, f"{src}/a.avro", avro_schema=reader)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))

    # a second file lands, written under an EVOLVED writer (v2 == reader
    # shape, snappy): the restarted query decodes only the new file
    rows2 = [
        {"id": 1000 + i, "qty": i, "name": f"m{i}", "tag": "v2"} for i in range(50)
    ]
    ocf.write_ocf(f"{src}/b.avro", reader, rows2, codec="snappy")
    run_once()
    got2 = spark.read.parquet(sink)
    assert got2.count() == 150
    assert got2.filter("tag = 'v2'").count() == 50


def test_read_avro_stream_empty_dir_raises_clear_error(spark, tmp_path):
    """Defining a stream over a not-yet-populated directory without an
    explicit schema must fail with the contract spelled out, not an
    IndexError from the schema probe (round-5 ADVICE)."""
    import pytest as _pytest

    from avro_diff_spark.sources.avro import read_avro_stream

    with _pytest.raises(ValueError, match="avro_schema"):
        read_avro_stream(spark, str(tmp_path))


def test_stateless_text_tier_is_stream_ready(spark, tmp_path):
    """The stateless text operators (C4 cleaning, quality scoring,
    stopword lang-ID) are pure Column expressions, so they apply to a
    STREAMING frame unchanged — pinned by running the identical
    expressions over a file-source stream and the same data as a batch,
    row for row. This is the claim that the whole filter tier drops into
    a readStream pipeline without a rewrite."""
    from pyspark.sql import functions as F

    from avro_diff_spark.functions.text import c4_line_filter, lang_id, quality_score

    rows = [
        (1, "A good sentence ends here.\nAnother fine line stands alone!\nshort."),
        (2, "lorem ipsum dolor sit amet.\ntwo good lines follow here.\nthird decent line here."),
        (3, "the quick brown fox jumps over the lazy dog and that is that."),
        (4, "der schnelle braune fuchs springt und das ist auch schon alles hier."),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)

    def apply(df):
        # quality/lang ride the input projection; the C4 page verdict is
        # computed on the raw frame and stitched by position-free doc_id
        # (c4_line_filter projects its own fixed columns)
        scored = df.select(
            "doc_id",
            quality_score(F.col("text")).alias("quality"),
            lang_id(F.col("text")).alias("lang_pred"),
        )
        cleaned = c4_line_filter(df).select("doc_id", "page_kept", "clean_text")
        return scored, cleaned

    b_scored, b_cleaned = apply(spark.read.parquet(src))
    batch_s = {r.doc_id: r for r in b_scored.collect()}
    batch_c = {r.doc_id: r for r in b_cleaned.collect()}

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    s_scored, s_cleaned = apply(stream)
    for name, sdf in (("tier_scored", s_scored), ("tier_cleaned", s_cleaned)):
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got_s = {r.doc_id: r for r in spark.sql("SELECT * FROM tier_scored").collect()}
    got_c = {r.doc_id: r for r in spark.sql("SELECT * FROM tier_cleaned").collect()}
    assert got_s == batch_s and got_c == batch_c and len(batch_s) == 4
    assert batch_s[4].lang_pred == "de" and batch_s[3].lang_pred == "en"


def test_sliding_stream_matches_batch(spark, events_batch, events_dir, tmp_path):
    """Hopping 1h/15min windows: the streaming window() aggregation must
    equal the batch explicit-explode formulation (analytics.events_sliding)
    window-for-window."""
    from avro_diff_spark.streaming.events import sliding_counts_stream

    stream = sliding_counts_stream(read_event_stream(spark, events_dir))
    _run_to_memory(stream, "sliding", "complete", tmp_path)
    got = {
        (r["window_start_us"], r["event_type"]): (r["n_events"], round(r["sum_value"], 4))
        for r in spark.table("sliding").collect()
    }
    slide_us, win_us = 900_000_000, 3_600_000_000
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    base = us - us % slide_us
    k = F.explode(F.sequence(F.lit(0), F.lit(win_us // slide_us - 1)))
    want = {
        (r["w"], r["event_type"]): (r["n"], round(r["s"], 4))
        for r in events_batch.select(
            "event_type", "value", base.alias("b"), k.alias("k")
        )
        .select(
            "event_type",
            "value",
            (F.col("b") - F.col("k").cast("long") * F.lit(slide_us)).alias("w"),
        )
        .groupBy("w", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want


def test_attribution_join_stream_matches_batch(spark, events_batch, events_dir, tmp_path):
    """Stream-stream event-time join == the same join on bounded frames:
    every same-user (click, purchase) pair with the purchase inside the
    1h horizon, both sides arriving as streams."""
    from avro_diff_spark.streaming.events import (
        attribution_join_stream,
        read_event_stream,
    )

    s = read_event_stream(spark, events_dir)
    out = attribution_join_stream(
        s.where(F.col("event_type") == "click"),
        s.where(F.col("event_type") == "purchase"),
        horizon_minutes=60,
    )
    _run_to_memory(out, "attr_join", "append", tmp_path)
    got = {tuple(r) for r in spark.sql("SELECT * FROM attr_join").collect()}

    c = events_batch.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = events_batch.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    want = {
        tuple(r)
        for r in c.join(
            p,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 60 MINUTES")),
        )
        .select(
            F.col("c_user").alias("user_id"),
            "click_id",
            "purchase_id",
            F.unix_micros(F.col("click_ts")).alias("click_ts_us"),
            F.unix_micros(F.col("purchase_ts")).alias("purchase_ts_us"),
            "purchase_value",
        )
        .collect()
    }
    assert got == want
    assert len(got) > 0


def test_sliding_floor_semantics_match_spark_window_pre_1970(spark, tmp_path):
    """Negative-epoch events bucket by FLOOR (Spark's window() behavior),
    not truncate-toward-zero — the batch lowering and the engine's own
    sliding window agree on the full int64 domain."""
    from avro_diff_spark.analytics import _WIN_US, _SLIDE_US, events_sliding

    d = str(tmp_path / "events.parquet")
    rows = [
        (1, "1969-12-31 23:59:00", 1, "click", 1.0, None),   # negative epoch
        (2, "1970-01-01 00:10:00", 1, "click", 1.0, None),
        (3, "1969-06-15 07:33:20", 2, "view", 2.0, None),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    ev.write.parquet(d)
    got = {
        (r["window_start_us"], r["event_type"], r["n_events"])
        for r in events_sliding(spark, str(tmp_path)).collect()
    }
    want = {
        (F_row["window_start_us"], F_row["event_type"], F_row["n_events"])
        for F_row in ev.select(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .groupBy("w", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
        )
        .collect()
    }
    assert got == want
    # and the floor really floors: the 23:59 event's earliest window
    assert any(ws < -3_600_000_000 + _SLIDE_US and ws <= -_WIN_US + _SLIDE_US for ws, _, _ in got)
