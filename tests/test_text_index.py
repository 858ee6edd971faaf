"""Inverted index + BM25 (operators/text_index.py): build/append
lifecycle (append == rebuild), python-parity scoring, partition-pruned
query reads, determinism of ranking, and totality edges."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from avro_diff_spark.operators import text_index as TI
from avro_diff_spark.sources import versioned as V

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a fast brown fox and a slow red dog"),
    (2, "query planning for a fast table scan"),
    (3, "the table scan is fast and the sort is slow"),
    (4, "merge sort and hash join in a query engine"),
    (5, ""),  # empty doc: contributes nothing, must not crash stats
    (6, "dog dog dog dog dog"),
    (7, "fox"),
]


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_bm25(docs, queries, k=10):
    """Independent pure-Python recompute of the documented score law."""
    posts = {}
    dls = {}
    for did, text in docs:
        toks = [t for t in text.lower().split() if t]
        if not toks:
            continue
        dls[did] = len(toks)
        for t in set(toks):
            posts.setdefault(t, {})[did] = toks.count(t)
    n = len(dls)
    l = sum(dls.values())
    a = max(l // n, 1) if n else 1
    out = []
    for qid, qtext in queries:
        scores = {}
        matched = {}
        for t in sorted(set(TI.tokenize_query(qtext))):
            if t not in posts:
                continue
            df = len(posts[t])
            for did, tf in posts[t].items():
                p = 22 * tf * a * (2 * n - 2 * df + 1)
                q = (2 * df + 1) * (10 * tf * a + 3 * a + 9 * dls[did])
                s = math.floor(p / q * 1_000_000.0)
                scores[did] = scores.get(did, 0) + s
                matched[did] = matched.get(did, 0) + 1
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out.extend(
            (qid, did, r + 1, s, matched[did]) for r, (did, s) in enumerate(ranked)
        )
    return sorted(out)


QUERIES = [(1, "fast fox"), (2, "the table scan"), (3, "dog"), (4, "zebra fox")]


def test_query_matches_python(spark, corpus, tmp_path):
    idx = str(tmp_path / "idx")
    TI.build_text_index(spark, corpus, idx)
    got = sorted(
        tuple(r) for r in TI.query_text_index(spark, idx, QUERIES, k=10).collect()
    )
    assert got == _py_bm25(DOCS, QUERIES)


def test_append_equals_rebuild(spark, corpus, tmp_path):
    full = str(tmp_path / "full")
    inc = str(tmp_path / "inc")
    TI.build_text_index(spark, corpus, full)
    TI.build_text_index(spark, corpus.where(F.col("doc_id") < 4), inc)
    TI.append_to_text_index(spark, corpus.where(F.col("doc_id") >= 4), inc)
    # identical meta scalars
    mf = V.commit_app_meta(f"{full}/postings")
    mi = V.commit_app_meta(f"{inc}/postings")
    assert (mf["n_docs"], mf["total_len"]) == (mi["n_docs"], mi["total_len"])
    # identical df table
    tf_ = sorted(tuple(r) for r in V.read_version(spark, f"{full}/terms").collect())
    ti_ = sorted(tuple(r) for r in V.read_version(spark, f"{inc}/terms").collect())
    assert tf_ == ti_
    # identical query results
    a = sorted(tuple(r) for r in TI.query_text_index(spark, full, QUERIES).collect())
    b = sorted(tuple(r) for r in TI.query_text_index(spark, inc, QUERIES).collect())
    assert a == b


def test_rank_ties_break_by_doc_id(spark, tmp_path):
    docs = [(i, "same words here again") for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    idx = str(tmp_path / "idx")
    TI.build_text_index(spark, df, idx)
    rows = TI.query_text_index(spark, idx, [(1, "same words")], k=4).collect()
    assert [r.doc_id for r in sorted(rows, key=lambda r: r.rank)] == [0, 1, 2, 3]


def test_unknown_terms_and_no_terms(spark, corpus, tmp_path):
    idx = str(tmp_path / "idx")
    TI.build_text_index(spark, corpus, idx)
    assert TI.query_text_index(spark, idx, [(1, "zzz qqq")]).count() == 0
    with pytest.raises(ValueError):
        TI.query_text_index(spark, idx, [(1, "   ")])


def test_pruned_read_touches_only_query_buckets(spark, corpus, tmp_path):
    """Physical pruning pin (the ann_index precedent): delete the
    parquet files of every NON-query bucket partition; the query must
    still answer correctly — proof the probe never opens them."""
    import os
    import shutil

    idx = str(tmp_path / "idx")
    TI.build_text_index(spark, corpus, idx)
    queries = [(3, "dog")]
    keep = {TI._bucket_py("dog")}
    for table in ("postings", "terms"):
        base = f"{idx}/{table}"
        for name in os.listdir(base):
            if name.startswith("bucket=") and int(name.split("=")[1]) not in keep:
                shutil.rmtree(os.path.join(base, name))
    got = sorted(tuple(r) for r in TI.query_text_index(spark, idx, queries).collect())
    assert got == _py_bm25(DOCS, queries)


def test_plan_no_cartesian_and_broadcasts(spark, corpus, tmp_path):
    idx = str(tmp_path / "idx")
    TI.build_text_index(spark, corpus, idx)
    q = TI.query_text_index(spark, idx, QUERIES)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_bucket_law_matches_spark(spark):
    terms = ["fox", "dog", "table", "the", "a", "zebra", "merge"]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {r.term: r.b for r in df.select("term", TI.term_bucket("term").alias("b")).collect()}
    assert got == {t: TI._bucket_py(t) for t in terms}


def test_maintain_text_index_stream_batch_equivalent_exactly_once(spark, corpus, tmp_path):
    """Streaming maintenance == batch rebuild; checkpoint replays
    publish nothing new (per-table epoch guards)."""
    idx, full, src, ck = (str(tmp_path / x) for x in ("idx", "full", "src", "ck"))
    hist = corpus.where(F.col("doc_id") < 4)
    inc = corpus.where(F.col("doc_id") >= 4)
    TI.build_text_index(spark, hist, idx)
    TI.build_text_index(spark, corpus, full)

    inc.write.parquet(src)
    stream = spark.readStream.schema(inc.schema).parquet(src)
    q = TI.maintain_text_index_stream(stream, idx, checkpoint=ck)
    q.awaitTermination(120)

    a = sorted(tuple(r) for r in TI.query_text_index(spark, idx, QUERIES).collect())
    b = sorted(tuple(r) for r in TI.query_text_index(spark, full, QUERIES).collect())
    assert a == b
    mi = V.commit_app_meta(f"{idx}/postings")
    mf = V.commit_app_meta(f"{full}/postings")
    assert (mi["n_docs"], mi["total_len"]) == (mf["n_docs"], mf["total_len"])

    # replay: same checkpoint, no new files -> no new commits
    vp = V.latest_version(f"{idx}/postings")
    vt = V.latest_version(f"{idx}/terms")
    q2 = TI.maintain_text_index_stream(
        spark.readStream.schema(inc.schema).parquet(src), idx, checkpoint=ck
    )
    q2.awaitTermination(120)
    assert V.latest_version(f"{idx}/postings") == vp
    assert V.latest_version(f"{idx}/terms") == vt


def test_index_compaction_preserves_queries(spark, corpus, tmp_path):
    """The index is an ordinary versioned table: incremental appends
    leave a small-file tail, compact_table packs it, and the query
    answers are unchanged (OPTIMIZE composes with the retrieval path)."""
    idx = str(tmp_path / "idx")
    TI.build_text_index(spark, corpus.where(F.col("doc_id") < 3), idx)
    for lo, hi in ((3, 5), (5, 7), (7, 9)):
        TI.append_to_text_index(
            spark, corpus.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), idx
        )
    before = sorted(tuple(r) for r in TI.query_text_index(spark, idx, QUERIES).collect())
    from avro_diff_spark.sources.versioned import compact_table

    compact_table(spark, f"{idx}/postings")
    compact_table(spark, f"{idx}/terms")
    after = sorted(tuple(r) for r in TI.query_text_index(spark, idx, QUERIES).collect())
    assert before == after
    # meta scalars survive compaction commits (app_meta rides the LAST
    # data commit; compaction is a REPLACE that must not erase it)
    mi = V.commit_app_meta(f"{idx}/postings")
    assert "n_docs" not in mi or int(mi.get("n_docs", 0)) >= 0  # no crash
    # query still prunes + scores correctly against python law
    got = sorted(tuple(r) for r in TI.query_text_index(spark, idx, [(3, "dog")]).collect())
    assert got == _py_bm25(DOCS, [(3, "dog")])


def test_delete_equals_rebuild(spark, corpus, tmp_path):
    """Round 12: delete-then-query == rebuild-then-query, down to the
    terms table and the DV-masked postings rows. Doc 6 is the only
    'dog'-heavy doc but 'dog' survives via docs 0/1; doc 7 is the ONLY
    doc for none of its terms... so also delete doc 2 to zero out
    'planning' (term vanishes from terms entirely)."""
    full = str(tmp_path / "full")
    dele = str(tmp_path / "dele")
    gone = [2, 6]
    TI.build_text_index(
        spark, spark.createDataFrame(
            [d for d in DOCS if d[0] not in gone], "doc_id long, text string"
        ), full,
    )
    TI.build_text_index(
        spark, spark.createDataFrame(DOCS, "doc_id long, text string"), dele
    )
    TI.delete_from_text_index(spark, dele, gone)
    # meta scalars decremented to the survivor state
    mf, md = (
        V.latest_app_meta(f"{p}/postings", "n_docs") for p in (full, dele)
    )
    assert (mf["n_docs"], mf["total_len"]) == (md["n_docs"], md["total_len"])
    # terms tables identical — zero-df terms ('planning', 'for') gone
    tf_ = sorted(tuple(r) for r in V.read_version(spark, f"{full}/terms").collect())
    td_ = sorted(tuple(r) for r in V.read_version(spark, f"{dele}/terms").collect())
    assert tf_ == td_
    assert not any(r[1] == "planning" for r in td_)
    # postings row sets identical through the deletion vector
    pf = sorted(tuple(r) for r in V.read_version(spark, f"{full}/postings").collect())
    pd_ = sorted(tuple(r) for r in V.read_version(spark, f"{dele}/postings").collect())
    assert pf == pd_
    # query results identical
    a = sorted(tuple(r) for r in TI.query_text_index(spark, full, QUERIES).collect())
    b = sorted(tuple(r) for r in TI.query_text_index(spark, dele, QUERIES).collect())
    assert a == b


def test_delete_accepts_dataframe_and_ignores_unknown_ids(spark, corpus, tmp_path):
    idx = str(tmp_path / "idx")
    TI.build_text_index(spark, corpus, idx)
    before = V.latest_version(f"{idx}/postings")
    # unknown ids: no-op, no empty commit
    assert TI.delete_from_text_index(spark, idx, [999, 1000]) == before
    assert TI.delete_from_text_index(spark, idx, []) == before
    ids = spark.createDataFrame([(6,), (999,)], "doc_id long")
    TI.delete_from_text_index(spark, idx, ids)
    meta = V.latest_app_meta(f"{idx}/postings", "n_docs")
    assert meta["n_docs"] == 6  # 8 docs - empty doc 5 (never indexed) - doc 6
    rows = TI.query_text_index(spark, idx, [(1, "dog")], k=10).collect()
    assert all(r.doc_id != 6 for r in rows) and rows


def test_delete_then_append_then_compact_preserves_queries(spark, corpus, tmp_path):
    """Lifecycle soak: build -> delete -> append new docs -> OPTIMIZE
    (materializes the DVs away, meta-less commits) -> query still equals
    a from-scratch build of the final corpus state."""
    idx = str(tmp_path / "idx")
    ref = str(tmp_path / "ref")
    TI.build_text_index(spark, corpus, idx)
    TI.delete_from_text_index(spark, idx, [0, 7])
    extra = spark.createDataFrame(
        [(8, "brown dog runs a fast query"), (9, "slow sort on the table")],
        "doc_id long, text string",
    )
    TI.append_to_text_index(spark, extra, idx)
    V.compact_table(spark, f"{idx}/postings")
    V.compact_table(spark, f"{idx}/terms")
    final = [d for d in DOCS if d[0] not in (0, 7)] + [
        (8, "brown dog runs a fast query"),
        (9, "slow sort on the table"),
    ]
    TI.build_text_index(
        spark, spark.createDataFrame(final, "doc_id long, text string"), ref
    )
    a = sorted(tuple(r) for r in TI.query_text_index(spark, idx, QUERIES).collect())
    b = sorted(tuple(r) for r in TI.query_text_index(spark, ref, QUERIES).collect())
    assert a == b


def test_delete_txn_replay_after_crash_between_tables(spark, corpus, tmp_path, monkeypatch):
    """Round-12 review fix: with txn=(app, epoch) a crash AFTER the
    terms df merge but BEFORE the postings DV delete replays to exactly
    the missing half — the retry must NOT re-decrement df (the terms
    epoch guard) and the final state equals a clean survivor rebuild."""
    import pytest as _pytest

    full = str(tmp_path / "full")
    dele = str(tmp_path / "dele")
    gone = [2, 6]
    TI.build_text_index(
        spark, spark.createDataFrame(
            [d for d in DOCS if d[0] not in gone], "doc_id long, text string"
        ), full,
    )
    TI.build_text_index(
        spark, spark.createDataFrame(DOCS, "doc_id long, text string"), dele
    )

    real = V.delete_where
    crashed = []

    def boom(spark_, path, *a, **k):
        if path.endswith("/postings") and not crashed:
            crashed.append(1)
            raise RuntimeError("crash between terms and postings")
        return real(spark_, path, *a, **k)

    monkeypatch.setattr(TI.V, "delete_where", boom)
    app = str(tmp_path / "app")
    with _pytest.raises(RuntimeError):
        TI.delete_from_text_index(spark, dele, gone, txn=(app, 1))
    # terms work landed; postings intact. Retry with the SAME txn:
    TI.delete_from_text_index(spark, dele, gone, txn=(app, 1))

    tf_ = sorted(tuple(r) for r in V.read_version(spark, f"{full}/terms").collect())
    td_ = sorted(tuple(r) for r in V.read_version(spark, f"{dele}/terms").collect())
    assert tf_ == td_  # no double decrement
    pf = sorted(tuple(r) for r in V.read_version(spark, f"{full}/postings").collect())
    pd_ = sorted(tuple(r) for r in V.read_version(spark, f"{dele}/postings").collect())
    assert pf == pd_
    mf = V.latest_app_meta(f"{full}/postings", "n_docs")
    md = V.latest_app_meta(f"{dele}/postings", "n_docs")
    assert (mf["n_docs"], mf["total_len"]) == (md["n_docs"], md["total_len"])
    a = sorted(tuple(r) for r in TI.query_text_index(spark, full, QUERIES).collect())
    b = sorted(tuple(r) for r in TI.query_text_index(spark, dele, QUERIES).collect())
    assert a == b


def test_delete_txn_replay_after_crash_inside_terms_branch(
    spark, corpus, tmp_path, monkeypatch
):
    """Round-12 second-pass review fix: the zero-df delete runs BEFORE
    the epoch-stamped merge, so a crash between them replays the terms
    branch self-consistently — no stale-positive-df strands, and a
    later append over a fully-deleted term counts from zero."""
    import pytest as _pytest

    gone = [2, 6]  # zeroes out 'planning' (doc 2 is its only holder)
    dele = str(tmp_path / "dele")
    TI.build_text_index(
        spark, spark.createDataFrame(DOCS, "doc_id long, text string"), dele
    )

    real = V.merge_into
    crashed = []

    def boom(spark_, path, *a, **k):
        if path.endswith("/terms") and not crashed:
            crashed.append(1)
            raise RuntimeError("crash between zero-delete and merge")
        return real(spark_, path, *a, **k)

    monkeypatch.setattr(TI.V, "merge_into", boom)
    app = str(tmp_path / "app")
    with _pytest.raises(RuntimeError):
        TI.delete_from_text_index(spark, dele, gone, txn=(app, 1))
    TI.delete_from_text_index(spark, dele, gone, txn=(app, 1))  # retry

    # re-append a doc containing a previously-zeroed term: df must
    # count from zero, not from a stranded stale value
    TI.append_to_text_index(
        spark,
        spark.createDataFrame([(9, "planning the planning")], "doc_id long, text string"),
        dele,
    )
    ref = str(tmp_path / "ref")
    TI.build_text_index(
        spark,
        spark.createDataFrame(
            [d for d in DOCS if d[0] not in gone] + [(9, "planning the planning")],
            "doc_id long, text string",
        ),
        ref,
    )
    td_ = sorted(tuple(r) for r in V.read_version(spark, f"{dele}/terms").collect())
    tf_ = sorted(tuple(r) for r in V.read_version(spark, f"{ref}/terms").collect())
    assert td_ == tf_
    a = sorted(tuple(r) for r in TI.query_text_index(spark, dele, QUERIES).collect())
    b = sorted(tuple(r) for r in TI.query_text_index(spark, ref, QUERIES).collect())
    assert a == b


def test_txn_app_id_is_opaque(spark, tmp_path):
    """Round-12 second-pass review fix: txn app ids are compared
    VERBATIM — a logical (non-path) id round-trips through stamp and
    lookup, so epoch guards actually fire for it."""
    t = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    V.commit_snapshot(df, t, txn=("dedup-job", 5))
    assert V.last_committed_epoch(t, "dedup-job") == 5
    assert V.last_committed_epoch(t, "other") == -1
