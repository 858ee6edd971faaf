"""latest_app_meta: per-key newest app_meta, answered O(tail) from the
checkpoint's folded ``app_meta_latest`` map — the round-12 fix making
the text index's collection-stats lookup O(1) instead of an O(commits)
newest->oldest walk of commit-file opens."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from avro_diff_spark.sources import versioned as V
from avro_diff_spark.sources.versioned import (
    checkpoint_log,
    commit_snapshot,
    latest_app_meta,
    latest_version,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def _counting(monkeypatch):
    opened: list[int] = []
    real = V._read_commit

    def counting(path):
        name = os.path.basename(path)
        try:
            opened.append(int(name[:6]))
        except ValueError:
            pass
        return real(path)

    monkeypatch.setattr(V, "_read_commit", counting)
    return opened


def test_latest_app_meta_walks_past_meta_less_commits(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_snapshot(_df(spark, [(0, "a")]), t, app_meta={"n_docs": 1, "total_len": 5})
    commit_snapshot(_df(spark, [(1, "b")]), t, mode="append")  # no meta
    commit_snapshot(
        _df(spark, [(2, "c")]), t, mode="append", app_meta={"src_version": 7}
    )
    commit_snapshot(_df(spark, [(3, "d")]), t, mode="append")  # no meta
    # newest PER KEY, independent families
    assert latest_app_meta(t, "n_docs") == {"n_docs": 1, "total_len": 5}
    assert latest_app_meta(t, "src_version") == {"src_version": 7}
    assert latest_app_meta(t, "absent") == {}
    # version cap: below the src_version commit the key is unseen
    assert latest_app_meta(t, "src_version", version=1) == {}
    assert latest_app_meta(t, "n_docs", version=0) == {"n_docs": 1, "total_len": 5}
    assert latest_app_meta(str(tmp_path / "nope"), "k") == {}


def test_latest_app_meta_zero_opens_below_checkpoint(spark, tmp_path, monkeypatch):
    """25 commits, stats at v0 and v4 only: after the automatic v20
    checkpoint, the lookup opens no commit file at or below 20 — the
    answer for a key last written at v4 comes from the checkpoint's
    folded map."""
    t = str(tmp_path / "t")
    commit_snapshot(_df(spark, [(0, "a")]), t, app_meta={"n_docs": 1, "total_len": 3})
    for i in range(1, 25):
        meta = {"n_docs": 2, "total_len": 9} if i == 4 else None
        commit_snapshot(_df(spark, [(i, f"r{i}")]), t, mode="append", app_meta=meta)
    assert latest_version(t) == 24
    assert os.path.exists(V._checkpoint_path(t, 20))

    opened = _counting(monkeypatch)
    assert latest_app_meta(t, "n_docs") == {"n_docs": 2, "total_len": 9}
    assert opened and all(v > 20 for v in opened), opened


def test_latest_app_meta_old_format_checkpoint_falls_back(
    spark, tmp_path, monkeypatch
):
    """A checkpoint written before the map existed must not break the
    lookup (full walk), and the NEXT checkpoint must fold the complete
    map from the whole log."""
    t = str(tmp_path / "t")
    commit_snapshot(_df(spark, [(0, "a")]), t, app_meta={"n_docs": 1, "total_len": 3})
    for i in range(1, 12):
        commit_snapshot(_df(spark, [(i, f"r{i}")]), t, mode="append")
    # simulate the old format: strip the map from the v10 checkpoint
    p = V._checkpoint_path(t, 10)
    with open(p) as fh:
        ck = json.load(fh)
    del ck["app_meta_latest"]
    with open(p, "w") as fh:
        json.dump(ck, fh)
    assert latest_app_meta(t, "n_docs") == {"n_docs": 1, "total_len": 3}
    # a fresh checkpoint re-folds from scratch and restores O(tail)
    checkpoint_log(t)
    opened = _counting(monkeypatch)
    assert latest_app_meta(t, "n_docs") == {"n_docs": 1, "total_len": 3}
    assert opened == []  # checkpoint at latest: pure map answer


def test_collection_meta_zero_opens_below_checkpoint(spark, tmp_path, monkeypatch):
    """The text index's stats lookup is O(tail): drive the postings log
    past a checkpoint with meta-less compactions, then pin that
    _collection_meta opens nothing at or below the checkpoint and the
    stats still match build+appends."""
    from avro_diff_spark.operators import text_index as TI

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta doc{i}") for i in range(12)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    TI.build_text_index(spark, docs.where(F.col("doc_id") < 6), idx)
    for j in range(6, 12):
        TI.append_to_text_index(spark, docs.where(F.col("doc_id") == j), idx)
    posts = f"{idx}/postings"
    # meta-less commits (the compaction shape) until the automatic
    # checkpoint (every 10 commits) lands ABOVE the newest stats commit
    stats_v = latest_version(posts)
    while (latest_version(posts) // 10) * 10 <= stats_v:
        commit_snapshot(
            V.read_version(spark, posts), posts, mode="overwrite",
            partition_by=["bucket"],
        )
    ck_v = (latest_version(posts) // 10) * 10
    assert os.path.exists(V._checkpoint_path(posts, ck_v))

    opened = _counting(monkeypatch)
    meta = TI._collection_meta(idx)
    assert meta["n_docs"] == 12
    assert all(v > ck_v for v in opened), (opened, ck_v)


def test_refresh_agg_survives_destination_compaction(spark, tmp_path):
    """refresh_agg_table reads the applied source version via
    latest_app_meta: a meta-less commit on the destination (compaction)
    no longer raises 'not created by refresh_agg_table'."""
    from avro_diff_spark.sources.versioned import read_version, refresh_agg_table

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    commit_snapshot(
        spark.createDataFrame([(1, "a", 10), (2, "b", 20)], "k int, g string, x int"),
        src,
    )
    refresh_agg_table(spark, src, dst, ["k"], ["g"], sum_cols=["x"])
    # meta-less destination commit (the compaction shape)
    commit_snapshot(read_version(spark, dst), dst, mode="overwrite")
    commit_snapshot(
        spark.createDataFrame([(3, "a", 5)], "k int, g string, x int"),
        src,
        mode="append",
    )
    refresh_agg_table(spark, src, dst, ["k"], ["g"], sum_cols=["x"])
    got = {
        (r.g): (r.n_rows, r.x_sum) for r in read_version(spark, dst).collect()
    }
    assert got == {"a": (2, 15), "b": (1, 20)}


def test_delete_where_keys_form(spark, tmp_path):
    """Round 12: the broadcast-semi-join delete form — DataFrame key
    set, both DV and COW rewrites, app_meta rides the commit, and the
    condition/keys arguments are mutually exclusive."""
    import pytest

    from avro_diff_spark.sources.versioned import delete_where, read_version

    t = str(tmp_path / "t")
    rows = [(i, f"v{i}") for i in range(10)]
    commit_snapshot(_df(spark, rows), t)
    keys = spark.createDataFrame([(2,), (5,), (77,)], "k int")
    v = delete_where(spark, t, keys=keys, on=["k"], app_meta={"note": 1})
    assert sorted(r.k for r in read_version(spark, t).collect()) == [
        0, 1, 3, 4, 6, 7, 8, 9,
    ]
    assert latest_app_meta(t, "note") == {"note": 1}
    # cow form
    t2 = str(tmp_path / "t2")
    commit_snapshot(_df(spark, rows), t2)
    delete_where(spark, t2, keys=keys, on=["k"], rewrite="cow")
    assert sorted(r.k for r in read_version(spark, t2).collect()) == [
        0, 1, 3, 4, 6, 7, 8, 9,
    ]
    with pytest.raises(ValueError):
        delete_where(spark, t, "k = 1", keys=keys, on=["k"])
    with pytest.raises(ValueError):
        delete_where(spark, t, keys=keys)
    with pytest.raises(ValueError):
        delete_where(spark, t)
