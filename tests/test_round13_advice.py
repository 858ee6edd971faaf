"""Pins for the round-13 ADVICE items (the fetch_schedule host-column
fix is pinned in test_frontier.py alongside the two-level rank tests).

1. refresh_index on a closure-assigned index: live postings dedup on
   cand_id before sampling/re-assigning, closure replication is
   preserved when the index's eps is passed, and a codes-only SQ index
   is rejected with a clear error instead of crashing on a missing
   embedding column.
2. refresh_index commits centroids BEFORE postings, so a cache guard
   validating both versions can never read a half-refreshed index as
   complete.
3. the unicode_dedup fixture's two byte-spellings live as ASCII \\u
   escapes in the source (no formatter can silently collapse them).
4. mask_token_sql escapes quotes in salt/prefix (valid, non-injectable
   oracle SQL).
"""

from __future__ import annotations

import hashlib
import io

import pytest
from pyspark.sql import functions as F

from avro_diff_spark.operators import ann_index as AI
from avro_diff_spark.sources import versioned as V


@pytest.fixture(scope="module")
def emb_path(sf_dir):
    return f"{sf_dir}/embeddings.parquet"


def test_refresh_closure_index_dedups_and_keeps_replication(
    spark, tmp_path, emb_path
):
    idx = str(tmp_path / "closure_idx")
    AI.build_ivf_index(spark, emb_path, idx, closure_eps=0.2)
    before = V.read_version(spark, f"{idx}/postings")
    n_vectors = before.select("cand_id").distinct().count()
    assert before.count() > n_vectors  # fixture really replicates borders

    # refresh WITH the index's eps: still a closure index — every
    # (cell, cand_id) posting is unique (no double-counted ranks in
    # query_index) and border replication survives
    AI.refresh_index(spark, idx, closure_eps=0.2)
    after = V.read_version(spark, f"{idx}/postings")
    assert after.count() == after.select("cell", "cand_id").distinct().count()
    assert after.select("cand_id").distinct().count() == n_vectors
    assert after.count() > n_vectors

    # round 15 flipped the default: refresh without an explicit eps now
    # KEEPS the stored closure rule (stored_closure_eps — the round-15
    # ADVICE fix; the standalone pin is
    # test_ann_index.test_refresh_keeps_stored_closure_rule)
    AI.refresh_index(spark, idx)
    kept = V.read_version(spark, f"{idx}/postings")
    assert kept.count() > n_vectors
    assert kept.select("cand_id").distinct().count() == n_vectors

    # the documented downgrade path is now an EXPLICIT None: exactly one
    # posting per live vector
    AI.refresh_index(spark, idx, closure_eps=None)
    plain = V.read_version(spark, f"{idx}/postings")
    assert plain.count() == n_vectors
    assert plain.select("cand_id").distinct().count() == n_vectors


def test_refresh_rejects_sq_index(spark, tmp_path, emb_path):
    idx = str(tmp_path / "sq_idx")
    AI.build_ivf_sq_index(spark, emb_path, idx)
    with pytest.raises(ValueError, match="refresh_sq_index"):
        AI.refresh_index(spark, idx)


def test_refresh_commits_centroids_before_postings(spark, tmp_path, emb_path):
    """The version pin the q_ivf_refresh_topk cache guard relies on:
    build -> v0/v0, delete -> postings v1, refresh -> centroids v1 THEN
    postings v2 — observing postings at its post-refresh version implies
    the matching centroids already exist."""
    idx = str(tmp_path / "ordered_idx")
    AI.build_ivf_index(spark, emb_path, idx)
    AI.delete_from_index(spark, idx, [0, 7, 14])
    assert V.latest_version(f"{idx}/postings") == 1
    assert V.latest_version(f"{idx}/centroids") == 0

    calls = []
    real_commit = V.commit_snapshot

    def spy(df, path, **kw):
        calls.append(path.rsplit("/", 1)[-1])
        return real_commit(df, path, **kw)

    import avro_diff_spark.operators.ann_index as ann_mod

    orig = ann_mod.V.commit_snapshot
    ann_mod.V.commit_snapshot = spy
    try:
        AI.refresh_index(spark, idx)
    finally:
        ann_mod.V.commit_snapshot = orig
    assert calls == ["centroids", "postings"]
    assert V.latest_version(f"{idx}/postings") == 2
    assert V.latest_version(f"{idx}/centroids") == 1


def test_unicode_fixture_spellings_are_source_ascii():
    import avro_diff_spark.pipelines as P
    import unicodedata

    assert P._NFC_DECOMPOSED != P._NFC_COMPOSED
    assert unicodedata.normalize("NFC", P._NFC_DECOMPOSED) == P._NFC_COMPOSED
    src = io.open(P.__file__.replace(".pyc", ".py"), encoding="utf-8").read()
    for line in src.splitlines():
        if line.startswith(("_NFC_COMPOSED", "_NFC_DECOMPOSED")):
            assert line.isascii(), f"fixture spelling not escape-spelled: {line!r}"


def test_mask_token_sql_escapes_quotes(spark):
    import duckdb

    from avro_diff_spark.functions.mask import mask_token, mask_token_sql

    salt, prefix = "it's:a'salt", "o'_"
    sql = mask_token_sql("v", salt=salt, prefix=prefix)
    got = (
        duckdb.connect()
        .execute(f"SELECT {sql} AS t FROM (VALUES ('x''y'), (NULL)) AS s(v)")
        .fetchall()
    )
    want_tok = prefix + hashlib.sha256(f"{salt}:x'y".encode()).hexdigest()[:16]
    assert got == [(want_tok,), (None,)]
    # and the Spark twin agrees on the same quoted inputs
    df = spark.createDataFrame([("x'y",), (None,)], "v string")
    rows = df.select(
        mask_token(F.col("v"), salt=salt, prefix=prefix).alias("t")
    ).collect()
    assert [r.t for r in rows] == [want_tok, None]
