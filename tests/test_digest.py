"""Merkle bucket-digest diff (operators/digest.py).

Laws pinned here:
- soundness/completeness: the pruned diff's added/removed/changed rows equal
  the full diff's EXACTLY, on the deterministic snapshot pair and on fuzzed
  random mutations (including key-only and payload-only edits).
- identity: identical inputs -> zero mismatched buckets, empty pruned diff.
- bucket-count invariance: the pruned non-unchanged row set is the same at
  any num_buckets (pruning granularity must never change the answer).
- null keys/payloads participate (String() 'null' parity, null sentinel).
- plan shape: the bucket restriction is a BROADCAST left-semi join (the big
  sides are never shuffled for pruning) and the digest aggregation is a
  partial-aggregable hash aggregate, not a window.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from avro_diff_spark import key_diff
from avro_diff_spark.operators import digest as D


def _kinds(df):
    return sorted(
        tuple(r) for r in df.where(F.col("diff_kind") != "unchanged")
        .select("k", "diff_kind", F.to_json("old").alias("o"), F.to_json("new").alias("n"))
        .collect()
    )


def _rand_tables(rng, n_keys=120):
    old, new = [], []
    for i in range(n_keys):
        key = None if i == 0 else f"k{i}"
        payload = rng.choice(["a", "b", None])
        fate = rng.random()
        if fate < 0.15:
            old.append((key, payload))                      # removed
        elif fate < 0.30:
            new.append((key, payload))                      # added
        elif fate < 0.45:
            old.append((key, payload))                      # changed
            new.append((key, rng.choice(["x", None])))
        else:
            old.append((key, payload))                      # unchanged
            new.append((key, payload))
    return old, new


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_pruned_equals_full_fuzz(spark, seed):
    rng = random.Random(seed)
    old_rows, new_rows = _rand_tables(rng)
    old = spark.createDataFrame(old_rows, "k string, v string")
    new = spark.createDataFrame(new_rows, "k string, v string")
    full = key_diff(old, new, ["k"])
    pruned = D.key_diff_pruned(old, new, ["k"], num_buckets=16)
    assert _kinds(pruned) == _kinds(full)
    # every unchanged row the pruned diff DOES emit is genuinely unchanged
    extra = pruned.where(F.col("diff_kind") == "unchanged")
    truth = set(
        r["k"] for r in full.where(F.col("diff_kind") == "unchanged").collect()
    )
    assert set(r["k"] for r in extra.collect()) <= truth


def test_bucket_count_invariance(spark):
    rng = random.Random(5)
    old_rows, new_rows = _rand_tables(rng)
    old = spark.createDataFrame(old_rows, "k string, v string")
    new = spark.createDataFrame(new_rows, "k string, v string")
    base = _kinds(D.key_diff_pruned(old, new, ["k"], num_buckets=4))
    for b in (1, 37, 4096):
        assert _kinds(D.key_diff_pruned(old, new, ["k"], num_buckets=b)) == base


def test_identity_zero_buckets(spark):
    df = spark.createDataFrame([(f"k{i}", str(i % 7)) for i in range(200)], "k string, v string")
    assert D.digest_diff(df, df, ["k"], num_buckets=32).count() == 0
    assert D.key_diff_pruned(df, df, ["k"], num_buckets=32).count() == 0


def test_mismatch_localized_to_changed_buckets(spark):
    """One mutated key -> exactly one mismatched bucket (payload edits keep
    the key's bucket); one added + one removed key -> their own buckets."""
    rows = [(f"k{i}", "p") for i in range(500)]
    old = spark.createDataFrame(rows, "k string, v string")
    new = spark.createDataFrame(
        [(k, "MUT" if k == "k3" else v) for k, v in rows], "k string, v string"
    )
    dd = D.digest_diff(old, new, ["k"], num_buckets=64).collect()
    assert len(dd) == 1 and dd[0]["old_rows"] == dd[0]["new_rows"]
    new2 = spark.createDataFrame(rows[1:] + [("brand_new", "p")], "k string, v string")
    dd2 = D.digest_diff(old, new2, ["k"], num_buckets=1 << 20)
    assert dd2.count() == 2  # k0's bucket (removed) + brand_new's bucket (added)


def test_digest_agg_is_partial_and_prune_is_broadcast(spark):
    old = spark.createDataFrame([("a", "1"), ("b", "2")], "k string, v string")
    new = spark.createDataFrame([("a", "1"), ("b", "X")], "k string, v string")
    digest_plan = D.bucket_digests(old, ["k"], 16)._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in digest_plan and "Window" not in digest_plan
    pruned_plan = (
        D.key_diff_pruned(old, new, ["k"], num_buckets=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" in pruned_plan
    assert "CartesianProduct" not in pruned_plan


def test_payload_cols_subset(spark):
    """Digests over a payload subset ignore edits outside it."""
    old = spark.createDataFrame([("a", "1", "z")], "k string, v string, w string")
    new = spark.createDataFrame([("a", "1", "EDITED")], "k string, v string, w string")
    assert D.digest_diff(old, new, ["k"], 8, payload_cols=["v"]).count() == 0
    assert D.digest_diff(old, new, ["k"], 8, payload_cols=["v", "w"]).count() == 1


def test_cli_digest_command(spark, tmp_path, capsys):
    """digest CLI: exit 0 on identical datasets, exit 1 + pruned diff
    report on differing ones."""
    from avro_diff_spark.cli import digest_main

    old_p, new_p = str(tmp_path / "old.parquet"), str(tmp_path / "new.parquet")
    rows = [(i, f"v{i % 4}") for i in range(300)]
    spark.createDataFrame(rows, "k long, v string").write.parquet(old_p)
    spark.createDataFrame(
        [(k, "MUT" if k in (7, 8) else v) for k, v in rows] + [(999, "new")],
        "k long, v string",
    ).write.parquet(new_p)

    rc = digest_main([old_p, new_p, "k", "--format", "parquet", "--buckets", "64", "--diff"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "# of mismatched buckets:" in out
    assert "# of added rows: 1" in out
    assert "# of removed rows: 0" in out
    assert "# of changed rows: 2" in out

    rc = digest_main([old_p, old_p, "k", "--format", "parquet", "--buckets", "64"])
    out = capsys.readouterr().out
    assert rc == 0 and "# of mismatched buckets: 0" in out


def test_empty_inputs_total(spark):
    empty = spark.createDataFrame([], "k string, v string")
    other = spark.createDataFrame([("a", "1")], "k string, v string")
    assert D.digest_diff(empty, empty, ["k"], 8).count() == 0
    assert D.key_diff_pruned(empty, empty, ["k"], 8).count() == 0
    dd = D.digest_diff(empty, other, ["k"], 8).collect()
    assert len(dd) == 1 and (dd[0]["old_rows"], dd[0]["new_rows"]) == (0, 1)
    pr = D.key_diff_pruned(empty, other, ["k"], 8).collect()
    assert len(pr) == 1 and pr[0]["diff_kind"] == "added"


def test_user_bucket_column_does_not_collide(spark):
    """Tables may legitimately contain columns named bucket/_dd_bucket;
    the pruning join must not capture them (plain key_diff accepts such
    tables, so the pruned form must too)."""
    old = spark.createDataFrame(
        [("a", 7, 1), ("b", 8, 2)], "k string, bucket long, _dd_bucket long"
    )
    new = spark.createDataFrame(
        [("a", 7, 1), ("b", 99, 2)], "k string, bucket long, _dd_bucket long"
    )
    got = _kinds(D.key_diff_pruned(old, new, ["k"], num_buckets=8))
    assert got == _kinds(key_diff(old, new, ["k"]))


def test_precomputed_changed_buckets_path(spark):
    """Passing collected bucket ids skips the digest pass and produces
    the identical pruned diff (the CLI single-scan path)."""
    rng = random.Random(3)
    old_rows, new_rows = _rand_tables(rng)
    old = spark.createDataFrame(old_rows, "k string, v string")
    new = spark.createDataFrame(new_rows, "k string, v string")
    ids = [r["bucket"] for r in D.digest_diff(old, new, ["k"], 16).collect()]
    via_ids = D.key_diff_pruned(old, new, ["k"], 16, changed_buckets=ids)
    assert _kinds(via_ids) == _kinds(D.key_diff_pruned(old, new, ["k"], 16))
    # and the precomputed path plans NO digest aggregation at all
    plan = via_ids._jdf.queryExecution().executedPlan().toString()
    assert "xor" not in plan
