"""refresh_join_table: incrementally maintained materialized join view.

The pin is the materialized-view contract: after any history of fact and
dim commits, an incremental refresh (CDF-driven, delta-sized work) must
equal the full recompute ``fact ⋈ dim`` of the latest snapshots.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avro_diff_spark.sources.versioned import (
    commit_snapshot,
    commit_txn_marker,
    latest_app_meta,
    latest_version,
    read_version,
    refresh_join_table,
    table_schema,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _recompute(fact_df, dim_df):
    return fact_df.join(
        dim_df.withColumnRenamed("pk", "fk"), ["fk"], "inner"
    ).select("k", "fk", "val", "attr")


@pytest.fixture()
def tables(spark, tmp_path):
    fact0 = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b"), (3, 20, "c"), (4, 30, "d")],
        "k bigint, fk bigint, val string",
    )
    dim0 = spark.createDataFrame(
        [(10, "x"), (20, "y"), (30, "z"), (40, "unreferenced")],
        "pk bigint, attr string",
    )
    fp, dp, vp = str(tmp_path / "fact"), str(tmp_path / "dim"), str(tmp_path / "view")
    commit_snapshot(fact0, fp)
    commit_snapshot(dim0, dp)
    return fp, dp, vp


def test_initial_build_then_noop(spark, tables):
    fp, dp, vp = tables
    refresh_join_table(spark, fp, dp, vp, ["k"], "fk", "pk")
    got = _rows(read_version(spark, vp))
    want = _rows(_recompute(read_version(spark, fp), read_version(spark, dp)))
    assert got == want and len(got) == 4  # pk 40 unreferenced
    # both sources already applied -> no-op, no commit
    v = latest_version(vp)
    assert refresh_join_table(spark, fp, dp, vp, ["k"], "fk", "pk") is None
    assert latest_version(vp) == v


def test_fact_only_delta(spark, tables):
    fp, dp, vp = tables
    refresh_join_table(spark, fp, dp, vp, ["k"], "fk", "pk")
    fact1 = spark.createDataFrame(
        # k=1 updated, k=2 deleted, k=5 inserted, k=5 fk->20
        [(1, 10, "a2"), (3, 20, "c"), (4, 30, "d"), (5, 20, "e")],
        "k bigint, fk bigint, val string",
    )
    commit_snapshot(fact1, fp, mode="overwrite")
    refresh_join_table(spark, fp, dp, vp, ["k"], "fk", "pk")
    got = _rows(read_version(spark, vp))
    assert got == _rows(_recompute(fact1, read_version(spark, dp)))
    assert ("2",) not in {(str(t[0]),) for t in got}


def test_dim_delta_including_dangling_fk(spark, tables):
    fp, dp, vp = tables
    refresh_join_table(spark, fp, dp, vp, ["k"], "fk", "pk")
    # dim: attr of 10 updated (touches fact k=1,2), pk 30 DELETED
    # (fact k=4 dangles -> must leave the view), 50 inserted (no effect)
    dim1 = spark.createDataFrame(
        [(10, "x2"), (20, "y"), (40, "unreferenced"), (50, "new")],
        "pk bigint, attr string",
    )
    commit_snapshot(dim1, dp, mode="overwrite")
    refresh_join_table(spark, fp, dp, vp, ["k"], "fk", "pk")
    got = _rows(read_version(spark, vp))
    assert got == _rows(_recompute(read_version(spark, fp), dim1))
    assert all(t[0] != 4 for t in got)  # dangling fk row dropped


def test_both_sides_change_and_meta_rides_marker(spark, tables):
    fp, dp, vp = tables
    refresh_join_table(spark, fp, dp, vp, ["k"], "fk", "pk")
    fact1 = spark.createDataFrame(
        [(1, 20, "a2"), (2, 10, "b"), (3, 20, "c"), (4, 30, "d")],
        "k bigint, fk bigint, val string",
    )
    dim1 = spark.createDataFrame(
        [(10, "x"), (20, "y2"), (30, "z")], "pk bigint, attr string"
    )
    commit_snapshot(fact1, fp, mode="overwrite")
    commit_snapshot(dim1, dp, mode="overwrite")
    refresh_join_table(spark, fp, dp, vp, ["k"], "fk", "pk")
    assert _rows(read_version(spark, vp)) == _rows(_recompute(fact1, dim1))
    meta = latest_app_meta(vp, "fact_version")
    assert (meta["fact_version"], meta["dim_version"]) == (1, 1)
    # the marker is metadata-only: schema still resolves, reads still work
    assert table_schema(vp) is not None
    assert read_version(spark, vp).count() == len(_rows(_recompute(fact1, dim1)))


def test_replay_after_simulated_crash_is_idempotent(spark, tables):
    """Data commits landed but the txn marker did not (crash window):
    the next refresh re-applies the same delta and converges."""
    fp, dp, vp = tables
    refresh_join_table(spark, fp, dp, vp, ["k"], "fk", "pk")
    fact1 = spark.createDataFrame(
        [(1, 10, "a2"), (3, 20, "c"), (4, 30, "d")], "k bigint, fk bigint, val string"
    )
    commit_snapshot(fact1, fp, mode="overwrite")
    refresh_join_table(spark, fp, dp, vp, ["k"], "fk", "pk")
    # forge the crash: bookkeeping says v0 is still the applied fact
    commit_txn_marker(
        vp,
        app_meta={
            "fact_table": fp, "fact_version": 0,
            "dim_table": dp, "dim_version": 0,
        },
    )
    refresh_join_table(spark, fp, dp, vp, ["k"], "fk", "pk")  # replay
    assert _rows(read_version(spark, vp)) == _rows(
        _recompute(fact1, read_version(spark, dp))
    )


def test_guards(spark, tables, tmp_path):
    fp, dp, vp = tables
    with pytest.raises(ValueError, match="versioned tables"):
        refresh_join_table(spark, str(tmp_path / "nope"), dp, vp, ["k"], "fk", "pk")
    # a view not created by refresh_join_table is refused
    other = str(tmp_path / "other")
    commit_snapshot(spark.createDataFrame([(1,)], "k bigint"), other)
    with pytest.raises(ValueError, match="not created by refresh_join_table"):
        refresh_join_table(spark, fp, dp, other, ["k"], "fk", "pk")
    with pytest.raises(ValueError, match="marker needs"):
        commit_txn_marker(vp)
    with pytest.raises(ValueError, match="no table"):
        commit_txn_marker(str(tmp_path / "ghost"), app_meta={"a": 1})
    # column collision between fact and dim is refused
    dp2 = str(tmp_path / "dim2")
    commit_snapshot(
        spark.createDataFrame([(10, "x")], "pk bigint, val string"), dp2
    )
    with pytest.raises(ValueError, match="collision"):
        refresh_join_table(spark, fp, dp2, str(tmp_path / "v2"), ["k"], "fk", "pk")


def test_maintain_join_view_stream_matches_recompute(spark, tmp_path):
    """Streaming twin: after draining append + update + delete fact
    history, the view equals a full recompute against the dim, dangling
    fks never enter, and re-draining publishes nothing new."""
    from avro_diff_spark.sources.versioned import (
        delete_where,
        merge_into,
        latest_version as lv,
    )
    from avro_diff_spark.streaming.agg import maintain_join_view_stream

    fp, dp, vp, ck = (str(tmp_path / x) for x in ("fact", "dim", "view", "ck"))
    commit_snapshot(
        spark.createDataFrame(
            [(1, 10, "a"), (2, 20, "b"), (3, 99, "dangling")],
            "k bigint, fk bigint, val string",
        ),
        fp,
    )  # v0 — k=3 references no dim row
    commit_snapshot(
        spark.createDataFrame([(10, "x"), (20, "y")], "pk bigint, attr string"), dp
    )

    def drain():
        q = maintain_join_view_stream(
            spark, fp, dp, vp, ["k"], "fk", "pk", checkpoint=ck
        )
        q.awaitTermination(120)

    drain()
    assert _rows(read_version(spark, vp)) == _rows(
        _recompute(read_version(spark, fp), read_version(spark, dp))
    )
    assert all(t[0] != 3 for t in _rows(read_version(spark, vp)))

    # fact DML: update k=1 (merge), delete k=2 (DV), insert k=4
    # rewrite='dv': the CDF-visible DML shape (a 'touched' REPLACE commit
    # is indistinguishable from compaction to a change stream — the same
    # constraint every stream test exercises)
    merge_into(
        spark,
        fp,
        spark.createDataFrame(
            [(1, 20, "a2"), (4, 10, "d")], "k bigint, fk bigint, val string"
        ),
        ["k"],
        rewrite="dv",
    )
    delete_where(spark, fp, F.col("k") == 2, rewrite="dv")
    drain()
    assert _rows(read_version(spark, vp)) == _rows(
        _recompute(read_version(spark, fp), read_version(spark, dp))
    )

    # no new commits -> drain publishes nothing
    v = lv(vp)
    drain()
    assert lv(vp) == v

    # a FRESH checkpoint replays from scratch; the applied-version guard
    # drops every already-applied batch (no spurious rewrites)
    q = maintain_join_view_stream(
        spark, fp, dp, vp, ["k"], "fk", "pk", checkpoint=str(tmp_path / "ck2")
    )
    q.awaitTermination(120)
    assert lv(vp) == v
    assert _rows(read_version(spark, vp)) == _rows(
        _recompute(read_version(spark, fp), read_version(spark, dp))
    )


def test_refresh_refuses_foreign_source_pair(spark, tables, tmp_path):
    fp, dp, vp = tables
    refresh_join_table(spark, fp, dp, vp, ["k"], "fk", "pk")
    # a second, different source pair pointed at the same view: refused
    fp2, dp2 = str(tmp_path / "fact2"), str(tmp_path / "dim2")
    commit_snapshot(
        spark.createDataFrame([(1, 10, "z")], "k bigint, fk bigint, val string"), fp2
    )
    commit_snapshot(spark.createDataFrame([(10, "q")], "pk bigint, attr string"), dp2)
    # advance one source so the refresh gets past the already-current check
    commit_snapshot(
        spark.createDataFrame([(2, 10, "z2")], "k bigint, fk bigint, val string"),
        fp2,
        mode="overwrite",
    )
    with pytest.raises(ValueError, match="tracks"):
        refresh_join_table(spark, fp2, dp2, vp, ["k"], "fk", "pk")


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_refresh_matches_recompute_under_random_histories(spark, tmp_path, seed):
    """Property: for randomized interleaved fact/dim DML histories
    (insert/update/delete on either side, refreshed at random points),
    the incrementally maintained view always equals the full recompute.
    Deterministic pseudo-random scripts (seeded) — the venn/key_diff
    property-test house style, bounded for Spark's per-action cost."""
    import random

    rng = random.Random(seed)
    fp, dp, vp = (str(tmp_path / x) for x in ("f", "d", "v"))

    fact = {k: (k % 4 * 10 or 10, f"v{k}") for k in range(1, 7)}  # k -> (fk, val)
    dim = {pk: f"a{pk}" for pk in (10, 20, 30)}

    def fact_df():
        return spark.createDataFrame(
            [(k, fk, v) for k, (fk, v) in sorted(fact.items())],
            "k bigint, fk bigint, val string",
        )

    def dim_df():
        return spark.createDataFrame(
            sorted(dim.items()), "pk bigint, attr string"
        )

    commit_snapshot(fact_df(), fp)
    commit_snapshot(dim_df(), dp)
    refresh_join_table(spark, fp, dp, vp, ["k"], "fk", "pk")

    next_k, next_pk = 100, 100
    for _ in range(3):
        for _ in range(rng.randint(1, 2)):
            op = rng.choice(["f_ins", "f_upd", "f_del", "d_ins", "d_upd", "d_del"])
            if op == "f_ins":
                fact[next_k] = (rng.choice([10, 20, 30, 99]), f"n{next_k}")
                next_k += 1
            elif op == "f_upd" and fact:
                k = rng.choice(sorted(fact))
                fact[k] = (rng.choice([10, 20, 30, 99]), fact[k][1] + "'")
            elif op == "f_del" and fact:
                fact.pop(rng.choice(sorted(fact)))
            elif op == "d_ins":
                dim[next_pk] = f"new{next_pk}"
                next_pk += 1
            elif op == "d_upd" and dim:
                pk = rng.choice(sorted(dim))
                dim[pk] = dim[pk] + "'"
            elif op == "d_del" and dim:
                dim.pop(rng.choice(sorted(dim)))
            if op.startswith("f"):
                commit_snapshot(fact_df(), fp, mode="overwrite")
            else:
                commit_snapshot(dim_df(), dp, mode="overwrite")
        refresh_join_table(spark, fp, dp, vp, ["k"], "fk", "pk")
        assert _rows(read_version(spark, vp)) == _rows(
            _recompute(fact_df(), dim_df())
        ), f"seed {seed}: view diverged from recompute"
