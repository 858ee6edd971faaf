"""Deterministic sketches (functions/sketches.py): HLL registers and
estimates pinned against a pure-Python recompute, KMV overlap in both its
estimator and exact-degenerate branches, the count-min overestimate
guarantee, and the gap-fill/LOCF law — plus partitioning invariance for
the sketch reductions (max/sum must commute)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from avro_diff_spark.functions import sketches as SK


def _py_hll(values):
    """Reference HLL: same md5-derived registers, pure Python."""
    regs = {}
    for v in values:
        h = hashlib.md5(str(v).encode()).hexdigest()
        j = int(h[:3], 16) % SK.HLL_M
        suffix = int(h[3:12], 16)
        rho = SK.HLL_W + 1 - suffix.bit_length()
        regs[j] = max(regs.get(j, 0), rho)
    s = sum(1 << (SK.HLL_W + 1 - m) for m in regs.values())
    s += (SK.HLL_M - len(regs)) * (1 << (SK.HLL_W + 1))
    c = SK._hll_alpha_c()
    return regs, s, math.floor(c / s * 1000.0)


def test_hll_matches_python_recompute(spark):
    vals = [f"user-{i}" for i in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "u string")
    regs, s, est = _py_hll(vals)
    got = SK.hll_estimate(SK.hll_registers(df, "u")).collect()[0]
    assert got.s_scaled == s
    assert got.zero_registers == SK.HLL_M - len(regs)
    assert got.est_x1000 == est
    # the estimate is an estimate, but a sane one at n >> m
    assert abs(got.est_x1000 / 1000.0 - 5000) / 5000 < 0.15


def test_hll_register_table_matches_python(spark):
    vals = list(range(300))
    df = spark.createDataFrame([(v,) for v in vals], "u long")
    regs, _, _ = _py_hll(vals)
    got = {(r.j, r.m_j) for r in SK.hll_registers(df, "u").collect()}
    assert got == set(regs.items())


def test_hll_partitioning_invariant(spark):
    """max-per-register and the integer fold commute: any partitioning
    yields the identical sketch (the property that makes it mergeable
    across 1000 executors)."""
    df = spark.range(2000).select(F.col("id").cast("string").alias("u"))
    a = SK.hll_estimate(SK.hll_registers(df.repartition(1), "u")).collect()
    b = SK.hll_estimate(SK.hll_registers(df.repartition(37), "u")).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def _py_kmv_overlap(avals, bvals, k=256):
    ha = {hashlib.md5(str(v).encode()).hexdigest() for v in avals}
    hb = {hashlib.md5(str(v).encode()).hexdigest() for v in bvals}
    union_k = sorted(ha | hb)[:k]
    cnt_both = sum(1 for h in union_k if h in ha and h in hb)
    if len(union_k) < k:
        return len(union_k), cnt_both, cnt_both * 1000
    theta = int(union_k[-1][:12], 16)
    est = math.floor(
        float(cnt_both)
        * float(k - 1)
        / float(k)
        / (float(theta) / float(1 << SK.KMV_BITS))
        * 1000.0
    )
    return len(union_k), cnt_both, est


@pytest.mark.parametrize("n_a,n_b,shared", [(2000, 1500, 700), (60, 80, 30)])
def test_kmv_overlap_matches_python(spark, n_a, n_b, shared):
    """Both branches: big sets exercise the theta estimator, small sets
    (union < k) the exact-degenerate branch."""
    avals = [f"s{i}" for i in range(shared)] + [f"a{i}" for i in range(n_a - shared)]
    bvals = [f"s{i}" for i in range(shared)] + [f"b{i}" for i in range(n_b - shared)]
    a = spark.createDataFrame([(v,) for v in avals], "u string")
    b = spark.createDataFrame([(v,) for v in bvals], "u string")
    got = SK.kmv_overlap(a, b, "u", k=256).collect()[0]
    assert tuple(got) == _py_kmv_overlap(avals, bvals)
    # the estimator lands near the true overlap when it is active
    if got.n_union_sketch == 256:
        assert abs(got.est_inter_x1000 / 1000.0 - shared) / shared < 0.35


def test_countmin_overestimates_never_under(spark):
    """The count-min guarantee: every point estimate >= the true count
    (integer-exact), and the deliberately tiny width forces collisions so
    the test distinguishes >= from ==."""
    rows = [(f"t{i}", i + 1) for i in range(3000)]
    counts = spark.createDataFrame(rows, "token string, n long")
    sketch = SK.countmin_sketch(counts, "token", "n")
    # 4 rows x 1024 cells max
    assert sketch.count() <= SK.CM_DEPTH * SK.CM_WIDTH
    probes = counts.select("token")
    est = SK.countmin_lookup(sketch, probes, "token")
    joined = counts.join(est, "token").collect()
    assert len(joined) == 3000
    assert all(r.n_cm >= r.n for r in joined)
    # with 3000 terms in 1024 buckets collisions are guaranteed somewhere
    assert any(r.n_cm > r.n for r in joined)


def test_gapfill_fills_and_carries_forward(spark):
    """events_gapfill law on a hand-built frame: missing hours appear
    with n_filled=0/gap=true, and n_locf carries the last observed count
    across the gap."""
    from avro_diff_spark import analytics as A

    h = 3_600_000_000
    ev = spark.createDataFrame(
        [("a", 0 * h), ("a", 0 * h), ("a", 3 * h), ("b", 5 * h)],
        "event_type string, ts_us long",
    )
    import avro_diff_spark.analytics as AA

    real = AA.load_events
    AA.load_events = lambda s, d: ev
    try:
        out = {
            (r.event_type, r.hour_us): (r.n_filled, r.n_locf, r.gap)
            for r in A.events_gapfill(spark, "unused").collect()
        }
    finally:
        AA.load_events = real
    assert out == {
        ("a", 0 * h): (2, 2, False),
        ("a", 1 * h): (0, 2, True),
        ("a", 2 * h): (0, 2, True),
        ("a", 3 * h): (1, 1, False),
        ("b", 5 * h): (1, 1, False),
    }


def test_gapfill_window_is_partitioned(spark):
    """The LOCF window must partition by the series key — an
    unpartitioned window is the single-task funnel the layout round-7
    finding banned (plan gate discipline)."""
    from avro_diff_spark import analytics as A

    plan = A.events_gapfill(
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "No Partition Defined" not in plan


def test_hll_merge_equals_union_sketch(spark):
    """sketch(A) ⊔ sketch(B) == sketch(A ∪ B) exactly — the algebraic
    property that makes the sketch maintainable."""
    a = spark.createDataFrame([(f"a{i}",) for i in range(800)], "u string")
    b = spark.createDataFrame(
        [(f"a{i}",) for i in range(400, 1200)], "u string"
    )
    merged = SK.hll_merge(SK.hll_registers(a, "u"), SK.hll_registers(b, "u"))
    direct = SK.hll_registers(a.unionByName(b), "u")
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in direct.collect()
    }


def test_maintain_hll_stream_matches_batch_and_is_exactly_once(spark, tmp_path):
    """The streaming sketch table after draining N files equals the batch
    sketch over all rows; a restart on the same checkpoint commits
    nothing; a new wave merges incrementally."""
    import os

    from avro_diff_spark.sources.versioned import latest_version, read_version
    from avro_diff_spark.streaming.agg import maintain_hll_stream

    src, ckpt, t = (str(tmp_path / d) for d in ("src", "ck", "tbl"))
    os.makedirs(src)
    rows1 = [(f"u{i}",) for i in range(500)]
    rows2 = [(f"u{i}",) for i in range(300, 900)]
    spark.createDataFrame(rows1, "u string").coalesce(1).write.mode(
        "append"
    ).json(src)
    spark.createDataFrame(rows2, "u string").coalesce(1).write.mode(
        "append"
    ).json(src)

    def drain():
        q = maintain_hll_stream(
            spark.readStream.schema("u string").json(src),
            t,
            "u",
            checkpoint=ckpt,
        )
        q.awaitTermination(120)

    drain()
    v1 = latest_version(t)
    stored = {tuple(r) for r in read_version(spark, t).collect()}
    batch = SK.hll_registers(
        spark.createDataFrame(rows1 + rows2, "u string"), "u"
    )
    assert stored == {tuple(r) for r in batch.collect()}
    est_stream = SK.hll_estimate(read_version(spark, t)).collect()[0]
    est_batch = SK.hll_estimate(batch).collect()[0]
    assert tuple(est_stream) == tuple(est_batch)

    drain()  # restart, nothing new: no commit
    assert latest_version(t) == v1

    rows3 = [(f"w{i}",) for i in range(200)]
    spark.createDataFrame(rows3, "u string").coalesce(1).write.mode(
        "append"
    ).json(src)
    drain()
    assert latest_version(t) > v1
    full = SK.hll_registers(
        spark.createDataFrame(rows1 + rows2 + rows3, "u string"), "u"
    )
    assert {tuple(r) for r in read_version(spark, t).collect()} == {
        tuple(r) for r in full.collect()
    }


def test_countmin_merge_equals_union_sketch(spark):
    """sketch(A) + sketch(B) == sketch(A ⊎ B) — additive cells."""
    a = spark.createDataFrame([(f"t{i}", i + 1) for i in range(50)], "token string, n long")
    b = spark.createDataFrame([(f"t{i}", 2 * i + 1) for i in range(25, 75)], "token string, n long")
    union = a.unionByName(b).groupBy("token").agg(F.sum("n").alias("n"))
    merged = SK.countmin_merge(
        SK.countmin_sketch(a, "token", "n"), SK.countmin_sketch(b, "token", "n")
    )
    direct = SK.countmin_sketch(union, "token", "n")
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in direct.collect()}


def test_maintain_countmin_stream_exactly_once(spark, tmp_path):
    """The streaming sketch equals the batch sketch over all waves; a
    restart double-counts NOTHING (additive merge makes replay the
    dangerous case the epoch dedupe must catch)."""
    import os

    from avro_diff_spark.sources.versioned import latest_version, read_version
    from avro_diff_spark.streaming.agg import maintain_countmin_stream

    src, ckpt, t = (str(tmp_path / d) for d in ("src", "ck", "tbl"))
    os.makedirs(src)
    w1 = [(f"t{i % 7}",) for i in range(100)]
    spark.createDataFrame(w1, "term string").coalesce(1).write.mode("append").json(src)

    def drain():
        q = maintain_countmin_stream(
            spark.readStream.schema("term string").json(src),
            t,
            "term",
            checkpoint=ckpt,
        )
        q.awaitTermination(120)

    drain()
    v1 = latest_version(t)
    drain()  # restart: nothing new, no commit, no double count
    assert latest_version(t) == v1

    w2 = [(f"t{i % 11}",) for i in range(60)]
    spark.createDataFrame(w2, "term string").coalesce(1).write.mode("append").json(src)
    drain()

    batch_counts = (
        spark.createDataFrame(w1 + w2, "term string")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    direct = SK.countmin_sketch(batch_counts, "term", "n")
    assert {tuple(r) for r in read_version(spark, t).collect()} == {
        tuple(r) for r in direct.collect()
    }
    # probes through the maintained sketch bound the true counts
    est = SK.countmin_lookup(
        read_version(spark, t), batch_counts.select("term"), "term"
    )
    joined = batch_counts.join(est, "term").collect()
    assert all(r.n_cm >= r.n for r in joined)


def _py_kmv_difference(avals, bvals, k=256):
    ha = {hashlib.md5(str(v).encode()).hexdigest() for v in avals}
    hb = {hashlib.md5(str(v).encode()).hexdigest() for v in bvals}
    union_k = sorted(ha | hb)[:k]
    cnt = sum(1 for h in union_k if h in ha and h not in hb)
    if len(union_k) < k:
        return len(union_k), cnt, cnt * 1000
    theta = int(union_k[-1][:12], 16)
    est = math.floor(
        float(cnt)
        * float(k - 1)
        / float(k)
        / (float(theta) / float(1 << SK.KMV_BITS))
        * 1000.0
    )
    return len(union_k), cnt, est


@pytest.mark.parametrize("n_a,n_b,shared", [(2000, 1500, 700), (60, 80, 30)])
def test_kmv_difference_matches_python(spark, n_a, n_b, shared):
    """a-not-b on both branches, plus the sketch-level set algebra:
    within the union sketch, cnt_both + cnt_a_only == |sketch ∩ A|."""
    avals = [f"s{i}" for i in range(shared)] + [f"a{i}" for i in range(n_a - shared)]
    bvals = [f"s{i}" for i in range(shared)] + [f"b{i}" for i in range(n_b - shared)]
    a = spark.createDataFrame([(v,) for v in avals], "u string")
    b = spark.createDataFrame([(v,) for v in bvals], "u string")
    got = SK.kmv_difference(a, b, "u", k=256).collect()[0]
    assert tuple(got) == _py_kmv_difference(avals, bvals)
    ov = SK.kmv_overlap(a, b, "u", k=256).collect()[0]
    in_a = sum(
        1
        for h in sorted(
            {hashlib.md5(str(v).encode()).hexdigest() for v in avals}
            | {hashlib.md5(str(v).encode()).hexdigest() for v in bvals}
        )[:256]
        if h in {hashlib.md5(str(v).encode()).hexdigest() for v in avals}
    )
    assert ov.cnt_both + got.cnt_a_only == in_a
    true_diff = n_a - shared
    if got.n_union_sketch == 256:
        assert abs(got.est_diff_x1000 / 1000.0 - true_diff) / true_diff < 0.35


def test_kmv_difference_empty_inputs(spark):
    empty = spark.createDataFrame([], "u string")
    other = spark.createDataFrame([("a",), ("b",)], "u string")
    assert tuple(SK.kmv_difference(empty, empty, "u", k=8).collect()[0]) == (0, 0, 0)
    assert tuple(SK.kmv_difference(empty, other, "u", k=8).collect()[0]) == (2, 0, 0)
    assert tuple(SK.kmv_difference(other, empty, "u", k=8).collect()[0]) == (
        2,
        2,
        2000,
    )


# ------------------------------------------------------------- bloom ---


def _py_bloom_positions(v, k=SK.BLOOM_K, bits=SK.BLOOM_BITS):
    h = hashlib.md5(str(v).encode()).hexdigest()
    return [int(h[i * 5 : i * 5 + 5], 16) % bits for i in range(k)]


def test_bloom_no_false_negatives_and_python_parity(spark):
    members = [f"m{i}" for i in range(800)]
    extras = [f"x{i}" for i in range(600)]
    mdf = spark.createDataFrame([(v,) for v in members], "u string")
    pdf = spark.createDataFrame([(v,) for v in members[:100] + extras], "u string")
    bl = SK.bloom_build(mdf, "u")
    got = {r["u"]: r["hit"] for r in SK.bloom_probe(bl, pdf, "u").collect()}
    # exact python replica of the filter
    words = {}
    for v in members:
        for p in _py_bloom_positions(v):
            words[p // 32] = words.get(p // 32, 0) | (1 << (p % 32))
    for v, hit in got.items():
        expect = all(
            words.get(p // 32, 0) & (1 << (p % 32)) for p in _py_bloom_positions(v)
        )
        assert hit == expect, v
    # no false negatives; fp rate in the analytical ballpark
    assert all(got[v] for v in members[:100])
    fp = sum(1 for v in extras if got[v])
    n, m, k = len(members), SK.BLOOM_BITS, SK.BLOOM_K
    expect_rate = (1.0 - math.exp(-k * n / m)) ** k
    assert fp / len(extras) < max(4 * expect_rate, 0.05)


def test_bloom_merge_law_and_nulls(spark):
    a = spark.createDataFrame([("a",), (None,)], "u string")
    b = spark.createDataFrame([("b",), ("c",)], "u string")
    u = SK.bloom_build(a.unionByName(b), "u")
    m = SK.bloom_merge(SK.bloom_build(a, "u"), SK.bloom_build(b, "u"))
    assert {tuple(r) for r in u.collect()} == {tuple(r) for r in m.collect()}
    # nulls excluded on both sides
    pr = SK.bloom_probe(u, spark.createDataFrame([(None,), ("a",)], "u string"), "u")
    rows = pr.collect()
    assert len(rows) == 1 and rows[0]["u"] == "a" and rows[0]["hit"]


def test_bloom_probe_is_broadcast(spark):
    mdf = spark.createDataFrame([(f"m{i}",) for i in range(50)], "u string")
    plan = (
        SK.bloom_probe(SK.bloom_build(mdf, "u"), mdf, "u")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "CartesianProduct" not in plan


def test_maintain_bloom_stream_matches_batch_and_replay_safe(spark, tmp_path):
    import os

    from avro_diff_spark.sources.versioned import latest_version, read_version
    from avro_diff_spark.streaming.agg import maintain_bloom_stream

    src, ckpt, t = (str(tmp_path / d) for d in ("src", "ck", "tbl"))
    os.makedirs(src)
    rows1 = [(f"u{i}",) for i in range(400)]
    rows2 = [(f"u{i}",) for i in range(250, 700)]
    spark.createDataFrame(rows1, "u string").coalesce(1).write.mode("append").json(src)

    def drain():
        q = maintain_bloom_stream(
            spark.readStream.schema("u string").json(src), t, "u", checkpoint=ckpt
        )
        q.awaitTermination(120)

    drain()
    v1 = latest_version(t)
    drain()  # restart with nothing new: no commit
    assert latest_version(t) == v1

    spark.createDataFrame(rows2, "u string").coalesce(1).write.mode("append").json(src)
    drain()
    assert latest_version(t) > v1
    stored = {tuple(r) for r in read_version(spark, t).collect()}
    batch = SK.bloom_build(spark.createDataFrame(rows1 + rows2, "u string"), "u")
    assert stored == {tuple(r) for r in batch.collect()}
    # history-wide membership, zero false negatives
    pr = SK.bloom_probe(
        read_version(spark, t),
        spark.createDataFrame([(v,) for v, in rows1 + rows2], "u string"),
        "u",
    )
    assert pr.where(~F.col("hit")).count() == 0


# ----------------------------------------------------- bottom-k sample ---


def test_bottomk_sample_matches_python_and_merges(spark):
    rows = [(i, float((i * 37) % 1000)) for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, v double")
    got = sorted(tuple(r) for r in SK.bottomk_sample(df, "k", "v", 64).collect())
    expect = sorted(
        (hashlib.md5(str(k).encode()).hexdigest(), v) for k, v in rows
    )[:64]
    assert got == sorted(expect)
    # merge law: bottom-k of union == bottom-k of concatenated samples
    a, b = rows[:1200], rows[1200:]
    sa = SK.bottomk_sample(spark.createDataFrame(a, "k long, v double"), "k", "v", 64)
    sb = SK.bottomk_sample(spark.createDataFrame(b, "k long, v double"), "k", "v", 64)
    merged = sorted(
        tuple(r) for r in sa.unionByName(sb).orderBy("h").limit(64).collect()
    )
    assert merged == got


def test_sample_quantiles_selection_and_totality(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(100)], "k long, v double")
    got = SK.sample_quantiles(SK.bottomk_sample(df, "k", "v", 1000)).collect()[0]
    # full population sampled: order stats over 0..99
    assert got["n_sampled"] == 100
    import math as _m

    vals = sorted(float(i) for i in range(100))
    for q, name in ((0.25, "q_25"), (0.5, "q_5"), (0.75, "q_75"), (0.95, "q_95")):
        assert got[name] == vals[_m.floor(q * 99)]
    empty = spark.createDataFrame([], "k long, v double")
    tot = SK.sample_quantiles(SK.bottomk_sample(empty, "k", "v", 16)).collect()[0]
    assert tot["n_sampled"] == 0 and tot["q_5"] is None


def test_bottomk_plan_is_take_ordered(spark):
    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    plan = SK.bottomk_sample(df, "k", "v", 16)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan and "Sort " not in plan


def test_bloom_empty_build_side_total(spark):
    empty = spark.createDataFrame([], "u string")
    probes = spark.createDataFrame([("a",), ("b",)], "u string")
    pr = SK.bloom_probe(SK.bloom_build(empty, "u"), probes, "u").collect()
    assert len(pr) == 2 and not any(r["hit"] for r in pr)


def test_grouped_bottomk_matches_python(spark):
    rows = [(f"g{i % 3}", i, float((i * 13) % 100)) for i in range(900)]
    df = spark.createDataFrame(rows, "g string, k long, v double")
    got = {
        r["g"]: r
        for r in SK.grouped_bottomk_quantiles(df, ["g"], "k", "v", k=32).collect()
    }
    import math as _m

    for g in ("g0", "g1", "g2"):
        grp = [(hashlib.md5(str(k).encode()).hexdigest(), v) for gg, k, v in rows if gg == g]
        sample = sorted(v for _, v in sorted(grp)[:32])
        r = got[g]
        assert r["n_sampled"] == 32
        for q, name in ((0.25, "q_25"), (0.5, "q_5"), (0.75, "q_75"), (0.95, "q_95")):
            assert r[name] == sample[_m.floor(q * 31)], (g, name)
    # the sample window is PARTITIONED (no single-task funnel)
    plan = (
        SK.grouped_bottomk_quantiles(df, ["g"], "k", "v", k=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "No Partition Defined" not in plan


# ---------------------------------------------------------------------------
# priority sampling (round 11)
# ---------------------------------------------------------------------------


def _py_priority(rows, k):
    """(key, weight) rows -> set of sampled keys, the documented law."""
    import hashlib

    def q(key, w):
        h = hashlib.md5(str(key).encode()).hexdigest()
        u = int(h[:15], 16) + 1
        return float(w) / float(u)

    live = [(key, w) for key, w in rows if key is not None and w and w > 0]
    ranked = sorted(live, key=lambda kw: (-q(*kw), kw[0]))
    return [key for key, _ in ranked[:k]]


def test_priority_sample_matches_python(spark):
    from avro_diff_spark.functions.sketches import priority_sample

    rows = [(i, (i * 37) % 100 + 1) for i in range(300)]
    rows += [(1000, None), (None, 50), (1001, 0), (1002, -3)]
    df = spark.createDataFrame(rows, "id long, w long")
    got = [r.k for r in priority_sample(df, "id", "w", k=40).collect()]
    assert got == _py_priority(rows, 40)


def test_priority_sample_mergeable_and_weight_monotone(spark):
    """Mergeability (the TakeOrdered law): sample(A ∪ B) ==
    priority-merge(sample(A), sample(B)). And heavier rows are sampled
    no less often: scaling one row's weight up can only keep/add it."""
    from avro_diff_spark.functions.sketches import priority_sample

    rows_a = [(i, i % 50 + 1) for i in range(0, 200)]
    rows_b = [(i, i % 70 + 1) for i in range(200, 400)]
    a = spark.createDataFrame(rows_a, "id long, w long")
    b = spark.createDataFrame(rows_b, "id long, w long")
    union = [r.k for r in priority_sample(a.unionByName(b), "id", "w", k=30).collect()]
    merged = _py_priority(
        [(r.k, r.w) for r in priority_sample(a, "id", "w", k=30).collect()]
        + [(r.k, r.w) for r in priority_sample(b, "id", "w", k=30).collect()],
        30,
    )
    assert union == merged
    # weight monotonicity on a fixed row
    base = {r.k for r in priority_sample(a, "id", "w", k=30).collect()}
    boosted = a.withColumn(
        "w", F.when(F.col("id") == 7, F.lit(10_000_000)).otherwise(F.col("w"))
    )
    got = {r.k for r in priority_sample(boosted, "id", "w", k=30).collect()}
    assert 7 in got
    # boosting one row admits it and displaces at most the one
    # lowest-priority incumbent; no other membership can change
    assert got - base <= {7}
    assert len(base - got) <= 1 and len(got) == len(base)


def test_priority_sample_plan_is_take_ordered(spark):
    from avro_diff_spark.functions.sketches import priority_sample

    df = spark.createDataFrame([(i, i + 1) for i in range(50)], "id long, w long")
    plan = (
        priority_sample(df, "id", "w", k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # never a full sort


def test_subset_sum_estimate_exact_when_small_and_sane_when_sampled(spark):
    from avro_diff_spark.functions.sketches import priority_sample, subset_sum_estimate

    rows = [(i, (i * 13) % 40 + 1) for i in range(25)]
    df = spark.createDataFrame(rows, "id long, w long")
    total = sum(w for _, w in rows)
    # k >= n: exact
    r = subset_sum_estimate(priority_sample(df, "id", "w", k=31), 30).collect()[0]
    assert r.n == 25 and r.est_total == float(total)
    # sampled: unbiasedness can't be pinned on one draw, but the DLT
    # estimate is bounded by [sum of top-k weights, n * max term] and
    # must be positive and reproducible
    r1 = subset_sum_estimate(priority_sample(df, "id", "w", k=11), 10).collect()[0]
    r2 = subset_sum_estimate(priority_sample(df, "id", "w", k=11), 10).collect()[0]
    assert r1.n == 11 and r1.est_total > 0 and r1.est_total == r2.est_total
