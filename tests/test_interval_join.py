"""Bucketized interval join (operators/interval.py): semantics pinned
against a brute-force recompute, boundary inclusivity, bucket-width
invariance, and the no-nested-loop plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avro_diff_spark.operators.interval import interval_join


def _pts(spark, rows):
    return spark.createDataFrame(rows, "pid long, k string, t long")


def _ivs(spark, rows):
    return spark.createDataFrame(rows, "iid long, k string, lo long, hi long")


def _brute(pts, ivs, inclusive=True, keyed=True):
    out = set()
    for pid, pk, t in pts:
        for iid, ik, lo, hi in ivs:
            if keyed and pk != ik:
                continue
            if t >= lo and (t <= hi if inclusive else t < hi):
                out.add((pid, iid))
    return out


PTS = [(1, "a", 5), (2, "a", 10), (3, "a", 99), (4, "b", 10), (5, "b", 250)]
IVS = [(10, "a", 0, 10), (11, "a", 10, 20), (12, "b", 240, 260), (13, "b", 0, 5)]


@pytest.mark.parametrize("width", [1, 3, 7, 100, 1000])
@pytest.mark.parametrize("inclusive", [True, False])
def test_matches_brute_force_at_any_bucket_width(spark, width, inclusive):
    """Bucket width is a COST knob, never a semantics knob — every width
    reproduces the brute-force point-in-interval matches, both boundary
    conventions (note t=10 matches BOTH adjacent intervals when ends are
    inclusive)."""
    got = interval_join(
        _pts(spark, PTS),
        _ivs(spark, IVS),
        point_col="t",
        start_col="lo",
        end_col="hi",
        bucket_width=width,
        keys=["k"],
        end_inclusive=inclusive,
    )
    assert {(r.pid, r.iid) for r in got.collect()} == _brute(PTS, IVS, inclusive)


def test_unkeyed_join_and_plan_shape(spark):
    """Without equality keys the join still runs on the bucket column —
    an equi-join, never the BroadcastNestedLoopJoin Spark plans for a
    raw BETWEEN join."""
    got = interval_join(
        _pts(spark, PTS).drop("k"),
        _ivs(spark, IVS).drop("k"),
        point_col="t",
        start_col="lo",
        end_col="hi",
        bucket_width=16,
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert {(r.pid, r.iid) for r in got.collect()} == _brute(PTS, IVS, keyed=False)


def test_partitioning_invariance(spark):
    pts, ivs = _pts(spark, PTS), _ivs(spark, IVS)
    a = interval_join(
        pts.repartition(1), ivs.repartition(1),
        point_col="t", start_col="lo", end_col="hi", bucket_width=8, keys=["k"],
    )
    b = interval_join(
        pts.repartition(19), ivs.repartition(7),
        point_col="t", start_col="lo", end_col="hi", bucket_width=8, keys=["k"],
    )
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def _aivs(spark, rows):
    return spark.createDataFrame(rows, "aid long, k string, lo long, hi long")


def _bivs(spark, rows):
    return spark.createDataFrame(rows, "bid long, k string, s long, e long")


def _brute_overlap(avs, bvs, inclusive=True):
    out = set()
    for aid, ak, lo, hi in avs:
        for bid, bk, s, e in bvs:
            if ak != bk:
                continue
            ok = (lo <= e and s <= hi) if inclusive else (lo < e and s < hi)
            if ok:
                out.add((aid, bid))
    return out


AIVS = [(1, "a", 0, 50), (2, "a", 40, 60), (3, "a", 100, 100), (4, "b", 0, 5)]
BIVS = [(10, "a", 45, 55), (11, "a", 60, 70), (12, "a", 100, 120), (13, "b", 5, 9)]


@pytest.mark.parametrize("width", [1, 4, 13, 64, 500])
@pytest.mark.parametrize("inclusive", [True, False])
def test_overlap_join_matches_brute_force(spark, width, inclusive):
    """Every pair of overlapping intervals emitted EXACTLY once (the
    max-start-bucket rule — no distinct pass), any bucket width, both
    boundary conventions (touching intervals overlap only inclusively)."""
    from avro_diff_spark.operators.interval import overlap_join

    got = overlap_join(
        _aivs(spark, AIVS),
        _bivs(spark, BIVS),
        left_start="lo",
        left_end="hi",
        right_start="s",
        right_end="e",
        bucket_width=width,
        keys=["k"],
        end_inclusive=inclusive,
    ).collect()
    pairs = [(r.aid, r.bid) for r in got]
    assert len(pairs) == len(set(pairs)), "pair emitted more than once"
    assert set(pairs) == _brute_overlap(AIVS, BIVS, inclusive)


@pytest.mark.parametrize("width", [3, 64])
def test_left_interval_join_keeps_unmatched_points(spark, width):
    """how='left': points inside no interval survive with null interval
    columns — including a point whose bucket HAS interval candidates
    that all fail the residual (the case the anti-join must not miss)."""
    from avro_diff_spark.operators.interval import interval_join

    # pid=3 (t=99) shares buckets with [100,100] at wide widths yet
    # matches nothing; pid=5 matches; pid=6 is far from everything
    pts = PTS + [(6, "a", 10**6)]
    got = interval_join(
        _pts(spark, pts),
        _ivs(spark, IVS),
        point_col="t",
        start_col="lo",
        end_col="hi",
        bucket_width=width,
        keys=["k"],
        how="left",
        point_id="pid",
    ).collect()
    matched = _brute(pts, IVS)
    matched_pids = {p for p, _ in matched}
    assert {(r.pid, r.iid) for r in got if r.iid is not None} == matched
    assert {r.pid for r in got if r.iid is None} == {
        p for p, *_ in pts if p not in matched_pids
    }
    with pytest.raises(ValueError, match="point_id"):
        interval_join(
            _pts(spark, pts), _ivs(spark, IVS),
            point_col="t", start_col="lo", end_col="hi",
            bucket_width=8, how="left",
        )


def test_interval_join_property_fuzz(spark):
    """Property fuzz: random point/interval sets at random bucket widths
    always reproduce the brute-force matches (one Spark round-trip per
    seed batch to keep runtime sane)."""
    import random

    from avro_diff_spark.operators.interval import overlap_join

    rng = random.Random(20260815)
    for trial in range(3):
        width = rng.choice([1, 2, 5, 17, 50, 400])
        pts = [
            (i, rng.choice("ab"), rng.randrange(-50, 450))
            for i in range(40)
        ]
        ivs = []
        for i in range(25):
            lo = rng.randrange(-60, 440)
            ivs.append((100 + i, rng.choice("ab"), lo, lo + rng.randrange(0, 80)))
        got = interval_join(
            _pts(spark, pts), _ivs(spark, ivs),
            point_col="t", start_col="lo", end_col="hi",
            bucket_width=width, keys=["k"],
        )
        assert {(r.pid, r.iid) for r in got.collect()} == _brute(pts, ivs), (
            trial, width,
        )
        # overlap: intervals vs intervals from the same pool
        a_rows = [(i, k, lo, hi) for i, k, lo, hi in ivs]
        b_rows = [(i + 500, k, lo - 3, hi + 7) for i, k, lo, hi in ivs[:15]]
        ov = overlap_join(
            _aivs(spark, a_rows), _bivs(spark, [(i, k, s, e) for i, k, s, e in b_rows]),
            left_start="lo", left_end="hi", right_start="s", right_end="e",
            bucket_width=width, keys=["k"],
        ).collect()
        pairs = [(r.aid, r.bid) for r in ov]
        assert len(pairs) == len(set(pairs))
        assert set(pairs) == _brute_overlap(a_rows, b_rows), (trial, width)
