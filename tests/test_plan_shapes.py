"""Physical-plan shape gate over EVERY registered query.

The scale contract of this engine is enforced here, not just documented:
a query whose plan contains a CartesianProduct or BroadcastNestedLoopJoin
would be quadratic at 100 TB regardless of how fast it runs at test scale
(the round-1 simhash regression was exactly this shape). Building the
executed plan is driver-side planning only — no job runs.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as ent

#: queries whose plan INTENTIONALLY contains a broadcast nested-loop:
#: exact cosine top-k scores a small broadcast query set against every
#: candidate by definition (the documented brute-force baseline; the scale
#: paths are ann_signbucket_topk / ivf_topk), and PQ's ADC stage is the
#: same broadcast-queries-vs-all-candidates scan by design — over m-byte
#: codes at O(m) per pair instead of dim floats at O(dim), which is the
#: whole point of product quantization (see similarity.pq_topk docstring).
#: sq_topk's code scan is the same by-design shape over dim-byte codes
#: (int64-exact symmetric distance — see similarity.sq_topk docstring).
CROSS_JOIN_BY_DESIGN = {"cosine_topk", "pq_topk", "sq_topk"}

_QUERIES = sorted(ent.queries())


@pytest.mark.parametrize("name", _QUERIES)
def test_no_unbounded_join_shapes(spark, sf_dir, name):
    df = ent.queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    if name not in CROSS_JOIN_BY_DESIGN:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: nested-loop join in plan — quadratic at scale"
        )


#: registry queries whose per-query top-k must plan with Spark's
#: WindowGroupLimit optimization (SPARK-37099; similarity._topk_per_query,
#: optimization round 15): the rank-limited window must carry a MAP-SIDE
#: partial top-k (WindowGroupLimit below the exchange), so at most k rows
#: per (query, map partition) cross the shuffle and no task ever ranks
#: one query's raw candidate set — the built-in form of the two-level
#: rank, with one exchange instead of the hand-rolled salted stage's two.
#: (ann_signbucket_topk/vocab_topk and the pandas variant rank through
#: their own bounded paths; the bm25/hybrid family feeds a grouped
#: (query, doc) aggregate into the same helper.)
TWO_LEVEL_TOPK = [
    "cosine_topk",
    "ivf_topk",
    "ivfpq_topk",
    "ivfpq_residual_topk",
    "pq_topk",
    "sq_topk",
    "ivf_index_topk",
    "ivf_closure_topk",
    "ivf_sq_index_topk",
    "ivf_sq_rerank_topk",
    "ivfpq_opq_topk",
    "bm25_topk",
    "hybrid_topk",
    "maxsim_rerank_topk",
]


@pytest.mark.parametrize("name", TWO_LEVEL_TOPK)
def test_per_query_topk_is_two_leveled(spark, sf_dir, name):
    df = ent.queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, (
        f"{name}: rank window has no WindowGroupLimit — the per-query "
        "top-k would serialize one query's candidates into one task at "
        "scale (the rank<=k filter must sit directly on the row_number "
        "window for SPARK-37099 to fire)"
    )


def test_mixture_plans_are_window_free(spark, sf_dir):
    """Round 12: the mixture normalizers moved from `sum(..) OVER ()`
    to the broadcast-totals fold — no Window node (partitioned or not)
    may remain, and the 1-row totals join must plan as a broadcast hash
    join (never the BNLJ a constant-folded key degrades to)."""
    for name in ("mixture_weights", "mixture_resample"):
        df = ent.queries()[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan, f"{name}: window remains in plan"
        assert "BroadcastHashJoin" in plan, f"{name}: totals join not BHJ"
