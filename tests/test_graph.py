"""Fixed-point PageRank (operators/graph.py): pinned against a pure-Python
recompute of the identical integer/float sequence, partitioning-invariant,
and sane (a hub outranks leaves)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from avro_diff_spark.operators import graph as G


def _py_pagerank(edges, iterations):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    deg = {}
    for a, _ in edges:
        deg[a] = deg.get(a, 0) + 1
    r = {n: G.RANK_SCALE for n in nodes}
    for _ in range(iterations):
        s = {n: 0 for n in nodes}
        for a, b in edges:
            s[b] += r[a] // deg[a]
        r = {
            n: G.BASE_FP + math.floor(G.DAMPING * float(s[n]))
            for n in nodes
        }
    return r


def test_pagerank_matches_python(spark):
    # a star (hub 0) plus a chain and a self-contained triangle, symmetric
    pairs = [(0, i) for i in range(1, 8)] + [(8, 9), (9, 10), (11, 12), (12, 13), (13, 11)]
    pdf = spark.createDataFrame(pairs, "a long, b long")
    edges = G.symmetrize(pdf, "a", "b")
    got = {r.node: r.rank_fp for r in G.pagerank(edges, iterations=6).collect()}
    sym = pairs + [(b, a) for a, b in pairs]
    want = _py_pagerank(sym, 6)
    assert got == want
    # centrality sanity: the hub outranks every leaf
    assert all(got[0] > got[i] for i in range(1, 8))


def test_pagerank_partitioning_invariant(spark):
    pairs = [(i, (i * 7) % 23) for i in range(100) if i != (i * 7) % 23]
    pdf = spark.createDataFrame(pairs, "a long, b long")
    e = G.symmetrize(pdf, "a", "b")
    one = {tuple(r) for r in G.pagerank(e.repartition(1), iterations=4).collect()}
    many = {tuple(r) for r in G.pagerank(e.repartition(37), iterations=4).collect()}
    assert one == many


def test_pagerank_total_rank_conserved_approximately(spark):
    """On a symmetric graph total rank stays near n * RANK_SCALE (exact
    conservation up to the deterministic floor truncations)."""
    pairs = [(i, i + 1) for i in range(50)]
    e = G.symmetrize(spark.createDataFrame(pairs, "a long, b long"), "a", "b")
    rows = G.pagerank(e, iterations=5).collect()
    total = sum(r.rank_fp for r in rows)
    n = len(rows)
    assert abs(total - n * G.RANK_SCALE) / (n * G.RANK_SCALE) < 0.01


# ---------------------------------------------------------- triangles ---


def _brute(nodes, edges):
    import itertools

    adj = {n: set() for n in nodes}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    tri = sum(
        1
        for x, y, z in itertools.combinations(sorted(nodes), 3)
        if y in adj[x] and z in adj[x] and z in adj[y]
    )
    wed = sum(len(adj[n]) * (len(adj[n]) - 1) // 2 for n in nodes)
    return tri, wed


def _stats(spark, edges):
    from avro_diff_spark.operators.graph import canonical_edges, triangle_stats

    df = spark.createDataFrame(list(edges), "a long, b long")
    return triangle_stats(canonical_edges(df, "a", "b")).collect()[0]


@pytest.mark.parametrize("seed,p", [(3, 0.08), (11, 0.2), (29, 0.5)])
def test_triangles_match_brute_force(spark, seed, p):
    import itertools
    import random

    rng = random.Random(seed)
    nodes = list(range(35))
    edges = {(u, v) for u, v in itertools.combinations(nodes, 2) if rng.random() < p}
    got = _stats(spark, edges)
    tri, wed = _brute(nodes, edges)
    assert (got["n_triangles"], got["n_wedges"], got["n_edges"]) == (tri, wed, len(edges))


def test_triangles_special_graphs(spark):
    import itertools

    # K5: C(5,3)=10 triangles; star: 0; path: 0; self-loops/dups ignored
    k5 = set(itertools.combinations(range(5), 2))
    assert _stats(spark, k5)["n_triangles"] == 10
    star = {(0, i) for i in range(1, 10)}
    assert _stats(spark, star)["n_triangles"] == 0
    path = {(i, i + 1) for i in range(10)}
    assert _stats(spark, path)["n_triangles"] == 0
    messy = [(1, 2), (2, 1), (1, 1), (2, 3), (3, 1)]
    got = _stats(spark, messy)
    assert got["n_triangles"] == 1 and got["n_edges"] == 3


def test_triangles_plan_no_cartesian(spark):
    from avro_diff_spark.operators.graph import canonical_edges, triangle_stats

    df = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "a long, b long")
    plan = (
        triangle_stats(canonical_edges(df, "a", "b"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan
    # optimization round 15: the census counts per-edge via sorted
    # out-adjacency intersection — the wedge list must never be
    # materialized through a join again (at sf0.1's co-purchase graph
    # that was a 41M-row semi-join input vs 1.2M edges)
    assert "array_intersect" in plan
    assert "LeftSemi" not in plan


def test_triangles_empty_graph_total(spark):
    empty = spark.createDataFrame([], "a long, b long")
    from avro_diff_spark.operators.graph import triangle_stats

    got = triangle_stats(empty).collect()[0]
    assert tuple(got) == (0, 0, 0, 0, 0)
