"""Fixed-point PageRank (operators/graph.py): pinned against a pure-Python
recompute of the identical integer/float sequence, partitioning-invariant,
and sane (a hub outranks leaves)."""

from __future__ import annotations

import math

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
