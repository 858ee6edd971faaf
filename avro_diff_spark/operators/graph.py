"""Distributed graph analytics: PageRank in deterministic fixed-point
arithmetic.

The Pregel-style iterative shape (Malewicz et al. 2010; Page et al.
1999): each round is one equi-join of the edge list with the current
rank vector plus one groupBy-sum — both shuffles keyed by node id, the
plan a 1000-executor cluster runs as hash-partitioned joins with
map-side partial sums. No driver-side state, no collect, no windows;
rank state is one row per node.

DETERMINISM contract (same discipline as functions/sketches.py): ranks
are int64 fixed-point (1e6 = rank 1.0). Per-edge contributions use exact
integer division (``div``), per-node sums are exact int64 (order-free),
and the damping step is ONE correctly-rounded double multiply + floor —
so any engine, any partitioning, any iteration order produces
bit-identical ranks, and a DuckDB recursive/unrolled oracle can
value-hash the result. Floating-point PageRank cannot cross an engine
boundary; fixed-point PageRank can.

Beyond-reference tier (yuana97/Avro_Diff has no graph surface): the
training-data use is ranking documents inside near-duplicate
neighborhoods (keep the most central copy, not an arbitrary min-id) and
generally link-graph quality weighting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RANK_SCALE = 1_000_000  # fixed-point: 1e6 == rank 1.0
DAMPING = 0.85
BASE_FP = 150_000  # (1 - DAMPING) * RANK_SCALE, exact in int


def symmetrize(pairs: DataFrame, a: str, b: str) -> DataFrame:
    """An undirected pair list -> the directed edge list PageRank walks
    (each pair contributes both directions)."""
    return pairs.select(
        F.col(a).alias("src"), F.col(b).alias("dst")
    ).unionByName(pairs.select(F.col(b).alias("src"), F.col(a).alias("dst")))


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list. Returns
    (node, rank_fp) with rank_fp int64-scaled by 1e6; ranks average
    ~1e6 over nodes (the per-node formulation r' = 0.15 + 0.85 * sum of
    in-neighbor r/deg).

    Every node present as src or dst participates; a symmetric graph
    (see :func:`symmetrize`) has no dangling nodes, the shape the
    near-dup neighborhood use produces. The static frames (node set,
    degree-attached edges) are materialized once and each round's rank
    frame is localCheckpoint-cut (round 15), so every round costs
    exactly one edge⋈rank join + one groupBy-sum + one node join over
    materialized inputs — never a plan k rounds deep, and never a
    broadcast build that re-executes the edge derivation. The math is
    unchanged (the state is the rows, deterministically
    reproducible)."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    deg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    # degree attached to the edge list ONCE (it never changes across
    # rounds), and both static frames materialized with localCheckpoint:
    # round 15 — the lazy formulation re-ran one join per round for the
    # same static degrees, and worse, every round's broadcast-build
    # subjob (sums / nodes side) re-executed the whole upstream lineage
    # (edge derivation included) because nothing below the loop was a
    # materialized leaf — measured 12s of 100+-task broadcast jobs for a
    # graph of a few thousand edges at sf0.1, ~3s after. One join per
    # round instead of two, leaves read from memory.
    e = (
        edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
        .join(deg, F.col("e_src") == deg["node"])
        .select("e_src", "e_dst", "deg")
        .localCheckpoint()
    )
    ranks = nodes.select("node", F.lit(RANK_SCALE).cast("long").alias("rank_fp"))
    for _ in range(iterations):
        contrib = e.join(ranks, e["e_src"] == ranks["node"]).select(
            F.col("e_dst").alias("node"),
            F.expr("rank_fp div deg").alias("c"),
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = nodes.join(sums, "node", "left").select(
            "node",
            (
                F.lit(BASE_FP)
                + F.floor(
                    F.lit(DAMPING)
                    * F.coalesce(F.col("s"), F.lit(0)).cast("double")
                )
            ).cast("long").alias("rank_fp"),
        # each round's rank frame is CUT here (the near_dup_clusters
        # lineage discipline): the next round's joins — and their
        # broadcast builds — read |nodes| materialized rows instead of a
        # plan k rounds deep
        ).localCheckpoint()
    return ranks


def pagerank_sql(
    edges_sql: str, *, iterations: int = 10, src: str = "src", dst: str = "dst"
) -> str:
    """The DuckDB twin (oracle): the same fixed-point iteration unrolled
    as one CTE per round."""
    its = []
    prev = "it0"
    for i in range(1, iterations + 1):
        its.append(
            f"""it{i} AS (
  SELECT n.node,
         {BASE_FP} + CAST(floor({DAMPING!r} * CAST(coalesce(s.s, 0) AS DOUBLE)) AS BIGINT) AS rank_fp
  FROM nodes n LEFT JOIN (
    SELECT e.{dst} AS node, sum(r.rank_fp // d.deg)::BIGINT AS s
    FROM edges e
    JOIN {prev} r ON e.{src} = r.node
    JOIN deg d ON e.{src} = d.node
    GROUP BY e.{dst}
  ) s ON n.node = s.node
)"""
        )
        prev = f"it{i}"
    chain = ",\n".join(its)
    return f"""
WITH edges AS MATERIALIZED ({edges_sql}),
nodes AS MATERIALIZED (SELECT DISTINCT node FROM (
  SELECT {src} AS node FROM edges UNION ALL SELECT {dst} AS node FROM edges)),
deg AS MATERIALIZED (SELECT {src} AS node, count(*)::BIGINT AS deg FROM edges GROUP BY {src}),
it0 AS (SELECT node, CAST({RANK_SCALE} AS BIGINT) AS rank_fp FROM nodes),
{chain}
SELECT node, rank_fp FROM {prev}
"""


# ---------------------------------------------------------- triangles ---


def canonical_edges(pairs: DataFrame, a: str, b: str) -> DataFrame:
    """Undirected edge list in canonical form: self-loops dropped, each
    edge once as (a, b) with a < b (node ids must be orderable/unique)."""
    lo, hi = F.least(F.col(a), F.col(b)), F.greatest(F.col(a), F.col(b))
    return (
        pairs.where(F.col(a) != F.col(b))
        .select(lo.alias("a"), hi.alias("b"))
        .distinct()
    )


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Exact triangle census of an undirected graph — degree-ordered
    edge-iterator counting (Schank 2007; the orientation bound of
    Cohen 2009 / Suri & Vassilvitskii 2011): orienting every edge from
    its lower-(degree, id) endpoint bounds each node's out-degree by
    O(sqrt(m)), then each edge (u, v) contributes
    ``|N+(u) ∩ N+(v)|`` triangles — every triangle is counted exactly
    once, on its (deg, id)-lowest edge.

    Optimization round 15: the previous formulation materialized the
    oriented WEDGE list through a self-join and semi-joined it against
    the closing edges — at sf0.1's co-purchase graph that is a 41M-row
    join output shuffled+sorted for the semi-join, against 1.2M edges
    (the plan's dominant exchange by 30x). The edge-iterator form
    shuffles only the m edge rows plus one sorted out-adjacency array
    per node, and the Θ(Σ wedge) work runs as per-row
    ``array_intersect`` inside codegen instead of a join. Max row width
    is the orientation's O(sqrt(m)) out-degree bound — the same bound
    that capped the wedge join's skew — so no row is unbounded and no
    hub explodes. Triangle counts are bit-identical (same census; the
    DuckDB oracle is an independent id-ordered 3-way join).

    Plan: 4 hash aggregations (canonical dedup, degrees, adjacency
    fold, final counts) + 4 equi-joins (2 degree attachments, 2
    adjacency attachments) — every shuffle keyed, map-side combined, no
    windows, no cartesians, no driver state. Integer-only, except the
    one correctly-rounded double divide finishing the global clustering
    coefficient (3*triangles/wedges, x1e6 floor) — the sketches'
    determinism discipline, so the oracle value-hashes this exactly.

    Input: canonical edges from :func:`canonical_edges`. Returns one row
    (n_nodes, n_edges, n_wedges, n_triangles, clustering_x1e6); empty
    graphs return all zeros.

    No explicit persist: the edge list and oriented list each feed
    several consumers, but their repeated subplans are identical
    EXCHANGES, which Spark's ReuseExchange dedupes at no cost — an
    explicit .persist() was measured SLOWER here (5.1s -> 6-7s at sf0.1
    on the co-purchase graph: cache materialization serializes what the
    reused shuffle files already share). Contrast pagerank_neardups,
    whose loop builds DIFFERENT plans per round and does need its edge
    persist."""
    e = edges
    deg = (
        e.select(F.explode(F.array("a", "b")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # attach endpoint degrees, orient lower (deg, id) -> higher
    ed = (
        e.join(deg.withColumnsRenamed({"v": "a", "deg": "da"}), "a")
        .join(deg.withColumnsRenamed({"v": "b", "deg": "db"}), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
    )
    # sorted out-adjacency per node (row width <= the O(sqrt(m))
    # orientation bound); each edge joins both endpoints' arrays and
    # intersects — |N+(u) ∩ N+(v)| per oriented edge (u, v)
    adj = oriented.groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("nbrs")
    )
    tri = (
        oriented.join(
            adj.select(F.col("src"), F.col("nbrs").alias("__nu")), "src"
        )
        .join(
            adj.select(F.col("src").alias("dst"), F.col("nbrs").alias("__nv")),
            "dst",
        )
        .select(F.size(F.array_intersect("__nu", "__nv")).alias("__c"))
        .agg(F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias("n_triangles"))
    )
    # wedge total from UNDIRECTED degrees: sum C(deg, 2), exact integers
    wed = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.coalesce(
            F.sum(F.expr("(deg * (deg - 1)) div 2")), F.lit(0)
        ).alias("n_wedges"),
    )
    ecnt = e.agg(F.count(F.lit(1)).alias("n_edges"))
    from avro_diff_spark.functions.canonical import fold_single_rows

    cols = ("n_nodes", "n_edges", "n_wedges", "n_triangles")
    folded = fold_single_rows([wed, ecnt, tri], list(cols))
    cc = F.floor(
        (F.lit(3.0) * F.col("n_triangles").cast("double"))
        / F.col("n_wedges").cast("double")
        * F.lit(1_000_000.0)
    ).cast("long")
    return folded.select(
        *cols,
        F.when(F.col("n_wedges") == 0, F.lit(0).cast("long"))
        .otherwise(cc)
        .alias("clustering_x1e6"),
    )
