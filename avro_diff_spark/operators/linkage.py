"""Record linkage / fuzzy matching under blocking.

The entity-resolution join a data-cleaning pipeline runs ("is this dirty
record the same entity as a master record?") — and the textbook place a
naive formulation explodes: string-distance joins have no equi-key, so
Spark would plan ``levenshtein(a, b) <= d`` alone as a broadcast
nested-loop over |A| x |B| pairs (the plan gate here bans exactly that).
The standard fix (Fellegi & Sunter 1969 linkage model; Christen 2012
blocking survey) is BLOCKING: only records agreeing on a cheap blocking
key are compared, chosen so the error model (typos in the tail, OCR
noise, …) cannot perturb it.

``fuzzy_join`` makes that shape mechanical: each blocking expression
becomes one hash EQUI-join on the computed key, the expensive string
distance runs only inside blocks as a residual filter, and multiple
blocking passes (to cover different error positions) union with pair
dedup. Cost ∝ sum of block-pair sizes — the knob the caller holds —
never |A| x |B|; every shuffle is keyed; no UDFs (``F.levenshtein`` is a
JVM builtin, and DuckDB ships the same function, so oracles cross-check
exactly).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def fuzzy_join(
    a: DataFrame,
    b: DataFrame,
    col: str,
    *,
    blocks: Sequence[Callable[[Column], Column]],
    max_dist: int = 1,
    a_keep: Sequence[str] = (),
    b_keep: Sequence[str] = (),
) -> DataFrame:
    """All (a, b) row pairs whose ``col`` values agree on AT LEAST ONE
    blocking key and lie within ``max_dist`` edit distance. Returns
    ``a_keep`` + ``a_<col>`` + ``b_keep`` + ``b_<col>`` + ``dist``.
    Pairs caught by several blocking passes appear once (dedup on the
    kept keys + both strings). NULL strings never match.

    Multiplicity contract: the final dedup collapses on the KEPT columns
    plus both strings, so input rows that are identical under the
    ``a_keep``/``b_keep`` projections collapse to ONE output pair —
    duplicate-row multiplicity is not preserved. Include a unique id in
    ``a_keep``/``b_keep`` (as the registered ``fuzzy_match_customers``
    query does with ``c_custkey``) when per-row pairing matters."""
    acol, bcol = f"a_{col}", f"b_{col}"
    left = a.where(F.col(col).isNotNull()).select(
        *a_keep, F.col(col).alias(acol)
    )
    right = b.where(F.col(col).isNotNull()).select(
        *b_keep, F.col(col).alias(bcol)
    )
    out = None
    for blk in blocks:
        j = (
            left.withColumn("_blk", blk(F.col(acol)))
            .join(right.withColumn("_blk", blk(F.col(bcol))), "_blk")
            .drop("_blk")
        )
        j = j.where(F.levenshtein(F.col(acol), F.col(bcol)) <= F.lit(max_dist))
        out = j if out is None else out.unionByName(j)
    if out is None:
        raise ValueError("fuzzy_join needs at least one blocking expression")
    return out.distinct().withColumn(
        "dist", F.levenshtein(F.col(acol), F.col(bcol)).cast("long")
    )


def fuzzy_join_passjoin(
    a: DataFrame,
    b: DataFrame,
    col: str,
    *,
    max_dist: int = 1,
    a_keep: Sequence[str] = (),
    b_keep: Sequence[str] = (),
    n_salts: int = 16,
) -> DataFrame:
    """:func:`fuzzy_join` with GENERAL-EDIT blocking: all (a, b) pairs
    within ``max_dist`` levenshtein distance, with NO declared error
    positions — robust to arbitrary substitutions, insertions and
    deletions anywhere in the string. Same output contract (kept cols +
    both strings + ``dist``, distinct; NULLs never match; the
    multiplicity-collapse note on :func:`fuzzy_join` applies).

    Blocking is the positional-segment pigeonhole scheme (the PassJoin
    family — Li, Deng, Feng, VLDB 2011 "PASS-JOIN: a partition-based
    method for similarity joins"):

    - INDEX side: each string of ``a`` (length L >= d+1) is evenly
      partitioned into d+1 contiguous segments; emit one row
      (L, segment index, segment text) per segment.
    - PROBE side: each string of ``b`` (length M) enumerates every
      compatible source length L in [M-d, M+d] (edit distance bounds
      length difference), recomputes the segment layout for that L, and
      emits every substring of itself with the segment's length whose
      start is within d of the segment's start.
    - candidates = one hash EQUI-join on (L, i, text); verification =
      the levenshtein residual inside blocks, as always.

    **Completeness (pigeonhole proof):** fix an optimal alignment of a
    to b with e <= d edits. The edits distribute over the d+1 segments
    of a, so some segment carries ZERO edits: it maps to an identical
    contiguous substring of b, whose start position differs from the
    segment's start by at most the net insertions-minus-deletions
    before it — at most d. The probe enumerates exactly (that L, that
    segment index, every start within +/-d clamped to valid range), so
    the pair lands in a block. Strings of ``a`` shorter than d+1 chars
    (degenerate: some segment would be empty) instead take a bounded
    SHORT-BLOCK pass — they can only match b-strings of length <= 2d,
    and the join keys on b's LENGTH (the a side enumerates its 2d+1
    compatible lengths), so even this degenerate bucket splits into
    per-length blocks; both sets are tiny in any real linkage column
    besides (documented assumption; the pytest property fuzzes both
    regimes).

    Cost: index fan-out d+1 rows per string, probe fan-out at most
    (2d+1)(d+1)(2d+1) rows per string — a constant in the edit budget,
    never |A| x |B|; every shuffle is keyed by (L, i, text). All
    expressions are JVM Columns (sequence/transform/substr) — no UDF.

    **Degenerate-block skew (``n_salts``):** real key columns share
    constant prefixes ("Customer#000000123"), so one segment's block can
    contain a large fraction of BOTH sides — correct (the residual
    filter still decides) but its verification work lands on ONE task,
    because the skew is in the join's OUTPUT, which AQE's
    input-byte-sized skew split never sees. The join key therefore
    carries a content-derived salt: the probe side computes
    ``crc32(string) % n_salts``, the index side replicates each segment
    row across all salts (a bounded (d+1)·n_salts fan-out of the
    SMALLER side), splitting every block's pair generation and
    residual verification n_salts ways — deterministic, layout-free,
    the ``operators/skew.py`` discipline. Verification uses the banded
    THRESHOLD levenshtein (O(d·n) per pair, JVM builtin) and the exact
    distance is recomputed only for surviving pairs.
    """
    d = int(max_dist)
    if d < 1:
        raise ValueError("max_dist must be >= 1 (use an equi-join for exact match)")
    acol, bcol = f"a_{col}", f"b_{col}"
    left = a.where(F.col(col).isNotNull()).select(*a_keep, F.col(col).alias(acol))
    right = b.where(F.col(col).isNotNull()).select(*b_keep, F.col(col).alias(bcol))
    if d == 1:
        return _fuzzy_join_del1(left, right, acol, bcol, a_keep, b_keep, n_salts)

    def _layout(L, i):
        """(start_0based, seg_len) of segment i in the even partition of
        a length-L string into d+1 parts (first L%(d+1) parts one longer)."""
        base = F.floor(L / F.lit(d + 1)).cast("int")
        rem = F.pmod(L, F.lit(d + 1)).cast("int")
        seg_len = base + F.when(i < rem, F.lit(1)).otherwise(F.lit(0))
        start = i * base + F.least(i, rem)
        return start, seg_len

    # ---- long-string passes (L >= d+1): segment index join ----
    s, t = F.col(acol), F.col(bcol)
    La, M = F.length(s).cast("int"), F.length(t).cast("int")
    r = max(int(n_salts), 1)
    idx = (
        left.where(La >= d + 1)
        .select("*", F.explode(F.sequence(F.lit(0), F.lit(d))).alias("_i"))
        .select("*", F.explode(F.sequence(F.lit(0), F.lit(r - 1))).alias("_salt"))
    )
    a_start, a_len = _layout(F.length(F.col(acol)).cast("int"), F.col("_i"))
    idx = idx.select(
        "*",
        F.length(F.col(acol)).cast("int").alias("_L"),
        F.col(acol).substr(a_start + 1, a_len).alias("_seg"),
    )

    probe = right.select(
        "*",
        F.explode(
            F.when(
                F.greatest(M - d, F.lit(d + 1)) <= M + d,
                F.sequence(F.greatest(M - d, F.lit(d + 1)), M + d),
            )
        ).alias("_L"),
    ).select("*", F.explode(F.sequence(F.lit(0), F.lit(d))).alias("_i"))
    p_start, p_len = _layout(F.col("_L"), F.col("_i"))
    lo = F.greatest(p_start - d, F.lit(0))
    hi = F.least(p_start + d, F.length(F.col(bcol)).cast("int") - p_len)
    probe = probe.select(
        "*", F.explode(F.when(lo <= hi, F.sequence(lo, hi))).alias("_st")
    ).select(
        *b_keep,
        bcol,
        "_L",
        "_i",
        F.pmod(F.crc32(F.col(bcol)), F.lit(r)).cast("int").alias("_salt"),
        F.col(bcol).substr(F.col("_st") + 1, p_len).alias("_seg"),
    )

    # Explicit-count repartition on the join key: the candidate blocks
    # are SMALL IN BYTES but EXPLOSIVE IN OUTPUT, so AQE's byte-sized
    # coalesce would merge them into one task and serialize the
    # verification; a user-specified partition count is exempt from
    # coalescing and keeps the salted blocks spread.
    jkeys = ["_L", "_i", "_salt", "_seg"]
    nparts = max(2 * r, 16)
    pairs = (
        idx.repartition(nparts, *jkeys)
        .join(probe.repartition(nparts, *jkeys), jkeys)
        .select(*a_keep, acol, *b_keep, bcol)
    )

    # ---- short-block pass (L <= d): bounded degenerate bucket ----
    # LENGTH-keyed (round-12 nit): a short a-string only matches b of
    # length within d of its own, so the a side enumerates its 2d+1
    # compatible target lengths and the join keys on b's actual length —
    # the degenerate bucket splits into per-length blocks and pairs
    # violating the length bound never materialize. (The key varies over
    # the data, so Catalyst cannot constant-fold it into a BNLJ.)
    short_a = left.where(La <= d).select(
        *a_keep,
        acol,
        F.explode(
            F.sequence(F.greatest(La - d, F.lit(0)), F.least(La + d, F.lit(2 * d)))
        ).alias("_m"),
    )
    short_b = right.where(M <= 2 * d).withColumn("_m", M)
    shorts = short_a.join(short_b, "_m").select(*a_keep, acol, *b_keep, bcol)

    # banded threshold verify (O(d*n) per pair); exact distance only for
    # the (few) survivors
    within = F.levenshtein(F.col(acol), F.col(bcol), d)
    out = pairs.unionByName(shorts).where((within >= 0) & (within <= F.lit(d)))
    return out.distinct().withColumn(
        "dist", F.levenshtein(F.col(acol), F.col(bcol)).cast("long")
    )


def _del_variants(scol: Column) -> Column:
    """The single-deletion neighborhood of a string as a distinct array:
    the string itself plus every string obtained by deleting exactly one
    character (n+1 variants, deduplicated — a run of equal characters
    yields one variant, not run-length many)."""
    n = F.length(scol)
    dels = F.when(n < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            # sequence() DESCENDS when start > stop, hence the n<1 guard
            F.sequence(F.lit(1), n),
            lambda i: F.concat(
                scol.substr(F.lit(1), i - 1), scol.substr(i + 1, n - i)
            ),
        )
    )
    return F.array_distinct(F.concat(F.array(scol), dels))


def _fuzzy_join_del1(
    left: DataFrame,
    right: DataFrame,
    acol: str,
    bcol: str,
    a_keep: Sequence[str],
    b_keep: Sequence[str],
    n_salts: int,
) -> DataFrame:
    """``max_dist == 1`` candidate generation by the DELETION-NEIGHBORHOOD
    join (the FastSS / Mor-Fraenkel scheme, round 15) instead of the
    positional-segment pigeonhole.

    **Why (measured):** PassJoin's d+1 = 2 even segments degenerate on
    key-like columns with a long shared prefix — every
    ``Customer#000000...`` row carries the identical first segment, so
    ONE block holds a large fraction of both sides and the candidate set
    collapses to an effective |A| x |B| through it (~45M verified pairs /
    ~43s of executor CPU for 3k x 15k rows at sf0.1). Deletion variants
    of ID-like strings are near-unique, so blocks stay proportional to
    the true near-match neighborhoods.

    **Completeness (exactness unchanged):** lev(a, b) <= 1 implies the
    single-deletion neighborhoods D1(a) and D1(b) intersect —
    substitution at i: delete position i from both; insertion/deletion:
    the shorter string is itself a member of the longer one's
    neighborhood and of its own (identity); equality: the identity
    variant. Every candidate still passes the SAME banded-levenshtein
    verification, so false candidates (shared variant at distance 2,
    xxhash64 collisions) are dropped and the output law is identical to
    the segment path's — pinned by the fuzz property in
    tests/test_linkage.py, which compares against brute force.

    Scale shape: fan-out n+1 variant rows per string (vs the segment
    path's (d+1)·n_salts index fan-out), shuffles keyed by the 8-byte
    ``xxhash64(variant)`` instead of segment text, and the same
    content-salt split (probe side ``crc32 % n_salts``, index side
    replicated) so a degenerate block of byte-identical strings — the
    one block this scheme can still produce — spreads over tasks."""
    r = max(int(n_salts), 1)
    av = (
        left.select(
            *a_keep, acol, F.explode(_del_variants(F.col(acol))).alias("_v")
        )
        .select(*a_keep, acol, F.xxhash64("_v").alias("_h"))
        .select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(r - 1))).alias("_salt")
        )
    )
    bv = right.select(
        *b_keep, bcol, F.explode(_del_variants(F.col(bcol))).alias("_v")
    ).select(
        *b_keep,
        bcol,
        F.xxhash64("_v").alias("_h"),
        F.pmod(F.crc32(F.col(bcol)), F.lit(r)).cast("int").alias("_salt"),
    )
    # explicit-count repartition: candidate blocks are small in bytes but
    # explosive in join output, so AQE's byte-sized coalesce would fold
    # them into few tasks (same rationale as the segment path)
    nparts = max(2 * r, 16)
    jkeys = ["_h", "_salt"]
    pairs = (
        av.repartition(nparts, *jkeys)
        .join(bv.repartition(nparts, *jkeys), jkeys)
        # length bound: |len(a) - len(b)| <= 1 for any true match; cheap
        # pre-filter ahead of the DP
        .where(
            F.abs(F.length(F.col(acol)) - F.length(F.col(bcol))) <= F.lit(1)
        )
        .select(*a_keep, acol, *b_keep, bcol)
    )
    within = F.levenshtein(F.col(acol), F.col(bcol), 1)
    out = pairs.where((within >= 0) & (within <= F.lit(1)))
    return out.distinct().withColumn(
        "dist", F.levenshtein(F.col(acol), F.col(bcol)).cast("long")
    )
