"""Deduplication operators for LLM-training-data pipelines.

North-star extensions (BASELINE.json) — no reference code exists; designed
Spark-first for 100 TB:

- exact dedup: hash-groupBy on a normalized-text fingerprint. One shuffle on
  the 16-byte fingerprint, map-side partial agg; survivors picked by min id
  (deterministic).
- MinHash + LSH near-dup: shingle → exact int64 polynomial hash (radix
  encoding, collision-free on ASCII — functions/text.py
  char_shingle_hashes) → n universal-hash mins (all JVM expression work,
  no UDFs) → band buckets → candidate pairs via a
  self-equi-join on (band, band_key) — the classic shuffle-friendly LSH: at
  100 TB the only join is on band keys, never all-pairs. Candidates are then
  verified with exact Jaccard.
- SimHash: 32-bit sign-of-weighted-bit-sums over token hashes; near-dups =
  pairs at small Hamming distance.
- n-gram Jaccard: exact pairwise similarity via a prefix-filtering join
  (AllPairs/PPJoin family) over hashed shingles, verified with
  array_intersect — never an unfiltered all-pairs product.

Every constant is deterministic and every value integer/md5/polynomial-
derived so the DuckDB oracles reproduce results exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from avro_diff_spark.sources.tables import spread_small
from avro_diff_spark.functions.text import (
    MERSENNE_P,
    char_codes,
    fingerprint_md5,
    hash32,
    poly_shingle_hashes,
    tokens_ws,
)

# Deterministic universal-hash parameters for minhash: a_i odd, b_i spread.
# (Quality needs only pairwise independence-ish mixing; determinism and
# engine portability matter more than cryptographic strength.)
def minhash_params(n: int) -> list[tuple[int, int]]:
    return [(2 * i + 3, (7919 * (i + 1)) % MERSENNE_P) for i in range(n)]


def exact_dedup_clusters(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Duplicate clusters under exact normalized-text equality.

    Columns: ``fingerprint`` (md5), ``n_docs``, ``keep_id`` (min id — the
    deterministic survivor). Only clusters with >1 member.
    """
    return (
        df.select(
            fingerprint_md5(F.col(text_col)).alias("fingerprint"),
            F.col(id_col).alias("__id"),
        )
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("__id").alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Deduplicated view: keep the min-id row per exact normalized text.

    Implemented as a self-contained groupBy+join (not dropDuplicates, whose
    survivor choice is partition-order-dependent — unacceptable at scale).
    """
    keep = (
        df.select(
            fingerprint_md5(F.col(text_col)).alias("fingerprint"),
            F.col(id_col).alias(id_col),
        )
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, on=id_col, how="inner")


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n_hashes: int = 32,
    shingle_k: int = 5,
) -> DataFrame:
    """(id, sig array<long>, n_shingles) — one row per document.

    The shingle set is hashed once (int64 polynomial); each signature slot is
    ``min((a_i*h + b_i) mod p)`` over the distinct shingle hashes: pure
    array expressions, distributed row-wise, no shuffle at all.

    The hashed-shingle array is materialized in its own projection so the
    n_hashes slots share one evaluation — inlining it would re-run the
    shingle-hash pipeline per slot (an n_hashes× CPU blowup; Catalyst's
    CollapseProject rightly refuses to inline a non-cheap alias referenced
    more than once, which is exactly the behavior relied on here).
    """
    # codes staged as a projected column: the polynomial references the
    # array k times per position (see char_codes docstring)
    hashed = (
        spread_small(df)
        .select(
            F.col(id_col).alias("doc_id"),
            char_codes(F.col(text_col)).alias("__codes"),
        )
        .select(
            "doc_id",
            F.array_distinct(poly_shingle_hashes(F.col("__codes"), shingle_k)).alias("sh"),
        )
    )
    return _signatures_from_sh(hashed, n_hashes)


def _signatures_from_sh(doc_sh: DataFrame, n_hashes: int) -> DataFrame:
    """Signatures from a precomputed (doc_id, sh) frame — lets callers share
    one shingle-hashing pass (and its reusable exchange) between signature
    generation and Jaccard verification.

    Empty-shingle docs (text shorter than shingle_k) get all-null signature
    slots; they are excluded at BANDING (null band keys, see
    :func:`lsh_candidate_pairs`) rather than filtered here — a filter on
    size(sh) above the repartition gets predicate-pushed through the
    projection into the scan, re-evaluating the whole shingle chain per row
    (measured 2.4× on the minhash query).

    Formulation benchmarked three ways at sf0.1 (identical output
    checksums): per-slot ``array_min(transform(...))`` wins over both a
    single 32-slot running-min array fold (zip_with allocates two 32-elem
    arrays per shingle — ~10% slower warm) and 32 scalar ``aggregate``
    folds (higher-order scalar lambdas pay per-call interpretation —
    ~25% slower warm). The transform's intermediate array is bulk-allocated
    once per slot and the min runs as a tight primitive loop."""
    params = minhash_params(n_hashes)

    # factory, not default-arg closure: PySpark reflects on lambda arity
    def _uh(a: int, b: int):
        return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P)

    sig = F.array(
        *[F.array_min(F.transform(F.col("sh"), _uh(a, b))) for a, b in params]
    )
    return doc_sh.select(
        "doc_id",
        sig.alias("sig"),
        F.size("sh").alias("n_shingles"),
    )


def band_rows(
    sig_df: DataFrame, *, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """(doc_id, band_id, band_key) LSH bucket rows — the banding step of
    :func:`lsh_candidate_pairs`, factored out so the persisted near-dup
    index (operators/neardup_index.py) stores and probes EXACTLY the
    buckets the batch pipeline computes.

    Null band key for empty-shingle docs (all-null signature slots):
    without the guard, array_join skips nulls and every empty doc lands
    on identical band keys — a mega-bucket of meaningless candidates.
    The guard lives INSIDE the banding expression and the null filter
    sits above the Generate, where Catalyst cannot push it down into the
    signature computation (a size(sh) filter upstream re-evaluates the
    shingle chain at the scan — measured 2.4× on the minhash query)."""
    return (
        sig_df.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_id"),
                            F.when(
                                F.element_at(F.col("sig"), 1).isNotNull(),
                                F.md5(
                                    F.array_join(
                                        F.slice(
                                            F.col("sig"), b * rows_per_band + 1, rows_per_band
                                        ),
                                        ",",
                                    )
                                ),
                            ).alias("band_key"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("band"),
        )
        .select("doc_id", "band.band_id", "band.band_key")
        .where(F.col("band_key").isNotNull())
    )


def lsh_candidate_pairs(
    sig_df: DataFrame,
    *,
    bands: int = 8,
    rows_per_band: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing at least one LSH band.

    Explode each signature into ``bands`` (band_id, band_key) buckets, then
    groupBy the bucket and expand pairs *within* each bucket. One shuffle on
    the (band_id, md5-of-slice) key — small and uniformly distributed — and
    the signature plan is evaluated exactly once (a self-join formulation
    would evaluate it twice, once per side).

    Scale note: a bucket of n docs yields n·(n-1)/2 pairs; that cardinality
    is inherent to candidate generation, but by default the *expansion* of
    one bucket happens in a single task. Corpora with massive
    exact-duplicate clusters should run :func:`exact_dedup` first (standard
    practice) so no bucket is pathological — or set ``max_bucket``: member
    lists longer than it are split into ``⌈n/max_bucket⌉`` chunks whose
    chunk-pair grid (within-chunk i<j triangles + cross-chunk rectangles —
    exactly the original pair set, since the sorted list makes every cross
    pair ordered) is round-robin-repartitioned before expansion, so one
    mega-bucket's O(n²) work spreads across the cluster at the cost of one
    extra exchange of the (bounded-length) chunk rows. Identical output
    either way.
    """
    banded = band_rows(sig_df, bands=bands, rows_per_band=rows_per_band)
    ids = F.col("ids")
    pair_structs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.greatest(F.size(ids) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    buckets = (
        banded.groupBy("band_id", "band_key")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
        # Identical member lists recur across bands (every doc cluster that
        # agrees on the whole signature collides in all ``bands`` buckets),
        # so dedupe on the sorted id-list BEFORE the O(n²) pair expansion:
        # one expansion per distinct co-bucket set instead of up to
        # ``bands``× the work feeding the pair-level distinct (measured
        # ~8× fewer expanded rows on the dups corpus).
        .select("ids")
        .distinct()
    )
    if max_bucket is not None:
        return _chunked_pair_expansion(buckets, int(max_bucket))
    return (
        buckets
        # explode_outer: plain explode would make Catalyst infer a
        # size()>0 filter that re-evaluates the O(n²) pair construction a
        # second time per bucket (see _prefix_candidates for the pattern)
        .select(F.explode_outer(pair_structs).alias("p"))
        .where(F.col("p").isNotNull())
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def _chunked_pair_expansion(buckets: DataFrame, max_bucket: int) -> DataFrame:
    """Pair expansion with per-bucket skew split (see
    :func:`lsh_candidate_pairs` ``max_bucket``). ``buckets`` is one row per
    distinct sorted member list ``ids``; output is the identical distinct
    (doc_a < doc_b) pair set the single-task expansion produces.

    The sorted list is cut into fixed-size chunks; each (chunk_i ≤ chunk_j)
    grid cell becomes its own row BEFORE the quadratic expansion, and a
    round-robin repartition spreads the cells over the cluster. A diagonal
    cell expands its i<j triangle; an off-diagonal cell expands the full
    rectangle — ordered automatically because every element of an earlier
    chunk sorts below every element of a later one.
    """
    C = max_bucket
    ids = F.col("ids")
    n_chunks = F.ceil(F.size(ids) / F.lit(C)).cast("int")
    cells = F.flatten(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.transform(
                F.sequence(i, n_chunks - 1),
                lambda j: F.struct(
                    F.slice(ids, i * C + 1, C).alias("ca"),
                    F.when(j > i, F.slice(ids, j * C + 1, C)).alias("cb"),
                ),
            ),
        )
    )
    cell_rows = (
        buckets.select(F.explode_outer(cells).alias("cell"))
        .where(F.col("cell").isNotNull())
        .select("cell.ca", "cell.cb")
        # round-robin: spread the grid cells of ONE mega-bucket across
        # tasks; each moved row is at most 2·max_bucket ids
        .repartition(buckets.sparkSession.sparkContext.defaultParallelism)
    )
    ca, cb = F.col("ca"), F.col("cb")
    tri = F.flatten(
        F.transform(
            ca,
            lambda x, i: F.transform(
                F.slice(ca, i + 2, F.greatest(F.size(ca) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    rect = F.flatten(
        F.transform(
            ca,
            lambda x: F.transform(cb, lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b"))),
        )
    )
    pairs = F.when(cb.isNull(), tri).otherwise(rect)
    return (
        cell_rows.select(F.explode_outer(pairs).alias("p"))
        .where(F.col("p").isNotNull())
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def _doc_shingles(
    df: DataFrame, text_col: str, id_col: str, shingle_k: int
) -> DataFrame:
    """(doc_id, sh: array<long>) — distinct hashed shingles per document.

    The explicit repartition on TOP of the array-building select is load-
    bearing: callers reference this subtree several times (candidate
    generation + both verification sides), and exchange reuse (AQE's
    runtime stage cache; ReuseExchange without AQE) dedupes identical
    Exchange subtrees — so the shingle+hash work runs ONCE and every
    other consumer reads the shuffle output. Without it a self-join
    lineage recomputes the arrays per consumer.

    The explicit ``isNotNull`` filter is equally load-bearing (round 15):
    the verification joins push an inferred ``isnotnull(doc_id)`` into
    THEIR copies of this subtree but not into the signature path's copy,
    so the three exchange subtrees stopped canonicalizing equal and the
    shingle-hash chain (the dominant per-row cost) ran once per copy —
    measured via ``sameResult`` over the physical plan's exchanges.
    Filtering here makes the join pushdown a no-op, all copies identical,
    and the stage reused; a null-id document could never survive the
    id-keyed joins anyway, so results are unchanged.
    """
    return (
        spread_small(df)
        .where(F.col(id_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            # staged column: see char_codes docstring (k refs per position)
            char_codes(F.col(text_col)).alias("__codes"),
        )
        .select(
            "doc_id",
            F.array_distinct(
                poly_shingle_hashes(F.col("__codes"), shingle_k)
            ).alias("sh"),
        )
        .repartition(F.col("doc_id"))
    )


def _verify_pairs(
    candidates: DataFrame, doc_sh: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of (doc_a, doc_b) candidate pairs against
    per-doc shingle arrays. Work ∝ candidate count.

    No join-strategy hints: under AQE the join sides materialize as
    shuffle stages first, and a runtime demotion to broadcast READS the
    existing shuffle output rather than recomputing the shingle pass (the
    static-planner recompute hazard that once motivated shuffle_hash
    hints here doesn't exist post-materialization — measured ~20% faster
    without the hints, and at scale AQE keeps the shuffled join when the
    sides are big).
    """
    # try_divide: two empty shingle sets give a 0 divisor, which throws
    # DIVIDE_BY_ZERO under Spark 4's ANSI default (null → dropped by the
    # threshold filter, the correct semantics for an undefined Jaccard)
    jac = F.try_divide(
        F.col("n_common").cast("double"),
        F.col("n_a") + F.col("n_b") - F.col("n_common"),
    )
    # Explicit-n repartitions on the join keys: per-pair cost here is an
    # O(|sh|) array_intersect, so bytes wildly understate CPU and AQE
    # coalesces these joins to a handful of tasks (measured 4 of 32 at
    # sf0.1 — the pair bytes are tiny). A user repartition with explicit n
    # is not AQE-coalescible; both sides aligned on (key, n) also means
    # the joins add no further exchange. At real scale the exchange simply
    # replaces the one the join itself would have inserted.
    n_part = candidates.sparkSession.sparkContext.defaultParallelism
    av = doc_sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    bv = doc_sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    # Length-ratio prefilter (optimization round 16, guide §3): Jaccard ≥ t
    # forces t·max(|A|,|B|) ≤ min(|A|,|B|) (|A∩B| ≤ min, |A∪B| ≥ max), so
    # length-skewed candidates are decided from the two array SIZES alone
    # and never pay the O(|sh|) array_intersect. Applied between the size
    # projection and the intersect — no extra join, results unchanged
    # (every filtered pair fails the exact-Jaccard threshold anyway).
    t = float(threshold)
    len_ok = (
        F.greatest(F.col("n_a"), F.col("n_b")) * F.lit(t)
        <= F.least(F.col("n_a"), F.col("n_b"))
    )
    out = (
        candidates.repartition(n_part, "doc_a")
        .join(av.repartition(n_part, "doc_a"), "doc_a")
        .repartition(n_part, "doc_b")
        .join(bv.repartition(n_part, "doc_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size("sh_a").alias("n_a"),
            F.size("sh_b").alias("n_b"),
            "sh_a",
            "sh_b",
        )
        .filter(len_ok)
        .select(
            "doc_a",
            "doc_b",
            "n_a",
            "n_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("n_common"),
        )
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("doc_a", "doc_b", "n_a", "n_b", "n_common", "jaccard")


def _prefix_candidates(doc_sh: DataFrame, threshold: float) -> DataFrame:
    """Candidate pairs via a PPJoin-style positional prefix-filtering join.

    Under any fixed global order of shingles, two sets with Jaccard ≥ t
    must share at least one of each other's first ``|d| − ⌈t·|d|⌉ + 1``
    shingles (the *prefix*); ordering by ascending corpus document
    frequency makes those prefix shingles the rarest ones, so the candidate
    join touches small buckets instead of every co-shingle pair.

    On top of the static prefix, the join applies PPJoin's **position
    filter**: a valid pair must share a prefix shingle at ranks
    ``rank_a ≤ n_a − α + 1`` and ``rank_b ≤ n_b − α + 1`` where
    ``α = t/(1+t)·(n_a+n_b)`` is the overlap a Jaccard-t pair needs
    (prefix lemma with the pair-dependent α — strictly tighter than the
    single-sided static prefix, typically 2-3× fewer raw join rows and
    candidates). α is left as a real number: the un-ceiled bound is looser
    than the integer one, so the filter stays sound under float rounding.
    """
    from pyspark.sql import Window

    # explode_outer, NOT explode: plain explode makes Catalyst infer a
    # `size(sh) > 0 AND isnotnull(sh)` filter and push it through the
    # repartition exchange into the scan — where `sh` is not a column, so
    # the entire shingle-hash expression chain gets inlined and re-evaluated
    # per input row (2× on top of the real computation). explode_outer
    # infers nothing; the cheap post-explode null filter is equivalent
    # because no document has a null/empty shingle set row that matters.
    # n_sh rides along from the array (sh is exchange-materialized: size()
    # is a cheap column op, and it saves a count-over-partition later).
    exploded = doc_sh.select(
        "doc_id", F.size("sh").alias("n_sh"), F.explode_outer("sh").alias("s")
    ).where(F.col("s").isNotNull())
    # global order: (document frequency asc, shingle asc) — any total
    # order works for correctness; rarest-first minimizes bucket sizes.
    # Broadcast: the char-shingle domain is bounded by alphabet^k (a few
    # million for normalized text at k=5), INDEPENDENT of corpus size, so
    # the dfreq map stays broadcastable at any scale.
    dfreq = exploded.groupBy("s").agg(F.count(F.lit(1)).alias("df_s"))
    # rank via a window instead of per-doc collect_list + array sort: the
    # broadcast join preserves doc_sh's doc_id partitioning, so the window
    # adds only a sort (no exchange), streams instead of building per-doc
    # arrays, and skips the slice/transform re-materialization.
    w = Window.partitionBy("doc_id").orderBy("df_s", "s")
    ranked = exploded.join(F.broadcast(dfreq), "s").select(
        "doc_id", "n_sh", "s", F.row_number().over(w).alias("rank")
    )
    # static prefix size for Jaccard t: |d| - ceil(t*|d|) + 1
    plen = (
        F.col("n_sh")
        - F.ceil(F.lit(float(threshold)) * F.col("n_sh")).cast("int")
        + 1
    )
    prefix = ranked.where(F.col("rank") <= plen).select("doc_id", "n_sh", "rank", "s")
    a, b = prefix.alias("a"), prefix.alias("b")
    t = float(threshold)
    # length filter (PPJoin): jaccard >= t forces t*max(|A|,|B|) <= min
    len_ok = (
        F.greatest(F.col("a.n_sh"), F.col("b.n_sh")) * F.lit(t)
        <= F.least(F.col("a.n_sh"), F.col("b.n_sh"))
    )
    alpha = (F.col("a.n_sh") + F.col("b.n_sh")) * F.lit(t / (1.0 + t))
    pos_ok = (F.col("a.rank") <= F.col("a.n_sh") - alpha + 1) & (
        F.col("b.rank") <= F.col("b.n_sh") - alpha + 1
    )
    return (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & len_ok
            & pos_ok,
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_k: int = 5,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for pairs above ``threshold``.

    Without ``candidates``: a positional **prefix-filtering join** (the
    AllPairs/PPJoin family, see :func:`_prefix_candidates`) — exact results
    at a fraction of the naive inverted-index cost (which is quadratic in
    docs-per-frequent-shingle and dies at scale).

    With ``candidates`` (e.g. from LSH): skip straight to verification.

    Either way verification joins the pairs to per-doc distinct-shingle
    arrays and intersects row-wise (``array_intersect``) — work
    proportional to the candidate count.

    Shingles are represented by their exact int64 polynomial encoding
    throughout (collision-free on ASCII, see char_shingle_hashes): int64
    join keys and arrays shuffle ~3× smaller than k-char strings and
    intersect faster; the DuckDB oracle computes the identical polynomial,
    so results match bit-for-bit.

    Columns: doc_a, doc_b, n_a, n_b, n_common, jaccard.
    """
    doc_sh = _doc_shingles(df, text_col, id_col, shingle_k)
    if candidates is None:
        candidates = _prefix_candidates(doc_sh, threshold)
    return _verify_pairs(candidates, doc_sh, threshold)


def minhash_near_dups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    threshold: float = 0.5,
    max_bucket: int | None = None,
) -> DataFrame:
    """LSH-candidate generation + exact-Jaccard verification.

    Signatures AND verification both derive from one shared (doc_id, sh)
    subtree (same repartition exchange), so the shingle-hash pass — the
    dominant per-row cost — runs once, not three times.

    ``max_bucket`` (optional) splits pathological LSH buckets' pair
    expansion across the cluster — see :func:`lsh_candidate_pairs`.
    """
    rows_per_band = n_hashes // bands
    doc_sh = _doc_shingles(df, text_col, id_col, shingle_k)
    sigs = _signatures_from_sh(doc_sh, n_hashes)
    cands = lsh_candidate_pairs(
        sigs, bands=bands, rows_per_band=rows_per_band, max_bucket=max_bucket
    )
    return _verify_pairs(cands, doc_sh, threshold)


def simhash32(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """32-bit SimHash over whitespace tokens (with multiplicity).

    bit_b(doc) = sign of Σ_tokens (2*bit_b(hash32(token)) − 1); the fingerprint
    packs the 32 sign bits. Pure array expressions, no shuffle.
    """
    tok_hashes = F.transform(tokens_ws(F.col(text_col)), hash32)

    # ONE fold over the token array with a 32-slot accumulator — not 32
    # separate aggregates: the single-fold form generates ~1/10th the
    # codegen (32 aggregates compiled ~4s of driver-side codegen at first
    # run). Bit b of h is tested as (h div 2^b) mod 2 — F.shiftright needs
    # a literal bit count, but dividing by a powers-of-two array element is
    # identical for the non-negative 32-bit hash values (and matches the
    # oracle's (h // 2^b) % 2 exactly).
    powers = F.lit([1 << b for b in range(32)]).cast("array<bigint>")
    bit_sums = F.aggregate(
        tok_hashes,
        F.array_repeat(F.lit(0), 32),
        lambda acc, h: F.zip_with(
            acc,
            powers,
            lambda a, p: a
            + F.when((h / p).cast("long") % 2 == 1, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    packed = F.aggregate(
        F.zip_with(
            bit_sums,
            powers,
            lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return spread_small(df).select(
        F.col(id_col).alias("doc_id"), packed.alias("simhash")
    )


def duplicate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    ngram_w: int = 8,
    min_docs: int = 2,
    max_doc_list: int = 20,
) -> DataFrame:
    """Word-n-gram spans appearing in ≥ ``min_docs`` documents — the
    substring-level contamination/boilerplate detector from the
    training-data dedup literature (duplicated spans across documents,
    not whole-document duplicates).

    Scale shape: each doc explodes its distinct hashed w-grams, ONE shuffle
    on the gram hash, map-side partial agg; no pairwise work at any point.
    ``doc_ids`` lists the first ``max_doc_list`` member docs (lowest ids —
    deterministic); ``n_docs`` is always the full count. The doc list is
    BOUNDED BEFORE aggregation (rank-within-gram window + filter), never
    an uncapped collect_set later sliced: a boilerplate gram shared by
    millions of docs would otherwise materialize the whole set in one
    reducer. The count and the capped list aggregate on the same shuffle
    key, so AQE reuses one exchange for both.

    Columns: gram_hash, n_docs, doc_ids (comma-joined, capped).
    """
    from pyspark.sql import Window

    from avro_diff_spark.functions.text import word_shingles

    grams = F.array_distinct(
        F.transform(word_shingles(F.col(text_col), ngram_w), hash32)
    )
    exploded = (
        spread_small(df)
        .select(F.col(id_col).alias("doc_id"), F.explode_outer(grams).alias("gram_hash"))
        .where(F.col("gram_hash").isNotNull())
    )
    counts = (
        exploded.groupBy("gram_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )
    w = Window.partitionBy("gram_hash").orderBy("doc_id")
    sample = (
        exploded.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_doc_list)
        .groupBy("gram_hash")
        .agg(F.array_join(F.sort_array(F.collect_list("doc_id")), ",").alias("doc_ids"))
    )
    return counts.join(sample, "gram_hash").select("gram_hash", "n_docs", "doc_ids")


def exact_substring_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    ngram_w: int = 8,
    min_count: int = 2,
    min_tokens: int = 10,
) -> DataFrame:
    """MAXIMAL repeated token spans ≥ ``min_tokens`` — the ExactSubstr
    dedup shape (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better", arXiv:2107.06499): where
    :func:`duplicate_spans` reports which fixed-w grams repeat,
    this chains ADJACENT hits into the maximal span a dedup pass would
    actually cut. A token position p is a hit when the w-gram starting at
    p occurs ≥ ``min_count`` times in the CORPUS — occurrences, not
    distinct documents, exactly the suffix-array repeat count the Lee et
    al. pass thresholds, so a gram repeated twice inside ONE document
    qualifies too (the round-6 min!=max-on-doc_id shortcut missed those
    self-repeats; in-document boilerplate is a real dedup target). A
    maximal run of consecutive hit positions [p0..p1] covers tokens
    [p0, p1 + w - 1], i.e. ``span_tokens = p1 - p0 + w`` (every w-window
    inside it is duplicated — the suffix-array interval ExactSubstr
    extracts, found here by span-chaining instead of a distributed
    suffix array).

    Scale shape: positioned w-grams (one posexplode, no distinct — the
    position matters), ONE shuffle on the gram hash for the plain
    occurrence count (map-side partial agg — cheaper than any distinct),
    an equi-join back on the hash, then the gaps-and-islands window
    partitioned by doc (one shuffle on doc_id); no pairwise work at any
    point, and every stage is key-partitioned.

    Columns: doc_id, span_start (token index), span_tokens, n_grams
    (= run length, the count of duplicated windows the span chains).
    """
    from pyspark.sql import Window

    from avro_diff_spark.functions.text import word_shingles

    pg = (
        spread_small(df)
        .select(
            F.col(id_col).alias("doc_id"),
            F.posexplode_outer(
                F.transform(word_shingles(F.col(text_col), ngram_w), hash32)
            ).alias("pos", "gram_hash"),
        )
        .where(F.col("gram_hash").isNotNull())
    )
    dup = (
        pg.groupBy("gram_hash")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= min_count)
        .select("gram_hash")
    )
    hits = pg.join(dup, "gram_hash").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = hits.withColumn("__grp", F.col("pos") - F.row_number().over(w))
    return (
        runs.groupBy("doc_id", "__grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") - F.min("pos") + F.lit(ngram_w)).alias("span_tokens"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .filter(F.col("span_tokens") >= min_tokens)
        .select("doc_id", "span_start", "span_tokens", "n_grams")
    )


def exact_substring_scrub(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    ngram_w: int = 8,
    min_count: int = 2,
    min_tokens: int = 10,
) -> DataFrame:
    """The COMPLETED ExactSubstr pass (Lee et al. 2022): cut every
    maximal duplicated span :func:`exact_substring_spans` finds out of
    each document's token stream and report what remains — the analogue
    of ``decontaminated_counts`` for the contamination flags. Spans are
    disjoint per document by construction (maximal runs), so the kept
    count is exact; ``kept_md5`` fingerprints the kept tokens in order,
    pinning the actual cut mechanics (not just arithmetic) against the
    oracle.

    Scale shape: the spans pipeline's two shuffles, one per-doc span
    aggregation (bounded: spans per doc ≤ tokens/min_tokens), a LEFT
    equi-join back onto the token stream, and a pure Column
    filter-with-index over the token array — no extra shuffle beyond
    the join, no UDFs.

    Columns: doc_id, n_tokens, n_kept_tokens, n_cut_spans, kept_md5.
    """
    spans = exact_substring_spans(
        df,
        text_col,
        id_col,
        ngram_w=ngram_w,
        min_count=min_count,
        min_tokens=min_tokens,
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_tokens")).alias("__spans"),
        F.count(F.lit(1)).alias("n_cut_spans"),
    )
    toks = spread_small(df).select(
        F.col(id_col).alias("doc_id"), tokens_ws(F.col(text_col)).alias("__toks")
    )
    j = toks.join(per_doc, "doc_id", "left")
    covered = lambda i: F.exists(  # noqa: E731 - span-membership predicate
        F.col("__spans"),
        lambda s: (i >= s.getField("span_start"))
        & (i < s.getField("span_start") + s.getField("span_tokens")),
    )
    kept = F.when(
        F.col("__spans").isNull(), F.col("__toks")
    ).otherwise(F.filter(F.col("__toks"), lambda x, i: ~covered(i)))
    return j.select(
        "doc_id",
        F.size("__toks").alias("n_tokens"),
        F.size(kept).alias("n_kept_tokens"),
        F.coalesce(F.col("n_cut_spans"), F.lit(0)).alias("n_cut_spans"),
        F.md5(F.array_join(kept, " ")).alias("kept_md5"),
    )


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    *,
    ngram_w: int = 8,
) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing ≥1 word n-gram
    with ANY benchmark document — the standard eval-leakage scrub every
    training-data pipeline runs before a model sees the corpus (the
    published recipes test 8-13-gram overlap against each benchmark's
    prompts/answers).

    Scale shape: the benchmark side is an eval suite — thousands of
    documents, bounded by construction, INDEPENDENT of corpus size — so its
    distinct gram-hash set broadcasts at any corpus scale. The corpus side
    explodes per-doc distinct grams and hash-joins the broadcast set: one
    scan, one shuffle (the per-doc count agg), zero pairwise work. Per-doc
    grams are distinct, so ``count(*)`` after the semi-style join IS the
    distinct-shared-gram count.

    Columns: doc_id, n_contaminated_grams (docs with ≥1 hit only — the
    scrub list; join it back anti-style to drop them).
    """
    from avro_diff_spark.functions.text import word_shingles

    def grams(df: DataFrame) -> DataFrame:
        g = F.array_distinct(
            F.transform(word_shingles(F.col(text_col), ngram_w), hash32)
        )
        return (
            df.select(
                F.col(id_col).alias("doc_id"), F.explode_outer(g).alias("gram_hash")
            )
            .where(F.col("gram_hash").isNotNull())
        )

    bench_g = grams(benchmark).select("gram_hash").distinct()
    return (
        grams(spread_small(corpus))
        .join(F.broadcast(bench_g), "gram_hash")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )


def ngram_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    *,
    k: int = 13,
    w: int = 8,
) -> DataFrame:
    """13-gram eval decontamination at winnowed cost — the GPT-3/PaLM
    recipe (Brown et al. 2020 Appendix C scrubs training docs sharing a
    13-gram with any eval example; PaLM and successors report the same
    n-gram-overlap family) made affordable at 100 TB.

    :func:`contamination_check` tests EVERY corpus gram against the
    benchmark set — exhaustive, but the corpus gram stream is ~one row
    per word. This variant WINNOWS the corpus side (functions/text.py
    ``winnow_min_hashes`` over the per-position k-gram hash32 stream,
    Schleimer et al.'s guarantee transposed to word grams): only the
    ~2/(w+1) selected hashes join the broadcast benchmark set, and any
    verbatim overlap of ≥ k+w-1 words (20 at the defaults) — the
    eval-answer/passage leakage the recipe exists to catch — still
    shares a selected fingerprint by the winnowing guarantee. Isolated
    single-gram collisions may be subsampled away; that is the
    documented trade against the exhaustive sibling. The benchmark side
    keeps ALL its distinct gram hashes: an eval suite is bounded by
    construction, so the set broadcasts at any corpus scale.

    Scale shape: corpus-side map (tokens → gram hashes → window minima,
    all Column expressions), one broadcast hash-join, one
    map-side-combined groupBy — no pairwise work, no full-gram shuffle.
    Columns: doc_id, n_contaminated_fps (docs with ≥1 winnowed hit —
    the scrub list)."""
    from avro_diff_spark.functions.text import winnow_min_hashes, word_shingles

    gram_hashes = F.transform(word_shingles(F.col(text_col), k), hash32)
    bench_g = (
        benchmark.select(F.explode_outer(gram_hashes).alias("fp"))
        .where(F.col("fp").isNotNull())
        .distinct()
    )
    fps = (
        spread_small(corpus)
        # project the hash stream as a real column first: winnowing
        # references it ~log w times and an inlined expression would be
        # rebuilt per reference (the char_codes materialization rule)
        .select(F.col(id_col).alias("doc_id"), gram_hashes.alias("__hs"))
        .select(
            "doc_id",
            F.explode_outer(winnow_min_hashes(F.col("__hs"), w=w)).alias("fp"),
        )
        .where(F.col("fp").isNotNull())
    )
    return (
        fps.join(F.broadcast(bench_g), "fp")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_fps"))
    )


def simhash_blocks(max_hamming: int, n_bits: int = 32) -> list[tuple[int, int]]:
    """(offset, width) of the ``max_hamming + 1`` bit-blocks that partition an
    ``n_bits`` fingerprint — shared between the Spark plan and the oracle SQL
    so the two bandings can never drift."""
    n_blocks = max_hamming + 1
    widths = [n_bits // n_blocks + (1 if i < n_bits % n_blocks else 0) for i in range(n_blocks)]
    offsets = [sum(widths[:i]) for i in range(n_blocks)]
    return list(zip(offsets, widths))


def simhash_near_dups(
    df: DataFrame, text_col: str, id_col: str, *, max_hamming: int = 3
) -> DataFrame:
    """Pairs (a < b) with Hamming(simhash) ≤ max_hamming.

    **Hamming-ball blocking by pigeonhole** — never all-pairs: split the
    32-bit fingerprint into ``max_hamming + 1`` bit-blocks; a pair within
    distance d differs in at most d blocks, so it matches EXACTLY on at
    least one block. Each doc explodes into (block_id, block_bits) keys,
    buckets on the key (the one shuffle), pairs expand within buckets, and
    the exact ``bit_count(xor)`` test verifies. The blocking is lossless
    (100% recall), unlike probabilistic LSH — results are identical to the
    naive all-pairs join at a tiny fraction of the cost: with d=3, buckets
    are exact 8-bit-block matches, so the expansion is O(Σ bucket²) over
    ~4·2⁸-way-split data instead of O(n²) over the corpus.

    The fingerprint rides along inside the bucket, so verification needs no
    join back to the fingerprint table (zero recompute, zero extra shuffle).

    Sizing note: a 32-bit fingerprint saturates around 10⁸ documents (the
    birthday bound floods every block bucket past that); corpora at the
    10⁹⁺ scale should widen to simhash-64 with 16-bit blocks — the
    construction here generalizes verbatim, 32-bit is kept because the
    oracle's integer arithmetic stays comfortably in exact range.
    """
    return hamming_near_dup_pairs(
        simhash32(df, text_col, id_col),
        "simhash",
        "doc_id",
        max_hamming=max_hamming,
        n_bits=32,
    )


def hamming_near_dup_pairs(
    hashed: DataFrame,
    hash_col: str,
    id_col: str,
    *,
    max_hamming: int = 3,
    n_bits: int = 32,
) -> DataFrame:
    """Pairs (doc_a < doc_b) with Hamming(``hash_col``) ≤ ``max_hamming``
    over ANY precomputed fingerprint column — the Hamming-ball pigeonhole
    blocking :func:`simhash_near_dups` always used, factored out (round
    15) so the perceptual image hash (:func:`phash_near_dups`) and any
    future bit-fingerprint share the exact candidate/verify machinery.
    Same scale shape: one shuffle keyed by (block_id, block_bits),
    chunk-bounded in-bucket pair expansion, exact ``bit_count(xor)``
    verify with the fingerprint riding inside the bucket."""
    blocks = simhash_blocks(max_hamming, n_bits)
    s = hashed.select(F.col(id_col).alias("doc_id"), F.col(hash_col).alias("__h"))
    block_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("block_id"),
                F.shiftright(F.col("__h"), off)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("block_bits"),
            )
            for i, (off, width) in enumerate(blocks)
        ]
    )
    banded = s.select(
        "doc_id", "__h", F.explode(block_arr).alias("blk")
    ).select("doc_id", "__h", "blk.block_id", "blk.block_bits")
    members = F.col("members")
    pair_structs = F.flatten(
        F.transform(
            members,
            lambda x, i: F.transform(
                F.slice(members, i + 2, F.greatest(F.size(members) - i - 1, F.lit(0))),
                lambda y: F.struct(
                    x.getField("doc_id").alias("doc_a"),
                    y.getField("doc_id").alias("doc_b"),
                    x.getField("__h").alias("sim_a"),
                    y.getField("__h").alias("sim_b"),
                ),
            ),
        )
    )
    return (
        banded.groupBy("block_id", "block_bits")
        .agg(F.sort_array(F.collect_set(F.struct("doc_id", "__h"))).alias("members"))
        .filter(F.size("members") > 1)
        # explode_outer: plain explode would re-evaluate the O(n²) pair
        # construction via an inferred size()>0 filter (see lsh_candidate_pairs)
        .select(F.explode_outer(pair_structs).alias("p"))
        .where(F.col("p").isNotNull())
        .select(
            F.col("p.doc_a").alias("doc_a"),
            F.col("p.doc_b").alias("doc_b"),
            F.bit_count(F.col("p.sim_a").bitwiseXOR(F.col("p.sim_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def phash_near_dups(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    *,
    max_hamming: int = 3,
    decoder=None,
) -> DataFrame:
    """Image near-duplicate pairs by PERCEPTUAL hash (round 15 — the
    round-14 verdict's multimodal-dedup item): decode each image with
    the from-scratch codecs, take its 32-bit dHash
    (:func:`multimodal.dhash32_of_array` — Krawetz's difference hash,
    the public perceptual-dedup workhorse), and pair by the SAME
    lossless Hamming-ball pigeonhole blocking the text tier uses
    (:func:`hamming_near_dup_pairs` over :func:`simhash_blocks`) —
    never all-pairs. Re-encoded, rescaled or lightly retouched copies
    land within a few bits of each other where byte-exact dedup sees
    unrelated blobs. Columns: (doc_a, doc_b, hamming).

    Scale shape: the decode+hash is one map-only Arrow pass over
    (id, payload); blocking shuffles 4 small int key rows per image,
    expansion is bucket-bounded, verify is one bit_count — the corpus
    payload bytes never shuffle."""
    from avro_diff_spark import multimodal as MM

    hashed = MM.image_dhash(
        media,
        payload_col,
        id_col,
        decoder=decoder if decoder is not None else MM.decode_image_array,
    )
    return hamming_near_dup_pairs(
        hashed, "dhash", "media_id", max_hamming=max_hamming, n_bits=32
    )


def audio_near_dups(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    *,
    max_hamming: int = 2,
    decoder=None,
) -> DataFrame:
    """Audio near-duplicate pairs by PERCEPTUAL energy-envelope hash
    (round 15 — the audio sibling of :func:`phash_near_dups`,
    completing the dedup tier over text/embeddings/images/audio):
    decode each payload with the real PCM/FLAC codecs, hash the mono
    signal's 33-window energy envelope
    (:func:`multimodal.audio_ahash32_of_samples` — all-integer, so the
    law is bit-exact on any engine), and pair by the shared lossless
    Hamming-ball blocking (:func:`hamming_near_dup_pairs`). Re-encoded
    or re-leveled copies land within a few bits where byte-exact dedup
    sees unrelated blobs. Columns: (doc_a, doc_b, hamming). Same scale
    shape as the image tier: one map-only Arrow pass, 3 small key rows
    per clip, bucket-bounded expansion, bit_count verify."""
    from avro_diff_spark import multimodal as MM

    hashed = MM.audio_ahash(media, payload_col, id_col, decoder=decoder)
    return hamming_near_dup_pairs(
        hashed, "ahash", "media_id", max_hamming=max_hamming, n_bits=32
    )


def _unionfind_finish(edges: DataFrame, nodes: DataFrame | None = None) -> DataFrame:
    """Finish connected components in ONE driver-side union-find pass over
    a BOUNDED edge list → (doc_id, cluster_id), cluster_id = component min.

    Iterative graph rounds pay a fixed per-round cost (2 jobs + a
    localCheckpoint materialization) that dominates small edge lists: at
    bench scale the star loop spent 15s closing a ~10³-row edge list the
    driver closes in microseconds (round-5 verdict). Both cluster
    operators therefore finish driver-side when the MEASURED edge count is
    below ``driver_finish_max_edges`` — a bounded-collect contract exactly
    like ANN training samples (5M edges ≈ 80 MB as two int64 pandas
    columns); above it the distributed loops run unchanged, so the
    100 TB path never collects.

    Union always attaches the larger root under the smaller, so by
    induction every root IS its component minimum — the same label the
    distributed formulations converge to (min orders identically for the
    numeric/string id types both engines compare with).
    """
    import pandas as pd
    from pyspark.sql import types as T

    spark = edges.sparkSession
    epdf = edges.toPandas()
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(epdf["src"], epdf["dst"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    node_vals = set(epdf["src"]) | set(epdf["dst"])
    if nodes is not None:
        node_vals |= set(nodes.toPandas().iloc[:, 0])
    t = edges.schema[0].dataType
    schema = T.StructType(
        [T.StructField("doc_id", t), T.StructField("cluster_id", t)]
    )
    ordered = sorted(node_vals)
    if not ordered:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": ordered, "cluster_id": [find(n) for n in ordered]}
        ),
        schema,
    )


DRIVER_FINISH_MAX_EDGES = 5_000_000


def near_dup_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    *,
    max_iters: int = 25,
    driver_finish_max_edges: int = DRIVER_FINISH_MAX_EDGES,
) -> DataFrame:
    """Connected components over near-duplicate PAIRS → (doc_id, cluster_id).

    The step every production near-dedup pipeline runs after pair finding
    (MinHash/SimHash/embedding LSH all emit pairs): transitively close them
    so each duplicate GROUP keeps exactly one survivor — pairwise survivors
    alone would keep B when A~B and B~C but drop nothing of C's chain.
    ``cluster_id`` is the minimum doc id reachable from the node, so the
    survivor set is simply ``doc_id == cluster_id``.

    Algorithm: iterative min-label propagation — per round, every node
    takes the min of its own label and its neighbors' labels (one equi-join
    on the edge list + one groupBy-min per round), converging in
    O(component diameter) rounds. Near-dup components are short chains
    through shared duplicates, so the diameter is small by construction;
    ``max_iters`` bounds pathological chains and the loop exits early the
    first round nothing changes (checked with a count — the one place an
    iterative algorithm genuinely needs a driver-side action per round).
    Lineage is cut with ``localCheckpoint`` each round so the plan stays
    O(1) deep instead of O(iters). At adversarial diameters (million-node
    chains) use :func:`near_dup_clusters_star` — the large-star/small-star
    formulation (Kiveris et al., "Connected Components in MapReduce and
    Beyond"), same join primitive, O(log² n) rounds, identical output.

    Scale shape: each round shuffles the edge list by src — |edges| is
    near-dup-pair bounded (LSH-banded upstream, never all-pairs), and the
    label table is |nodes| rows of two ints. Below
    ``driver_finish_max_edges`` (measured count, bounded-collect contract)
    the closure instead finishes in one driver-side union-find pass — see
    :func:`_unionfind_finish`; pass 0 to force the distributed loop.
    """
    # materialize the upstream pair-finding pipeline ONCE: both the
    # driver-finish collect and every propagation round read this, and
    # without the checkpoint each consumer would re-execute the entire
    # lineage (MinHash banding etc.) from the scan
    edges_fwd = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).localCheckpoint()
    n_pairs = edges_fwd.count()
    if n_pairs <= driver_finish_max_edges:
        # union-find tolerates duplicate/self/one-directional edges, so the
        # raw pair list collects as-is — no symmetrize/distinct shuffles
        return _unionfind_finish(edges_fwd)
    edges = (
        edges_fwd.union(
            edges_fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint()
    )
    with _loop_shuffle_parts(pairs.sparkSession, 2 * n_pairs):
        for _ in range(max_iters):
            neighbor_min = (
                edges.join(labels, edges["dst"] == labels["node"])
                .groupBy("src")
                .agg(F.min("label").alias("nmin"))
            )
            # the changed flag rides the propagation select, so convergence
            # detection costs one probe over the materialized round output —
            # no extra join, no re-execution (2 jobs/round total)
            new_labels = (
                labels.join(neighbor_min, labels["node"] == neighbor_min["src"], "left")
                .select(
                    "node",
                    F.least(
                        F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                    ).alias("new_label"),
                    (F.coalesce(F.col("nmin"), F.col("label")) < F.col("label")).alias(
                        "__changed"
                    ),
                )
                .localCheckpoint()
            )
            labels = new_labels.select("node", F.col("new_label").alias("label"))
            if new_labels.filter(F.col("__changed")).limit(1).count() == 0:
                break
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


class _loop_shuffle_parts:
    """Temporarily size ``spark.sql.shuffle.partitions`` to the MEASURED
    row count of an iterative loop's working set.

    Iterative graph rounds run many tiny shuffle stages over an edge list
    that is usually orders of magnitude smaller than the scan that
    produced it (LSH pair lists at sf0.1: ~10^3 rows; the session default
    of 32+ partitions makes every round pay 32 tasks × several stages of
    pure scheduling). One shuffle partition per ~2M edge rows keeps tasks
    meaningfully sized at every scale — a 100 TB corpus with billions of
    candidate pairs still gets thousands of partitions, while bench-scale
    loops collapse to single-task stages. Restores the previous setting
    on exit. Caveat: the setting is session-scoped, so a query planned
    CONCURRENTLY on the same SparkSession from another thread (e.g. a
    running streaming query's micro-batch) would inherit the shrunk value
    for that plan — hold iterative graph loops and concurrent planning on
    separate sessions (``SparkSession.newSession()`` shares the cluster
    but isolates conf). On platforms where the conf is non-numeric
    (e.g. "auto"), the context leaves it untouched.
    """

    def __init__(self, spark, n_rows: int, rows_per_part: int = 2_000_000) -> None:
        self.spark = spark
        try:
            cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            cur = 0  # non-numeric ("auto"): leave the session conf alone
        self.parts = max(1, min(cur, n_rows // rows_per_part + 1)) if cur else None

    def __enter__(self):
        if self.parts is not None:
            self.old = self.spark.conf.get("spark.sql.shuffle.partitions")
            self.spark.conf.set("spark.sql.shuffle.partitions", str(self.parts))
        return self

    def __exit__(self, *exc):
        if self.parts is not None:
            self.spark.conf.set("spark.sql.shuffle.partitions", self.old)
        return False


def near_dup_clusters_star(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    *,
    max_iters: int = 20,
    driver_finish_max_edges: int = DRIVER_FINISH_MAX_EDGES,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    operations (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — same (doc_id, cluster_id) contract as
    :func:`near_dup_clusters`, different convergence regime: O(log² n)
    rounds regardless of component DIAMETER, where min-label propagation
    needs O(diameter) rounds. Near-dup groups are short chains, so the
    default operator stays min-label; this is the drop-in for adversarial
    shapes (million-node chains: re-crawled boilerplate, templated spam).

    Per round, each operation is a groupBy-min over the symmetric edge
    list plus one join — NO neighborhood materialization (no
    collect_list), so a high-degree hub costs a shuffle key, not a row of
    unbounded width:

    - large-star: every neighbor v > u re-attaches to m(u) = min(N(u) ∪
      {u}) — breaks tall trees wide.
    - small-star: every neighbor v ≤ u (and u itself) attaches to m(u) —
      contracts stars onto their minimum.

    Convergence is detected by (count, xor-of-hashes) stability —
    cheap aggregates, no exceptAll; lineage is cut per round with
    localCheckpoint like the min-label loop. Below
    ``driver_finish_max_edges`` the closure finishes in one driver-side
    union-find pass (:func:`_unionfind_finish`) — the per-round fixed
    costs that make O(log² n) rounds worthwhile at billions of edges are
    pure overhead on a bounded edge list; pass 0 to force the loop.
    """
    # ONE materialization of the upstream pair-finding pipeline: nodes and
    # edges both derive from the checkpointed pair list (checkpointing each
    # separately would execute the whole MinHash/LSH lineage twice — the
    # round-5 bench showed exactly that 2× penalty)
    fwd = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).localCheckpoint()
    n_pairs = fwd.count()
    if n_pairs <= driver_finish_max_edges:
        # raw pair list suffices: union-find tolerates duplicate/self
        # edges, and it covers self-paired ids the loop's src!=dst filter
        # would route through `nodes`
        return _unionfind_finish(fwd)
    nodes = (
        fwd.select(F.col("src").alias("node"))
        .union(fwd.select(F.col("dst").alias("node")))
        .distinct()
    )
    edges = (
        fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )

    def _sym(e: DataFrame) -> DataFrame:
        return e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))

    def _mins(e: DataFrame) -> DataFrame:
        # m(u) = min over the FULL neighborhood of u, u included
        return (
            _sym(e)
            .groupBy("src")
            .agg(F.least(F.min("dst"), F.first("src")).alias("m"))
        )

    def _sig(e: DataFrame):
        # bit_xor, not sum: order-independent over the DISTINCT edge set
        # and cannot overflow under ANSI arithmetic
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.bit_xor(F.xxhash64(F.col("src"), F.col("dst"))), F.lit(0)
            ).alias("h"),
        ).first()
        return row["n"], row["h"]

    sig = _sig(edges)
    with _loop_shuffle_parts(pairs.sparkSession, 2 * n_pairs):
        for _ in range(max_iters):
            # large-star over the symmetric view: (v, m(u)) for v > u.
            # cache(), not localCheckpoint(): m2 and sym2 both read it, but
            # the cache fills inside small's materialization job — one job
            # per round instead of two, and small's checkpoint still cuts
            # the cross-round lineage. Duplicate edges are tolerated here
            # (groupBy-min is idempotent; small's distinct cleans up), so
            # large skips its own distinct shuffle too.
            m = _mins(edges)
            sym = _sym(edges)
            large = (
                sym.join(m, "src")
                .filter(F.col("dst") > F.col("src"))
                .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
                .filter(F.col("src") != F.col("dst"))
                .cache()
            )
            # small-star: (v, m(u)) for v <= u, plus (u, m(u))
            m2 = _mins(large)
            sym2 = _sym(large)
            small = (
                sym2.join(m2, "src")
                .filter(F.col("dst") <= F.col("src"))
                .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
                .union(m2.select(F.col("src"), F.col("m").alias("dst")))
                .filter(F.col("src") != F.col("dst"))
                .distinct()
                .localCheckpoint()
            )
            large.unpersist()
            edges = small
            new_sig = _sig(edges)
            if new_sig == sig:
                break
            sig = new_sig
    # converged: every non-root points directly at its component minimum
    label = (
        edges.groupBy("src").agg(F.min("dst").alias("root"))
    )
    return (
        nodes.join(label, nodes["node"] == label["src"], "left")
        .select(
            F.col("node").alias("doc_id"),
            F.least(
                F.col("node"), F.coalesce(F.col("root"), F.col("node"))
            ).alias("cluster_id"),
        )
    )
