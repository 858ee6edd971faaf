"""Deterministic distributed sketches: HyperLogLog distinct counting,
KMV (k-minimum-values / theta) set-expression cardinality, and count-min
frequency estimation.

At 100 TB, exact ``COUNT(DISTINCT x)`` is a full shuffle of every
distinct value and exact heavy-hitters a full frequency table; the
sketch versions reduce each to FIXED-SIZE state (2^p registers, k
hashes, d×w counters) that merges algebraically across partitions —
the canonical Flajolet et al. 2007 (HLL), Bar-Yossef et al. 2002 (KMV),
and Cormode & Muthukrishnan 2005 (count-min) constructions, the same
sketches Spark's own ``approx_count_distinct`` / DataSketches ship.

These implementations are DETERMINISTIC where library sketches are not:
every hash derives from md5 of the value's string form (computable
bit-identically in any engine), register/bucket math is integer-only,
and the one floating-point finish per estimate is a fixed sequence of
IEEE-754 correctly-rounded ops — so a DuckDB oracle reproduces the
estimates EXACTLY, and so do reruns on any cluster layout (max/sum
reductions commute). Per-row work is pure Column expressions (JVM
codegen, no UDFs); each sketch costs one shuffle keyed by (group,
register) — map-side partial max/sum combines first, so the shuffle
carries at most ``groups × m`` rows regardless of input size.

No counterpart in the reference (yuana97/Avro_Diff has no approximate
aggregation surface); this is the beyond-reference training-pipeline
tier (corpus distinct-URL/user estimation, split-overlap auditing,
vocabulary heavy-hitters) the engine targets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ---------------------------------------------------------------- HLL ---

# m = 2^P registers; W suffix bits per hash. Both sized so every
# intermediate fits exactly: the register index is 3 hex digits (12
# bits) folded mod m, the rho suffix 9 hex digits (36 bits, < 2^53 so a
# BIGINT->DOUBLE cast is exact), and the scaled register sum
# S = sum_j 2^(W+1-M_j) <= m * 2^37 = 2^46 stays an exact BIGINT.
HLL_P = 9
HLL_M = 1 << HLL_P  # 512 registers
HLL_W = 36


def _hll_alpha_c(m: int = HLL_M, w: int = HLL_W) -> float:
    """The constant numerator alpha_m * m^2 * 2^(w+1) of the scaled-sum
    estimator — ONE float literal shared verbatim by the Spark plan and
    the SQL oracle, so both engines run the identical correctly-rounded
    division/multiply sequence."""
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * m * m * float(1 << (w + 1))


def _md5_hex(col: Column) -> Column:
    """Lowercase md5 hex of the value's string form — the portable hash
    every sketch here keys on (DuckDB: ``md5(CAST(x AS VARCHAR))``)."""
    return F.md5(F.encode(col.cast("string"), "UTF-8"))


def _bit_length(v: Column, w: int) -> Column:
    """bit_length(v) for v in [0, 2^w) as a pure integer CASE chain —
    no log2: floating log is not guaranteed to floor identically across
    engines near powers of two, an exact comparison ladder is."""
    expr = F.lit(0)
    for nbits in range(1, w + 1):
        expr = F.when(v >= F.lit(1 << (nbits - 1)), F.lit(nbits)).otherwise(expr)
    return expr


def _bit_length_sql(v: str, w: int) -> str:
    arms = " ".join(
        f"WHEN {v} >= {1 << (nbits - 1)} THEN {nbits}"
        for nbits in range(w, 0, -1)
    )
    return f"(CASE {arms} ELSE 0 END)"


def hll_registers(
    df: DataFrame, col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """The HLL register table: one row per (group, register j) with
    M_j = max over hashed values of (leading zeros of the 36-bit suffix
    + 1). One groupBy — partial max combines map-side, so the shuffle
    carries at most groups × 512 rows at any input size."""
    h = _md5_hex(F.col(col))
    j = F.conv(F.substring(h, 1, 3), 16, 10).cast("long") % HLL_M
    v = F.conv(F.substring(h, 4, 9), 16, 10).cast("long")
    rho = F.lit(HLL_W + 1) - _bit_length(v, HLL_W)
    gs = list(group_cols or [])
    return (
        df.where(F.col(col).isNotNull())
        .select(*gs, j.alias("j"), rho.alias("rho"))
        .groupBy(*gs, "j")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Fold a register table into per-group sketch state + estimate:
    ``zero_registers`` (registers no value ever hit), ``s_scaled`` (the
    exact-integer scaled sum S = sum_j 2^(37 - M_j), absent registers
    contributing 2^37), and ``est_x1000`` = floor(C / S * 1000) — the
    raw HLL estimator alpha_m * m^2 / sum(2^-M_j), fixed-point scaled.
    Integer state plus one correctly-rounded double divide/multiply:
    bit-identical on any engine and any partitioning."""
    gs = list(group_cols or [])
    c = _hll_alpha_c()
    per = registers.groupBy(*gs).agg(
        F.count(F.lit(1)).alias("_present"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({HLL_W + 1} - m_j AS INT))")
        ).alias("_s_present"),
    )
    s = F.col("_s_present") + (F.lit(HLL_M) - F.col("_present")) * F.lit(
        1 << (HLL_W + 1)
    )
    return per.select(
        *gs,
        (F.lit(HLL_M) - F.col("_present")).alias("zero_registers"),
        s.alias("s_scaled"),
        F.floor(F.lit(c) / s.cast("double") * F.lit(1000.0)).alias("est_x1000"),
    )


def hll_estimate_sql(
    table: str, col: str, group_cols: list[str] | None = None
) -> str:
    """The DuckDB twin of hll_registers + hll_estimate (oracle)."""
    gs = list(group_cols or [])
    gsel = ", ".join(gs) + (", " if gs else "")
    gby = ("GROUP BY " + ", ".join(gs)) if gs else ""
    gby_j = "GROUP BY " + ", ".join(gs + ["j"])
    c = _hll_alpha_c()
    blen = _bit_length_sql("v", HLL_W)
    return f"""
WITH hashed AS (
  SELECT {gsel}
         ('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 3))::BIGINT % {HLL_M} AS j,
         ('0x' || substr(md5(CAST({col} AS VARCHAR)), 4, 9))::BIGINT AS v
  FROM {table} WHERE {col} IS NOT NULL
),
regs AS (
  SELECT {gsel} j, max({HLL_W + 1} - {blen}) AS m_j FROM hashed {gby_j}
),
folded AS (
  SELECT {gsel} count(*) AS _present,
         sum((CAST(1 AS BIGINT) << ({HLL_W + 1} - m_j)))::BIGINT AS _s_present
  FROM regs {gby}
)
SELECT {gsel}
       {HLL_M} - _present AS zero_registers,
       _s_present + ({HLL_M} - _present) * {1 << (HLL_W + 1)} AS s_scaled,
       floor({c!r} / CAST(_s_present + ({HLL_M} - _present) * {1 << (HLL_W + 1)}
             AS DOUBLE) * 1000.0)::BIGINT AS est_x1000
FROM folded
"""


def hll_corrected_estimate(row) -> float:
    """The small-range-corrected HLL estimate from one
    :func:`hll_estimate` row — Flajolet et al.'s LINEAR COUNTING branch
    (E = m·ln(m/V) when the raw estimate is under 2.5m and some
    registers are still zero), which the bit-deterministic query surface
    deliberately omits (ln is not specified to the last bit across
    engines). Driver-side consumers recording metadata (ANALYZE NDV)
    use this; oracle-compared queries never do. Total over the empty
    sketch: a register table with NO rows (all-NULL or empty column)
    folds to est_x1000 NULL — that is zero distinct values, not an
    error."""
    import math

    if row.est_x1000 is None:
        return 0.0
    raw = row.est_x1000 / 1000.0
    zeros = row.zero_registers
    if raw < 2.5 * HLL_M and zeros > 0:
        return HLL_M * math.log(HLL_M / zeros)
    return raw


def hll_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge two register tables: per-register MAX — the algebraic HLL
    union (sketch(A) ⊔ sketch(B) == sketch(A ∪ B) exactly, not
    approximately; pytest-pinned). This is what makes the sketch a
    maintainable artifact: a stream can fold each micro-batch's
    registers into a stored table and the result is bit-identical to
    sketching the full history."""
    gs = list(group_cols or [])
    return (
        a.unionByName(b).groupBy(*gs, "j").agg(F.max("m_j").alias("m_j"))
    )


# ---------------------------------------------------------------- KMV ---

KMV_BITS = 48  # leading hex digits turned numeric: 48 bits, double-exact


def kmv_hashes(df: DataFrame, col: str, k: int) -> DataFrame:
    """The k smallest md5 hashes of the column's DISTINCT values — the
    KMV/theta sketch. orderBy+limit plans as TakeOrdered (per-partition
    top-k, then a k-row merge on the driver side of the exchange), never
    a full sort; state is k hashes no matter the input size."""
    return (
        df.where(F.col(col).isNotNull())
        .select(_md5_hex(F.col(col)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_overlap(
    a: DataFrame, b: DataFrame, col: str, k: int = 256
) -> DataFrame:
    """Estimate |A ∩ B| of two distinct-value sets from k-hash sketches
    (the theta-sketch intersection): take the k smallest hashes of the
    UNION, count how many belong to both sides, and scale the union
    estimate (k-1)/theta by that fraction. Exact-integer inputs + one
    fixed float sequence; when the union holds fewer than k distinct
    values the sketch IS the union and the count is exact. Returns one
    row: (n_union_sketch, cnt_both, est_inter_x1000)."""
    ha = a.where(F.col(col).isNotNull()).select(
        _md5_hex(F.col(col)).alias("h")
    ).distinct()
    hb = b.where(F.col(col).isNotNull()).select(
        _md5_hex(F.col(col)).alias("h")
    ).distinct()
    union_k = ha.unionByName(hb).distinct().orderBy("h").limit(k)
    # count the sketch hashes present in BOTH sides: semi-join each big
    # distinct set against the BROADCAST k-row sketch (never the reverse
    # — A ∩ B itself can be huge at scale, the sketch never is)
    marked = ha.join(F.broadcast(union_k), "h", "left_semi").join(
        hb, "h", "left_semi"
    )
    # ONE aggregation over the tagged union of the two tiny frames —
    # joining the 1-row aggregates would constant-fold into the
    # nested-loop shape the plan gate bans
    tagged = union_k.select(
        "h", F.lit(1).alias("_u"), F.lit(0).alias("_b")
    ).unionByName(marked.select("h", F.lit(0).alias("_u"), F.lit(1).alias("_b")))
    theta = F.conv(
        F.substring(F.max(F.when(F.col("_u") == 1, F.col("h"))), 1, 12), 16, 10
    ).cast("long")
    # coalesce the sums: a global agg over an EMPTY tagged union yields
    # NULL sums, and NULL < k propagates NULL through the estimate —
    # two empty inputs must return (0, 0, 0) exactly like the SQL twin
    # (whose count(*) aggregates are already total)
    stats = tagged.agg(
        F.coalesce(F.sum("_u"), F.lit(0)).alias("n_union_sketch"),
        F.coalesce(F.sum("_b"), F.lit(0)).alias("cnt_both"),
        theta.alias("_theta48"),
    )
    est_full = F.floor(
        F.col("cnt_both").cast("double")
        * F.lit(float(k - 1))
        / F.lit(float(k))
        / (F.col("_theta48").cast("double") / F.lit(float(1 << KMV_BITS)))
        * F.lit(1000.0)
    )
    return stats.select(
        "n_union_sketch",
        "cnt_both",
        F.when(F.col("n_union_sketch") < F.lit(k), F.col("cnt_both") * 1000)
        .otherwise(est_full)
        .alias("est_inter_x1000"),
    )


def kmv_difference(
    a: DataFrame, b: DataFrame, col: str, k: int = 256
) -> DataFrame:
    """Estimate |A \\ B| (distinct values in A but not B) from the same
    union k-hash sketch :func:`kmv_overlap` uses — the theta-sketch
    a-not-b operation: count the sketch hashes present in A and ABSENT
    from B, scale by the union estimate. Same totality (union < k ⇒
    exact) and the same scale shape (big sets only ever SEMI/ANTI-join
    the broadcast k-row sketch). Returns one row:
    (n_union_sketch, cnt_a_only, est_diff_x1000)."""
    ha = a.where(F.col(col).isNotNull()).select(
        _md5_hex(F.col(col)).alias("h")
    ).distinct()
    hb = b.where(F.col(col).isNotNull()).select(
        _md5_hex(F.col(col)).alias("h")
    ).distinct()
    union_k = ha.unionByName(hb).distinct().orderBy("h").limit(k)
    a_only = ha.join(F.broadcast(union_k), "h", "left_semi").join(
        hb, "h", "left_anti"
    )
    tagged = union_k.select(
        "h", F.lit(1).alias("_u"), F.lit(0).alias("_d")
    ).unionByName(a_only.select("h", F.lit(0).alias("_u"), F.lit(1).alias("_d")))
    theta = F.conv(
        F.substring(F.max(F.when(F.col("_u") == 1, F.col("h"))), 1, 12), 16, 10
    ).cast("long")
    stats = tagged.agg(
        F.coalesce(F.sum("_u"), F.lit(0)).alias("n_union_sketch"),
        F.coalesce(F.sum("_d"), F.lit(0)).alias("cnt_a_only"),
        theta.alias("_theta48"),
    )
    est_full = F.floor(
        F.col("cnt_a_only").cast("double")
        * F.lit(float(k - 1))
        / F.lit(float(k))
        / (F.col("_theta48").cast("double") / F.lit(float(1 << KMV_BITS)))
        * F.lit(1000.0)
    )
    return stats.select(
        "n_union_sketch",
        "cnt_a_only",
        F.when(F.col("n_union_sketch") < F.lit(k), F.col("cnt_a_only") * 1000)
        .otherwise(est_full)
        .alias("est_diff_x1000"),
    )


def kmv_difference_sql(a_sql: str, b_sql: str, col: str, k: int = 256) -> str:
    """DuckDB twin of :func:`kmv_difference` (oracle)."""
    return f"""
WITH ha AS (SELECT DISTINCT md5(CAST({col} AS VARCHAR)) AS h FROM {a_sql}
            WHERE {col} IS NOT NULL),
hb AS (SELECT DISTINCT md5(CAST({col} AS VARCHAR)) AS h FROM {b_sql}
       WHERE {col} IS NOT NULL),
union_k AS (SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb)
            ORDER BY h LIMIT {k}),
stats AS (SELECT count(*) AS n_union_sketch,
                 ('0x' || substr(max(h), 1, 12))::BIGINT AS _theta48
          FROM union_k),
cnt AS (SELECT count(*) AS cnt_a_only FROM union_k
        WHERE h IN (SELECT h FROM ha) AND h NOT IN (SELECT h FROM hb))
SELECT n_union_sketch, cnt_a_only,
       CASE WHEN n_union_sketch < {k} THEN cnt_a_only * 1000
            ELSE floor(CAST(cnt_a_only AS DOUBLE) * {float(k - 1)!r} / {float(k)!r}
                 / (CAST(_theta48 AS DOUBLE) / {float(1 << KMV_BITS)!r}) * 1000.0)::BIGINT
       END AS est_diff_x1000
FROM stats, cnt
"""


def kmv_overlap_sql(a_sql: str, b_sql: str, col: str, k: int = 256) -> str:
    """DuckDB twin of :func:`kmv_overlap` (oracle). ``a_sql``/``b_sql``
    are relation expressions (subqueries or table names)."""
    return f"""
WITH ha AS (SELECT DISTINCT md5(CAST({col} AS VARCHAR)) AS h FROM {a_sql}
            WHERE {col} IS NOT NULL),
hb AS (SELECT DISTINCT md5(CAST({col} AS VARCHAR)) AS h FROM {b_sql}
       WHERE {col} IS NOT NULL),
union_k AS (SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb)
            ORDER BY h LIMIT {k}),
stats AS (SELECT count(*) AS n_union_sketch,
                 ('0x' || substr(max(h), 1, 12))::BIGINT AS _theta48
          FROM union_k),
cnt AS (SELECT count(*) AS cnt_both FROM union_k
        WHERE h IN (SELECT h FROM ha) AND h IN (SELECT h FROM hb))
SELECT n_union_sketch, cnt_both,
       CASE WHEN n_union_sketch < {k} THEN cnt_both * 1000
            ELSE floor(CAST(cnt_both AS DOUBLE) * {float(k - 1)!r} / {float(k)!r}
                 / (CAST(_theta48 AS DOUBLE) / {float(1 << KMV_BITS)!r}) * 1000.0)::BIGINT
       END AS est_inter_x1000
FROM stats, cnt
"""


# ---------------------------------------------------------- count-min ---


def countmin_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two count-min sketches: per-cell SUM — counts are additive,
    so sketch(A) + sketch(B) == sketch(A ⊎ B) exactly (multiset union).
    Unlike the HLL max-merge this is NOT idempotent: a replayed merge
    double-counts, which is why the streaming maintainer rides the
    commit log's exactly-once epoch dedupe."""
    return (
        a.unionByName(b)
        .groupBy("depth", "bucket")
        .agg(F.sum("cell").alias("cell"))
    )

CM_DEPTH = 4
CM_WIDTH = 1024


def _cm_bucket(h: Column, depth: int) -> Column:
    """Row ``depth``'s bucket: an independent 12-hex-digit-offset slice
    of the md5, mod width."""
    return (
        F.conv(F.substring(h, 1 + 3 * depth, 3), 16, 10).cast("long") % CM_WIDTH
    )


def countmin_sketch(
    counts: DataFrame, term_col: str, n_col: str
) -> DataFrame:
    """Fold an exact (term, count) table into the d×w count-min sketch:
    one row per (depth, bucket) with the bucket's summed count. Fixed
    4×1024 cells; building from the term-count table (not raw
    occurrences) keeps the explode factor at d rows per DISTINCT term."""
    h = _md5_hex(F.col(term_col))
    rows = counts.select(
        F.col(n_col).alias("_n"),
        F.posexplode(
            F.array(*[_cm_bucket(h, d) for d in range(CM_DEPTH)])
        ).alias("depth", "bucket"),
    )
    return rows.groupBy("depth", "bucket").agg(F.sum("_n").alias("cell"))


def countmin_lookup(
    sketch: DataFrame, probes: DataFrame, term_col: str
) -> DataFrame:
    """Point-estimate each probe term: min over the d cells its hashes
    land in (the count-min guarantee: estimate >= true count, integer
    exact). d broadcast-joined lookups expressed as one equi-join on
    (depth, bucket) + a groupBy min."""
    h = _md5_hex(F.col(term_col))
    keyed = probes.select(
        F.col(term_col),
        F.posexplode(
            F.array(*[_cm_bucket(h, d) for d in range(CM_DEPTH)])
        ).alias("depth", "bucket"),
    )
    return (
        keyed.join(F.broadcast(sketch), ["depth", "bucket"])
        .groupBy(term_col)
        .agg(F.min("cell").alias("n_cm"))
    )


def countmin_sql(
    term_counts_sql: str, term_col: str, n_col: str, probes_sql: str
) -> str:
    """DuckDB twin: sketch + probe lookup from a (term, count) relation
    and a probe relation (oracle)."""
    buckets = ", ".join(
        f"('0x' || substr(md5({term_col}), {1 + 3 * d}, 3))::BIGINT % {CM_WIDTH}"
        for d in range(CM_DEPTH)
    )
    return f"""
WITH tc AS ({term_counts_sql}),
cells AS (
  SELECT u.depth, u.bucket, sum({n_col})::BIGINT AS cell
  FROM tc, LATERAL (
    SELECT unnest(range({CM_DEPTH})) AS depth,
           unnest([{buckets}]) AS bucket
  ) u
  GROUP BY u.depth, u.bucket
),
probes AS ({probes_sql}),
keyed AS (
  SELECT probes.*, u.depth, u.bucket
  FROM probes, LATERAL (
    SELECT unnest(range({CM_DEPTH})) AS depth,
           unnest([{buckets}]) AS bucket
  ) u
)
SELECT keyed.{term_col}, min(cell) AS n_cm
FROM keyed JOIN cells USING (depth, bucket)
GROUP BY keyed.{term_col}
"""


# -------------------------------------------------------------- Bloom ---

# m = BLOOM_WORDS words x 32 usable bits per BIGINT word (bit 31 is the
# highest ever set: DuckDB raises on shifting into a BIGINT's sign bit,
# so 32-bit lanes keep both engines in exactly-representable territory).
# K hash functions = K disjoint 5-hex-digit (20-bit) md5 slices mod the
# bit count — deterministic, engine-portable, independent enough for the
# standard (1 - e^{-kn/m})^k false-positive analysis.
BLOOM_WORDS = 128
BLOOM_BITS = BLOOM_WORDS * 32  # 4096
BLOOM_K = 5


def _bloom_positions(col: Column, k: int = BLOOM_K, bits: int = BLOOM_BITS) -> Column:
    """Array of the value's k bit positions in [0, bits)."""
    h = _md5_hex(col)
    return F.array(
        *[
            F.conv(F.substring(h, 1 + i * 5, 5), 16, 10).cast("long") % bits
            for i in range(k)
        ]
    )


def bloom_build(
    df: DataFrame, col: str, k: int = BLOOM_K, words: int = BLOOM_WORDS
) -> DataFrame:
    """Build a bloom filter over ``col``'s non-null values as a DataFrame
    of ``(w, bits)`` words — at most ``words`` rows of fixed-size state
    for any input size. One shuffle: ``bit_or`` partial-aggregates
    map-side, so the exchange carries <= ``words`` rows per partition.
    Mergeable: :func:`bloom_merge` ORs two filters (idempotent — safe
    under replay). NULLs are excluded (membership of NULL is undefined
    for the probe side too)."""
    pos = F.explode(_bloom_positions(F.col(col), k, words * 32)).alias("pos")
    return (
        df.where(F.col(col).isNotNull())
        .select(pos)
        .select(
            F.expr("pos div 32").alias("w"),
            F.expr("shiftleft(cast(1 AS bigint), cast(pos % 32 AS int))").alias("_m"),
        )
        .groupBy("w")
        .agg(F.bit_or("_m").alias("bits"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR-merge two bloom word tables (same words/k): the filter of the
    union of the underlying sets — commutative, associative, idempotent."""
    return a.unionByName(b).groupBy("w").agg(F.bit_or("bits").alias("bits"))


def bloom_probe(
    bloom: DataFrame,
    df: DataFrame,
    col: str,
    k: int = BLOOM_K,
    words: int = BLOOM_WORDS,
) -> DataFrame:
    """Probe each distinct non-null value of ``df[col]`` against the
    filter: ``(value, hit)`` where ``hit`` is true iff ALL k bits are
    set (no false negatives; false-positive rate set by words/k/n). The
    filter is <= ``words`` rows, so the join is a broadcast hash join —
    the probe side never shuffles."""
    probes = (
        df.where(F.col(col).isNotNull())
        .select(F.col(col).alias("_v"))
        .distinct()
        .select("_v", F.explode(_bloom_positions(F.col("_v"), k, words * 32)).alias("pos"))
        .select(
            "_v",
            F.expr("pos div 32").alias("w"),
            F.expr("shiftleft(cast(1 AS bigint), cast(pos % 32 AS int))").alias("_m"),
        )
    )
    j = probes.join(F.broadcast(bloom), "w", "left")
    bit_set = (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("_m")) == F.col("_m"))
    return (
        j.groupBy("_v")
        .agg((F.sum(F.when(bit_set, 1).otherwise(0)) == F.lit(k)).alias("hit"))
        .withColumnRenamed("_v", col)
    )


# ----------------------------------------------------- bottom-k sample ---

def bottomk_sample(
    df: DataFrame, key_col: str, val_col: str, k: int = 256
) -> DataFrame:
    """Deterministic uniform row sample of fixed size k: keep the rows
    whose md5(key) hashes are the k smallest (Cohen & Kaplan bottom-k
    sketch over a UNIQUE row key — the hash IS the random tag, so every
    engine, every partitioning, every day draws the same sample).
    Plans as TakeOrdered (per-partition top-k then a k-row merge —
    never a full sort). Mergeable: the bottom-k of a union is the
    bottom-k of the concatenated samples. ``key_col`` must be unique
    per row (duplicate keys would bias the draw)."""
    return (
        df.where(F.col(key_col).isNotNull())
        .select(
            _md5_hex(F.col(key_col)).alias("h"), F.col(val_col).alias("v")
        )
        .orderBy("h")
        .limit(k)
    )


def sample_quantiles(
    sample: DataFrame, qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95)
) -> DataFrame:
    """Discrete order-statistic quantiles of a (bounded) sample: one row
    (n_sampled, q_25, q_50, ...), quantile q = the sorted sample's
    element at 1-based index floor(q*(n-1)) + 1 — pure selection, no
    interpolation arithmetic to diverge across engines. Empty sample ->
    n_sampled 0 with NULL quantiles (total)."""
    agg = sample.agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.array_sort(F.collect_list("v")).alias("_a"),
    )
    cols = [F.col("n_sampled")]
    for q in qs:
        idx = (
            F.floor(F.lit(float(q)) * (F.col("n_sampled") - 1).cast("double"))
            .cast("int")
            + 1
        )
        name = f"q_{str(q).replace('0.', '')}"
        cols.append(
            F.when(F.col("n_sampled") == 0, F.lit(None))
            .otherwise(F.element_at(F.col("_a"), idx))
            .alias(name)
        )
    return agg.select(*cols)


def bottomk_quantiles_sql(
    src_sql: str,
    key_col: str,
    val_col: str,
    k: int = 256,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
) -> str:
    """DuckDB twin of bottomk_sample |> sample_quantiles."""
    sel = []
    for q in qs:
        name = f"q_{str(q).replace('0.', '')}"
        sel.append(
            f"CASE WHEN n = 0 THEN NULL ELSE "
            f"a[CAST(floor({float(q)!r} * CAST(n - 1 AS DOUBLE)) AS INT) + 1] "
            f"END AS {name}"
        )
    return f"""
WITH s AS (
  SELECT {val_col} AS v, md5(CAST({key_col} AS VARCHAR)) AS h
  FROM {src_sql} WHERE {key_col} IS NOT NULL
  ORDER BY h LIMIT {k}
),
arr AS (SELECT count(*)::BIGINT AS n, list(v ORDER BY v) AS a FROM s)
SELECT n AS n_sampled, {', '.join(sel)} FROM arr
"""


def grouped_bottomk_quantiles(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    val_col: str,
    k: int = 256,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """Per-group :func:`bottomk_sample` + :func:`sample_quantiles`: one
    row per group with its own k-row deterministic sample's order-stat
    quantiles. The sample selection is a rank window PARTITIONED by the
    group (state k rows per group, skew capped by k); the quantile
    finish is the same selection arithmetic as the ungrouped form."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*group_cols).orderBy("h")
    sample = (
        df.where(F.col(key_col).isNotNull())
        .select(
            *group_cols,
            _md5_hex(F.col(key_col)).alias("h"),
            F.col(val_col).alias("v"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
    )
    agg = sample.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.array_sort(F.collect_list("v")).alias("_a"),
    )
    cols = [*[F.col(c) for c in group_cols], F.col("n_sampled")]
    for q in qs:
        idx = (
            F.floor(F.lit(float(q)) * (F.col("n_sampled") - 1).cast("double"))
            .cast("int")
            + 1
        )
        cols.append(F.element_at(F.col("_a"), idx).alias(f"q_{str(q).replace('0.', '')}"))
    return agg.select(*cols)


def grouped_bottomk_quantiles_sql(
    src_sql: str,
    group_cols: list[str],
    key_col: str,
    val_col: str,
    k: int = 256,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
) -> str:
    """DuckDB twin of :func:`grouped_bottomk_quantiles`."""
    gs = ", ".join(group_cols)
    sel = ", ".join(
        f"a[CAST(floor({float(q)!r} * CAST(n - 1 AS DOUBLE)) AS INT) + 1] "
        f"AS q_{str(q).replace('0.', '')}"
        for q in qs
    )
    return f"""
WITH s AS (
  SELECT {gs}, {val_col} AS v,
         row_number() OVER (PARTITION BY {gs}
                            ORDER BY md5(CAST({key_col} AS VARCHAR))) AS _rn
  FROM {src_sql} WHERE {key_col} IS NOT NULL
),
arr AS (SELECT {gs}, count(*)::BIGINT AS n, list(v ORDER BY v) AS a
        FROM s WHERE _rn <= {k} GROUP BY {gs})
SELECT {gs}, n AS n_sampled, {sel} FROM arr
"""


# ------------------------------------------------ weighted sampling ---

def priority_key(key: Column, weight: Column) -> Column:
    """The deterministic priority q = w / u of weighted priority
    sampling (Duffield, Lund & Thorup, JACM 2007 "Priority sampling for
    estimation of arbitrary subset sums"): u is a 60-bit md5-derived
    fixed-point tag of the row key (no ``rand()`` — every engine, every
    partitioning, every day draws the same sample), so q is ONE IEEE
    divide of two exactly-represented integers and orders identically
    in any engine.

    Why priority sampling and not the Efraimidis-Spirakis key
    ``u^(1/w)``: both are weighted reservoirs from the same literature
    family, but ES needs ``pow`` — not guaranteed to round identically
    across libms (the ln/PSI exclusion precedent in functions/drift.py)
    — while the DLT priority needs only a division, and its ordering
    under cross-multiplication ``w_a * u_b > w_b * u_a`` is exact
    integer arithmetic. Same inclusion-probability structure
    (p_i = min(1, w_i / tau)), plus an unbiased subset-sum estimator.
    """
    u = F.conv(F.substring(_md5_hex(key), 1, 15), 16, 10).cast("long") + 1
    return weight.cast("double") / u.cast("double")


def priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int = 256,
    *,
    keep: list[str] | None = None,
) -> DataFrame:
    """Deterministic weighted sample of fixed size k: the rows with the
    k LARGEST priorities q = w/u (:func:`priority_key`) — heavy rows
    enter with probability ~min(1, w/tau), the weighted counterpart of
    :func:`bottomk_sample`. Plans as TakeOrdered (per-partition top-k
    then a k-row merge — never a full sort) and is MERGEABLE: the
    priority sample of a union is the priority-merge of per-part
    samples, which is exactly what TakeOrdered executes. ``key_col``
    must be unique per row; rows with NULL key or non-positive/NULL
    weight never enter (a zero-weight row has priority 0 and could
    only pad an undersized sample). Weights must be integers < 2^53
    (use exact cents for money — the snapshots.py law)."""
    keep = list(keep or ())
    w = F.col(weight_col)
    return (
        df.where(F.col(key_col).isNotNull() & w.isNotNull() & (w > 0))
        .select(
            *keep,
            F.col(key_col).alias("k"),
            w.cast("long").alias("w"),
            priority_key(F.col(key_col), w).alias("q"),
        )
        .orderBy(F.col("q").desc(), F.col("k").asc())
        .limit(k)
    )


def priority_sample_sql(
    src_sql: str, key_col: str, weight_col: str, k: int = 256, keep: str = ""
) -> str:
    """DuckDB twin of :func:`priority_sample` (same md5 tag, same single
    divide, same (q desc, key asc) order)."""
    keep_sel = f"{keep}, " if keep else ""
    return f"""
SELECT {keep_sel}{key_col} AS k, CAST({weight_col} AS BIGINT) AS w,
       CAST({weight_col} AS DOUBLE)
         / CAST(('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 15))::BIGINT + 1 AS DOUBLE) AS q
FROM {src_sql}
WHERE {key_col} IS NOT NULL AND {weight_col} IS NOT NULL AND {weight_col} > 0
ORDER BY q DESC, k ASC
LIMIT {int(k)}
"""


def subset_sum_estimate(sample_kplus1: DataFrame, k: int) -> DataFrame:
    """DLT unbiased total-weight estimator from a (k+1)-row priority
    sample: tau = the (k+1)-th priority; each of the top-k items
    estimates max(w_i, tau); if fewer than k+1 rows exist the sample is
    the whole population and the sum is exact. One bounded single-row
    fold (<= k+1 array elements — the sample_quantiles contract);
    returns (n_population_sampled, est_total)."""
    agg = sample_kplus1.agg(
        F.count(F.lit(1)).alias("n"),
        F.reverse(F.array_sort(F.collect_list(F.struct("q", "w")))).alias("_a"),
    )
    tau = F.element_at(F.col("_a"), k + 1).getField("q")
    topk = F.slice(F.col("_a"), 1, k)
    est_full = F.aggregate(
        topk,
        F.lit(0.0),
        lambda acc, s: acc + F.greatest(s.getField("w").cast("double"), tau),
    )
    est_exact = F.aggregate(
        F.col("_a"), F.lit(0.0), lambda acc, s: acc + s.getField("w").cast("double")
    )
    return agg.select(
        F.col("n"),
        F.when(F.col("n") <= k, est_exact).otherwise(est_full).alias("est_total"),
    )
