"""Text-analysis column functions for LLM-data-pipeline operators.

No reference code exists for these (the reference's only scalar functions are
String() casts and JSON stringify, SURVEY.md §2.7); they are the north-star
extensions (BASELINE.json) built as pure Column expressions — JVM-side,
whole-stage-codegen eligible, no Python UDFs in any hot path.

Engine-portability rule: every derived number is integer arithmetic, md5
hashing, or a single IEEE double op on integers — so the DuckDB oracle can
reproduce values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: token regex shared by Spark and the DuckDB oracles: words | numbers |
#: single non-space symbol (a BPE-ish pre-tokenization split).
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: prime just above 2^32 for minhash universal hashing.
MERSENNE_P = 4_294_967_311


def norm_text(col: Column) -> Column:
    """Lowercase, trim, collapse runs of whitespace to single spaces."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def tokens_ws(col: Column, *, pre_normalized: bool = False) -> Column:
    """Whitespace tokens of the normalized text (no empty tokens).

    ``pre_normalized=True`` skips the norm regex — pass it when the caller
    has already projected :func:`norm_text` into a column, so multi-feature
    selects evaluate the regex once instead of once per feature."""
    return F.split(col if pre_normalized else norm_text(col), " ")


def token_count_ws(col: Column) -> Column:
    return F.size(tokens_ws(col))


def token_count_bpe(col: Column) -> Column:
    """BPE-ish token count: words + numbers + individual symbols."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_RE), 0))


def hash32(col: Column) -> Column:
    """Deterministic 32-bit integer hash: first 8 hex digits of md5.

    Portable: DuckDB computes the identical value via
    ``('0x' || substr(md5(s), 1, 8))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def fingerprint_md5(col: Column, *, pre_normalized: bool = False) -> Column:
    """Document fingerprint: md5 of the normalized text."""
    return F.md5(col if pre_normalized else norm_text(col))


def dedup_paragraphs(col: Column, *, sep: str = "\n\n") -> Column:
    """Intra-document paragraph dedup: drop every repeat of an
    already-seen paragraph, KEEPING first-occurrence order, and rejoin —
    the within-page cleanup (boilerplate blocks, syndication footers,
    scraper stutters repeat inside one document) that document-level
    dedup cannot touch. Pure Column: split → ``array_distinct`` (Spark
    preserves first-occurrence order) → join; the DuckDB oracle law is
    the explicit first-occurrence filter (``list_position(a, a[i]) = i``)
    because its ``list_distinct`` does not preserve order."""
    return F.array_join(F.array_distinct(F.split(col, sep)), sep)


def nfc(col: Column) -> Column:
    """Unicode canonical composition (NFC) of a string column — the
    multilingual dedup-key prerequisite: 'café' spelled with a composed
    U+00E9 and with 'e' + combining U+0301 are the SAME text to a
    reader, and a fingerprint over the raw bytes splits that dedup
    group. The JVM exposes no normalizer through Spark's function
    surface, so this is the engine's one Arrow-batched scalar
    pandas_udf: CPython's ``unicodedata.normalize`` (UCD-exact, the
    same tables DuckDB's utf8proc oracle twin ``nfc_normalize`` uses)
    with a two-level ASCII fast path — ASCII is NFC-invariant, so a
    JVM-side ``rlike`` gate masks all-ASCII strings to NULL before the
    Arrow boundary (their bytes never cross it — a validity bit does;
    round-13 verdict item 3) and ``coalesce`` restores them after,
    while inside the batch the residual ``isascii`` check still
    short-circuits. One pass, order preserved, NULLs pass through."""
    global _NFC_UDF
    if _NFC_UDF is None:  # lazy: pandas_udf creation needs a live session
        from pyspark.sql.functions import pandas_udf

        _NFC_UDF = pandas_udf(_nfc_batch, "string")
    return F.coalesce(_NFC_UDF(F.when(col.rlike("[^\\x00-\\x7F]"), col)), col)


_NFC_UDF = None


def _nfc_batch(s):
    import unicodedata

    return s.map(
        lambda t: t if t.isascii() else unicodedata.normalize("NFC", t),
        na_action="ignore",
    )


def fingerprint_md5_nfc(col: Column, *, pre_normalized: bool = False) -> Column:
    """:func:`fingerprint_md5` over the NFC form — the fingerprint to
    use on multilingual corpora (composed/decomposed spellings merge)."""
    return F.md5(nfc(col if pre_normalized else norm_text(col)))


#: rolling-hash constants (Rabin–Karp): base 31, large prime modulus.
#: acc < mod ⇒ acc*31 + 0x10FFFF < 2^35 — no int64 overflow.
ROLL_BASE = 31
ROLL_MOD = 1_000_000_007


def rolling_hash(col: Column, *, pre_normalized: bool = False) -> Column:
    """Polynomial rolling hash of the normalized text (Rabin–Karp form):
    ``h = fold(chars, 0, (acc, c) -> (acc*B + code(c)) mod M)``.

    Cheaper than md5 for incremental/windowed fingerprinting and
    engine-portable: DuckDB reproduces it with list_reduce over
    string_split (see pipelines.ROLLING_FINGERPRINTS_SQL)."""
    s = col if pre_normalized else norm_text(col)
    codes = F.transform(F.split(s, ""), lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(ROLL_BASE) + x) % F.lit(ROLL_MOD),
    )


def _safe_seq(start: int, n: Column) -> Column:
    """sequence(start, start+n-1), empty when n < 1. (Spark's sequence()
    DESCENDS when start > stop — never call it with an unguarded bound.)"""
    return F.when(n < 1, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(start), F.lit(start) + n - 1)
    )


def char_shingles(col: Column, k: int = 5, *, pre_normalized: bool = False) -> Column:
    """All k-character shingles of the normalized text (with duplicates)."""
    s = col if pre_normalized else norm_text(col)
    n = F.length(s) - F.lit(k - 1)
    return F.transform(_safe_seq(1, n), lambda i: s.substr(i, F.lit(k)))


#: polynomial-shingle base: > 127, so the polynomial is INJECTIVE over
#: 7-bit-folded character codes (radix argument) — no collisions at all on
#: ASCII text, unlike a short hash. Bounds: 131^7 · 127 · 8 ≈ 6.7e17, exact
#: in int64 with no modulus through k = 8.
POLY_B = 131
POLY_MAX_K = 8


def char_codes(col: Column, *, pre_normalized: bool = False) -> Column:
    """7-bit-folded character codes of the normalized text (the polynomial
    shingle-hash input). MATERIALIZE THIS AS A PROJECTED COLUMN before
    passing it to :func:`poly_shingle_hashes`: the polynomial references
    the array k times per position, and a computed expression there gets
    inlined and rebuilt per reference — an O(k·n²) blowup (measured 7×
    slower than md5 hashing; with a column reference it is ~2× faster)."""
    s = col if pre_normalized else norm_text(col)
    return F.transform(F.split(s, ""), lambda c: F.ascii(c).cast("long") % 128)


def poly_shingle_hashes(codes: Column, k: int = 5) -> Column:
    """int64 polynomial of every k-char shingle over a MATERIALIZED codes
    column (see :func:`char_codes`):
    ``h(i) = Σ_j codes[i+j] · B^(k-1-j)`` — the rolling-hash replacement
    for md5-per-shingle on the dedup hot path (k multiply-adds per
    position vs a full digest). Exact int64, collision-FREE on ASCII
    (injective radix-131 encoding of the folded codes; non-ASCII
    codepoints fold mod 128 — deterministic and identical in the SQL
    mirror)."""
    if k > POLY_MAX_K:
        raise ValueError(f"poly_shingle_hashes supports k <= {POLY_MAX_K}")
    n = F.size(codes) - F.lit(k - 1)

    def h(i: Column) -> Column:
        total = None
        for j in range(k):
            term = F.element_at(codes, i + j) * F.lit(POLY_B ** (k - 1 - j))
            total = term if total is None else total + term
        return total

    return F.transform(_safe_seq(1, n), h)


def winnow_hashes(codes: Column, *, k: int = 5, w: int = 8) -> Column:
    """Winnowing fingerprint set (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    the MOSS document-fingerprinting algorithm): the distinct minima of
    every ``w``-long window over the per-position k-gram hashes, sorted.

    Guarantee: two documents sharing any substring of length ≥ ``w+k-1``
    share at least one fingerprint — the deterministic, position-robust
    subsampling that whole-document hashes (md5 / rolling) can't give.
    Density is ~2/(w+1) of positions, so the selected set is an ~8x
    compression at w=8 while staying collision-free (exact int64 polynomial
    k-gram hashes underneath, see :func:`poly_shingle_hashes`).

    Window minima come from the sparse-table doubling trick, not per-window
    slices: ``T_1 = hs``, ``T_2p[i] = least(T_p[i], T_p[i+p])``, and the
    w-window min is ``least(T_P[i], T_P[i+w-P])`` with ``P`` the largest
    power of two ≤ w — ⌈log₂ w⌉ + 1 zip_with passes of O(n) each instead
    of n slice allocations of w (measured ~5× on the registry query; the
    shifted operand reuses ``F.slice``, and zip_with's null padding on the
    shorter side is harmless because ``F.least`` skips nulls and the final
    slice keeps only the n−w+1 valid windows). Ties keep ALL minimal
    positions' values (value-set semantics: selecting by value, not
    position, is the robust-winnowing variant and is position-shift
    invariant)."""
    return winnow_min_hashes(poly_shingle_hashes(codes, k), w=w)


def winnow_min_hashes(hs: Column, *, w: int = 8) -> Column:
    """The winnowing window-min core of :func:`winnow_hashes` over an
    ARBITRARY per-position hash array — sorted distinct minima of every
    ``w``-long window (same sparse-table doubling, same short-doc and
    tie laws). Factored out (round 13) so word-n-gram streams winnow
    too: ``ngram_decontaminate`` feeds 13-gram hash32 values through
    this to subsample eval-overlap tests at ~2/(w+1) density."""
    n = F.size(hs)

    def shifted(arr: Column, s: int) -> Column:
        return F.slice(arr, 1 + s, F.greatest(n - s, F.lit(0)))

    p = 1
    table = hs  # T_p: per-index min over [i, i+p)
    while p * 2 <= w:
        table = F.zip_with(table, shifted(table, p), lambda a, b: F.least(a, b))
        p *= 2
    win = (
        table if p == w else F.zip_with(table, shifted(table, w - p), lambda a, b: F.least(a, b))
    )
    n_win = n - F.lit(w - 1)
    mins = F.slice(win, 1, F.greatest(n_win, F.lit(0)))
    # short docs (k-grams exist but fewer than w): one window over them all
    short = F.when((n > 0) & (n_win < 1), F.array(F.array_min(hs))).otherwise(mins)
    return F.array_sort(F.array_distinct(short))


def word_shingles(col: Column, k: int = 3) -> Column:
    """All k-word shingles (space-joined) of the whitespace tokens."""
    toks = tokens_ws(col)
    n = F.size(toks) - F.lit(k - 1)
    return F.transform(
        _safe_seq(1, n),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )


# --- language identification (stopword-count heuristic) -------------------

#: tiny per-language stopword marker lists. Order of LANGS is the
#: deterministic tie-break priority (first max wins).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr": ("le", "la", "et", "les", "des", "est", "un", "une", "dans", "pour"),
}
LANGS = tuple(STOPWORDS)


def stopword_count(col: Column, lang: str) -> Column:
    """Occurrences (with multiplicity) of ``lang``'s stopwords in the text."""
    marker = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens_ws(col), lambda t: F.array_contains(marker, t)))


def lang_id(col: Column) -> Column:
    """Predicted language: argmax of stopword counts, 'und' (undetermined)
    when every count is zero. Ties break by LANGS order (first max wins)."""
    counts = {lang: stopword_count(col, lang) for lang in LANGS}
    m = F.greatest(*counts.values())
    expr = F.lit("und")
    for lang in reversed(LANGS):  # build WHEN chain so earlier langs win ties
        expr = F.when(counts[lang] == m, F.lit(lang)).otherwise(expr)
    return F.when(m == 0, F.lit("und")).otherwise(expr)


# --- repetition signals (Gopher-style filters) ----------------------------

def top_frac(arr: Column) -> Column:
    """Fraction of an array taken by its single most frequent element —
    the Gopher repetition-filter core (a high value marks boilerplate/
    spam). 1.0 for a fully repeated array; NULL when empty.

    Per-row O(n²) via distinct×filter — right for documents up to a few
    thousand tokens (the common LLM-corpus shape after splitting);
    book-length inputs should explode to a (doc_id, gram) groupBy instead.
    PASS A MATERIALIZED COLUMN, not a computed expression: the inner
    lambda references ``arr`` once per distinct element, so a non-cheap
    expression would be re-evaluated O(n) times per row (measured 5× on
    the repetition query).
    """
    counts = F.transform(
        F.array_distinct(arr),
        lambda d: F.size(F.filter(arr, lambda g: g == d)),
    )
    return F.try_divide(F.array_max(counts).cast("double"), F.size(arr))


def top_ngram_frac(col: Column, n: int = 2) -> Column:
    """Top-n-gram occupancy straight from a text column (convenience form;
    multi-feature selects should stage tokens/grams as columns and call
    :func:`top_frac` — see pipelines.q_repetition_stats)."""
    return top_frac(tokens_ws(col) if n == 1 else word_shingles(col, n))


def word_grams_from_tokens(toks: Column, n: int = 2) -> Column:
    """Space-joined word n-grams from a pre-tokenized array column."""
    m = F.size(toks) - F.lit(n - 1)
    return F.transform(
        _safe_seq(1, m), lambda i: F.array_join(F.slice(toks, i, n), " ")
    )


def unique_frac(arr: Column) -> Column:
    """Distinct elements / total elements (low ⇒ repetitive doc)."""
    return F.try_divide(F.size(F.array_distinct(arr)).cast("double"), F.size(arr))


def unique_word_frac(col: Column) -> Column:
    return unique_frac(tokens_ws(col))


def mean_elem_len(arr: Column) -> Column:
    """Mean element length in characters (Gopher uses 3–10 as the sane
    band for words)."""
    total = F.aggregate(
        F.transform(arr, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return F.try_divide(total.cast("double"), F.size(arr))


def mean_word_len(col: Column) -> Column:
    return mean_elem_len(tokens_ws(col))


# --- PII redaction --------------------------------------------------------

#: conservative patterns valid in BOTH Java regex (Spark) and RE2 (DuckDB):
#: no backrefs, no lookaround, ASCII classes only.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+[0-9][0-9()\-\s]{6,}[0-9]",
}
PII_KINDS = tuple(PII_PATTERNS)


def pii_count(col: Column, kind: str) -> Column:
    """Occurrences of one PII pattern in the raw text."""
    return F.regexp_count(col, F.lit(PII_PATTERNS[kind]))


def redact_pii(col: Column) -> Column:
    """Replace every PII match with ``<KIND>`` markers, applied in
    PII_KINDS order (emails first so phone digits inside a redacted email
    can't double-match)."""
    out = col
    for kind in PII_KINDS:
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


# --- quality scoring ------------------------------------------------------

def text_features(col: Column) -> dict[str, Column]:
    """Integer/single-division quality features (each engine-portable)."""
    norm = norm_text(col)
    toks = tokens_ws(col)
    n_chars = F.length(norm)
    n_tokens = F.size(toks)
    n_alpha = F.length(F.regexp_replace(norm, r"[^a-z]", ""))
    n_digit = F.length(F.regexp_replace(norm, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(norm, r"[^!-/:-@\[-`{-~]", ""))
    n_stop = stopword_count(col, "en")
    # try_divide: empty text has n_chars == 0 and ANSI mode (Spark 4
    # default) would throw; ratios come back NULL for such rows instead.
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "alpha_ratio": F.try_divide(n_alpha.cast("double"), n_chars),
        "digit_ratio": F.try_divide(n_digit.cast("double"), n_chars),
        "punct_ratio": F.try_divide(n_punct.cast("double"), n_chars),
        "stopword_ratio": F.try_divide(n_stop.cast("double"), n_tokens),
        "mean_token_len": F.try_divide(n_alpha.cast("double"), n_tokens),
    }


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: rewards alphabetic prose of sane
    length with some stopwords; penalizes symbol/digit soup. The exact
    weights are arbitrary; the contract is determinism and monotonicity in
    the obvious directions."""
    f = text_features(col)
    length_ok = F.when((f["n_chars"] >= 50) & (f["n_chars"] <= 10000), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    # NOTE: no rounding — the oracle mirrors this exact expression tree, and
    # identical IEEE op order yields bit-identical doubles in both engines.
    return (
        F.lit(0.3) * f["alpha_ratio"]
        + F.lit(0.2) * F.least(f["stopword_ratio"] * 2, F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least(f["punct_ratio"] * 4, F.lit(1.0)))
        + F.lit(0.1) * (F.lit(1.0) - F.least(f["digit_ratio"] * 4, F.lit(1.0)))
        + F.lit(0.2) * length_ok
    )


def c4_keep_line(line: Column, *, min_words: int = 3) -> Column:
    """C4's line-retention predicate (Raffel et al. 2020, §2.2 — public):
    a line survives iff it ends in a terminal punctuation mark, carries at
    least ``min_words`` words, and does not mention javascript. Pure
    Column expression (regex + split), JVM-side."""
    return (
        line.rlike('[.!?"]$')
        & (F.size(F.split(F.trim(line), r"\s+")) >= min_words)
        & ~F.contains(F.lower(line), F.lit("javascript"))
    )


def c4_line_filter(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_words: int = 3,
    min_kept_lines: int = 5,
) -> "DataFrame":
    """C4-style page cleaning: per-line retention (:func:`c4_keep_line`)
    plus the page-level drops — any page containing ``lorem ipsum`` or a
    curly brace, or keeping fewer than ``min_kept_lines`` lines, is
    dropped whole (``page_kept = false``, NULL ``clean_text``).

    The cleaning pass every web-scale pretraining corpus runs before
    dedup/quality scoring. Everything is Column expressions over a
    ``split``/``filter``/``array_join`` pipeline — at 100 TB this is a
    single projection over the scan: no shuffle, no Python, and Catalyst
    prunes to (id, text).

    Output: (id, n_lines, n_kept, page_kept, clean_text).
    """
    text = F.col(text_col)
    lines = F.split(text, "\n")
    kept = F.filter(lines, lambda l: c4_keep_line(l, min_words=min_words))
    page_kept = (
        ~F.contains(F.lower(text), F.lit("lorem ipsum"))
        & ~F.contains(text, F.lit("{"))
        & (F.size(kept) >= min_kept_lines)
    )
    return df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        page_kept.alias("page_kept"),
        F.when(page_kept, F.array_join(kept, "\n")).alias("clean_text"),
    )
