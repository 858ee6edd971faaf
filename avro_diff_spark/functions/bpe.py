"""Byte-pair-encoding tokenizer training and application.

The tokenizer-training step of an LLM data pipeline, structured the way
production trainers (Sennrich et al. 2016 subword-nmt; HF tokenizers;
SentencePiece's BPE mode) actually run at scale:

1. DISTRIBUTED word counting — the only pass that touches the corpus.
   A 100 TB corpus aggregates to a word-frequency table bounded by the
   distinct vocabulary, shuffling once on the word key (map-side partial
   aggregation does the heavy lifting).
2. DRIVER-SIDE merge learning over that bounded table (``learn_bpe``) —
   exactly what every published trainer does: the word-frequency dict
   fits in memory by construction, and ``max_words`` caps it besides.
3. DISTRIBUTED application: BPE segments each DISTINCT word once
   (Arrow-batched ``mapInPandas``), then a join fans the per-word token
   counts back to occurrences — the corpus-size pass never runs Python
   per occurrence. See pipelines.q_bpe_token_counts.

No reference parity: the reference (yuana97/Avro_Diff) has no tokenizer
surface; this is part of the beyond-reference LLM-pipeline tier.
"""

from __future__ import annotations

from functools import lru_cache

#: end-of-word marker (Sennrich et al. 2016 convention)
EOW = "</w>"


def learn_bpe(word_counts: dict[str, int], n_merges: int = 50) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a word -> count table.

    Classic algorithm: words start as character sequences (plus the
    ``</w>`` end marker); each round merges the most frequent adjacent
    symbol pair. Ties break on the lexicographically smallest pair, so
    the merge list is fully deterministic for a given table. Stops early
    when no pair occurs at least twice.
    """
    words = [(list(w) + [EOW], c) for w, c in sorted(word_counts.items()) if w]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in words:
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                counts[pair] = counts.get(pair, 0) + c
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        if counts[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for k, (syms, c) in enumerate(words):
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[k] = (out, c)
    return merges


def bpe_encode(
    word: str,
    ranks: dict[tuple[str, str], int],
    *,
    alphabet: frozenset[str] | set[str] | None = None,
) -> list[str]:
    """Segment one word with learned merges — the greedy lowest-rank loop
    every production encoder runs (subword-nmt / GPT-2 style): repeatedly
    merge the present pair with the best (lowest) rank, left-to-right and
    non-overlapping, until no mergeable pair remains.

    With ``alphabet`` (the trained character set, from
    :func:`train_bpe`), characters OUTSIDE it fall back to the
    ``<0xNN>`` byte pieces of their UTF-8 encoding after the merge loop
    — the GPT-2 byte-level / SentencePiece ``--byte_fallback``
    convention: every emitted piece is then either a known symbol or a
    byte piece (production tokenizers never emit UNK), and
    ``functions.unigram.decode_pieces`` round-trips losslessly."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_pair = (syms[i], syms[i + 1])
        if best_pair is None:
            break
        merged = best_pair[0] + best_pair[1]
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == best_pair[0] and syms[i + 1] == best_pair[1]:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    if alphabet is not None:
        from avro_diff_spark.functions.unigram import byte_pieces

        fb: list[str] = []
        for s in syms:
            # merge products and EOW are alphabet-derived by construction;
            # only a raw single char can be out-of-alphabet
            if len(s) == 1 and s not in alphabet:
                fb.extend(byte_pieces(s))
            else:
                fb.append(s)
        syms = fb
    return syms


def _file_key(path: str) -> tuple:
    """(path, size, mtime_ns) content key — a regenerated parquet can
    never serve stale merges from the cache (round-4 ADVICE pattern)."""
    import os

    if os.path.isdir(path):
        parts = [path]
        for dp, _, fns in os.walk(path):
            for fn in sorted(fns):
                st = os.stat(os.path.join(dp, fn))
                parts.append((fn, st.st_size, st.st_mtime_ns))
        return tuple(parts)
    st = os.stat(path)
    return (path, st.st_size, st.st_mtime_ns)


@lru_cache(maxsize=8)
def _train_cached(key: tuple, path: str, n_merges: int, max_words: int):
    from avro_diff_spark.functions.fit import word_count_table

    counts = dict(word_count_table(path, max_words))
    alphabet = frozenset(ch for w in counts for ch in w) | {EOW}
    return tuple(learn_bpe(counts, n_merges)), alphabet


def train_bpe_merges(
    documents_parquet: str, *, n_merges: int = 50, max_words: int = 50_000
) -> list[tuple[str, str]]:
    """Train merges from a documents parquet. The word-frequency table is
    computed as a DISTRIBUTED Spark aggregation (functions/fit.py
    ``word_count_table``: groupBy count + TakeOrderedAndProject) and only
    the bounded top-``max_words`` table reaches the driver, where the
    merge-learning loop runs; with no active SparkSession the same table
    comes from the pinned-identical DuckDB fallback. The same whitespace
    normalization as functions.text.norm_text keeps the Spark and oracle
    tokenizations identical."""
    return list(
        _train_cached(_file_key(documents_parquet), documents_parquet, n_merges, max_words)[0]
    )


def train_bpe(
    documents_parquet: str, *, n_merges: int = 50, max_words: int = 50_000
) -> tuple[list[tuple[str, str]], frozenset[str]]:
    """Like :func:`train_bpe_merges` but also returns the trained
    character alphabet — pass it to :func:`bpe_encode` ``alphabet=`` to
    enable byte fallback for out-of-alphabet characters (same cached
    training run; the alphabet is the word table's character set)."""
    merges, alphabet = _train_cached(
        _file_key(documents_parquet), documents_parquet, n_merges, max_words
    )
    return list(merges), alphabet
