"""Unigram-LM (SentencePiece-style) tokenizer training and application.

The OTHER dominant public subword family next to BPE (Kudo 2018,
"Subword Regularization", arXiv:1804.10959; the SentencePiece `unigram`
trainer): instead of greedy merge rules, a vocabulary of pieces with
unigram log-probabilities is fit by EM over the segmentation lattice and
pruned to a target size; encoding picks the max-likelihood segmentation
by Viterbi. Structured exactly like functions/bpe.py for scale:

1. DISTRIBUTED word counting — the only corpus-size pass (one shuffle on
   the word key, map-side partial aggregation).
2. DRIVER-SIDE training over the BOUNDED word-frequency table
   (``learn_unigram``): seed vocabulary from substring counts, EM via
   forward-backward over each word's segmentation lattice, prune the
   lowest-expected-count pieces until the target vocabulary size — the
   same bounded-driver-state contract as SentencePiece's own trainer,
   which also holds the (capped) word-frequency table in memory.
3. DISTRIBUTED application: Viterbi-segment each DISTINCT word once in
   Arrow-batched ``mapInPandas``, join the per-word token counts back to
   occurrences — the corpus-size pass never runs Python per occurrence.
   See pipelines.q_unigram_token_counts.

Everything is deterministic for a fixed input table: seeding and pruning
tie-break lexicographically, EM iterates words and pieces in sorted
order, and Viterbi ties prefer fewer pieces then the earlier split
point, so Spark and the DuckDB oracle (which replays the same trained
vocabulary through the same encoder) agree exactly.

No reference parity: the reference (yuana97/Avro_Diff) has no tokenizer
surface; this is part of the beyond-reference LLM-pipeline tier.
"""

from __future__ import annotations

import math
from functools import lru_cache

#: log-probability assigned to an out-of-vocabulary single character at
#: encode time (rare words past the training table's ``max_words`` cap can
#: carry characters the trainer never saw). Matches SentencePiece's
#: unk-penalty idea: far below any trained piece, so unknown characters
#: never win over real pieces, but every string stays segmentable.
UNK_LOGP = -100.0

#: per-byte log-probability of the 256 byte-fallback pieces (SentencePiece
#: ``--byte_fallback``): production tokenizers never emit UNK — a character
#: outside the trained vocabulary segments into the ``<0xNN>`` pieces of
#: its UTF-8 encoding instead, so EVERY string round-trips losslessly.
#: Kept at the UNK penalty so byte pieces never beat a trained piece.
BYTE_LOGP = UNK_LOGP


def byte_pieces(ch: str) -> list[str]:
    """The ``<0xNN>`` byte-fallback pieces of one character's UTF-8
    encoding — the SentencePiece byte-piece surface convention."""
    return [f"<0x{b:02X}>" for b in ch.encode("utf-8")]


def decode_pieces(pieces: list[str]) -> str:
    """Inverse of encoding: concatenate pieces, folding runs of
    ``<0xNN>`` byte pieces back through UTF-8 — the lossless round-trip
    byte fallback guarantees."""
    out: list[str] = []
    buf = bytearray()
    for p in pieces:
        if len(p) == 6 and p.startswith("<0x") and p.endswith(">"):
            buf.append(int(p[3:5], 16))
            continue
        if buf:
            out.append(buf.decode("utf-8"))
            buf.clear()
        out.append(p)
    if buf:
        out.append(buf.decode("utf-8"))
    return "".join(out)


def _seed_vocab(
    word_counts: dict[str, int], seed_size: int, max_piece_len: int
) -> dict[str, float]:
    """Initial piece set: every single character seen, plus the
    ``seed_size`` substrings (length 2..max_piece_len) with the highest
    count*length mass — the standard suffix-array-free seeding
    approximation of the SentencePiece trainer."""
    sub: dict[str, int] = {}
    for w, c in sorted(word_counts.items()):
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                s = w[i:j]
                sub[s] = sub.get(s, 0) + c
    chars = {s: c for s, c in sub.items() if len(s) == 1}
    multi = sorted(
        (s for s in sub if len(s) > 1),
        key=lambda s: (-sub[s] * len(s), s),
    )[:seed_size]
    total = sum(chars.values()) + sum(sub[s] for s in multi)
    out = {s: math.log(c / total) for s, c in chars.items()}
    out.update({s: math.log(sub[s] / total) for s in multi})
    return out


def _em_step(
    word_counts: dict[str, int],
    logp: dict[str, float],
    max_piece_len: int,
) -> dict[str, float]:
    """One EM iteration: expected piece counts via forward-backward over
    each word's segmentation lattice (probability domain — float64 range
    comfortably covers short-word lattices), then re-normalize."""
    exp: dict[str, float] = {}
    for w, c in sorted(word_counts.items()):
        n = len(w)
        # cache piece probs present in this word's lattice
        edge: list[list[tuple[int, str, float]]] = [[] for _ in range(n + 1)]
        for i in range(n):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                s = w[i:j]
                lp = logp.get(s)
                if lp is not None:
                    edge[j].append((i, s, math.exp(lp)))
        alpha = [0.0] * (n + 1)
        alpha[0] = 1.0
        for j in range(1, n + 1):
            alpha[j] = sum(alpha[i] * pr for i, _, pr in edge[j])
        if alpha[n] <= 0.0:
            continue  # unsegmentable under current vocab (no char piece)
        beta = [0.0] * (n + 1)
        beta[n] = 1.0
        for i in range(n - 1, -1, -1):
            acc = 0.0
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                s = w[i:j]
                lp = logp.get(s)
                if lp is not None:
                    acc += math.exp(lp) * beta[j]
            beta[i] = acc
        z = alpha[n]
        for j in range(1, n + 1):
            for i, s, pr in edge[j]:
                exp[s] = exp.get(s, 0.0) + c * alpha[i] * pr * beta[j] / z
    total = sum(exp.values())
    if total <= 0.0:
        return logp
    floor = 1e-12  # keeps every single character segmentable forever
    out: dict[str, float] = {}
    for s in sorted(logp):
        e = exp.get(s, 0.0)
        if len(s) == 1:
            e = max(e, floor)
        if e > 0.0:
            out[s] = math.log(e / total)
    return out


def learn_unigram(
    word_counts: dict[str, int],
    vocab_size: int = 2000,
    *,
    seed_size: int = 8000,
    max_piece_len: int = 6,
    em_iters: int = 2,
    prune_keep: float = 0.75,
) -> dict[str, float]:
    """Fit a unigram-LM piece vocabulary: seed → (EM × em_iters → prune
    lowest-expected-count multi-char pieces to ``prune_keep`` of the
    current size) until ≤ ``vocab_size`` pieces remain → final EM round.
    Single characters are never pruned, so every string stays
    segmentable. Returns piece → log-probability."""
    word_counts = {w: c for w, c in word_counts.items() if w}
    logp = _seed_vocab(word_counts, seed_size, max_piece_len)
    while True:
        for _ in range(em_iters):
            logp = _em_step(word_counts, logp, max_piece_len)
        multi = [s for s in logp if len(s) > 1]
        if len(logp) <= vocab_size or not multi:
            break
        n_chars = len(logp) - len(multi)
        keep_n = max(vocab_size - n_chars, int(len(multi) * prune_keep))
        if keep_n >= len(multi):
            keep_n = max(vocab_size - n_chars, 0)
        kept = sorted(multi, key=lambda s: (-logp[s], s))[:keep_n]
        logp = {s: lp for s, lp in logp.items() if len(s) == 1 or s in set(kept)}
    return _em_step(word_counts, logp, max_piece_len)


def viterbi_encode(
    word: str,
    logp: dict[str, float],
    max_piece_len: int = 6,
    *,
    byte_fallback: bool = True,
) -> list[str]:
    """Max-likelihood segmentation of one word under the trained unigram
    LM — the standard Viterbi pass every unigram encoder runs. Fully
    deterministic: ties prefer (higher score, fewer pieces, earliest
    split start). Characters absent from the vocabulary segment into the
    ``<0xNN>`` byte pieces of their UTF-8 encoding at ``BYTE_LOGP`` per
    byte (SentencePiece ``--byte_fallback``; production tokenizers never
    emit UNK, and :func:`decode_pieces` round-trips losslessly). With
    ``byte_fallback=False`` an unknown character instead rides as itself
    at ``UNK_LOGP`` — the pre-round-7 behavior."""
    n = len(word)
    NEG = float("-inf")
    # (score, -n_pieces) maximized; back[j] = (i, [pieces])
    best = [(NEG, 0)] * (n + 1)
    best[0] = (0.0, 0)
    back: list[tuple[int, list[str]] | None] = [None] * (n + 1)
    for j in range(1, n + 1):
        cand = None
        for i in range(max(0, j - max_piece_len), j):
            if best[i][0] == NEG:
                continue
            s = word[i:j]
            lp = logp.get(s)
            if lp is None:
                if j - i > 1:
                    continue
                if byte_fallback:
                    pieces = byte_pieces(s)
                    lp = BYTE_LOGP * len(pieces)
                else:
                    pieces = [s]
                    lp = UNK_LOGP
            else:
                pieces = [s]
            key = (best[i][0] + lp, best[i][1] - len(pieces), -i)
            if cand is None or key > cand[0]:
                cand = (key, i, pieces)
        if cand is not None:
            best[j] = (cand[0][0], cand[0][1])
            back[j] = (cand[1], cand[2])
    out: list[str] = []
    j = n
    while j > 0:
        i, ps = back[j]  # type: ignore[misc]
        out.extend(reversed(ps))
        j = i
    out.reverse()
    return out


# (path, size, mtime_ns) content key — a regenerated parquet can never
# serve a stale vocabulary from the cache. ONE implementation, shared by
# every driver-side trainer (bpe/unigram/langid).
from avro_diff_spark.functions.bpe import _file_key  # noqa: E402


@lru_cache(maxsize=8)
def _train_cached(key: tuple, path: str, vocab_size: int, max_words: int):
    from avro_diff_spark.functions.fit import word_count_table

    logp = learn_unigram(dict(word_count_table(path, max_words)), vocab_size)
    return tuple(sorted(logp.items()))


def train_unigram(
    documents_parquet: str, *, vocab_size: int = 2000, max_words: int = 20_000
) -> dict[str, float]:
    """Train a unigram vocabulary from a documents parquet. The
    word-frequency table (capped at ``max_words`` by count — the same
    contract as SentencePiece's own trainer and bpe.train_bpe_merges) is
    computed as a DISTRIBUTED Spark aggregation (functions/fit.py) and
    only that bounded table reaches the driver for EM + pruning; with no
    active SparkSession the pinned-identical DuckDB fallback is used. The
    same whitespace normalization as functions.text.norm_text keeps Spark
    and oracle tokenizations identical."""
    return dict(
        _train_cached(_file_key(documents_parquet), documents_parquet, vocab_size, max_words)
    )
