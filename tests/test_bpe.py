"""BPE tokenizer training/application tests.

Pins the classic Sennrich et al. (2016) worked example, determinism,
and the equivalence that production encoders rely on: applying learned
merges greedily by rank (the subword-nmt / GPT-2 loop in bpe_encode)
segments identically to replaying the merges in learned order.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from avro_diff_spark.functions.bpe import EOW, bpe_encode, learn_bpe


def _apply_in_order(word: str, merges) -> list[str]:
    """Reference encoder: replay merges in learned order, each applied
    left-to-right non-overlapping — the training-time definition."""
    syms = list(word) + [EOW]
    for a, b in merges:
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_sennrich_worked_example():
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = learn_bpe(counts, n_merges=4)
    # 'es' occurs 9x (newest 6 + widest 3) — the famous first merge —
    # then 'est', 'est</w>', then 'lo' (low 5 + lower 2 = 7)
    assert merges == [("e", "s"), ("es", "t"), ("est", EOW), ("l", "o")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe_encode("newest", ranks) == ["n", "e", "w", "est</w>"]
    assert bpe_encode("lowest", ranks) == ["lo", "w", "est</w>"]
    assert bpe_encode("low", ranks) == ["lo", "w", EOW]


def test_learning_is_deterministic():
    counts = {"aba": 3, "bab": 3, "abab": 2}
    assert learn_bpe(counts, 6) == learn_bpe(dict(reversed(list(counts.items()))), 6)


def test_no_merges_below_frequency_two():
    assert learn_bpe({"xyz": 1}, 10) == []
    ranks = {}
    assert bpe_encode("xyz", ranks) == ["x", "y", "z", EOW]


@settings(max_examples=60, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abcd", min_size=1, max_size=8),
        st.integers(1, 20),
        min_size=1,
        max_size=12,
    ),
    st.integers(1, 30),
    st.lists(st.text(alphabet="abcd", min_size=0, max_size=10), max_size=6),
)
def test_greedy_rank_equals_sequential_replay(counts, n_merges, probes):
    """For merges learned by BPE, greedy lowest-rank application equals
    sequential replay — on training words AND unseen probe words."""
    merges = learn_bpe(counts, n_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in list(counts) + probes:
        assert bpe_encode(w, ranks) == _apply_in_order(w, merges), (w, merges)


@settings(max_examples=30, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abc", min_size=1, max_size=6),
        st.integers(1, 9),
        min_size=1,
        max_size=8,
    )
)
def test_segmentation_reconstructs_word(counts):
    merges = learn_bpe(counts, 20)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in counts:
        assert "".join(bpe_encode(w, ranks)) == w + EOW


def test_train_from_parquet_cached(tmp_path):
    import duckdb

    p = str(tmp_path / "documents.parquet")
    duckdb.sql(
        "COPY (SELECT i AS doc_id, 'the lowest newest rates' AS text "
        "FROM range(20) t(i)) TO '" + p + "' (FORMAT PARQUET)"
    )
    from avro_diff_spark.functions import bpe as B

    m1 = B.train_bpe_merges(p, n_merges=5)
    assert m1 and all(isinstance(t, tuple) and len(t) == 2 for t in m1)
    assert B.train_bpe_merges(p, n_merges=5) == m1
    # regenerating the file invalidates the cache key (mtime/size change)
    duckdb.sql(
        "COPY (SELECT i AS doc_id, 'zz zz zz' AS text FROM range(30) t(i)) "
        "TO '" + p + "' (FORMAT PARQUET)"
    )
    m2 = B.train_bpe_merges(p, n_merges=5)
    assert m2 != m1


def test_bpe_byte_fallback_round_trip():
    """With the trained alphabet supplied, out-of-alphabet characters
    segment into <0xNN> byte pieces (never a bare unknown symbol) and
    decode_pieces() inverts losslessly; in-alphabet encoding is
    unchanged from the no-fallback path."""
    from avro_diff_spark.functions import bpe as B
    from avro_diff_spark.functions.unigram import decode_pieces

    wc = {"lower": 5, "lowest": 4, "newer": 6}
    merges = B.learn_bpe(wc, n_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    alphabet = frozenset(ch for w in wc for ch in w) | {B.EOW}

    for word in ("lower", "низ", "low日er", "a🎉b"):
        pieces = B.bpe_encode(word, ranks, alphabet=alphabet)
        known = set(alphabet) | {m[0] + m[1] for m in merges}
        for p in pieces:
            assert p in known or (
                p.startswith("<0x") and p.endswith(">") and len(p) == 6
            ), p
        assert decode_pieces(pieces).removesuffix(B.EOW) == word
    assert B.bpe_encode("lower", ranks, alphabet=alphabet) == B.bpe_encode(
        "lower", ranks
    )


def test_train_bpe_returns_alphabet(tmp_path):
    import duckdb

    p = str(tmp_path / "documents.parquet")
    duckdb.sql(
        "COPY (SELECT i AS doc_id, 'abc abd' AS text FROM range(5) t(i)) "
        "TO '" + p + "' (FORMAT PARQUET)"
    )
    from avro_diff_spark.functions import bpe as B

    merges, alphabet = B.train_bpe(p, n_merges=3)
    assert alphabet == frozenset("abcd") | {B.EOW}
    assert merges == B.train_bpe_merges(p, n_merges=3)
