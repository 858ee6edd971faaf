"""Unigram-LM (SentencePiece-style) tokenizer: trainer + Viterbi encoder.

Pinning strategy mirrors tests/test_bpe.py: the encoder is
property-pinned against a NAIVE exhaustive reference (all 2^(n-1)
segmentations scored directly), the trainer against structural
invariants (segmentability, normalization, prune monotonicity), and the
distributed query against hand-computable corpora.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from avro_diff_spark.functions.unigram import (
    UNK_LOGP,
    learn_unigram,
    viterbi_encode,
)


def _brute_best(word: str, logp: dict[str, float], max_piece_len: int = 6) -> float:
    """Score of the best segmentation by exhaustive enumeration."""
    n = len(word)
    best = float("-inf")
    for mask in range(1 << max(n - 1, 0)):
        cuts = [0] + [i + 1 for i in range(n - 1) if mask >> i & 1] + [n]
        score = 0.0
        ok = True
        for a, b in zip(cuts, cuts[1:]):
            s = word[a:b]
            if b - a > max_piece_len:
                ok = False
                break
            lp = logp.get(s)
            if lp is None:
                if b - a > 1:
                    ok = False
                    break
                lp = UNK_LOGP
            score += lp
        if ok and score > best:
            best = score
    return best


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=8), min_size=1, max_size=8
    ),
    st.text(alphabet="abcd", min_size=1, max_size=9),
)
def test_viterbi_matches_exhaustive_search(words, query):
    """Viterbi returns a segmentation whose score equals the max over ALL
    2^(n-1) segmentations — on vocabularies trained from arbitrary small
    corpora and queries containing unseen characters ('d' never trains).
    byte_fallback=False pins the raw DP; the byte-fallback surface has
    its own round-trip property below."""
    logp = learn_unigram({w: i + 1 for i, w in enumerate(words)}, vocab_size=50)
    pieces = viterbi_encode(query, logp, byte_fallback=False)
    assert "".join(pieces) == query
    got = sum(logp.get(s, UNK_LOGP) for s in pieces)
    want = _brute_best(query, logp)
    assert math.isclose(got, want, rel_tol=1e-12, abs_tol=1e-12)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=8), min_size=1, max_size=8
    ),
    st.text(
        alphabet=st.sampled_from(list("abcdé日🎉ß")), min_size=1, max_size=9
    ),
)
def test_byte_fallback_never_emits_unk_and_round_trips(words, query):
    """The production-tokenizer contract (SentencePiece --byte_fallback /
    GPT-2 byte level): EVERY string segments into pieces that are each
    either in the trained vocabulary or a <0xNN> byte piece — no bare
    unknown characters — and decode_pieces() inverts losslessly,
    including multi-byte UTF-8 (é=2, 日=3, 🎉=4 bytes)."""
    from avro_diff_spark.functions.unigram import decode_pieces

    logp = learn_unigram({w: i + 1 for i, w in enumerate(words)}, vocab_size=50)
    pieces = viterbi_encode(query, logp)
    for p in pieces:
        assert p in logp or (p.startswith("<0x") and p.endswith(">") and len(p) == 6)
    assert decode_pieces(pieces) == query
    # known chars never degrade to bytes: an all-vocab query is unchanged
    assert all(
        not p.startswith("<0x") for p in viterbi_encode("".join(words)[:9], logp)
    )


def test_trainer_invariants():
    wc = {"banana": 20, "bandana": 10, "ban": 5, "anna": 8, "nab": 1}
    logp = learn_unigram(wc, vocab_size=12, seed_size=30)
    # every single character survives -> everything segmentable
    for ch in "bandn":
        assert ch in logp
    # a proper distribution (normalized within float tolerance)
    assert math.isclose(sum(math.exp(p) for p in logp.values()), 1.0, rel_tol=1e-9)
    # frequent whole words become pieces; vocab respects the target
    assert len(logp) <= 12 + len(set("".join(wc)))
    # determinism: same table -> identical vocabulary and probabilities
    assert learn_unigram(wc, vocab_size=12, seed_size=30) == logp


def test_prune_prefers_high_mass_pieces():
    """With a tight budget the trainer keeps the piece that explains the
    most corpus mass ('aaaa' dominates) over rare substrings."""
    wc = {"aaaa": 100, "bbbb": 1}
    logp = learn_unigram(wc, vocab_size=3, seed_size=10)
    multi = {s for s in logp if len(s) > 1}
    assert any(set(s) == {"a"} for s in multi)
    assert math.exp(logp["a"] if "a" in logp else -99) >= 0.0  # chars retained
    assert "a" in logp and "b" in logp


def test_unigram_token_counts_query(spark, tmp_path):
    """End-to-end distributed application: token totals equal a
    driver-side re-encode of every word occurrence."""
    from avro_diff_spark.functions.unigram import train_unigram
    from avro_diff_spark.pipelines import q_unigram_token_counts

    rows = [
        (1, "the quick brown fox", "en", "web"),
        (2, "the the the", "en", "web"),
        (3, "quickly quick brownie", "en", "web"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    logp = train_unigram(f"{tmp_path}/documents.parquet")
    got = {r.doc_id: r for r in q_unigram_token_counts(spark, str(tmp_path)).collect()}
    for doc_id, text, _, _ in rows:
        words = text.split()
        assert got[doc_id].n_words == len(words)
        assert got[doc_id].n_unigram_tokens == sum(
            len(viterbi_encode(w, logp)) for w in words
        )


def test_prune_loop_reaches_target_on_large_vocab():
    """A corpus with many distinct substrings forces multiple EM+prune
    rounds; the trainer lands at/below the target while keeping every
    single character (segmentability invariant)."""
    import random

    rng = random.Random(11)
    words = {}
    for _ in range(300):
        w = "".join(rng.choice("abcdef") for _ in range(rng.randint(3, 9)))
        words[w] = words.get(w, 0) + rng.randint(1, 20)
    logp = learn_unigram(words, vocab_size=40, seed_size=400)
    chars = {c for w in words for c in w}
    assert chars <= set(logp)
    assert len(logp) <= 40 + len(chars)
    assert len([s for s in logp if len(s) > 1]) > 0
    # still a distribution, still segments everything
    import math as _math
    assert _math.isclose(sum(_math.exp(p) for p in logp.values()), 1.0, rel_tol=1e-9)
    for w in list(words)[:20]:
        assert "".join(viterbi_encode(w, logp)) == w
