from __future__ import annotations

from pyspark.sql import functions as F

from avro_diff_spark.operators import dedup as DD
from avro_diff_spark.snapshots import documents_with_dups


def test_exact_dedup_removes_planted_copies(spark, sf_dir):
    corpus = documents_with_dups(spark, sf_dir)
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_base = base.count()
    n_exact_copies = base.filter(F.col("doc_id") % 10 == 0).count()
    n_near_copies = base.filter(F.col("doc_id") % 10 == 1).count()
    assert corpus.count() == n_base + n_exact_copies + n_near_copies

    survivors = DD.exact_dedup(corpus, "text", "doc_id")
    # near copies have distinct text → survive; exact copies collapse
    assert survivors.count() == n_base + n_near_copies
    # survivor of each exact-dup cluster is the original (min id)
    assert survivors.filter(F.col("doc_id") >= 1_000_000).filter(
        F.col("doc_id") < 2_000_000
    ).count() == 0

    clusters = DD.exact_dedup_clusters(corpus, "text", "doc_id")
    assert clusters.count() == n_exact_copies
    assert clusters.filter(F.col("n_docs") != 2).count() == 0


def test_minhash_finds_planted_near_dups(spark, sf_dir):
    corpus = documents_with_dups(spark, sf_dir)
    found = DD.minhash_near_dups(corpus, "text", "doc_id", threshold=0.5)
    pairs = {(r["doc_a"], r["doc_b"]) for r in found.collect()}
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact_ids = [r[0] for r in base.filter(F.col("doc_id") % 10 == 0).select("doc_id").collect()]
    near_ids = [r[0] for r in base.filter(F.col("doc_id") % 10 == 1).select("doc_id").collect()]
    # exact copies (jaccard 1.0) must all be caught
    for i in exact_ids:
        assert (i, i + 1_000_000) in pairs
    # trailing-suffix near copies have very high jaccard; expect ≥90% recall through LSH
    hits = sum((i, i + 2_000_000) in pairs for i in near_ids)
    assert hits >= 0.9 * len(near_ids)


def test_jaccard_pairs_exact_for_identical_texts(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "completely different words entirely unrelated content")],
        "doc_id long, text string",
    )
    out = DD.jaccard_pairs(df, "text", "doc_id", threshold=0.99).collect()
    assert len(out) == 1
    assert (out[0]["doc_a"], out[0]["doc_b"], out[0]["jaccard"]) == (1, 2, 1.0)


def test_simhash_zero_distance_for_identical(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "totally different content here now")],
        "doc_id long, text string",
    )
    pairs = DD.simhash_near_dups(df, "text", "doc_id", max_hamming=0).collect()
    assert [(p["doc_a"], p["doc_b"], p["hamming"]) for p in pairs] == [(1, 2, 0)]


def test_lsh_candidates_subset_of_pairs(spark, sf_dir):
    corpus = documents_with_dups(spark, sf_dir).limit(100)
    # localCheckpoint BEFORE filtering on the signature array: a
    # filter(size(sig) != 32) on the lazy frame gets pushdown-rewritten
    # below the staged projections, inlining the whole 32-slot signature
    # chain (and its shingle array, per slot) into one interpreted
    # predicate — the exact O(k·n²) hazard char_codes documents. That
    # pathological TEST plan cost ~250 s for 100 docs; asserting over
    # the materialized rows checks the same law in ~2 s.
    sigs = DD.minhash_signatures(corpus, "text", "doc_id").localCheckpoint()
    assert sigs.filter(F.size("sig") != 32).count() == 0
    cands = DD.lsh_candidate_pairs(sigs)
    bad = cands.filter(F.col("doc_a") >= F.col("doc_b")).count()
    assert bad == 0


def test_contamination_check_flags_benchmark_overlap(spark):
    """Docs sharing a word 8-gram with a benchmark doc are flagged with the
    exact distinct-shared-gram count; clean docs are absent."""
    words = [f"w{i}" for i in range(20)]
    bench_text = " ".join(words[:10])           # grams: 3 distinct 8-grams
    rows = [
        (1, bench_text),                        # exact twin of the benchmark
        (2, " ".join(words[1:11])),             # shares 2 of bench's 8-grams
        (3, " ".join(words[10:20])),            # disjoint vocab order, clean
        (4, "short text"),                      # < 8 words, no grams at all
    ]
    corpus = spark.createDataFrame(rows, "doc_id: long, text: string")
    bench = spark.createDataFrame([(100, bench_text)], "doc_id: long, text: string")
    got = {
        r.doc_id: r.n_contaminated_grams
        for r in DD.contamination_check(corpus, bench, "text", "doc_id").collect()
    }
    assert got == {1: 3, 2: 2}


def test_contamination_check_benchmark_side_broadcast(spark):
    """The benchmark gram set must join broadcast — the plan may not shuffle
    the corpus side against it (scale contract: eval suites are bounded)."""
    corpus = spark.createDataFrame(
        [(i, f"a b c d e f g h doc{i}") for i in range(50)],
        "doc_id: long, text: string",
    )
    bench = spark.createDataFrame([(0, "a b c d e f g h")], "doc_id: long, text: string")
    plan = (
        DD.contamination_check(corpus, bench, "text", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_chunked_pair_expansion_identical_pairs(spark, sf_dir):
    """max_bucket skew-split produces exactly the single-task expansion's
    candidate pair set — including when chunks divide unevenly and when a
    bucket fits in one chunk."""
    corpus = documents_with_dups(spark, sf_dir)
    sigs = DD.minhash_signatures(corpus, "text", "doc_id")
    base = DD.lsh_candidate_pairs(sigs)
    for mb in (3, 4, 1000):
        chunked = DD.lsh_candidate_pairs(sigs, max_bucket=mb)
        a = {(r.doc_a, r.doc_b) for r in base.collect()}
        b = {(r.doc_a, r.doc_b) for r in chunked.collect()}
        assert a == b, f"max_bucket={mb}"
    assert a  # non-trivial corpus


def test_chunked_expansion_mega_bucket(spark):
    """A single 10-member bucket with max_bucket=3 exercises diagonal and
    off-diagonal grid cells: all 45 ordered pairs, each exactly once."""
    from pyspark.sql import Row

    # ten identical texts -> identical signatures -> one bucket everywhere
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="the same exact text for every document here") for i in range(10)]
    )
    sigs = DD.minhash_signatures(docs, "text", "doc_id")
    pairs = DD.lsh_candidate_pairs(sigs, max_bucket=3).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    want = {(a, b) for a in range(10) for b in range(10) if a < b}
    assert got == want


def test_exact_substring_spans_matches_naive_scan(spark):
    """Property pin vs an INDEPENDENT naive reference: for every doc,
    scan all w-windows directly (dict of gram -> corpus occurrence
    count, the Lee et al. suffix-array repeat count — in-document
    self-repeats included), mark hit positions, merge consecutive runs,
    keep spans >= min_tokens. The distributed gaps-and-islands
    formulation must agree exactly."""
    import re

    w, min_count, min_tokens = 3, 2, 5
    docs = [
        (1, "a b c d e f g h"),
        (2, "x a b c d e y z"),          # shares the 5-token run a..e with 1
        (3, "q r s t u v"),              # no overlap
        (4, "x a b c d e y z"),          # exact dup of 2 (long run incl x/yz)
        (5, "c d e f g p p c d e f g"),  # shares c..g with 1, twice
        (6, "one two"),                  # shorter than w
        (7, "m1 m2 m3 m4 m5 zz m1 m2 m3 m4 m5"),  # repeats ONLY within itself
    ]

    def norm(t):
        return [x for x in re.sub(r"\s+", " ", t.strip().lower()).split(" ") if x]

    grams: dict[tuple, int] = {}
    toks = {i: norm(t) for i, t in docs}
    for i, tk in toks.items():
        for p in range(len(tk) - w + 1):
            g = tuple(tk[p : p + w])
            grams[g] = grams.get(g, 0) + 1
    want = set()
    for i, tk in toks.items():
        hits = [
            p
            for p in range(len(tk) - w + 1)
            if grams[tuple(tk[p : p + w])] >= min_count
        ]
        run: list[int] = []
        for p in hits + [None]:
            if run and (p is None or p != run[-1] + 1):
                span = run[-1] - run[0] + w
                if span >= min_tokens:
                    want.add((i, run[0], span, len(run)))
                run = []
            if p is not None:
                run = run + [p] if run and p == run[-1] + 1 else [p]
        # note: loop emits at run breaks; trailing None flushes the last run
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.span_start, r.span_tokens, r.n_grams)
        for r in DD.exact_substring_spans(
            df, "text", "doc_id", ngram_w=w, min_count=min_count, min_tokens=min_tokens
        ).collect()
    }
    assert got == want
    # sanity on the fixture: doc 7's spans exist ONLY via in-document
    # repeats (no other doc shares its grams) — the round-6 gap
    assert {d for d, *_ in want} == {1, 2, 4, 5, 7}
    assert any(d == 7 and s == 5 for d, _, s, _ in want)


def test_exact_substring_scrub_matches_naive_cut(spark):
    """The completed pass: naive reference recomputes spans per doc (as
    in the spans test), cuts covered positions, and the distributed
    scrub must agree on kept counts AND the md5 of the kept tokens —
    pinning the cut mechanics, not just arithmetic."""
    import hashlib
    import re

    w, min_count, min_tokens = 3, 2, 5
    docs = [
        (1, "a b c d e f g h"),
        (2, "x a b c d e y z"),
        (3, "q r s t u v"),                       # untouched: spans absent
        (7, "m1 m2 m3 m4 m5 zz m1 m2 m3 m4 m5"),  # in-document repeats only
    ]

    def norm(t):
        return [x for x in re.sub(r"\s+", " ", t.strip().lower()).split(" ") if x]

    grams: dict[tuple, int] = {}
    toks = {i: norm(t) for i, t in docs}
    for tk in toks.values():
        for p in range(len(tk) - w + 1):
            g = tuple(tk[p : p + w])
            grams[g] = grams.get(g, 0) + 1

    want = {}
    for i, tk in toks.items():
        hits = [
            p for p in range(len(tk) - w + 1) if grams[tuple(tk[p : p + w])] >= min_count
        ]
        covered = set()
        n_spans = 0
        run: list[int] = []
        for p in hits + [None]:
            if run and (p is None or p != run[-1] + 1):
                span = run[-1] - run[0] + w
                if span >= min_tokens:
                    covered |= set(range(run[0], run[-1] + w))
                    n_spans += 1
                run = []
            if p is not None:
                run = run + [p] if run and p == run[-1] + 1 else [p]
        kept = [t for j, t in enumerate(tk) if j not in covered]
        want[i] = (
            len(tk),
            len(kept),
            n_spans,
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_kept_tokens, r.n_cut_spans, r.kept_md5)
        for r in DD.exact_substring_scrub(
            df, "text", "doc_id", ngram_w=w, min_count=min_count, min_tokens=min_tokens
        ).collect()
    }
    assert got == want
    # doc 3 is untouched, doc 7 loses both of its self-repeat spans
    assert got[3][1] == got[3][0] and got[7][1] == 1


def test_incremental_index_probe_equals_full_recompute(spark, sf_dir, tmp_path):
    """Round-8 brief item 6: probing the persisted LSH bucket index with
    an increment yields EXACTLY the pairs a full minhash_near_dups
    recompute over the union emits restricted to increment-touching
    pairs — banding is a pure per-doc function, so the stored index is
    lossless, and successive appends keep it so."""
    from pyspark.sql import functions as F

    from avro_diff_spark import snapshots as snap
    from avro_diff_spark.operators.dedup import minhash_near_dups
    from avro_diff_spark.operators.neardup_index import (
        build_neardup_index,
        probe_neardup_index,
    )

    corpus = snap.documents_with_dups(spark, sf_dir)
    base = corpus.filter(F.col("doc_id") < 1_000_000)
    inc1 = corpus.filter(
        (F.col("doc_id") >= 1_000_000) & (F.col("doc_id") < 2_000_000)
    )
    inc2 = corpus.filter(F.col("doc_id") >= 2_000_000)
    idx = str(tmp_path / "ndidx")
    build_neardup_index(spark, base, "text", "doc_id", idx)

    def key(rows):
        return {(r.doc_a, r.doc_b, r.n_a, r.n_b, r.n_common) for r in rows}

    # increment 1 (exact dups), appended to the index afterwards
    got1 = key(
        probe_neardup_index(spark, inc1, "text", "doc_id", idx, append=True).collect()
    )
    full1 = minhash_near_dups(base.unionByName(inc1), "text", "doc_id")
    want1 = key(
        full1.filter(
            (F.col("doc_a") >= 1_000_000) | (F.col("doc_b") >= 1_000_000)
        ).collect()
    )
    assert got1 == want1 and got1

    # increment 2 probes the GROWN index (base + inc1)
    got2 = key(
        probe_neardup_index(spark, inc2, "text", "doc_id", idx, append=True).collect()
    )
    full2 = minhash_near_dups(
        base.unionByName(inc1).unionByName(inc2), "text", "doc_id"
    )
    want2 = key(
        full2.filter(
            (F.col("doc_a") >= 2_000_000) | (F.col("doc_b") >= 2_000_000)
        ).collect()
    )
    assert got2 == want2 and got2


def test_incremental_index_probe_never_reads_corpus(spark, sf_dir, tmp_path):
    """The incremental path reads ONLY index tables: the original corpus
    parquet is DELETED after the index build, and the probe still
    produces the exact pair set."""
    import shutil

    from pyspark.sql import functions as F

    from avro_diff_spark import snapshots as snap
    from avro_diff_spark.operators.neardup_index import (
        build_neardup_index,
        index_params,
        probe_neardup_index,
    )

    corpus_path = str(tmp_path / "corpus")
    snap.documents_with_dups(spark, sf_dir).filter(
        F.col("doc_id") < 1_000_000
    ).write.parquet(corpus_path)
    base = spark.read.parquet(corpus_path)
    idx = str(tmp_path / "ndidx")
    build_neardup_index(spark, base, "text", "doc_id", idx)
    assert index_params(idx) == {"n_hashes": 32, "bands": 8, "shingle_k": 5}

    shutil.rmtree(corpus_path)  # the historical corpus is GONE

    inc = snap.documents_with_dups(spark, sf_dir).filter(
        F.col("doc_id") >= 2_000_000
    )
    pairs = probe_neardup_index(
        spark, inc, "text", "doc_id", idx, append=False
    ).collect()
    assert pairs
    # every planted near-dup (+2M) pairs with its original (id - 2M + 1... id % pattern)
    matched = {r.doc_b - 2_000_000 for r in pairs if r.doc_b >= 2_000_000 and r.doc_a < 1_000_000}
    assert matched  # originals found purely from the stored index


def test_neardup_index_delete_equals_survivor_rebuild(spark, sf_dir, tmp_path):
    """Round 12 (index CRUD parity): DV-delete a slice of the indexed
    base — probing the increment then equals probing an index built on
    the SURVIVORS, deleted docs never surface as neighbors, params stay
    readable, and list/DataFrame id forms agree."""
    from pyspark.sql import functions as F

    from avro_diff_spark import snapshots as snap
    from avro_diff_spark.operators.neardup_index import (
        build_neardup_index,
        delete_from_neardup_index,
        index_params,
        probe_neardup_index,
    )

    corpus = snap.documents_with_dups(spark, sf_dir)
    base = corpus.filter(F.col("doc_id") < 1_000_000)
    inc = corpus.filter(F.col("doc_id") >= 1_000_000)
    gone = base.where(F.col("doc_id") % 9 == 4).select("doc_id")
    survivors = base.where(F.col("doc_id") % 9 != 4)

    idx = str(tmp_path / "full")
    ref = str(tmp_path / "ref")
    build_neardup_index(spark, base, "text", "doc_id", idx)
    build_neardup_index(spark, survivors, "text", "doc_id", ref)
    delete_from_neardup_index(spark, idx, gone)
    assert index_params(idx) == index_params(ref)

    def key(rows):
        return {(r.doc_a, r.doc_b, r.n_a, r.n_b, r.n_common) for r in rows}

    got = key(
        probe_neardup_index(spark, inc, "text", "doc_id", idx, append=False).collect()
    )
    want = key(
        probe_neardup_index(spark, inc, "text", "doc_id", ref, append=False).collect()
    )
    assert got == want and got
    gone_ids = {r.doc_id for r in gone.collect()}
    assert not any(a in gone_ids or b in gone_ids for a, b, *_ in got)

    # list form reaches the same state
    idx2 = str(tmp_path / "full2")
    build_neardup_index(spark, base, "text", "doc_id", idx2)
    delete_from_neardup_index(spark, idx2, sorted(gone_ids))
    got2 = key(
        probe_neardup_index(spark, inc, "text", "doc_id", idx2, append=False).collect()
    )
    assert got2 == got
    # unknown ids: no-op
    v = delete_from_neardup_index(spark, idx2, [10**9])
    assert v == delete_from_neardup_index(spark, idx2, [])


def test_neardup_index_delete_then_compact_preserves_probe(spark, sf_dir, tmp_path):
    """OPTIMIZE after a delete on both LSH index tables: the DV-masked
    rows stay gone, the params commit stays readable, the probe result
    is unchanged."""
    from pyspark.sql import functions as F

    from avro_diff_spark import snapshots as snap
    from avro_diff_spark.operators.neardup_index import (
        build_neardup_index,
        delete_from_neardup_index,
        index_params,
        probe_neardup_index,
    )
    from avro_diff_spark.sources.versioned import compact_table

    corpus = snap.documents_with_dups(spark, sf_dir)
    base = corpus.filter(F.col("doc_id") < 1_000_000)
    inc = corpus.filter(F.col("doc_id") >= 1_000_000)
    idx = str(tmp_path / "nd")
    build_neardup_index(spark, base, "text", "doc_id", idx)
    delete_from_neardup_index(
        spark, idx, base.where(F.col("doc_id") % 9 == 4).select("doc_id")
    )
    params = index_params(idx)

    def key(rows):
        return {(r.doc_a, r.doc_b, r.n_a, r.n_b, r.n_common) for r in rows}

    before = key(
        probe_neardup_index(spark, inc, "text", "doc_id", idx, append=False).collect()
    )
    compact_table(spark, f"{idx}/buckets")
    compact_table(spark, f"{idx}/shingles")
    assert index_params(idx) == params
    after = key(
        probe_neardup_index(spark, inc, "text", "doc_id", idx, append=False).collect()
    )
    assert before == after and before


def test_ngram_decontaminate_winnow_guarantee(spark):
    """Any verbatim overlap of >= k+w-1 words is caught (winnowing
    guarantee transposed to word grams); disjoint docs never flag."""
    from avro_diff_spark.operators.dedup import ngram_decontaminate

    leak = " ".join(f"w{i}" for i in range(25))  # 25 shared words >= 13+8-1
    bench = spark.createDataFrame(
        [(1000, f"prefix text {leak} suffix text")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, f"intro {leak} outro words here"),        # long overlap -> caught
            (2, " ".join(f"x{i}" for i in range(30))),    # disjoint -> clean
            (3, "short doc"),                              # < 13 words -> clean
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_contaminated_fps for r in
           ngram_decontaminate(corpus, bench, "text", "doc_id").collect()}
    assert 1 in got and got[1] >= 1
    assert 2 not in got and 3 not in got


def test_ngram_decontaminate_flags_subset_of_exhaustive(spark):
    """Winnowed decon never invents contamination: every flagged doc is
    flagged by the exhaustive 13-gram check too (subsampling can only
    drop isolated collisions, not add them)."""
    from avro_diff_spark.operators.dedup import (
        contamination_check,
        ngram_decontaminate,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 11 == 0)
    rest = docs.filter(F.col("doc_id") % 11 != 0)
    winnowed = {r.doc_id for r in
                ngram_decontaminate(rest, bench, "text", "doc_id").collect()}
    exhaustive = {r.doc_id for r in
                  contamination_check(rest, bench, "text", "doc_id", ngram_w=13).collect()}
    assert winnowed <= exhaustive
