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
    sigs = DD.minhash_signatures(corpus, "text", "doc_id")
    assert sigs.filter(F.size("sig") != 32).count() == 0
    cands = DD.lsh_candidate_pairs(sigs)
    bad = cands.filter(F.col("doc_a") >= F.col("doc_b")).count()
    assert bad == 0
