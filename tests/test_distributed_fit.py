"""Round-13 pins for the distributed model-fit tier (functions/fit.py).

Round-12 verdict: every trainer (BPE/unigram word table, langid bigram
profiles, DSIR buckets, quality-LR sample, IVF/PQ embedding samples)
read the corpus parquet driver-side through DuckDB — a 100 TB
bottleneck. The fix computes the same bounded tables as Spark
aggregations; DuckDB survives only as the session-less fallback. Two
pins make that mechanical:

1. EQUIVALENCE — the Spark path and the DuckDB fallback return
   value-identical tables at sf0.001 (the same token/hash-law identity
   every oracle-green query relies on).
2. NO DRIVER CORPUS READ — with an active SparkSession, every trainer
   completes with the DuckDB fallback monkeypatched to raise, proving
   the fit path never scans the corpus on the driver.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from avro_diff_spark.functions import fit

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"
EMB = f"{SF}/embeddings.parquet"


# ---------------------------------------------------------------- 1. equivalence


def test_word_count_table_paths_agree(spark):
    s = fit._word_count_spark(spark, DOCS, 500)
    d = fit._word_count_duckdb(DOCS, 500)
    assert s == d
    assert 0 < len(s) <= 500
    # the truncation order is (count DESC, word) — a total order
    assert sorted(s, key=lambda t: (-t[1], t[0])) == list(s)
    # the cap actually truncates
    assert fit._word_count_spark(spark, DOCS, 5) == d[:5]


def test_langid_bigram_table_paths_agree(spark):
    s = sorted(fit._langid_bigram_spark(spark, DOCS))
    d = sorted(fit._langid_bigram_duckdb(DOCS))
    assert s == d
    assert len(s) > 0


def test_dsir_bucket_table_paths_agree(spark):
    s = fit._dsir_buckets_spark(spark, DOCS, 256, "en")
    d = fit._dsir_buckets_duckdb(DOCS, 256, "en")
    assert s == d


def test_quality_sample_rows_paths_agree(spark):
    s = sorted(fit._quality_sample_spark(spark, DOCS, 256, "en", 64))
    d = sorted(fit._quality_sample_duckdb(DOCS, 256, "en", 64))
    assert s == d
    assert len({r[0] for r in s}) == 64


def test_embedding_sample_paths_agree(spark):
    s = np.array(fit._embedding_sample_spark(spark, EMB, "ivf", 32), dtype=np.float64)
    d = np.array(fit._embedding_sample_duckdb(EMB, "ivf", 32), dtype=np.float64)
    assert s.shape == d.shape == (32, s.shape[1])
    # bit-identical: float32 parquet values widen exactly in both engines
    assert (s == d).all()
    # a different tag draws a different sample (the hash is tag-salted)
    p = np.array(fit._embedding_sample_spark(spark, EMB, "pq", 32), dtype=np.float64)
    assert not (s == p).all()


# ------------------------------------------------- 2. no driver-side corpus read


@pytest.fixture()
def no_duckdb_fallback(monkeypatch):
    """Make every DuckDB fallback in fit.py raise, and clear the trainer
    memos so the fit actually re-runs."""

    def boom(*a, **k):
        raise AssertionError("driver-side DuckDB corpus read in a fit path")

    for name in (
        "_word_count_duckdb",
        "_langid_bigram_duckdb",
        "_dsir_buckets_duckdb",
        "_quality_sample_duckdb",
        "_embedding_sample_duckdb",
    ):
        monkeypatch.setattr(fit, name, boom)

    from avro_diff_spark import pipelines
    from avro_diff_spark.functions import bpe, unigram
    from avro_diff_spark.operators import similarity

    bpe._train_cached.cache_clear()
    unigram._train_cached.cache_clear()
    pipelines._train_langid_cached.cache_clear()
    pipelines._train_dsir_cached.cache_clear()
    pipelines._train_quality_cached.cache_clear()
    similarity._train_ivf_cached.cache_clear()
    similarity._train_pq_cached.cache_clear()
    yield
    # drop the memos trained under the monkeypatch so other modules see
    # freshly-trained (identical) state rather than sharing cache slots
    bpe._train_cached.cache_clear()
    unigram._train_cached.cache_clear()
    pipelines._train_langid_cached.cache_clear()
    pipelines._train_dsir_cached.cache_clear()
    pipelines._train_quality_cached.cache_clear()
    similarity._train_ivf_cached.cache_clear()
    similarity._train_pq_cached.cache_clear()


def test_all_trainers_fit_without_driver_corpus_read(spark, no_duckdb_fallback):
    from avro_diff_spark import pipelines
    from avro_diff_spark.functions.bpe import train_bpe
    from avro_diff_spark.functions.unigram import train_unigram
    from avro_diff_spark.operators.similarity import (
        train_ivf_centroids,
        train_pq_codebooks,
    )

    merges, alphabet = train_bpe(DOCS, n_merges=10, max_words=2000)
    assert len(merges) == 10 and len(alphabet) > 10

    logp = train_unigram(DOCS, vocab_size=200, max_words=2000)
    assert len(logp) > 50

    profiles = pipelines._train_langid_profiles(DOCS, top_k=10)
    assert len(profiles) > 0

    weights = pipelines._train_dsir(DOCS)
    assert len(weights) == pipelines.DSIR_BUCKETS

    table, b0 = pipelines._train_quality(DOCS)
    assert len(table) == pipelines.FT_BUCKETS

    cents = train_ivf_centroids(EMB, n_centroids=4, sample=64)
    assert len(cents) == 4

    books = train_pq_codebooks(EMB, m=4, ksub=4, sample=64)
    assert len(books) == 4


def test_langid_profile_spark_equals_fallback(spark):
    """The distributed assignment/top-k (DECIMAL cross-products, rank
    window, langs x top_k collect) reproduces the Python fallback law
    bit-for-bit."""
    s = fit._langid_profile_spark(spark, DOCS, 10)
    d = fit._langid_profile_finish(fit._langid_bigram_duckdb(DOCS), 10)
    assert s == d
    s40 = fit._langid_profile_spark(spark, DOCS, 40)
    d40 = fit._langid_profile_finish(fit._langid_bigram_duckdb(DOCS), 40)
    assert s40 == d40 and len(s40) >= len(s)
