"""Partitioning-invariance gate: a distributed engine's results must not
depend on HOW the data is partitioned — the property that actually
breaks when a plan sneaks in an order-dependent float reduction, a
partition-local survivor pick (dropDuplicates), or a non-deterministic
tie. Every registered operator family is run under two very different
shuffle-parallelism settings and must produce IDENTICAL row sets.

This is the mechanical form of the 100 TB question "would this compute
the same answer on 1000 executors?": at sf0.001 with 3 vs 37 shuffle
partitions the physical plans differ (different exchanges, different
partial-aggregation groupings, different task interleavings), so any
partition-sensitive expression shows up as a diff here long before it
shows up as an oracle-hash flake.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

#: one representative per operator family (keyed diff, venn, windows,
#: text analytics, exact/float-sensitive aggregates, trained tokenizer,
#: MinHash LSH incl. connected components, ANN, mixing, media decode)
QUERIES = [
    "key_diff_orders",
    "venn_onepass_counts",
    "sessionize",
    "pricing_summary",
    "tfidf_top_terms",
    "lm_bigram_scores",
    "unigram_token_counts",
    "minhash_near_dups",
    "near_dup_clusters",
    "cosine_topk",
    "mixture_weights",
    "audio_features_flac",
    "cdc_changes_orders",  # versioned family: log replay + CDC derivation
    "dsir_weights",  # trained broadcast scoring: int64 sums must not drift
    "incremental_agg_orders",  # CDF delta + FOJ state merge across layouts
    "quality_classifier",  # round 8: trained-weight broadcast + fixed point
    "incremental_near_dups",  # round 8: stored-index probe across layouts
    "mixture_resample",  # round 8b: derived-rate hash thin + window math
    "hidden_partition_prune",  # round 8b: transform pruning + residual filter
    "pipeline_attrition",  # round 8b: three-stage funnel composition
    "ivf_index_topk",  # round 8b: persisted-index probe across layouts
    "hll_distinct_orders",  # round 9: sketch register max-fold + float finish
    "kmv_custkey_overlap",  # round 9: top-k hash sketch + semi-join counts
    "countmin_heavy_hitters",  # round 9: integer cell fold + min probe
    "events_gapfill",  # round 9: dense-axis explode + per-series LOCF window
    "pagerank_neardups",  # round 9: iterative fixed-point join/agg rounds
    "interval_join_purchases",  # round 9: bucketized range join + residual
    "concurrent_sessions",  # round 9: unkeyed overlap join + pair dedup rule
    "salted_join_revenue",  # round 10: content-derived salt must not drift
    "events_anomalies",  # round 10: exact percentile medians across layouts
    "events_sliding",  # round 10: hopping-window explode + decimal sums
    "dq_expectations",  # round 10: conditional-agg scan + distinct + fk join
    "scd2_user_states",  # round 10: keyed lag/lead run-collapse windows
    "key_diff_digest_pruned",  # round 10: xor digest fold + bucket pruning
    "bloom_probe_orders",  # round 10: bit_or word fold + broadcast probe
    "drift_totalprice_status",  # round 10: decimal cross-product TVD fold
    "copurchase_triangles",  # round 10: degree-oriented wedge/closure joins
    "running_revenue",  # round 10: two-level prefix sum across layouts
    "fuzzy_match_customers",  # round 10: blocked distance join + pair dedup
    "warc_text_extraction",  # round 11: 3-stage mapInPandas decode chain
    "drift_ks_totalprice",  # round 11: prefix-scan CDF + decimal max fold
    "bm25_topk",  # round 11: pruned index scan + fixed-point sums + top-k
    "qgram_match_customers",  # round 11: PassJoin segment blocking + dedup
    "weighted_sample_counts",  # round 11: priority-sample TakeOrdered merge
    "drift_ks_by_priority",  # round 11: group-keyed window offsets + max
    "web_link_graph",  # round 11: per-doc link resolve + bounded collect_list
    "crawl_attrition",  # round 11: 3-operator funnel composition + distinct
    "robots_gate_counts",  # round 11: per-row grammar eval w/ parse cache
    "hybrid_topk",  # round 12: two index probes + integer RRF fusion
    "url_dedup",  # round 12: pure-Column canonicalization + keyed groupBy
    "bm25_delete_topk",  # round 12: DV-masked probe across layouts
    "crawl_frontier",  # round 12: link+sitemap union, canonical-key dedup
    "pipeline_lineage",  # round 12: observed counts + versioned round trip
    "ivf_delete_topk",  # round 12: DV-masked cell probe across layouts
    "incremental_near_dups_deleted",  # round 12: DV-survivor LSH probe
    "hybrid_weighted_topk",  # round 12: weighted integer fusion
    "table_profile",  # round 12: melt + two-stage exact distinct across layouts
    "venn_multi_regions",  # round 12: k-way tag-union counts across layouts
    "incremental_join_orders",  # round 12: CDF-driven join-view maintenance
    "maxsim_rerank_topk",  # round 12: two-stage retrieve+rerank across layouts
    "join_key_skew",  # round 12: TakeOrdered top-N + broadcast totals
    "price_histogram",  # round 12: equi-width bucket agg across layouts
    "price_depth_histogram",  # round 12: two-level global rank across layouts
    "epoch_shuffle_order",  # round 12: md5 keys + per-shard ranks across layouts
    "contrastive_negatives",  # round 12: global rank + stride equi-join
    "table_profile_approx",  # round 13: HLL register fold across layouts
    "ivf_refresh_topk",  # round 13: post-refresh probe across layouts
    "ngram_decontaminated_counts",  # round 13: winnowed gram join across layouts
    "unicode_dedup_counts",  # round 13: NFC fingerprint groupBy across layouts
    "dataset_card",  # round 13: two-pass corpus summary across layouts
    "ivf_closure_topk",  # round 13: replicated-cell probe + distinct across layouts
    "crawl_fetch_waves",  # round 13: host-keyed rank window across layouts
    "source_overlap_matrix",  # round 13: fingerprint self-join across layouts
    "paragraph_dedup_counts",  # round 13: map-only paragraph law across layouts
    "masked_customers",  # round 13: map-only token law across layouts
    "ivf_sq_index_topk",  # round 13: int64 code-distance probe across layouts
    "ivf_sq_delete_topk",  # round 14: DV-deleted code probe across layouts
    "ivf_sq_rerank_topk",  # round 14: shortlist + exact-cosine re-rank across layouts
    "dataset_card_diff",  # round 14: card aggregates + key_diff across layouts
    "crawl_two_waves",  # round 14: iterated frontier + visited feed-forward across layouts
    "ivf_sq_closure_rerank_topk",  # round 14: closure + SQ8 + float refine across layouts
    "crawl_waves_schedule",  # round 14: grouped two-level rank windows across layouts
    "ivf_sq_refresh_topk",  # round 14: post-retrain code probe across layouts
    "crawl_schedule_delays",  # round 15: Arrow delay parse + paced two-level rank
    "phash_near_dups",  # round 15: decode+dhash Arrow pass, Hamming banding
    "ivfpq_opq_topk",  # round 15: rotated-space cells/codes across layouts
    "audio_near_dups",  # round 15: decode+energy-hash Arrow pass, banding
    "ivfpq_index_topk",  # round 15: stored PQ codes probe across layouts
]


def _rows(spark, name, parts):
    import __spark_entry__ as ent

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        df = ent.queries()[name](spark, SF_DIR)
        cols = sorted(df.columns)
        # repr gives a total order even with NULLs / mixed types; equality
        # of the sorted multisets is what matters
        return sorted((tuple(r[c] for c in cols) for r in df.collect()), key=repr)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.mark.parametrize("name", QUERIES)
def test_result_is_partitioning_invariant(spark, name):
    a = _rows(spark, name, 3)
    b = _rows(spark, name, 37)
    assert a == b, f"{name}: result depends on shuffle partitioning"
    assert len(a) > 0
