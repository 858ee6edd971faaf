"""Round-5 pipeline operators: near-dup clustering, sequence packing,
C4-style line cleaning."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from avro_diff_spark.functions.text import c4_line_filter
from avro_diff_spark.operators.dedup import near_dup_clusters
from avro_diff_spark.pipelines import pack_sequences


def _union_find(edges, nodes):
    """Reference connected components (driver-side union-find)."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=60,
    )
)
def test_near_dup_clusters_matches_union_find(spark, edges):
    """Both execution paths — the DISTRIBUTED min-label loop (forced with
    driver_finish_max_edges=0) and the default bounded-edge-list
    driver-side union-find finish — compute exactly the
    connected-components labeling of a reference union-find, on arbitrary
    graphs (chains, cycles, stars, disconnected islands)."""
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges], "doc_a long, doc_b long"
    )
    loop = {
        r.doc_id: r.cluster_id
        for r in near_dup_clusters(pairs, driver_finish_max_edges=0).collect()
    }
    finish = {
        r.doc_id: r.cluster_id for r in near_dup_clusters(pairs).collect()
    }
    nodes = {n for e in edges for n in e}
    want = _union_find(edges, nodes)
    assert loop == want
    assert finish == want


def test_near_dup_clusters_long_chain_converges(spark):
    """A 40-node path graph (worst diameter per edge count) still converges
    to a single cluster labeled by the min node."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a long, doc_b long"
    )
    rows = near_dup_clusters(pairs, max_iters=50, driver_finish_max_edges=0).collect()
    assert {r.cluster_id for r in rows} == {0}
    assert {r.doc_id for r in rows} == set(range(41))


def test_pack_sequences_invariants(spark, sf_dir):
    """Offsets stay inside the budget; shard ids are monotone in id order
    per group; every start equals the running token total before the doc."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    budget = 256
    out = pack_sequences(docs, budget=budget).collect()
    by_group: dict = {}
    for r in out:
        assert 0 <= r.shard_offset < budget
        by_group.setdefault(r.source, []).append(r)
    for rows in by_group.values():
        rows.sort(key=lambda r: r.doc_id)
        running = 0
        for r in rows:
            assert r.shard_id == running // budget
            assert r.shard_offset == running % budget
            running += r.n_tokens


def test_c4_line_filter_rules(spark):
    """Each C4 rule in isolation: terminal punctuation, min words,
    javascript lines, lorem-ipsum pages, curly-brace pages, min kept
    lines."""
    rows = [
        # (id, text, expect_page_kept, expect_kept_lines)
        (1, "one good sentence here.\nanother fine sentence!\nshort.\nno terminal punct", True,
         ["one good sentence here.", "another fine sentence!"]),
        (2, "uses javascript on every line.\nplain good line stays here.", False, None),  # < 2 kept
        (3, "lorem ipsum dolor sit amet.\nperfectly good line here.\nsecond good line here.", False, None),
        (4, "config = { nested }.\ngood line number one.\ngood line number two.", False, None),
        (5, 'ends with a quote mark."\nquestion form works too?\nbang form works too!', True,
         ['ends with a quote mark."', "question form works too?", "bang form works too!"]),
    ]
    df = spark.createDataFrame([(i, t) for i, t, _, _ in rows], "doc_id long, text string")
    got = {r.doc_id: r for r in c4_line_filter(df, min_kept_lines=2).collect()}
    for i, _, want_kept, want_lines in rows:
        assert got[i].page_kept == want_kept, i
        if want_kept:
            assert got[i].clean_text == "\n".join(want_lines), i
        else:
            assert got[i].clean_text is None, i


def test_lm_bigram_scores_semantics(spark, tmp_path):
    """Corpus-frequent boilerplate scores LOW surprise; a doc made of
    corpus-unique bigrams scores HIGH with every bigram novel; docs with
    fewer than two tokens are absent."""
    from avro_diff_spark.pipelines import q_lm_bigram_scores

    rows = [(i, "the quick brown fox jumps") for i in range(5)]
    rows.append((10, "zebra xylophone quasar nebula"))
    rows.append((11, "solo"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {r.doc_id: r for r in q_lm_bigram_scores(spark, str(tmp_path)).collect()}

    assert 11 not in got  # single token: no bigrams
    assert set(got) == {0, 1, 2, 3, 4, 10}
    boiler, novel = got[0], got[10]
    assert boiler.n_bigrams == 4 and novel.n_bigrams == 3
    assert boiler.n_novel == 0 and novel.n_novel == 3
    assert novel.surprise > boiler.surprise
    # exact value: every novel bigram has c12=1, c1=1; V = distinct w2
    v = 4 + 3  # quick brown fox jumps + xylophone quasar nebula
    assert novel.surprise == (3 * 1 + 3 * v) / (3 * 1 + 3)
    assert boiler.surprise == (4 * 5 + 4 * v) / (4 * 5 + 4)


def test_near_dup_clusters_star_matches_union_find(spark):
    """The large-star/small-star formulation computes the identical
    labeling on adversarial shapes: long chains, descending chains,
    hubs, random graphs, duplicate/reversed edges."""
    import random

    from avro_diff_spark.operators.dedup import near_dup_clusters_star

    rng = random.Random(7)
    cases = [
        [(i, i + 1) for i in range(120)],
        [(i + 1, i) for i in range(60)],
        [(0, i) for i in range(1, 30)] + [(50, 51), (51, 50), (60, 61), (7, 3)],
        [(rng.randrange(80), rng.randrange(80)) for _ in range(120)],
    ]
    for edges in cases:
        edges = [(a, b) for a, b in edges if a != b]
        nodes = {n for e in edges for n in e}
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        loop = {
            r.doc_id: r.cluster_id
            for r in near_dup_clusters_star(
                pairs, driver_finish_max_edges=0
            ).collect()
        }
        finish = {
            r.doc_id: r.cluster_id for r in near_dup_clusters_star(pairs).collect()
        }
        assert loop == _union_find(edges, nodes)
        assert finish == loop


def test_near_dup_clusters_star_chain_in_log_rounds(spark):
    """The diameter-independence claim, demonstrated: a 200-edge path
    converges within 10 alternations (min-label would need ~200 rounds)."""
    from avro_diff_spark.operators.dedup import near_dup_clusters_star

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "doc_a long, doc_b long"
    )
    rows = near_dup_clusters_star(
        pairs, max_iters=10, driver_finish_max_edges=0
    ).collect()
    assert {r.cluster_id for r in rows} == {0}
    assert {r.doc_id for r in rows} == set(range(201))


def test_gopher_quality_rules(spark, tmp_path):
    """Each Gopher rule (Rae et al. 2021 §A1.1) flips the keep flag on an
    engineered document while the control document passes all of them."""
    import avro_diff_spark.pipelines as P

    good_words = ("the quality of data and the model that we have built "
                  "with care to be robust ") * 5  # 80 words, all alphabetic
    docs = [
        (1, good_words, "en", "web", len(good_words)),
        (2, "short text with the and of", "en", "web", 10),  # < 50 words
        (3, ("a " * 80).strip() + " the of and that", "en", "web", 10),  # mean len < 3
        (4, good_words + " ##########", "en", "web", 10),  # symbols > 10%
        (5, "\n".join(["- bullet item with the and of that to be"] * 10), "en", "web", 10),
        (6, good_words.replace("the", "xxe").replace("and", "xxd")
             .replace("of", "xx").replace("to", "tx").replace("be", "bx")
             .replace("with", "wxxh").replace("that", "txxt")
             .replace("have", "hxve"), "en", "web", 10),  # no stop words
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in P.q_gopher_quality(spark, str(tmp_path)).collect()}
    assert out[1].keep
    assert not out[2].keep and out[2].n_words < 50
    assert not out[3].keep and out[3].sum_word_chars < 3 * out[3].n_words
    assert not out[4].keep and 10 * out[4].n_symbols > out[4].n_words
    assert not out[5].keep and 10 * out[5].n_bullet_lines > 9 * out[5].n_lines
    assert not out[6].keep and out[6].n_stop_hits < 2


def test_gopher_repetition_rules(spark, tmp_path):
    """Each repetition rule (Rae et al. 2021 §A1.2) flips keep on an
    engineered document; a varied control document passes."""
    import avro_diff_spark.pipelines as P

    varied = "\n".join(
        f"al{i} be{i} ga{i} de{i} ep{i} ze{i} et{i} th{i}" for i in range(12)
    )
    dup_lines = "\n".join(["repeat this exact line"] * 8 + ["one fresh line here"])
    dup_paras = "\n\n".join(["para one body text"] * 5 + ["another para entirely"])
    top2 = ("very nice " * 30) + "something else entirely to finish"
    docs = [
        (1, varied, "en", "web", 1),
        (2, dup_lines, "en", "web", 1),
        (3, dup_paras, "en", "web", 1),
        (4, top2, "en", "web", 1),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in P.q_gopher_repetition(spark, str(tmp_path)).collect()}
    assert out[1].keep and out[1].dup_lines == 0
    assert not out[2].keep and 10 * out[2].dup_lines > 3 * out[2].n_lines
    assert not out[3].keep and 10 * out[3].dup_paras > 3 * out[3].n_paras
    assert not out[4].keep and 5 * out[4].top2_chars > out[4].n_chars


def test_stratified_sample_membership_law(spark):
    """Per-row pin of the deterministic bucketing: a row survives iff
    md5-hash32('strat:' || id) % 10000 < its stratum's basis-point rate —
    the same hash-split mechanism dataset_split_counts uses."""
    import hashlib

    from avro_diff_spark.pipelines import stratified_sample

    rates = {"en": 10000, "de": 5000, "zh": 0}
    rows = [(i, ["en", "de", "zh"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {r.doc_id for r in stratified_sample(df, "lang", rates, id_col="doc_id").collect()}
    want = set()
    for i, lang in rows:
        h = int(hashlib.md5(f"strat:{i}".encode()).hexdigest()[:8], 16)
        if h % 10000 < rates[lang]:
            want.add(i)
    assert got == want
    assert any(lang == "de" for i, lang in rows if i in got)  # partial stratum non-empty
    assert not {i for i, lang in rows if lang == "zh"} & got  # 0-rate stratum empty


def test_mixture_weights_law(spark, tmp_path):
    """weight_ppm follows floor-exact sqrt temperature scaling and both
    ppm columns sum to ≤ 1e6 (floor rounding) with small sources
    up-weighted relative to proportional sampling."""
    import math

    from avro_diff_spark.pipelines import q_mixture_weights

    rows = []
    for i in range(400):
        rows.append((i, "tok " * (1 + i % 3), "en", "big"))
    for i in range(400, 425):
        rows.append((i, "tok tok", "en", "small"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {r.source: r for r in q_mixture_weights(spark, str(tmp_path)).collect()}
    s = {src: math.floor(math.sqrt(got[src].n_docs) * 1e6) for src in got}
    tot = sum(s.values())
    for src in got:
        assert got[src].weight_ppm == (1_000_000 * s[src]) // tot
    assert sum(r.weight_ppm for r in got.values()) <= 1_000_000
    # temperature scaling: the small source's share beats its natural share
    assert got["small"].weight_ppm > got["small"].natural_ppm
    assert got["big"].weight_ppm < got["big"].natural_ppm


def test_decontaminated_counts_consistent_with_flags(spark, sf_dir):
    """kept + dropped == corpus; dropped == the contamination_check flag
    list (per-source), so the scrub accounts for every document once."""
    from pyspark.sql import functions as F

    from avro_diff_spark.operators import dedup as DD
    from avro_diff_spark.pipelines import q_decontaminated_counts
    from avro_diff_spark.snapshots import documents_with_dups

    got = {r.source: r for r in q_decontaminated_counts(spark, sf_dir).collect()}
    corpus = documents_with_dups(spark, sf_dir)
    rest = corpus.filter(F.col("doc_id") % 97 != 0)
    flags = DD.contamination_check(
        rest, corpus.filter(F.col("doc_id") % 97 == 0), "text", "doc_id", ngram_w=8
    )
    flagged = {
        r.source: r.n
        for r in rest.join(flags.select("doc_id"), "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    per_source = {
        r.source: r.n for r in rest.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for src, row in got.items():
        assert row.n_docs == per_source[src]
        assert row.n_docs_kept + row.n_docs_dropped == row.n_docs
        assert row.n_docs_dropped == flagged.get(src, 0)
    assert sum(r.n_docs_dropped for r in got.values()) > 0


def test_near_dup_cluster_sizes_consistent_with_closure(spark, sf_dir):
    """The histogram re-aggregates the closure exactly: sizes multiply
    back to the labeled doc count, and every multi-doc cluster drops
    size-1 docs under keep-one."""
    from avro_diff_spark.pipelines import q_near_dup_cluster_sizes, q_near_dup_clusters

    hist = q_near_dup_cluster_sizes(spark, sf_dir).collect()
    labels = q_near_dup_clusters(spark, sf_dir).collect()
    assert sum(r.n_docs for r in hist) == len(labels)
    from collections import Counter

    sizes = Counter(Counter(r.cluster_id for r in labels).values())
    assert {r.cluster_size: r.n_clusters for r in hist} == dict(sizes)
    for r in hist:
        assert r.n_dropped == (r.cluster_size - 1) * r.n_clusters


def test_langid_ngram_profiles_discriminate(spark, tmp_path):
    """On an engineered bilingual corpus, training assigns each
    language's distinctive bigrams to it, and the confusion table is
    diagonal (every doc predicted as its own label)."""
    from avro_diff_spark.pipelines import (
        _train_langid_profiles,
        q_langid_ngram_counts,
    )

    en = "the cat and the dog share the hearth with their brethren"
    de = "zwischen zwölf wörtern wächst größe für jüngere zuschauer"
    rows = [(i, en + f" variant {i}", "en", "web") for i in range(20)]
    rows += [(100 + i, de + f" nummer {i}", "de", "web") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    prof = _train_langid_profiles(f"{tmp_path}/documents.parquet")
    langs_of = {}
    for bg, lang in prof:
        langs_of.setdefault(lang, set()).add(bg)
    assert "th" in langs_of["en"] and "th" not in langs_of.get("de", set())
    assert any("z" in bg for bg in langs_of["de"])
    # disjoint voting table
    assert len({bg for bg, _ in prof}) == len(prof)

    got = {(r.lang, r.lang_pred): r.n_docs for r in q_langid_ngram_counts(spark, str(tmp_path)).collect()}
    assert got == {("en", "en"): 20, ("de", "de"): 20}


def test_dsir_scores_match_naive_recompute(spark, sf_dir):
    """DSIR (Xie et al. 2023) end to end: the distributed hashed-gram
    scoring equals a driver-side pure-Python recompute with the same
    trained log-ratio table, doc for doc, in exact int64 fixed point."""
    import hashlib
    import re

    from avro_diff_spark.pipelines import (
        DSIR_BUCKETS,
        _train_dsir,
        q_dsir_weights,
    )

    weights = dict(_train_dsir(f"{sf_dir}/documents.parquet"))
    assert sorted(weights) == list(range(DSIR_BUCKETS))  # complete table

    def grams(text):
        toks = [t for t in re.sub(r"\s+", " ", text.lower().strip()).split(" ") if t]
        return [f"u:{t}" for t in toks] + [
            f"b:{a} {b}" for a, b in zip(toks, toks[1:])
        ]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % DSIR_BUCKETS

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    want = {}
    for r in docs:
        gs = grams(r.text)
        if gs:
            s = sum(weights[bucket(g)] for g in gs)
            want[r.doc_id] = (len(gs), s, int(s > 0))

    got = {
        r.doc_id: (r.n_grams, r.dsir_score_fp, r.selected)
        for r in q_dsir_weights(spark, sf_dir).collect()
    }
    assert got == want


def test_dsir_target_slice_scores_higher(sf_dir):
    """The trained importance weights separate the target domain: the
    English slice's mean fixed-point score exceeds the rest's (the whole
    point of importance resampling toward a target distribution)."""
    import duckdb

    from avro_diff_spark import pipelines as P

    old = P.ORACLE_SF_DIR
    P.ORACLE_SF_DIR = sf_dir
    try:
        sql = P._dsir_weights_sql()
    finally:
        P.ORACLE_SF_DIR = old
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    en_mean, other_mean = con.execute(
        f"""
        WITH s AS ({sql})
        SELECT avg(dsir_score_fp) FILTER (lang = 'en'),
               avg(dsir_score_fp) FILTER (lang != 'en')
        FROM s JOIN documents USING (doc_id)
        """
    ).fetchone()
    assert en_mean > 0 > other_mean


def test_quality_classifier_matches_pure_python(spark, sf_dir):
    """fastText-style quality classifier (round-8 brief): distributed
    scoring equals a pure-Python recompute with the same trained weight
    table, doc for doc, in exact int64 fixed point."""
    import hashlib
    import re

    from avro_diff_spark.pipelines import (
        FT_BUCKETS,
        _train_quality,
        q_quality_classifier,
    )

    table, b0 = _train_quality(f"{sf_dir}/documents.parquet")
    weights = dict(table)
    assert sorted(weights) == list(range(FT_BUCKETS))  # complete table

    def grams(text):
        toks = [t for t in re.sub(r"\s+", " ", text.lower().strip()).split(" ") if t]
        return [f"u:{t}" for t in toks] + [
            f"b:{a} {b}" for a, b in zip(toks, toks[1:])
        ]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % FT_BUCKETS

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    want = {}
    for r in docs:
        gs = grams(r.text)
        if gs:
            s = sum(weights[bucket(g)] for g in gs) + b0 * len(gs)
            want[r.doc_id] = (len(gs), s, int(s > 0))

    got = {
        r.doc_id: (r.n_grams, r.quality_score_fp, r.reference_like)
        for r in q_quality_classifier(spark, sf_dir).collect()
    }
    assert got == want


def test_quality_classifier_separates_the_positive_class(spark, sf_dir):
    """The trained classifier actually separates its positive class: the
    flagged rate among target-language docs is well above the rest's
    (trained on a bounded 512-doc sample, scored corpus-wide)."""
    from avro_diff_spark.pipelines import FT_POS_LANG, q_quality_classifier

    langs = {
        r.doc_id: r.lang
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }
    rows = q_quality_classifier(spark, sf_dir).collect()
    pos = [r for r in rows if langs[r.doc_id] == FT_POS_LANG]
    neg = [r for r in rows if langs[r.doc_id] != FT_POS_LANG]
    pos_rate = sum(r.reference_like for r in pos) / len(pos)
    neg_rate = sum(r.reference_like for r in neg) / len(neg)
    assert pos_rate > 0.8, pos_rate
    assert pos_rate > neg_rate + 0.3, (pos_rate, neg_rate)


def test_events_props_stats_malformed_json_is_null(spark, tmp_path):
    """from_json null-on-malformed semantics: bad/missing/NULL props rows
    count in n but not n_parsed, and never poison the aggregates."""
    from avro_diff_spark.analytics import events_props_stats

    d = str(tmp_path / "events.parquet")
    rows = [
        (1, "2024-01-01 00:00:00", 1, "click", 1.0, '{"k": 5}'),
        (2, "2024-01-01 00:00:00", 1, "click", 1.0, "{bad json"),
        (3, "2024-01-01 00:00:00", 1, "click", 1.0, None),
        (4, "2024-01-01 00:00:00", 1, "click", 1.0, '{"other": 1}'),
        (5, "2024-01-01 00:00:00", 1, "view", 1.0, '{"k": -3}'),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(d)
    got = {r["event_type"]: r for r in events_props_stats(spark, str(tmp_path)).collect()}
    c = got["click"]
    assert (c["n"], c["n_parsed"], c["k_sum"], c["k_min"], c["k_max"]) == (4, 1, 5, 5, 5)
    v = got["view"]
    assert (v["n"], v["n_parsed"], v["k_sum"]) == (1, 1, -3)


def test_epoch_shuffle_is_deterministic_and_epoch_varying(spark):
    from avro_diff_spark.pipelines import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(40)], "doc_id bigint")
    a = {(r.doc_id, r.shard, r.pos) for r in
         epoch_shuffle(df, "doc_id", epoch=1, n_shards=4).collect()}
    b = {(r.doc_id, r.shard, r.pos) for r in
         epoch_shuffle(df, "doc_id", epoch=1, n_shards=4).collect()}
    c = {(r.doc_id, r.shard, r.pos) for r in
         epoch_shuffle(df, "doc_id", epoch=2, n_shards=4).collect()}
    assert a == b          # reproducible
    assert a != c          # different epoch -> different order
    assert len(a) == 40    # a permutation: every row exactly once
    # per-shard positions are dense 1..n
    import collections

    per = collections.defaultdict(list)
    for _, s, p in a:
        per[s].append(p)
    for s, ps in per.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))

    import pytest as _pytest

    with _pytest.raises(ValueError):
        epoch_shuffle(df, "doc_id", epoch=1, n_shards=0)


def test_contrastive_negatives_law(spark):
    from avro_diff_spark.pipelines import contrastive_negatives

    df = spark.createDataFrame([(i,) for i in range(20)], "doc_id bigint")
    rows = contrastive_negatives(df, "doc_id", k=2).collect()
    # every anchor gets k negatives (no accidental self-pair at N=20
    # with these strides unless offset hits 0 mod N)
    import collections

    per = collections.defaultdict(set)
    for r in rows:
        assert r.neg_id != r.anchor_id
        per[r.anchor_id].add((r.neg_rank, r.neg_id))
    assert set(per) == set(range(20))
    # deterministic across invocations
    again = {(r.anchor_id, r.neg_rank, r.neg_id)
             for r in contrastive_negatives(df, "doc_id", k=2).collect()}
    assert again == {(r.anchor_id, r.neg_rank, r.neg_id) for r in rows}
    # different seed -> different pairing
    other = {(r.anchor_id, r.neg_rank, r.neg_id)
             for r in contrastive_negatives(df, "doc_id", k=2, seed=7).collect()}
    assert other != again

    import pytest as _pytest

    with _pytest.raises(ValueError):
        contrastive_negatives(df, "doc_id", k=0)


def test_dataset_card_diff_classifies_dedup_effects(spark, sf_dir):
    """The card diff (round 14) is the key_diff of the two cards: the
    dedup generation zeroes dup_docs/dup_ppm and shrinks n_docs (all
    'changed'), while per-fingerprint-survivor laws keep distinct_texts
    identical ('unchanged'); every metric appears exactly once with
    both values carried."""
    from avro_diff_spark.pipelines import q_dataset_card, q_dataset_card_diff

    rows = {r.metric: r for r in q_dataset_card_diff(spark, sf_dir).collect()}
    assert len(rows) == 10
    assert all(r.diff_kind in ("changed", "unchanged") for r in rows.values())
    assert rows["dup_docs"].diff_kind == "changed"
    assert rows["dup_docs"].new_value == 0
    assert rows["dup_ppm"].new_value == 0
    assert rows["n_docs"].old_value > rows["n_docs"].new_value
    # exact dedup keeps one doc per fingerprint: distinct texts survive
    assert rows["distinct_texts"].diff_kind == "unchanged"
    assert rows["n_docs"].new_value == rows["distinct_texts"].new_value
    # the old side IS the recorded dataset_card
    card = {r.metric: r.value for r in q_dataset_card(spark, sf_dir).collect()}
    assert {m: r.old_value for m, r in rows.items()} == card
