"""Distributed model-fit primitives — the bounded-table contract.

Every trainer in the engine (BPE/unigram word table, language-ID bigram
profiles, DSIR bucket counts, the quality-classifier labeled sample, the
IVF/PQ embedding samplers) needs a BOUNDED table computed from an
unbounded corpus.  Through round 12 that table was computed with a
driver-side DuckDB scan of the corpus parquet — correct, but a
single-node full scan: at 100 TB the fit step is a driver bottleneck
even though the trained state itself is bounded.

This module replaces that shape.  Each primitive computes the SAME
bounded table as a distributed Spark aggregation — the driver
``collect()`` touches only the bounded result (``max_words`` rows,
``n_buckets`` rows, ``sample`` vectors …), never the corpus — whenever a
SparkSession is active.  The original DuckDB scan survives only as a
fallback for session-less contexts (oracle-SQL generation tooling, unit
tests without a cluster); the two paths are pinned value-identical in
``tests/test_distributed_fit.py``, which both compares their outputs row
for row at sf0.001 and re-runs every trainer with the DuckDB path
monkeypatched to raise, proving the fit never reads the corpus on the
driver when a session exists.

Why the two paths agree bit-for-bit: they share the engine's portable
text/hash laws — ``functions.text.norm_text / tokens_ws / hash32`` on
the Spark side mirror ``pipelines.norm_sql / tokens_sql / hash32_sql``
on the DuckDB side (the identity every oracle-green query already relies
on), counts are exact integers, order-by keys are total orders, and the
float32→float64 widening of embedding values is exact in both engines.

Plan shapes (the 100 TB contract):

* word table — explode + map-side-combined groupBy count +
  ``TakeOrderedAndProject`` (orderBy c DESC, w LIMIT max_words): one
  shuffle of distinct words, a bounded result.
* bigram profiles — groupBy (lang, bigram) count: shuffle bounded by
  |langs| x |charset|^2, map-side combined.
* DSIR / quality buckets — hashed-gram groupBy bounded by n_buckets
  (x sample docs for the classifier), map-side combined.
* embedding samples — orderBy (md5-of-id, id) LIMIT sample:
  ``TakeOrderedAndProject`` again, O(sample . dim) on the driver.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _active_spark():
    from pyspark.sql import SparkSession

    return SparkSession.getActiveSession()


def _glob(path: str) -> str:
    import os

    return path + "/**/*.parquet" if os.path.isdir(path) else path


# --------------------------------------------------------------------------
# word-frequency table (BPE / unigram trainers)
# --------------------------------------------------------------------------


def word_count_table(path: str, max_words: int) -> tuple[tuple[str, int], ...]:
    """The bounded (word, count) table: whitespace tokens of the
    normalized text, counted, top ``max_words`` by (count DESC, word) —
    a total order, so the truncation is deterministic in both engines."""
    spark = _active_spark()
    if spark is None:
        return _word_count_duckdb(path, max_words)
    return _word_count_spark(spark, path, max_words)


def _word_count_spark(spark, path: str, max_words: int):
    from avro_diff_spark.functions import text as TX

    rows = (
        spark.read.parquet(path)
        .select(F.explode(TX.tokens_ws(F.col("text"))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(max_words)
        .collect()
    )
    return tuple((r["w"], r["c"]) for r in rows)


def _word_count_duckdb(path: str, max_words: int):
    import duckdb

    rows = duckdb.connect().execute(
        """
        SELECT w, count(*) AS c FROM (
          SELECT unnest(string_split(
            regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS w
          FROM read_parquet(?)
        ) WHERE w <> '' GROUP BY w ORDER BY c DESC, w LIMIT ?
        """,
        [_glob(path), max_words],
    ).fetchall()
    return tuple((w, c) for w, c in rows)


# --------------------------------------------------------------------------
# (lang, char-bigram) count table (language-ID profile trainer)
# --------------------------------------------------------------------------


def langid_bigram_table(path: str) -> tuple[tuple[str, str, int], ...]:
    """(lang, bigram, count) over the normalized text, sorted by
    (lang, bigram) — bounded by |langs| x |charset|^2, independent of
    corpus row count."""
    spark = _active_spark()
    if spark is None:
        rows = _langid_bigram_duckdb(path)
    else:
        rows = _langid_bigram_spark(spark, path)
    return tuple(sorted(rows))


def _langid_bigram_spark(spark, path: str):
    from avro_diff_spark.functions import text as TX

    rows = (
        spark.read.parquet(path)
        .select("lang", TX.norm_text(F.col("text")).alias("t"))
        .select(
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(length(t) - 1, 0)),"
                    " i -> substring(t, i, 2))"
                )
            ).alias("bg"),
        )
        .groupBy("lang", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    return [(r["lang"], r["bg"], r["c"]) for r in rows]


def _langid_bigram_duckdb(path: str):
    import duckdb

    from avro_diff_spark.pipelines import norm_sql

    rows = duckdb.connect().execute(
        f"""
        WITH t AS (SELECT lang, {norm_sql('text')} AS t FROM read_parquet(?)),
        bg AS (
          SELECT lang,
                 unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                                       i -> t[i:i + 1])) AS bg
          FROM t
        )
        SELECT lang, bg, count(*) AS c FROM bg GROUP BY lang, bg
        """,
        [_glob(path)],
    ).fetchall()
    return [(lang, bg, c) for lang, bg, c in rows]


def langid_profile_table(path: str, top_k: int) -> tuple[tuple[str, str], ...]:
    """The TRAINED language-ID profile [(bigram, lang), ...] — each
    observed bigram assigned to the language where its RELATIVE
    frequency is highest (exact integer cross-multiplication
    c_l·T_m > c_m·T_l, ties to the earlier language), then each
    language keeps its ``top_k`` bigrams by (count DESC, bigram).

    The Spark path runs assignment and top-k selection DISTRIBUTED —
    per-language totals collect first (|langs| rows), broadcast back as
    a map literal, the per-bigram argmax folds over the lang-sorted
    count structs with DECIMAL(38) cross-products (overflow-free at any
    corpus size, matching the fallback's arbitrary-precision ints), and
    a per-language rank window truncates — so the driver collect is
    HARD-bounded at langs x top_k rows even on CJK corpora where
    distinct bigrams alone would be millions.  The session-less DuckDB
    fallback runs the same law in Python over the full bigram table;
    both paths are pinned value-identical (tests/test_distributed_fit)."""
    spark = _active_spark()
    if spark is None:
        return _langid_profile_finish(_langid_bigram_duckdb(path), top_k)
    return _langid_profile_spark(spark, path, top_k)


def _langid_profile_spark(spark, path: str, top_k: int):
    from pyspark.sql import Window

    from avro_diff_spark.functions import text as TX

    bgc = (
        spark.read.parquet(path)
        .select("lang", TX.norm_text(F.col("text")).alias("t"))
        .select(
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(length(t) - 1, 0)),"
                    " i -> substring(t, i, 2))"
                )
            ).alias("bg"),
        )
        .groupBy("lang", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = {
        r["lang"]: int(r["t"])
        for r in bgc.groupBy("lang").agg(F.sum("c").alias("t")).collect()
    }
    tmap = F.create_map(
        *[F.lit(x) for lang in sorted(totals) for x in (lang, totals[lang])]
    )
    dec = "decimal(38,0)"
    entries = F.array_sort(F.collect_list(F.struct("lang", "c")))
    assigned = (
        bgc.groupBy("bg")
        .agg(entries.alias("es"))
        .select(
            "bg",
            F.aggregate(
                F.slice(F.col("es"), 2, F.greatest(F.size("es") - 1, F.lit(0))),
                F.element_at(F.col("es"), 1),
                lambda acc, e: F.when(
                    e["c"].cast(dec) * F.element_at(tmap, acc["lang"]).cast(dec)
                    > acc["c"].cast(dec) * F.element_at(tmap, e["lang"]).cast(dec),
                    e,
                ).otherwise(acc),
            ).alias("best"),
        )
        .select("bg", F.col("best.lang").alias("lang"), F.col("best.c").alias("c"))
    )
    rank = F.row_number().over(
        Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("bg"))
    )
    kept = assigned.withColumn("rn", rank).where(F.col("rn") <= top_k).collect()
    per_lang: dict[str, list[str]] = {}
    for r in kept:
        per_lang.setdefault(r["lang"], []).append(r["bg"])
    out: list[tuple[str, str]] = []
    for lang in sorted(per_lang):
        out.extend((bg, lang) for bg in sorted(per_lang[lang]))
    return tuple(out)


def _langid_profile_finish(rows, top_k: int):
    """The fallback finisher: the same assignment/top-k law in plain
    Python (arbitrary-precision ints) over a full (lang, bg, c) table."""
    totals: dict[str, int] = {}
    for lang, _, c in rows:
        totals[lang] = totals.get(lang, 0) + c
    by_bigram: dict[str, dict[str, int]] = {}
    for lang, bg, c in rows:
        by_bigram.setdefault(bg, {})[lang] = c
    assigned: dict[str, tuple[str, int]] = {}
    for bg in sorted(by_bigram):
        best = None
        for lang in sorted(by_bigram[bg]):
            c = by_bigram[bg][lang]
            if best is None or c * totals[best[0]] > best[1] * totals[lang]:
                best = (lang, c)
        assigned[bg] = best  # type: ignore[assignment]
    per_lang: dict[str, list[tuple[str, int]]] = {}
    for bg, (lang, c) in assigned.items():
        per_lang.setdefault(lang, []).append((bg, c))
    out: list[tuple[str, str]] = []
    for lang in sorted(per_lang):
        kept = sorted(per_lang[lang], key=lambda t: (-t[1], t[0]))[:top_k]
        out.extend((bg, lang) for bg, _ in sorted(kept))
    return tuple(out)


# --------------------------------------------------------------------------
# hashed-gram bucket counts (DSIR trainer)
# --------------------------------------------------------------------------


def dsir_bucket_table(
    path: str, n_buckets: int, target_lang: str
) -> dict[int, tuple[int, int]]:
    """{bucket: (target_count, raw_count)} over the hashed unigram+bigram
    gram stream — bounded by ``n_buckets``."""
    spark = _active_spark()
    if spark is None:
        return _dsir_buckets_duckdb(path, n_buckets, target_lang)
    return _dsir_buckets_spark(spark, path, n_buckets, target_lang)


def _grams_col(ts):
    """Spark unigram+bigram gram stream over a filtered token-list column
    (prefix-tagged so the two gram spaces never collide) — the same law
    as pipelines._dsir_grams_sql."""
    return F.concat(
        F.transform(ts, lambda t: F.concat(F.lit("u:"), t)),
        F.when(F.size(ts) < 2, F.array().cast("array<string>")).otherwise(
            F.expr(
                "transform(sequence(1, size(ts) - 1),"
                " i -> 'b:' || ts[i - 1] || ' ' || ts[i])"
            )
        ),
    )


def _dsir_buckets_spark(spark, path: str, n_buckets: int, target_lang: str):
    from avro_diff_spark.functions import text as TX

    toks = (
        spark.read.parquet(path)
        .select(
            "lang",
            F.filter(TX.tokens_ws(F.col("text")), lambda t: t != "").alias("ts"),
        )
        .select("lang", F.explode(_grams_col(F.col("ts"))).alias("g"))
    )
    rows = (
        toks.select("lang", (TX.hash32(F.col("g")) % n_buckets).alias("b"))
        .groupBy("b")
        .agg(
            F.sum((F.col("lang") == target_lang).cast("long")).alias("t_c"),
            F.count(F.lit(1)).alias("r_c"),
        )
        .collect()
    )
    return {r["b"]: (int(r["t_c"]), int(r["r_c"])) for r in rows}


def _dsir_buckets_duckdb(path: str, n_buckets: int, target_lang: str):
    import duckdb

    from avro_diff_spark.pipelines import _dsir_grams_sql, tokens_sql

    rows = duckdb.connect().execute(
        f"""
        WITH t AS (SELECT lang,
                          list_filter({tokens_sql('text')}, x -> x != '') AS ts
                   FROM read_parquet(?)),
        g AS (SELECT lang, unnest({_dsir_grams_sql('ts')}) AS g FROM t)
        SELECT ('0x' || substr(md5(g), 1, 8))::BIGINT % {n_buckets} AS b,
               count(*) FILTER (lang = ?) AS t_c,
               count(*) AS r_c
        FROM g GROUP BY b
        """,
        [_glob(path), target_lang],
    ).fetchall()
    return {b: (tc, rc) for b, tc, rc in rows}


# --------------------------------------------------------------------------
# labeled hashed-gram sample (quality-classifier trainer)
# --------------------------------------------------------------------------


def quality_sample_rows(
    path: str, n_buckets: int, pos_lang: str, sample: int
) -> tuple[tuple[object, int, int, int], ...]:
    """(doc_id, y, bucket, count) rows for the DETERMINISTIC labeled
    sample: the ``sample`` lowest (md5(doc_id), doc_id) docs, per-doc
    hashed-gram bucket counts — bounded by sample x n_buckets."""
    spark = _active_spark()
    if spark is None:
        rows = _quality_sample_duckdb(path, n_buckets, pos_lang, sample)
    else:
        rows = _quality_sample_spark(spark, path, n_buckets, pos_lang, sample)
    return tuple(sorted(rows))


def _quality_sample_spark(spark, path: str, n_buckets: int, pos_lang: str, sample: int):
    from avro_diff_spark.functions import text as TX

    t = (
        spark.read.parquet(path)
        .select(
            "doc_id",
            "lang",
            F.filter(TX.tokens_ws(F.col("text")), lambda x: x != "").alias("ts"),
        )
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .limit(sample)
    )
    rows = (
        t.select(
            "doc_id",
            (F.col("lang") == pos_lang).cast("int").alias("y"),
            F.explode(_grams_col(F.col("ts"))).alias("g"),
        )
        .select("doc_id", "y", (TX.hash32(F.col("g")) % n_buckets).alias("b"))
        .groupBy("doc_id", "y", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    return [(r["doc_id"], int(r["y"]), int(r["b"]), int(r["c"])) for r in rows]


def _quality_sample_duckdb(path: str, n_buckets: int, pos_lang: str, sample: int):
    import duckdb

    from avro_diff_spark.pipelines import _dsir_grams_sql, tokens_sql

    rows = duckdb.connect().execute(
        f"""
        WITH t AS (SELECT doc_id, lang,
                          list_filter({tokens_sql('text')}, x -> x != '') AS ts
                   FROM read_parquet(?)
                   ORDER BY md5(doc_id::VARCHAR), doc_id LIMIT {sample}),
        g AS (SELECT doc_id, lang, unnest({_dsir_grams_sql('ts')}) AS g FROM t)
        SELECT doc_id, any_value(lang = ?)::INT AS y,
               ('0x' || substr(md5(g), 1, 8))::BIGINT % {n_buckets} AS b,
               count(*) AS c
        FROM g GROUP BY doc_id, b
        """,
        [_glob(path), pos_lang],
    ).fetchall()
    return [(d, int(y), int(b), int(c)) for d, y, b, c in rows]


# --------------------------------------------------------------------------
# deterministic embedding hash-sample (IVF / PQ trainers)
# --------------------------------------------------------------------------


def embedding_sample(path: str, tag: str, sample: int):
    """float64 sample matrix: the ``sample`` lowest
    (hash32(tag + ':' + vec_id), vec_id) embedding rows.  float32 parquet
    values widen to float64 exactly in both engines, so downstream Lloyd
    iterations see bit-identical inputs."""
    import numpy as np

    spark = _active_spark()
    if spark is None:
        vecs = _embedding_sample_duckdb(path, tag, sample)
    else:
        vecs = _embedding_sample_spark(spark, path, tag, sample)
    return np.array(vecs, dtype=np.float64)


def _embedding_sample_spark(spark, path: str, tag: str, sample: int):
    from avro_diff_spark.functions import text as TX

    key = TX.hash32(F.concat(F.lit(tag + ":"), F.col("vec_id").cast("string")))
    rows = (
        spark.read.parquet(path)
        .select("vec_id", "embedding", key.alias("hk"))
        .orderBy("hk", "vec_id")
        .limit(sample)
        .collect()
    )
    return [list(r["embedding"]) for r in rows]


def embedding_sample_df(
    df, tag: str, sample: int, *, id_col: str = "cand_id", emb_col: str = "embedding"
):
    """:func:`embedding_sample` over an already-loaded DataFrame (the
    stored-index refresh path, where the corpus is the postings table,
    not a parquet path).  Same law: the ``sample`` lowest
    (hash32(tag + ':' + id), id) rows, TakeOrderedAndProject, float64."""
    import numpy as np

    from avro_diff_spark.functions import text as TX

    key = TX.hash32(F.concat(F.lit(tag + ":"), F.col(id_col).cast("string")))
    rows = (
        df.select(F.col(id_col).alias("_id"), F.col(emb_col).alias("_emb"), key.alias("_hk"))
        .orderBy("_hk", "_id")
        .limit(sample)
        .collect()
    )
    return np.array([list(r["_emb"]) for r in rows], dtype=np.float64)


def _embedding_sample_duckdb(path: str, tag: str, sample: int):
    import duckdb

    rows = duckdb.connect().execute(
        f"""
        SELECT embedding FROM read_parquet(?)
        ORDER BY ('0x' || substr(md5('{tag}:' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT,
                 vec_id
        LIMIT ?
        """,
        [path, sample],
    ).fetchall()
    return [list(r[0]) for r in rows]
