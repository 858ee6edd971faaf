"""Sparse retrieval: a persisted inverted index with BM25-class ranking.

The lexical half of a corpus-scale search/dedup stack (the dense half is
``operators/ann_index.py``): postings stored as a VERSIONED TABLE
hive-partitioned by a term hash bucket, so a query's scan prunes to the
buckets its terms live in (the log-level partition skip every
partitioned table here gets); global collection statistics (doc count,
total token count, per-term document frequencies) are maintained
INCREMENTALLY on append via ``versioned.merge_into`` — indexing work is
∝ the increment, the historical postings are never re-read.

Ranking is the BM25 shape (Robertson & Sparck Jones probabilistic
relevance framework; Robertson et al., TREC-3 1994) with the engine's
determinism discipline applied:

- ``ln``-free idf: the Robertson-Sparck-Jones idf is
  ``ln((N - df + 0.5) / (df + 0.5))``; the engine scores with the
  RATIONAL ARGUMENT ``(2N - 2df + 1) / (2df + 1)`` instead (the
  ``lm_bigram_scores`` surrogate trick — ln's last ulp differs across
  libms, and the monotone transform preserves per-term ordering).
- rational constants: ``k1 = 6/5``, ``b = 3/4`` (the textbook 1.2/0.75),
  and an INTEGER average document length ``A = max(L div N, 1)``, so the
  whole per-term score is one exact integer fraction

      score(t, d) = 22*tf*A*(2N - 2df + 1)
                    ---------------------------------    (k1+1 = 11/5)
                    (2df + 1)*(10*tf*A + 3*A + 9*dl)

  carried in DECIMAL(38,0) (exact far beyond any real corpus; the
  DuckDB twin rides HUGEINT), then fixed-pointed by ONE IEEE divide:
  ``score_x1e6 = floor(P/Q * 1e6)`` — both engines perform the identical
  correctly-rounded double ops, so hashes match bit-for-bit.
- per-document totals are SUMS OF INT64 fixed-point scores — exact and
  aggregation-order-independent (the countmin/tfidf lesson: a sum of
  raw doubles depends on partial-agg order and breaks value hashes).

Scale shape: build = one tokenize + one (term, doc) groupBy; query =
broadcast the (tiny) query-term list, one pruned postings scan, one
broadcast df join, one keyed groupBy-sum, one per-query top-k window.
No driver state beyond the two meta scalars (N, L) and the query terms.

No reference parity (yuana97/Avro_Diff has no retrieval surface);
beyond-reference LLM-pipeline tier — round-10 verdict top-next item 3.
"""

from __future__ import annotations

import zlib
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from avro_diff_spark.functions import text as TX
from avro_diff_spark.sources import versioned as V
from avro_diff_spark.sources.tables import spread_small

__all__ = [
    "tokenize_query",
    "term_bucket",
    "build_text_index",
    "append_to_text_index",
    "delete_from_text_index",
    "maintain_text_index_stream",
    "query_text_index",
    "bm25_score_sql",
]

#: Number of term-hash partitions in the postings/terms tables. A layout
#: constant (affects only pruning granularity, never values); real
#: deployments size it so one bucket ≈ one executor's comfortable scan.
N_BUCKETS = 16


def tokenize_query(text: str) -> list[str]:
    """Driver-side twin of :func:`functions.text.tokens_ws`'s law
    (lowercase, trim, collapse whitespace, split): queries are small
    literal strings, so tokenizing them on the driver is bounded state,
    and sharing the law keeps query terms aligned with indexed terms."""
    toks = text.lower().split()
    return [t for t in toks if t]


def term_bucket(term) -> F.Column:
    """Partition bucket of a term: ``crc32(term) % N_BUCKETS``. CRC32 is
    the standard polynomial in both Spark and zlib, so the driver can
    compute the very same bucket for pruning (:func:`_bucket_py`)."""
    col = term if not isinstance(term, str) else F.col(term)
    return F.pmod(F.crc32(col.cast("string")), F.lit(N_BUCKETS)).cast("int")


def _bucket_py(term: str) -> int:
    return (zlib.crc32(term.encode("utf-8")) & 0xFFFFFFFF) % N_BUCKETS


def _postings_of(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(bucket, term, doc_id, tf, dl) — term frequencies with the doc
    length denormalized onto every posting (the impact-ordered-postings
    convention: scoring never joins a doclen table)."""
    toks = spread_small(df).select(
        F.col(id_col).alias("doc_id"), TX.tokens_ws(F.col(text_col)).alias("toks")
    )
    exploded = toks.select(
        "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term")
    ).where(F.col("term") != "")
    return exploded.groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    ).select(term_bucket("term").alias("bucket"), "term", "doc_id", "tf", "dl")


def _stats_of(postings: DataFrame):
    """(terms_df, n_docs, total_len) from a postings increment: df per
    term, plus the two meta scalars (each doc contributes its dl once —
    postings carry it per term, so count docs via countDistinct)."""
    terms = postings.groupBy("bucket", "term").agg(
        F.count(F.lit(1)).alias("df")
    )
    meta = postings.groupBy("doc_id").agg(F.first("dl").alias("dl")).agg(
        F.count(F.lit(1)).alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("l")
    ).collect()[0]
    return terms, int(meta["n"]), int(meta["l"])


def build_text_index(
    spark: SparkSession,
    df: DataFrame,
    index_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> int:
    """Index a corpus from scratch: commit ``postings`` and ``terms``
    (both bucket-partitioned) with the collection stats (N, L) in the
    commit's app metadata. Returns the postings table version."""
    postings = _postings_of(df, text_col, id_col)
    terms, n, l = _stats_of(postings)
    V.commit_snapshot(
        terms, f"{index_path}/terms", partition_by=["bucket"]
    )
    return V.commit_snapshot(
        postings,
        f"{index_path}/postings",
        partition_by=["bucket"],
        app_meta={"n_docs": n, "total_len": l},
    )


def append_to_text_index(
    spark: SparkSession,
    df: DataFrame,
    index_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    txn: tuple[str, int] | None = None,
) -> int:
    """Incremental indexing: APPEND the increment's postings and MERGE
    its per-term df deltas into the terms table (``merge_into`` —
    matched terms add, new terms insert); the meta scalars advance in
    the commit's app metadata. Work ∝ increment — the historical
    postings are never read (``append == rebuild`` is pytest-pinned).
    Docs already indexed must not be re-submitted (the standard
    inverted-index contract; dedup upstream).

    ``txn=(app_id, epoch)`` makes the whole increment IDEMPOTENT for
    streaming replays: each of the two commits (terms merge, postings
    append) is epoch-guarded independently via
    ``last_committed_epoch`` + the commit txn record, so a crash
    between them replays to exactly the missing half — the Delta
    txnAppId/txnVersion discipline of ``commit_stream``."""
    postings = _postings_of(df, text_col, id_col)
    delta_terms, dn, dl_ = _stats_of(postings)
    meta = _collection_meta(index_path)
    # merge_into takes whole source rows, so pre-sum the delta with the
    # touched terms' current df (left join pruned to the delta's
    # buckets — work ∝ increment, untouched term files ride merge_into's
    # 'touched' rewrite untouched)
    touched_buckets = [
        r["bucket"] for r in delta_terms.select("bucket").distinct().collect()
    ]
    cur = (
        V.read_version(spark, f"{index_path}/terms")
        .where(F.col("bucket").isin(touched_buckets))
        .select("bucket", "term", F.col("df").alias("_cur_df"))
    )
    merged_src = (
        delta_terms.withColumnRenamed("df", "_delta_df")
        .join(cur, ["bucket", "term"], "left")
        .select(
            "bucket",
            "term",
            (F.coalesce(F.col("_cur_df"), F.lit(0)) + F.col("_delta_df")).alias("df"),
        )
    )
    epoch = None if txn is None else int(txn[1])
    if txn is None or V.last_committed_epoch(f"{index_path}/terms", txn[0]) < epoch:
        V.merge_into(
            spark, f"{index_path}/terms", merged_src, ["bucket", "term"], txn=txn
        )
    if txn is not None and (
        V.last_committed_epoch(f"{index_path}/postings", txn[0]) >= epoch
    ):
        return V.latest_version(f"{index_path}/postings")
    return V.commit_snapshot(
        postings,
        f"{index_path}/postings",
        mode="append",
        partition_by=["bucket"],
        app_meta={
            "n_docs": int(meta["n_docs"]) + dn,
            "total_len": int(meta["total_len"]) + dl_,
        },
        txn=txn,
    )


def delete_from_text_index(
    spark: SparkSession,
    index_path: str,
    doc_ids: Sequence[int] | DataFrame,
    *,
    id_col: str = "doc_id",
    txn: tuple[str, int] | None = None,
) -> int:
    """Incremental DOCUMENT DELETION — the missing half of index
    maintenance (a dedup pass removing docs already indexed previously
    required a rebuild): drop the docs' postings with a merge-on-read
    deletion vector (``delete_where`` — a point-delete in a large
    postings file writes a KB sidecar, not the file), decrement the
    touched terms' df via ``merge_into``, delete terms whose entire df
    came from the deleted docs, and decrement the collection stats
    (N, L) in the SAME commit as the postings delete (df rows and stats
    always travel with their own table's commit).

    ``txn=(app_id, epoch)`` makes the whole delete IDEMPOTENT across
    retries — the ``append_to_text_index`` discipline: the terms work
    and the postings DV delete are guarded independently by
    ``last_committed_epoch``, so a crash between them replays to
    exactly the missing half and never double-decrements df. (Without
    txn a retry after a crash between the terms commits and the
    postings delete WOULD re-decrement — pass txn in any flow that
    retries.) Inside the terms branch the zero-df delete runs BEFORE
    the epoch-stamped merge, so a crash between those two replays the
    branch self-consistently (see the inline ORDER IS LOAD-BEARING
    note) — nothing strands in any interleaving.

    ``delete-then-query == rebuild-then-query`` is pytest-pinned, as is
    terms/postings table equality with a fresh build on the survivors
    and the crash-between-tables replay.

    Scale shape: the doomed postings are scanned once and persisted for
    the stats fold and the df decrements (``delete_where`` performs its
    own provenance scan for the DV identification — the index is
    term-keyed, not doc-keyed, and Lucene pays the same identification
    shape for deletes); one bucket-pruned terms merge. A DataFrame id
    set is identified by broadcast semi-join, never collected; zero-df
    terms are collected driver-side (bounded by the DELETED docs'
    vocabulary, not the corpus). Returns the postings version. Ids
    never indexed are a no-op."""
    posts_path = f"{index_path}/postings"
    terms_path = f"{index_path}/terms"
    if isinstance(doc_ids, DataFrame):
        ids_df = doc_ids.select(F.col(id_col).alias("doc_id")).distinct()
        doomed_cond = None
    else:
        ids = sorted({int(i) for i in doc_ids})
        if not ids:
            return V.latest_version(posts_path)
        ids_df = None
        doomed_cond = F.col("doc_id").isin(ids)

    posts = V.read_version(spark, posts_path)
    if doomed_cond is not None:
        doomed = posts.where(doomed_cond)
    else:
        doomed = posts.join(F.broadcast(ids_df), "doc_id", "semi")
    doomed = doomed.persist()
    try:
        meta_row = (
            doomed.groupBy("doc_id")
            .agg(F.first("dl").alias("dl"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(F.sum("dl"), F.lit(0)).alias("l"),
            )
            .collect()[0]
        )
        dn, dl_ = int(meta_row["n"]), int(meta_row["l"])
        if dn == 0:
            return V.latest_version(posts_path)

        epoch = None if txn is None else int(txn[1])
        if txn is None or V.last_committed_epoch(terms_path, txn[0]) < epoch:
            dec_terms = doomed.groupBy("bucket", "term").agg(
                F.count(F.lit(1)).alias("_dec")
            )
            touched_buckets = [
                r["bucket"] for r in dec_terms.select("bucket").distinct().collect()
            ]
            cur = (
                V.read_version(spark, terms_path)
                .where(F.col("bucket").isin(touched_buckets))
                .select("bucket", "term", F.col("df").alias("_cur_df"))
            )
            new_terms = dec_terms.join(cur, ["bucket", "term"], "left").select(
                "bucket",
                "term",
                (F.coalesce(F.col("_cur_df"), F.lit(0)) - F.col("_dec")).alias("df"),
            ).persist()
            try:
                live = new_terms.where(F.col("df") > 0)
                # a term's bucket is a function of the term, so the zero
                # set is just term strings; bounded by the deleted docs'
                # vocabulary
                zeros = [
                    r["term"] for r in new_terms.where(F.col("df") <= 0).collect()
                ]
                # ORDER IS LOAD-BEARING: the zero-df delete runs FIRST
                # and carries NO txn; the df MERGE runs second and
                # carries the epoch stamp. A crash between them replays
                # the whole branch self-consistently (the re-read cur
                # lacks the already-deleted zero terms — they fold to
                # df<0 and the no-match delete commits nothing — and
                # live df is recomputed from the un-decremented values);
                # stamping BEFORE the zero-delete would strand zero
                # terms with their stale POSITIVE df, which a later
                # re-append would overcount.
                if zeros:
                    zb = sorted({_bucket_py(t) for t in zeros})
                    V.delete_where(
                        spark,
                        terms_path,
                        F.col("bucket").isin(zb) & F.col("term").isin(zeros),
                    )
                V.merge_into(
                    spark, terms_path, live, ["bucket", "term"],
                    when_not_matched="ignore", txn=txn,
                )
            finally:
                new_terms.unpersist()
        if txn is not None and (
            V.last_committed_epoch(posts_path, txn[0]) >= epoch
        ):
            return V.latest_version(posts_path)
        meta = _collection_meta(index_path)
        new_meta = {
            "n_docs": int(meta["n_docs"]) - dn,
            "total_len": int(meta["total_len"]) - dl_,
        }
        if doomed_cond is not None:
            return V.delete_where(
                spark, posts_path, doomed_cond, app_meta=new_meta, txn=txn
            )
        # DataFrame id set: broadcast-semi-join identification, never
        # collected
        return V.delete_where(
            spark, posts_path, keys=ids_df, on=["doc_id"], app_meta=new_meta,
            txn=txn,
        )
    finally:
        doomed.unpersist()


def maintain_text_index_stream(
    stream_df: DataFrame,
    index_path: str,
    *,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    trigger_available_now: bool = True,
):
    """Stream new documents into the stored inverted index: each
    micro-batch runs :func:`append_to_text_index` (postings append +
    df merge + meta advance) with the batch epoch as the idempotence
    token, so checkpoint replays — even ones that crashed BETWEEN the
    two commits — re-apply exactly the missing half and nothing twice.
    The streaming sibling of the batch append, pinned batch-equivalent
    in tests/test_text_index.py (the maintain_index_stream precedent).
    Returns the StreamingQuery."""
    import os

    app_id = os.path.abspath(checkpoint)

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_to_text_index(
            batch_df.sparkSession,
            batch_df,
            index_path,
            text_col=text_col,
            id_col=id_col,
            txn=(app_id, int(epoch_id)),
        )

    writer = stream_df.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _collection_meta(index_path: str) -> dict:
    """The newest commit's collection stats (n_docs, total_len) —
    walking PAST commits that carry none (compaction/metadata commits
    don't re-state app_meta, and OPTIMIZE on the postings table must not
    amnesia the index; caught by the compaction composition pin).
    O(log tail) via :func:`versioned.latest_app_meta`: below a
    checkpoint the stats come from its folded per-key map, so a table
    with thousands of commits answers without a commit-file walk
    (zero sub-checkpoint opens pytest-pinned)."""
    meta = V.latest_app_meta(f"{index_path}/postings", "n_docs")
    if meta:
        return meta
    raise ValueError(f"{index_path!r} has no committed collection stats")


def _score_cols(n_docs: int, avgdl: int):
    """The exact-integer BM25 fraction (module docstring): returns
    (P, Q) decimal columns over (tf, dl, df) input columns."""
    d = "decimal(38,0)"
    tf, dl, df = F.col("tf").cast(d), F.col("dl").cast(d), F.col("df").cast(d)
    a = F.lit(int(avgdl)).cast(d)
    n2 = F.lit(2 * int(n_docs)).cast(d)
    p = F.lit(22).cast(d) * tf * a * (n2 - F.lit(2).cast(d) * df + F.lit(1).cast(d))
    q = (F.lit(2).cast(d) * df + F.lit(1).cast(d)) * (
        F.lit(10).cast(d) * tf * a + F.lit(3).cast(d) * a + F.lit(9).cast(d) * dl
    )
    return p, q


def query_text_index(
    spark: SparkSession,
    index_path: str,
    queries: Sequence[tuple[int, str]],
    *,
    k: int = 10,
) -> DataFrame:
    """BM25-class top-k per query against the STORED index:
    (query_id, doc_id, rank, score_x1e6, n_terms_matched). The postings
    and terms scans filter on the literal term buckets (partition-pruned
    — a probe touches only its buckets' files); ranking is
    (score desc, doc_id asc), fully deterministic."""
    meta = _collection_meta(index_path)
    n_docs, total_len = int(meta["n_docs"]), int(meta["total_len"])
    avgdl = max(total_len // n_docs, 1) if n_docs else 1

    qrows = [
        (int(qid), t)
        for qid, text in queries
        for t in sorted(set(tokenize_query(text)))
    ]
    if not qrows:
        raise ValueError("no query terms after tokenization")
    terms = sorted({t for _, t in qrows})
    buckets = sorted({_bucket_py(t) for t in terms})
    qdf = spark.createDataFrame(qrows, "query_id long, term string")

    # prune_eq (optimization round 16): the bucket restriction moves
    # into read_version's manifest-level skip — non-matching partition
    # files are dropped BEFORE any scan subtree is assembled (fewer
    # driver-side plan nodes per probe) and the identical bucket
    # equality filter is applied on top, so results are unchanged.
    posts = V.read_version(
        spark, f"{index_path}/postings", prune_eq=("bucket", buckets)
    ).where(F.col("term").isin(terms))
    dfs = (
        V.read_version(spark, f"{index_path}/terms", prune_eq=("bucket", buckets))
        .where(F.col("term").isin(terms))
        .select("term", "df")
    )
    p, q = _score_cols(n_docs, avgdl)
    score = F.floor(
        p.cast("double") / q.cast("double") * F.lit(1_000_000.0)
    ).cast("long")
    scored = (
        posts.join(F.broadcast(dfs), "term")
        .join(F.broadcast(qdf), "term")
        .select("query_id", "doc_id", score.alias("s"))
    )
    agg = scored.groupBy("query_id", "doc_id").agg(
        F.sum("s").alias("score_x1e6"),
        F.count(F.lit(1)).alias("n_terms_matched"),
    )
    from avro_diff_spark.operators.similarity import _topk_per_query

    # rank-limited window (optimization round 15): WindowGroupLimit's
    # map-side partial top-k bounds any one task even when a common
    # query term matches a huge share of the corpus
    return _topk_per_query(
        agg,
        k,
        [F.col("score_x1e6").desc(), F.col("doc_id").asc()],
        ["query_id", "doc_id", "rank", "score_x1e6", "n_terms_matched"],
    )


def bm25_score_sql(
    queries: Sequence[tuple[int, str]],
    *,
    k: int = 10,
    docs_sql: str = "documents",
    text_expr: str = "text",
    id_expr: str = "doc_id",
    tokens_sql_fn=None,
) -> str:
    """DuckDB twin of indexing + :func:`query_text_index` from the raw
    corpus — an INDEPENDENT formulation (no stored index, no buckets:
    postings, df, N, L all derived inline), proving the persisted
    index + incremental stats reproduce the from-scratch computation.
    HUGEINT carries the exact fraction; the identical floor(P/Q * 1e6)
    double finish matches Spark's DECIMAL(38,0) path bit-for-bit."""
    if tokens_sql_fn is None:
        from avro_diff_spark.pipelines import tokens_sql as tokens_sql_fn  # lazy: no cycle
    qvals = ", ".join(
        "({}, '{}')".format(int(qid), t.replace("'", "''"))
        for qid, text in queries
        for t in sorted(set(tokenize_query(text)))
    )
    return f"""
WITH toks AS (
  SELECT {id_expr} AS doc_id, {tokens_sql_fn(text_expr)} AS toks FROM {docs_sql}
),
posts AS (
  SELECT doc_id, len(toks) AS dl, term, count(*) AS tf
  FROM (SELECT doc_id, toks, unnest(toks) AS term FROM toks)
  WHERE term <> ''
  GROUP BY doc_id, len(toks), term
),
dfs AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
meta AS (
  SELECT count(*) AS n, coalesce(sum(dl), 0) AS l
  FROM (SELECT doc_id, any_value(dl) AS dl FROM posts GROUP BY doc_id)
),
a AS (SELECT CASE WHEN n > 0 THEN greatest(l // n, 1) ELSE 1 END AS avgdl, n FROM meta),
q(query_id, term) AS (VALUES {qvals}),
scored AS (
  SELECT q.query_id, p.doc_id,
         floor(
           CAST(22::HUGEINT * p.tf * a.avgdl * (2::HUGEINT * a.n - 2 * d.df + 1) AS DOUBLE)
           / CAST((2::HUGEINT * d.df + 1)
                  * (10::HUGEINT * p.tf * a.avgdl + 3 * a.avgdl + 9 * p.dl) AS DOUBLE)
           * 1000000.0
         )::BIGINT AS s
  FROM posts p JOIN dfs d USING (term) JOIN q ON q.term = p.term CROSS JOIN a
),
agg AS (
  SELECT query_id, doc_id,
         CAST(sum(s) AS BIGINT) AS score_x1e6,
         count(*) AS n_terms_matched
  FROM scored GROUP BY query_id, doc_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score_x1e6 DESC, doc_id ASC) AS rank
  FROM agg
)
SELECT query_id, doc_id, CAST(rank AS INT) AS rank, score_x1e6, n_terms_matched
FROM ranked WHERE rank <= {int(k)}
"""
