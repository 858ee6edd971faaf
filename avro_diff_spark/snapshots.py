"""Deterministic old/new snapshot pairs derived from the driver testdata.

The reference's flagship inputs are two versions of the same dataset
(userdata1 vs userdata2; studentAssignments Old vs New). The driver testdata
has no version pairs, so we derive them deterministically from ``orders`` and
``lineitem`` with pure modular-arithmetic predicates — exactly reproducible
in ANSI SQL for the DuckDB oracle, and free of any float rounding hazards
(the only mutation is ``+ 100.0``, which is a deterministic IEEE-754 op in
any engine).

orders snapshots, key = o_orderkey:
- old  = orders where o_orderkey % 5 != 0      (keys %5==0 appear only in new → added)
- new  = orders where o_orderkey % 7 != 0      (keys %7==0 appear only in old → removed)
         with o_totalprice += 100.0 where o_orderkey % 3 == 0  (→ changed)

lineitem snapshots (composite key l_orderkey, l_linenumber) follow the same
pattern with different moduli, and also mutate l_returnflag to exercise a
string-column change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from avro_diff_spark.functions.canonical import ts_micros
from avro_diff_spark.sources.tables import load_table


def orders_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 5 != 0)


def orders_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 != 0)
    return o.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + F.lit(100.0)).otherwise(
            F.col("o_totalprice")
        ),
    )


ORDERS_OLD_SQL = "SELECT * FROM orders WHERE o_orderkey % 5 <> 0"
ORDERS_NEW_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus,
       CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 100.0 ELSE o_totalprice END AS o_totalprice,
       o_orderdate, o_orderpriority
FROM orders WHERE o_orderkey % 7 <> 0
"""


def lineitem_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 4 != 0)


def lineitem_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 9 != 0)
    return li.withColumn(
        "l_returnflag",
        F.when(F.col("l_orderkey") % 6 == 0, F.lit("X")).otherwise(F.col("l_returnflag")),
    )


LINEITEM_OLD_SQL = "SELECT * FROM lineitem WHERE l_orderkey % 4 <> 0"
LINEITEM_NEW_SQL = """
SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
       l_discount, l_tax,
       CASE WHEN l_orderkey % 6 = 0 THEN 'X' ELSE l_returnflag END AS l_returnflag,
       l_linestatus, l_shipdate
FROM lineitem WHERE l_orderkey % 9 <> 0
"""

# Venn inputs: overlapping slices of lineitem with the timestamp column
# projected to epoch micros (venn outputs whole rows; integer micros are
# engine-portable where timestamp rendering is not).
VENN_COLS = (
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_returnflag",
    "l_linestatus",
)


def venn_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 2 == 0)
    return li.select(*VENN_COLS, ts_micros(F.col("l_shipdate")).alias("l_shipdate_us"))


def venn_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 3 == 0)
    return li.select(*VENN_COLS, ts_micros(F.col("l_shipdate")).alias("l_shipdate_us"))


_VENN_SELECT = (
    "SELECT "
    + ", ".join(VENN_COLS)
    + ", epoch_us(l_shipdate) AS l_shipdate_us FROM lineitem WHERE l_orderkey % {m} = 0"
)
VENN_OLD_SQL = _VENN_SELECT.format(m=2)
VENN_NEW_SQL = _VENN_SELECT.format(m=3)


# --------------------------------------------------------------------------
# Array snapshots: per-order quantity arrays (sorted by (linenumber, qty) so
# duplicate linenumbers — the collision fixture — still order
# deterministically). The "new" side mutates quantities of every third
# linenumber, exercising per-index array element diffing.
# --------------------------------------------------------------------------


def lineitem_qty_arrays(spark: SparkSession, sf_dir: str, *, mutate: bool) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty = (
        F.when(F.col("l_linenumber") % 3 == 0, F.col("l_quantity") + 1).otherwise(
            F.col("l_quantity")
        )
        if mutate
        else F.col("l_quantity")
    )
    return (
        li.select(
            "l_orderkey",
            F.struct(F.col("l_linenumber"), qty.alias("q")).alias("s"),
        )
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_list("s")).alias("pairs"))
        .select(
            "l_orderkey",
            F.transform("pairs", lambda x: x.getField("q")).alias("qty_arr"),
        )
    )


# --------------------------------------------------------------------------
# Nested snapshots: orders struct-packed two levels deep, mirroring the
# reference's nested-record fixtures (studentAssignments.submission — SURVEY
# §1.2). Exercises recursive per-leaf diffing: mutations live at depth 1
# (pricing.total) and depth 2 (pricing.meta.o_orderpriority). o_orderdate is
# projected to epoch micros so every leaf is engine-portable.
# --------------------------------------------------------------------------


def _orders_nested(df: DataFrame) -> DataFrame:
    return df.select(
        "o_orderkey",
        F.struct(F.col("o_custkey"), F.col("o_orderstatus")).alias("customer"),
        F.struct(
            F.col("o_totalprice").alias("total"),
            F.struct(
                ts_micros(F.col("o_orderdate")).alias("orderdate_us"),
                F.col("o_orderpriority"),
            ).alias("meta"),
        ).alias("pricing"),
    )


def orders_nested_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _orders_nested(orders_old(spark, sf_dir))


def orders_nested_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = orders_new(spark, sf_dir).withColumn(
        "o_orderpriority",
        F.when(F.col("o_orderkey") % 11 == 0, F.lit("0-RUSH")).otherwise(
            F.col("o_orderpriority")
        ),
    )
    return _orders_nested(o)


ORDERS_NESTED_NEW_FLAT_SQL = f"""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       CASE WHEN o_orderkey % 11 = 0 THEN '0-RUSH' ELSE o_orderpriority END AS o_orderpriority
FROM ({ORDERS_NEW_SQL})
"""


# --------------------------------------------------------------------------
# Dedup corpora: the driver documents/embeddings are all-distinct, so derive
# corpora with known duplicates — exact copies (id+1_000_000) and near
# copies with a trailing-words mutation (id+2_000_000).
# --------------------------------------------------------------------------

NEAR_DUP_SUFFIX = " extra trailing words appended"


def documents_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    exact = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    near = d.filter(F.col("doc_id") % 10 == 1).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(NEAR_DUP_SUFFIX)).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    return d.unionByName(exact).unionByName(near)


DOCUMENTS_WITH_DUPS_SQL = f"""
SELECT doc_id, text, lang, source, n_chars FROM documents
UNION ALL SELECT doc_id + 1000000, text, lang, source, n_chars
  FROM documents WHERE doc_id % 10 = 0
UNION ALL SELECT doc_id + 2000000, text || '{NEAR_DUP_SUFFIX}', lang, source, n_chars
  FROM documents WHERE doc_id % 10 = 1
"""


def documents_with_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents with deterministic synthetic PII appended (the raw corpus
    is PII-free word soup, so redaction needs seeded positives)."""
    d = load_table(spark, sf_dir, "documents")
    email = F.concat(
        F.col("text"), F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com"),
    )
    phone = F.concat(
        F.col("text"), F.lit(" call +1 (555) 010-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    text = (
        F.when(F.col("doc_id") % 7 == 0, email)
        .when(F.col("doc_id") % 11 == 0, phone)
        .otherwise(F.col("text"))
    )
    return d.select("doc_id", text.alias("text"), "lang", "source", "n_chars")


DOCUMENTS_WITH_PII_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 7 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
            WHEN doc_id % 11 = 0
              THEN text || ' call +1 (555) 010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
            ELSE text END AS text,
       lang, source, n_chars
FROM documents
"""


def embeddings_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    dup = e.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label"
    )
    return e.unionByName(dup)


EMBEDDINGS_WITH_DUPS_SQL = """
SELECT vec_id, embedding, label FROM embeddings
UNION ALL SELECT vec_id + 1000000, embedding, label FROM embeddings WHERE vec_id % 10 = 0
"""


# --------------------------------------------------------------------------
# Sparse-change snapshot pair for the digest-diff family: ~1% of orders
# mutated, a handful added/removed — the production re-diff shape (daily
# snapshot vs yesterday's) where merkle bucket pruning pays off because
# most buckets digest-match. Portable projection (integer cents, epoch
# micros) so the per-row md5 digests are bit-identical across engines.
# --------------------------------------------------------------------------

PORTABLE_ORDER_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "cents",
    "od_us",
    "o_orderpriority",
)


def _portable(df: DataFrame) -> DataFrame:
    return df.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        # floor/*/+ are correctly-rounded IEEE ops: identical in any engine
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).alias("cents"),
        ts_micros(F.col("o_orderdate")).alias("od_us"),
        "o_orderpriority",
    )


def orders_sparse_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    # drops keys %101==0 (they appear only in new -> 'added' there)
    return _portable(
        load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 101 != 0)
    )


def orders_sparse_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 103 != 0)
    return _portable(
        o.withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 97 == 0, F.col("o_totalprice") + F.lit(100.0)
            ).otherwise(F.col("o_totalprice")),
        )
    )


_PORTABLE_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus,
       CAST(floor({price} * 100.0 + 0.5) AS BIGINT) AS cents,
       epoch_us(o_orderdate) AS od_us, o_orderpriority
FROM orders WHERE o_orderkey % {drop} <> 0
"""

ORDERS_SPARSE_OLD_SQL = _PORTABLE_SQL.format(price="o_totalprice", drop=101)
ORDERS_SPARSE_NEW_SQL = _PORTABLE_SQL.format(
    price="(CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 100.0 ELSE o_totalprice END)",
    drop=103,
)


def venn_third(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third venn input (n-way venn): the %5 slice overlaps both the %2
    and %3 slices on multiples of 10 and 15, so all 7 regions of the
    3-set diagram are populated."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 5 == 0)
    return li.select(*VENN_COLS, ts_micros(F.col("l_shipdate")).alias("l_shipdate_us"))


VENN_THIRD_SQL = _VENN_SELECT.format(m=5)


# --------------------------------------------------------------------------
# Customer dimension snapshots (incremental join-view fixture): v0 is the
# base dim projected to (key, segment, balance); v1 mutates every 11th
# balance and DELETES every 13th customer — the delete leaves its orders
# dangling, exercising the view-maintenance row-removal path.
# --------------------------------------------------------------------------

def customer_dim_v0(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )


def customer_dim_v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = customer_dim_v0(spark, sf_dir).filter(F.col("c_custkey") % 13 != 0)
    return c.withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 11 == 0, F.col("c_acctbal") + F.lit(50.0)).otherwise(
            F.col("c_acctbal")
        ),
    )


CUSTOMER_DIM_V1_SQL = """
SELECT c_custkey, c_mktsegment,
       CASE WHEN c_custkey % 11 = 0 THEN c_acctbal + 50.0 ELSE c_acctbal END AS c_acctbal
FROM customer WHERE c_custkey % 13 <> 0
"""
