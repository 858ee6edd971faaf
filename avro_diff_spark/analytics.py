"""General analytics queries over the testdata star schema.

The reference has no aggregation/join surface beyond the diff itself
(SURVEY.md §2.5: counting only), but the engine must be a complete analytics
substrate at 100 TB. These queries are the proof points and the bench
headliners. Scale notes per query in docstrings.

Determinism discipline (for the DuckDB oracle's value hash):
- sums over doubles go through exact decimal (order-independent), then cast
  to double at the end — partial-aggregation order can never perturb a bit.
- top-k is taken with an explicit deterministic tie-break key.
- timestamps appear only as epoch micros or truncated epoch buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from avro_diff_spark.functions.canonical import ts_micros  # noqa: F401 (re-export for query authors)
from avro_diff_spark.sources.tables import load_events, load_table


def _floor_us(col, width_us: int):
    """Largest multiple of ``width_us`` <= col — FLOOR, not the
    truncate-toward-zero that ``x - x % w`` gives (Spark and DuckDB %
    both truncate, so a pre-1970 negative epoch would land in the
    bucket ABOVE it — the bucket that does not contain it). pmod is
    non-negative for a positive modulus, so this is exact on the full
    int64 domain; matches what Spark's own window()/date_trunc do and
    keeps the batch plans equal to their streaming twins everywhere."""
    return col - F.pmod(col, F.lit(width_us))


def _floor_us_sql(expr: str, width_us) -> str:
    """DuckDB twin of :func:`_floor_us`."""
    return f"({expr} - ((({expr} % {width_us}) + {width_us}) % {width_us}))"



def _dec_sum(col, scale: int = 4) -> F.Column:
    """Order-independent sum of a double expression via exact decimal."""
    return F.sum(col.cast(f"decimal(30,{scale})")).cast("double")


# The testdata stores money/rates as 2-decimal values in doubles, so casting
# the RAW columns to decimal is exact (≥1e-10 from any rounding boundary).
# All derived arithmetic then happens in exact decimal — never cast a
# computed double to decimal (engines round the binary expansion
# differently at high scales).

def _money(col) -> F.Column:
    return col.cast("decimal(14,2)")


def _rate(col) -> F.Column:
    return col.cast("decimal(4,2)")


def _disc_price() -> F.Column:
    return _money(F.col("l_extendedprice")) * (F.lit(1) - _rate(F.col("l_discount")))


_DISC_PRICE_SQL = "CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"


# --------------------------------------------------------------------------
# pricing summary (TPC-H Q1 shape): scan → partial agg → final agg.
# At 100 TB: no join, map-side combine does almost all the work; the shuffle
# carries |returnflag × linestatus| groups per partition — trivially small.
# --------------------------------------------------------------------------

def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _disc_price()
    charge = disc_price * (F.lit(1) + _rate(F.col("l_tax")))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_money(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            F.sum(_money(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
  count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# shipping priority (TPC-H Q3 shape): selective filters pushed to scans,
# two joins, top-k. At 100 TB: customer filter prunes early; orders⋈lineitem
# shuffles on orderkey; AQE broadcasts the filtered customer side.
# --------------------------------------------------------------------------

def top_revenue_orders(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
    )
    rev = (
        joined.groupBy("o_orderkey", "o_orderpriority")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )
    # Global top-k via orderBy+limit, NOT a row_number window over an empty
    # partition spec: Spark plans this as TakeOrderedAndProject — each task
    # keeps its local k, the driver merges k-per-partition. A global window
    # would shuffle every aggregated row into ONE partition (WindowExec
    # warns about exactly this), which dies at 100 TB.
    return (
        rev.orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(k)
        .select("o_orderkey", "o_orderpriority", "revenue")
    )


TOP_REVENUE_ORDERS_SQL = """
WITH rev AS (
  SELECT o_orderkey, o_orderpriority,
    CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
  GROUP BY o_orderkey, o_orderpriority
)
SELECT o_orderkey, o_orderpriority, revenue FROM (
  SELECT *, row_number() OVER (ORDER BY revenue DESC, o_orderkey ASC) AS rn FROM rev
) WHERE rn <= 10
"""


# --------------------------------------------------------------------------
# region revenue (TPC-H Q5 shape): star join over 5 tables. At 100 TB the
# dims (region/nation/supplier/customer) are broadcast; only
# orders⋈lineitem shuffles.
# --------------------------------------------------------------------------

def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dims = (
        cust.join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(dims), orders["o_custkey"] == dims["c_custkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


REGION_REVENUE_SQL = """
SELECT r_name, n_name,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
  count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# --------------------------------------------------------------------------
# supplier/part profit (TPC-H Q9 shape): fact ⋈ 3 broadcast dims → two-key
# agg. At 100 TB the only shuffle is the final (n_name, p_brand) aggregate —
# part/supplier/nation broadcast, and the p_size predicate pushes into the
# part scan before the broadcast is built.
# --------------------------------------------------------------------------

def supplier_part_profit(spark: SparkSession, sf_dir: str, max_size: int = 25) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= max_size)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    j = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
    )
    # profit = discounted revenue − retail cost of the shipped quantity;
    # all arithmetic in exact decimal (see module note on double hazards)
    profit = _disc_price() - _money(F.col("p_retailprice")) * F.col(
        "l_quantity"
    ).cast("decimal(14,2)")
    return (
        j.groupBy("n_name", "p_brand")
        .agg(
            F.sum(profit).cast("double").alias("profit"),
            _dec_sum(F.col("l_quantity"), 2).alias("total_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SUPPLIER_PART_PROFIT_SQL = """
SELECT n_name, p_brand,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
           - CAST(p_retailprice AS DECIMAL(14,2)) * CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS profit,
  CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS total_qty,
  count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_size <= 25
GROUP BY n_name, p_brand
"""


# --------------------------------------------------------------------------
# per-segment customer ranking: window functions (rank within partition).
# At 100 TB: single shuffle on the partition key; no global sort.
# --------------------------------------------------------------------------

def top_customers_by_segment(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    spend = (
        orders.groupBy("o_custkey")
        .agg(_dec_sum(F.col("o_totalprice")).alias("total_spend"), F.count(F.lit(1)).alias("n_orders"))
    )
    j = cust.join(spend, cust["c_custkey"] == spend["o_custkey"])
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("total_spend").desc(), F.col("c_custkey").asc()
    )
    return (
        j.withColumn("seg_rank", F.row_number().over(w))
        .filter(F.col("seg_rank") <= k)
        .select("c_mktsegment", "seg_rank", "c_custkey", "total_spend", "n_orders")
    )


TOP_CUSTOMERS_BY_SEGMENT_SQL = """
WITH spend AS (
  SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE) AS total_spend,
         count(*) AS n_orders
  FROM orders GROUP BY o_custkey
)
SELECT c_mktsegment, seg_rank, c_custkey, total_spend, n_orders FROM (
  SELECT c_mktsegment, c_custkey, total_spend, n_orders,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY total_spend DESC, c_custkey ASC) AS seg_rank
  FROM customer JOIN spend ON c_custkey = o_custkey
) WHERE seg_rank <= 5
"""


# --------------------------------------------------------------------------
# event-time tumbling window aggregation (batch form; the streaming twin
# lives in avro_diff_spark.streaming). Bucket arithmetic on epoch micros is
# engine-portable; at 100 TB this is a pure map-side bucket + agg shuffle.
# --------------------------------------------------------------------------

def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    hour_us = 3_600_000_000
    us = F.col("ts_us")
    bucket = _floor_us(us, hour_us)  # exact floor: engine-portable, sign-safe
    return (
        ev.groupBy(bucket.alias("window_start_us"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dec_sum(F.col("value")).alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .drop("approx_users")  # approx sketch is not oracle-stable; kept out of the contract
    )


EVENTS_HOURLY_SQL = f"""
SELECT {_floor_us_sql('epoch_us(ts)', 3600000000)} AS window_start_us, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# conversion funnel: furthest ORDERED stage reached per user. One shuffle on
# user_id, then a per-user sort-fold over the event sequence — no
# self-joins, no inequality joins, O(events-per-user) state. The fold is a
# pure array expression mirrored by DuckDB's list_reduce, so the oracle is
# exact.
# --------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_stages(
    spark: SparkSession,
    sf_dir: str,
    steps: tuple[str, ...] = FUNNEL_STEPS,
    first_n: int = 8,
) -> DataFrame:
    """Users by furthest funnel stage reached IN ORDER within their first
    ``first_n`` events (the early-journey conversion question — unbounded
    history trivially converts everyone on a long-lived product).

    Columns: funnel_stage (0 = none of step 1, len(steps) = full
    conversion), n_users.
    """
    ev = load_events(spark, sf_dir)
    code = F.lit(0)
    for i, s in enumerate(steps):
        code = F.when(F.col("event_type") == s, F.lit(i + 1)).otherwise(code)
    per_user = (
        ev.select("user_id", F.col("ts_us"), code.alias("code"))
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list(F.struct("ts_us", "code"))).alias("evs"))
    )

    def step(acc, e):
        out = acc
        for i in range(len(steps)):
            out = F.when((acc == i) & (e.getField("code") == i + 1), F.lit(i + 1)).otherwise(out)
        return out

    stage = F.aggregate(F.slice(F.col("evs"), 1, first_n), F.lit(0), step)
    return (
        per_user.select(stage.alias("funnel_stage"))
        .groupBy("funnel_stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def _funnel_sql(steps: tuple[str, ...] = FUNNEL_STEPS, first_n: int = 8) -> str:
    code = "CASE " + " ".join(
        f"WHEN event_type = '{s}' THEN {i + 1}" for i, s in enumerate(steps)
    ) + " ELSE 0 END"
    fold = "acc"
    # build the same WHEN chain the Spark fold uses (applied innermost-out)
    for i in range(len(steps) - 1, -1, -1):
        fold = f"CASE WHEN acc = {i} AND x = {i + 1} THEN {i + 1} ELSE {fold} END"
    return f"""
WITH coded AS (
  SELECT user_id, epoch_us(ts) AS ts_us, {code} AS code FROM events
),
per_user AS (
  SELECT user_id, list(code ORDER BY ts_us, code) AS codes FROM coded GROUP BY user_id
),
staged AS (
  SELECT list_reduce(list_prepend(0, codes[1:{first_n}]), (acc, x) -> {fold}) AS funnel_stage
  FROM per_user
)
SELECT funnel_stage, count(*) AS n_users FROM staged GROUP BY funnel_stage
"""


FUNNEL_STAGES_SQL = _funnel_sql()


# --------------------------------------------------------------------------
# retention cohorts: users grouped by signup week, activity counted per
# week-offset since signup. Two shuffles (per-user signup agg, cohort-cell
# distinct-count agg); the signup side joins back by user_id — at 100 TB
# both sides are already hashed on user_id so AQE reuses the layout.
# --------------------------------------------------------------------------

_WEEK_US = 7 * 24 * 3_600_000_000



def retention_cohorts(
    spark: SparkSession, sf_dir: str, max_week_offset: int = 7
) -> DataFrame:
    """Distinct active users per (signup-cohort week, weeks since signup).

    Columns: cohort_week_us (epoch micros of the cohort's week bucket),
    week_offset (0..max), n_active_users.
    """
    ev = load_events(spark, sf_dir)
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("signup_us"))
    )
    j = ev.select("user_id", "ts_us").join(signups, "user_id")
    # floor, not cast-truncate: events BEFORE signup give negative offsets,
    # and truncation would fold (-1 week, 0) onto offset 0 (diffs < 2^53,
    # so the double division is exact enough for floor to agree with SQL)
    off = F.floor((F.col("ts_us") - F.col("signup_us")) / F.lit(_WEEK_US)).cast("long")
    cohort = _floor_us(F.col("signup_us"), _WEEK_US)
    return (
        j.select(cohort.alias("cohort_week_us"), off.alias("week_offset"), "user_id")
        .filter((F.col("week_offset") >= 0) & (F.col("week_offset") <= max_week_offset))
        .groupBy("cohort_week_us", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_active_users"))
    )


RETENTION_COHORTS_SQL = f"""
WITH signups AS (
  SELECT user_id, min(epoch_us(ts)) AS signup_us
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
j AS (
  SELECT e.user_id,
         {_floor_us_sql('s.signup_us', _WEEK_US)} AS cohort_week_us,
         CAST(floor((epoch_us(e.ts) - s.signup_us) / {_WEEK_US}) AS BIGINT) AS week_offset
  FROM events e JOIN signups s USING (user_id)
)
SELECT cohort_week_us, week_offset, count(DISTINCT user_id) AS n_active_users
FROM j WHERE week_offset BETWEEN 0 AND 7
GROUP BY cohort_week_us, week_offset
"""


# --------------------------------------------------------------------------
# gap-based sessionization: lag + conditional cumsum windows. The streaming
# twin (applyInPandasWithState) lives in avro_diff_spark.streaming. At
# 100 TB: one shuffle on user_id; windows evaluate within partitions.
# --------------------------------------------------------------------------

def sessionize(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    ev = load_events(spark, sf_dir)
    gap_us = gap_minutes * 60_000_000
    us = F.col("ts_us")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    with_gap = ev.select(
        "user_id",
        "event_id",
        us.alias("ts_us"),
        F.when(
            (us - F.lag(us).over(w)) > gap_us, F.lit(1)
        ).otherwise(F.lit(0)).alias("is_new"),
    )
    wsum = Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = with_gap.withColumn("session_seq", F.sum("is_new").over(wsum))
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
        )
    )


SESSIONIZE_SQL = """
WITH g AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
              (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) > 1800000000
         THEN 1 ELSE 0 END AS is_new
  FROM events
), s AS (
  SELECT user_id, ts_us,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_seq
  FROM g
)
SELECT user_id, session_seq, count(*) AS n_events,
       min(ts_us) AS session_start_us, max(ts_us) AS session_end_us
FROM s GROUP BY user_id, session_seq
"""

def asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every ``error`` event, the user's latest preceding (or same-
    instant) non-error event — classic last-touch attribution, built on the
    scalable union+window :func:`avro_diff_spark.operators.asof.asof_join`.
    """
    from avro_diff_spark.operators.asof import asof_join

    ev = load_events(spark, sf_dir).select(
        "event_id", "user_id", "ts_us", "event_type", "value"
    )
    probes = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts_us"
    )
    quotes = ev.filter(F.col("event_type") != "error")
    return asof_join(
        probes,
        quotes,
        on="user_id",
        ts="ts_us",
        seq="event_id",
        quote_cols=["event_id", "ts_us", "event_type", "value"],
    )


# row_number formulation (not DuckDB's ASOF keyword) so the equal-ts
# tie-break — highest quote event_id wins — is pinned identically.
ASOF_ATTRIBUTION_SQL = """
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value FROM events
),
p AS (SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'error'),
q AS (SELECT * FROM ev WHERE event_type <> 'error'),
j AS (
  SELECT p.event_id,
         q.event_id AS last_event_id, q.ts_us AS last_ts_us,
         q.event_type AS last_event_type, q.value AS last_value,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY q.ts_us DESC, q.event_id DESC) AS rn
  FROM p JOIN q ON q.user_id = p.user_id AND q.ts_us <= p.ts_us
)
SELECT p.event_id, p.user_id, p.ts_us,
       j.last_event_id, j.last_ts_us, j.last_event_type, j.last_value
FROM p LEFT JOIN (SELECT * FROM j WHERE rn = 1) j ON p.event_id = j.event_id
"""

def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity time rollup (hypertable-style): one pass emits
    (day, hour)-level, day-level, and grand-total aggregates via
    ``rollup`` — Spark plans a single shuffle with partial aggregation
    instead of three separate scans. ``lvl`` (grouping id) disambiguates an
    aggregated-out level from a genuinely-null key."""
    ev = load_events(spark, sf_dir)
    day_us, hour_us = 86_400_000_000, 3_600_000_000
    us = F.col("ts_us")
    d = _floor_us(us, day_us).alias("day_us")
    h = _floor_us(us, hour_us).alias("hour_us")
    return (
        ev.select(d, h, "value")
        .rollup("day_us", "hour_us")
        .agg(
            F.grouping_id().alias("lvl"),
            F.count(F.lit(1)).alias("n_events"),
            _dec_sum(F.col("value")).alias("sum_value"),
        )
    )


EVENTS_ROLLUP_SQL = f"""
SELECT day_us, hour_us,
       CAST(grouping(day_us) * 2 + grouping(hour_us) AS BIGINT) AS lvl,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sum_value
FROM (
  SELECT {_floor_us_sql('epoch_us(ts)', 86400000000)} AS day_us,
         {_floor_us_sql('epoch_us(ts)', 3600000000)} AS hour_us,
         value
  FROM events
) GROUP BY ROLLUP (day_us, hour_us)
"""


def interval_join_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which purchases landed inside a MULTI-EVENT session? —
    the point-in-interval join (operators/interval.py): purchase events
    against per-user session windows derived by :func:`sessionize`.
    Spark's native plan for ``ts BETWEEN start AND end`` is a nested
    loop; here intervals explode to their covered 30-minute buckets and
    the join is a plain (user_id, bucket) equi-join + one residual
    comparison — plan-gated like every other query. The oracle is the
    INDEPENDENT formulation (DuckDB's native inequality join), so the
    bucketing mechanics are verified against the pure semantics."""
    from avro_diff_spark.operators.interval import interval_join

    ev = load_events(spark, sf_dir)
    busy = sessionize(spark, sf_dir).where(F.col("n_events") >= 2)
    pts = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    out = interval_join(
        pts,
        busy.select("user_id", "session_seq", "session_start_us", "session_end_us"),
        point_col="ts_us",
        start_col="session_start_us",
        end_col="session_end_us",
        bucket_width=1_800_000_000,  # 30 min — the session gap scale
        keys=["user_id"],
    )
    return out.select("event_id", "user_id", "session_seq", "ts_us").orderBy(
        "event_id"
    )


INTERVAL_JOIN_PURCHASES_SQL = f"""
WITH sess AS ({SESSIONIZE_SQL.strip()})
SELECT e.event_id, e.user_id, s.session_seq, epoch_us(e.ts) AS ts_us
FROM events e JOIN sess s
  ON e.user_id = s.user_id
 AND epoch_us(e.ts) BETWEEN s.session_start_us AND s.session_end_us
WHERE e.event_type = 'purchase' AND s.n_events >= 2
ORDER BY event_id
"""


def concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which multi-event sessions of DIFFERENT users overlapped in time,
    and for how long? — the interval-OVERLAP join
    (operators/interval.py ``overlap_join``), here in its harder UNKEYED
    form: every session explodes to its covered 30-minute buckets, the
    self-join runs on the bucket alone (plain equi-join — the raw
    pairwise formulation is a nested loop), the max-start-bucket rule
    emits each pair once, and ``user_a < user_b`` keeps one ordered row
    per pair. The oracle is DuckDB's native inequality join — an
    independent formulation verifying the banding against pure overlap
    semantics."""
    from avro_diff_spark.operators.interval import overlap_join

    sess = sessionize(spark, sf_dir).where(F.col("n_events") >= 2)
    a = sess.select(
        F.col("user_id").alias("user_a"),
        F.col("session_seq").alias("seq_a"),
        F.col("session_start_us").alias("lo_a"),
        F.col("session_end_us").alias("hi_a"),
    )
    b = sess.select(
        F.col("user_id").alias("user_b"),
        F.col("session_seq").alias("seq_b"),
        F.col("session_start_us").alias("lo_b"),
        F.col("session_end_us").alias("hi_b"),
    )
    out = overlap_join(
        a,
        b,
        left_start="lo_a",
        left_end="hi_a",
        right_start="lo_b",
        right_end="hi_b",
        bucket_width=1_800_000_000,
    ).where(F.col("user_a") < F.col("user_b"))
    return out.select(
        "user_a",
        "seq_a",
        "user_b",
        "seq_b",
        (
            F.least(F.col("hi_a"), F.col("hi_b"))
            - F.greatest(F.col("lo_a"), F.col("lo_b"))
        ).alias("overlap_us"),
    ).orderBy("user_a", "seq_a", "user_b", "seq_b")


CONCURRENT_SESSIONS_SQL = f"""
WITH sess AS ({SESSIONIZE_SQL.strip()})
SELECT a.user_id AS user_a, a.session_seq AS seq_a,
       b.user_id AS user_b, b.session_seq AS seq_b,
       least(a.session_end_us, b.session_end_us)
         - greatest(a.session_start_us, b.session_start_us) AS overlap_us
FROM sess a JOIN sess b
  ON a.user_id < b.user_id
 AND a.session_start_us <= b.session_end_us
 AND b.session_start_us <= a.session_end_us
WHERE a.n_events >= 2 AND b.n_events >= 2
ORDER BY user_a, seq_a, user_b, seq_b
"""


def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly per-type series with GAP FILLING — the timescale
    ``time_bucket_gapfill`` + LOCF surface every time-series store
    exposes and plain GROUP BY cannot produce (an hour with no events
    yields no group): generate each type's full observed hour range with
    ``sequence``+``explode``, left-join the sparse hourly counts, and
    emit zero-filled and last-observation-carried-forward columns.

    Scale shape: the sparse aggregate is one shuffle with map-side
    combine; the dense axis explodes from a groups-sized bounds table
    (rows = types x hours-in-range, never a function of event count);
    the LOCF window partitions BY SERIES KEY, so at 100 TB with millions
    of entities every partition is one series, not one global funnel —
    the plan gate rejects unpartitioned windows. Integer hour buckets
    (epoch micros), integer counts: engine-portable, no timestamp or
    float drift."""
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir)
    hour_us = 3_600_000_000
    us = F.col("ts_us")
    hourly = (
        ev.select("event_type", _floor_us(us, hour_us).alias("hour_us"))
        .groupBy("event_type", "hour_us")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("hour_us").alias("lo"), F.max("hour_us").alias("hi")
    )
    hours = bounds.select(
        "event_type",
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.lit(hour_us))
        ).alias("hour_us"),
    )
    full = hours.join(hourly, ["event_type", "hour_us"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return full.select(
        "event_type",
        "hour_us",
        F.coalesce("n_events", F.lit(0)).alias("n_filled"),
        F.last("n_events", ignorenulls=True).over(w).alias("n_locf"),
        F.col("n_events").isNull().alias("gap"),
    )


EVENTS_GAPFILL_SQL = f"""
WITH hourly AS (
  SELECT event_type, {_floor_us_sql('epoch_us(ts)', 3600000000)} AS hour_us,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT event_type, min(hour_us) AS lo, max(hour_us) AS hi
           FROM hourly GROUP BY event_type),
hours AS (SELECT event_type, unnest(generate_series(lo, hi, 3600000000)) AS hour_us
          FROM bounds),
dense AS (SELECT hours.event_type, hours.hour_us, hourly.n_events
          FROM hours LEFT JOIN hourly USING (event_type, hour_us))
SELECT event_type, hour_us,
       coalesce(n_events, 0) AS n_filled,
       last_value(n_events IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY hour_us
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_locf,
       n_events IS NULL AS gap
FROM dense
"""


# --------------------------------------------------------------------------
# round 10: sliding (hopping) windows, MAD anomaly flags, pivot, skew-salted
# join, and a data-quality expectation report.
# --------------------------------------------------------------------------

_SLIDE_US = 900_000_000  # 15 min
_WIN_US = 3_600_000_000  # 1 h window = 4 slides


def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window aggregation (1 h windows sliding every 15 min) —
    the overlapping-window surface Structured Streaming's ``window(ts,
    '1 hour', '15 minutes')`` exposes, here as an explicit batch plan:
    each event explodes to the window/slide = 4 windows containing it
    (``window_start = floor(ts/slide)*slide - k*slide``; every k in
    [0, 4) is containing by construction, so no residual filter), then
    ONE groupBy on (window_start, event_type) with map-side combine.

    Scale shape: shuffle rows = 4x events with full partial aggregation
    — the same cost law as Spark's own sliding ``window()`` operator
    (which physically plans this exact Expand + HashAggregate). Integer
    epoch-micro buckets and exact-decimal sums keep the oracle
    bit-stable."""
    ev = load_events(spark, sf_dir)
    us = F.col("ts_us")
    base = _floor_us(us, _SLIDE_US)
    k = F.explode(F.sequence(F.lit(0), F.lit(_WIN_US // _SLIDE_US - 1)))
    return (
        ev.select("event_type", "value", base.alias("__b"), k.alias("__k"))
        .select(
            "event_type",
            "value",
            (
                F.col("__b") - F.col("__k").cast("long") * F.lit(_SLIDE_US).cast("long")
            ).alias("window_start_us"),
        )
        .groupBy("window_start_us", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dec_sum(F.col("value")).alias("sum_value"),
        )
    )


EVENTS_SLIDING_SQL = f"""
SELECT {_floor_us_sql('epoch_us(ts)', _SLIDE_US)} - k * {_SLIDE_US} AS window_start_us,
       event_type, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sum_value
FROM events
CROSS JOIN (SELECT unnest(generate_series(0, {_WIN_US // _SLIDE_US - 1})) AS k) ks
GROUP BY 1, 2
"""


def events_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust time-series anomaly flags: hours whose event count
    deviates from the series median by more than 3x the median absolute
    deviation (the median/MAD rule — outlier-proof where mean/stddev is
    not, and the standard first-pass monitor on pipeline volumes).

    Exactness across engines: counts are integers; a median over
    integers is x.0 or x.5 (the average of two middle values) and a MAD
    over those deviations a multiple of 0.25 — every value and every
    ``dev > 3*mad`` comparison is an exactly-representable binary
    fraction, so Spark's ``percentile`` and DuckDB's ``median``
    hash-identically. Scale shape: the series aggregate is one shuffle
    with map-side combine; medians reduce per SERIES KEY (never a
    global sort); the stats frames are groups-sized and broadcast back
    onto the hourly frame."""
    ev = load_events(spark, sf_dir)
    hour_us = 3_600_000_000
    us = F.col("ts_us")
    hourly = (
        ev.select("event_type", _floor_us(us, hour_us).alias("hour_us"))
        .groupBy("event_type", "hour_us")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    med = hourly.groupBy("event_type").agg(
        F.percentile("n_events", 0.5).alias("med")
    )
    dev = hourly.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("n_events") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.percentile("dev", 0.5).alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("dev") > F.lit(3.0) * F.col("mad"))
        .select("event_type", "hour_us", "n_events", "med", "mad", "dev")
    )


EVENTS_ANOMALIES_SQL = f"""
WITH hourly AS (
  SELECT event_type, {_floor_us_sql('epoch_us(ts)', 3600000000)} AS hour_us,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
),
med AS (SELECT event_type, median(n_events) AS med FROM hourly GROUP BY 1),
dev AS (SELECT h.event_type, hour_us, n_events, med,
               abs(n_events - med) AS dev
        FROM hourly h JOIN med USING (event_type)),
mad AS (SELECT event_type, median(dev) AS mad FROM dev GROUP BY 1)
SELECT d.event_type, hour_us, n_events, d.med, m.mad, d.dev
FROM dev d JOIN mad m USING (event_type)
WHERE d.dev > 3 * m.mad
"""


#: pivot columns are DECLARED, not discovered: an undeclared pivot runs a
#: distinct-values job first and can explode to millions of columns on
#: dirty data — the fixed vocabulary keeps the plan one aggregation.
PIVOT_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity matrix: one row per user, one count column per
    DECLARED event type (``pivot`` with an explicit value list). Scale
    shape: a single groupBy(user) aggregation — the pivot lowers to one
    conditional count per declared type inside the same HashAggregate
    (map-side combine included), never a per-type shuffle or a
    distinct-values pre-job."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(PIVOT_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .fillna(0, subset=list(PIVOT_EVENT_TYPES))
    )


EVENTS_PIVOT_SQL = f"""
SELECT user_id,
  {", ".join(
      'count(*) FILTER (WHERE event_type = ' + f"'{t}'" + f') AS "{t}"'
      for t in PIVOT_EVENT_TYPES
  )}
FROM events GROUP BY user_id
"""


def salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority through a SKEW-SALTED orders⋈lineitem
    join (operators/skew.py): lineitem rows carry a deterministic salt,
    orders replicate across 8 salt slots, and the join runs on
    (orderkey, salt) — per-reducer input for any hot orderkey is bounded
    by its rows / 8. Result is row-identical to the plain equi-join (the
    oracle IS the plain join), which is the operator's contract."""
    from avro_diff_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "okey"
    )
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "okey"
    )
    joined = salted_join(li, orders.select("okey", "o_orderpriority"), "okey", salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.sum(_disc_price()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


SALTED_JOIN_REVENUE_SQL = """
SELECT o_orderpriority,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
  count(*) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite over ``lineitem`` — the
    Deequ/Great-Expectations report shape: each rule emits one row
    (rule, violations, n_checked). Row-level rules (not-null, range,
    accepted set) fold into ONE conditional-aggregation scan;
    uniqueness is the same scan's ``count - count(distinct key)``;
    referential integrity is one anti-join counted. The testdata's
    deliberately duplicated ``(l_orderkey, l_linenumber)`` (the
    collision fixture, TESTDATA.md) keeps the report non-vacuous.

    Scale shape: the scan rules cost one map-side-combined pass no
    matter how many rules; the distinct and the anti-join each shuffle
    on the checked key — at 100 TB you run the scan rules always and
    the key rules on a schedule. Output is a handful of rows."""
    from avro_diff_spark.operators.quality import expectation_report

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return expectation_report(
        li,
        violations={
            "not_null_shipdate": F.col("l_shipdate").isNull(),
            "discount_range": ~(
                (F.col("l_discount") >= 0.0) & (F.col("l_discount") <= 0.1)
            ),
            "returnflag_set": ~F.col("l_returnflag").isin("A", "N", "R"),
        },
        unique={"unique_order_line": ["l_orderkey", "l_linenumber"]},
        fk={"fk_orderkey_in_orders": (orders, "l_orderkey", "o_orderkey")},
    )


DQ_EXPECTATIONS_SQL = """
SELECT 'not_null_shipdate' AS rule,
       count(*) FILTER (WHERE l_shipdate IS NULL) AS violations,
       count(*) AS n_checked FROM lineitem
UNION ALL
SELECT 'discount_range',
       count(*) FILTER (WHERE NOT (l_discount >= 0.0 AND l_discount <= 0.1)),
       count(*) FROM lineitem
UNION ALL
SELECT 'returnflag_set',
       count(*) FILTER (WHERE l_returnflag NOT IN ('A','N','R')),
       count(*) FROM lineitem
UNION ALL
SELECT 'unique_order_line',
       count(*) - count(DISTINCT (l_orderkey, l_linenumber)),
       count(*) FROM lineitem
UNION ALL
SELECT 'fk_orderkey_in_orders',
       (SELECT count(*) FROM lineitem
        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
       count(*) FROM lineitem
"""


def scd2_user_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build (operators/scd.py) over the event
    stream: each user's event_type observations collapse into validity
    intervals — one row per genuine transition with half-open
    valid_from/valid_to epoch-micro bounds and a per-user change
    ordinal. The longitudinal generalization of the reference's
    two-snapshot diff: EVERY transition, timestamped. One shuffle on
    user_id; all windows partitioned by key (plan-gated)."""
    from avro_diff_spark.operators.scd import scd2_build

    ev = load_events(spark, sf_dir).select("user_id", "ts_us", "event_type")
    return scd2_build(ev, key="user_id", ts="ts_us", tracked=["event_type"]).select(
        "user_id",
        "event_type",
        F.col("valid_from").alias("valid_from_us"),
        F.col("valid_to").alias("valid_to_us"),
        "version",
    )


SCD2_USER_STATES_SQL = """
WITH obs AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events
),
runs AS (
  -- Run-start detection mirrors the Spark scd2_build formulation
  -- (row_number() = 1, NULLS FIRST ordering) so a NULL ts_us or NULL
  -- event_type cannot make the engines diverge: lag(ts_us) IS NULL
  -- would also fire on a genuine NULL timestamp mid-partition.
  SELECT user_id, ts_us, event_type,
    CASE WHEN row_number() OVER w = 1 THEN 1
         WHEN event_type IS NOT DISTINCT FROM lag(event_type) OVER w THEN 0
         ELSE 1 END AS chg
  FROM obs
  WINDOW w AS (PARTITION BY user_id
               ORDER BY ts_us ASC NULLS FIRST, event_type ASC NULLS FIRST)
),
vers AS (
  SELECT user_id, ts_us, event_type, chg,
    CAST(sum(chg) OVER (PARTITION BY user_id
                   ORDER BY ts_us ASC NULLS FIRST, event_type ASC NULLS FIRST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
  FROM runs
)
SELECT user_id, event_type, ts_us AS valid_from_us,
       lead(ts_us) OVER (PARTITION BY user_id ORDER BY version) AS valid_to_us,
       version
FROM vers WHERE chg = 1
"""


_DEBOUNCE_US = 300_000_000  # 5 min


def events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounced event counts: an event is a BOUNCE (client retry,
    double-click, duplicate delivery) when the same user emitted the
    same event type within the preceding 5 minutes; the report counts
    kept vs bounced per type. One ``lag`` window partitioned by
    (user_id, event_type) — the keyed-window shape that stays one tiny
    partition per entity at 100 TB (streaming twin:
    dropDuplicatesWithinWatermark)."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts_us").asc(), F.col("event_id").asc()
    )
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    bounced = gap.isNotNull() & (gap < F.lit(_DEBOUNCE_US))
    return (
        ev.select("event_type", bounced.alias("__b"))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(~F.col("__b"), 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("__b"), 1).otherwise(0)).alias("n_bounced"),
        )
    )


EVENTS_DEBOUNCE_SQL = f"""
WITH g AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type
           ORDER BY epoch_us(ts), event_id) AS gap
  FROM events
)
SELECT event_type,
       count(*) FILTER (WHERE gap IS NULL OR gap >= {_DEBOUNCE_US}) AS n_kept,
       count(*) FILTER (WHERE gap < {_DEBOUNCE_US}) AS n_bounced
FROM g GROUP BY event_type
"""


DRIFT_CUTS = (50000.0, 100000.0, 150000.0, 200000.0, 250000.0, 300000.0, 400000.0)


def drift_totalprice_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample drift check (functions/drift.py): exact total-variation
    distance between the finished ('F') and open ('O') order-value
    distributions over a declared bucketing — the monitoring primitive a
    training pipeline runs corpus-over-corpus. One union scan + one
    bucket-keyed hash aggregate (map-side combined, <= 9 shuffle rows per
    partition) + a single-row decimal fold; the lone double op is the
    final correctly-rounded divide, so the DuckDB twin matches exactly."""
    from avro_diff_spark.functions.drift import tv_distance

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return tv_distance(
        o.where(F.col("o_orderstatus") == "F"),
        o.where(F.col("o_orderstatus") == "O"),
        "o_totalprice",
        DRIFT_CUTS,
    )


def _drift_sql() -> str:
    from avro_diff_spark.functions.drift import tv_distance_sql

    return tv_distance_sql(
        "(SELECT o_totalprice FROM orders WHERE o_orderstatus = 'F')",
        "(SELECT o_totalprice FROM orders WHERE o_orderstatus = 'O')",
        "o_totalprice",
        DRIFT_CUTS,
    )


DRIFT_TOTALPRICE_SQL = _drift_sql()


def drift_lang_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical drift (functions/drift.py): exact total-variation
    distance between the LANGUAGE mixes of two corpus halves — the
    "did the language mix shift corpus-over-corpus?" monitor, buckets =
    the observed categories themselves (state one row per language,
    NULL its own category)."""
    from avro_diff_spark.functions.drift import tv_distance_categorical

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return tv_distance_categorical(
        d.where(F.col("doc_id") % 2 == 0),
        d.where(F.col("doc_id") % 2 == 1),
        "lang",
    )


def _drift_lang_sql() -> str:
    from avro_diff_spark.functions.drift import tv_distance_categorical_sql

    return tv_distance_categorical_sql(
        "(SELECT lang FROM documents WHERE doc_id % 2 = 0)",
        "(SELECT lang FROM documents WHERE doc_id % 2 = 1)",
        "lang",
    )


DRIFT_LANG_SQL = _drift_lang_sql()


def drift_price_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group drift (functions/drift.py ``tv_distance_by``): the
    finished-vs-open order-value TVD computed PER PRIORITY CLASS — the
    "which slice drifted?" monitor that localizes a corpus shift to its
    source instead of reporting one global number. One (group, bucket)
    aggregate, per-group totals joined back on the group key, one
    group-keyed numerator aggregate; buckets stay distributed, no
    windows, no collects."""
    from avro_diff_spark.functions.drift import tv_distance_by

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return tv_distance_by(
        o.where(F.col("o_orderstatus") == "F"),
        o.where(F.col("o_orderstatus") == "O"),
        "o_totalprice",
        DRIFT_CUTS,
        ["o_orderpriority"],
    )


def _drift_by_sql() -> str:
    from avro_diff_spark.functions.drift import tv_distance_by_sql

    return tv_distance_by_sql(
        "(SELECT o_orderpriority, o_totalprice FROM orders WHERE o_orderstatus = 'F')",
        "(SELECT o_orderpriority, o_totalprice FROM orders WHERE o_orderstatus = 'O')",
        "o_totalprice",
        DRIFT_CUTS,
        ["o_orderpriority"],
    )


DRIFT_BY_PRIORITY_SQL = _drift_by_sql()


def drift_ks_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Kolmogorov-Smirnov drift (functions/drift.py
    ``ks_distance_by``): the finished-vs-open order-value sup-CDF
    distance PER PRIORITY CLASS. Unlike the recorded global KS (whose
    bounded offsets are driver literals), the per-group prefix offsets
    come from a window PARTITIONED BY GROUP over the groups x buckets
    aggregate — no driver collect; every window keyed."""
    from avro_diff_spark.functions.drift import ks_distance_by

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return ks_distance_by(
        o.where(F.col("o_orderstatus") == "F"),
        o.where(F.col("o_orderstatus") == "O"),
        "o_totalprice",
        ["o_orderpriority"],
    )


def _drift_ks_by_sql() -> str:
    from avro_diff_spark.functions.drift import ks_distance_by_sql

    return ks_distance_by_sql(
        "(SELECT o_orderpriority, o_totalprice FROM orders WHERE o_orderstatus = 'F')",
        "(SELECT o_orderpriority, o_totalprice FROM orders WHERE o_orderstatus = 'O')",
        "o_totalprice",
        ["o_orderpriority"],
    )


DRIFT_KS_BY_PRIORITY_SQL = _drift_ks_by_sql()


def weighted_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED sampling (functions/sketches.py
    ``priority_sample`` — Duffield-Lund-Thorup priority sampling, the
    engine's weighted reservoir): draw 200 orders with probability
    scaled by order value (exact integer cents, the snapshots.py money
    law) using md5-derived fixed-point tags — no ``rand()``, so every
    engine/partitioning/run draws the same sample — then report the
    per-priority-class composition of the draw. Completes the sampling
    family (split/stratify/bottom-k uniform/mixture) with the
    value-weighted member a mixture builder needs. Plans as
    TakeOrdered: per-partition top-k + a k-row merge, the mergeability
    the pytest property pins."""
    from avro_diff_spark.functions.sketches import priority_sample

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    s = priority_sample(
        o.withColumn("w_cents", cents),
        "o_orderkey",
        "w_cents",
        k=200,
        keep=["o_orderpriority"],
    )
    return s.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("w").alias("w_sum"),
    )


def _weighted_sample_sql() -> str:
    from avro_diff_spark.functions.sketches import priority_sample_sql

    inner = priority_sample_sql(
        "(SELECT o_orderkey, o_orderpriority,"
        " CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS w_cents FROM orders)",
        "o_orderkey",
        "w_cents",
        k=200,
        keep="o_orderpriority",
    )
    return f"""
SELECT o_orderpriority, count(*)::BIGINT AS n_sampled,
       CAST(sum(w) AS BIGINT) AS w_sum
FROM ({inner})
GROUP BY o_orderpriority
"""


WEIGHTED_SAMPLE_SQL = _weighted_sample_sql()


def drift_ks_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift (functions/drift.py
    ``ks_distance``): sup-CDF-distance between the finished ('F') and
    open ('O') order-value distributions — the bucketing-free companion
    to the recorded TVD monitor (drift_totalprice_status): KS reads the
    full resolution of both samples, so a shift INSIDE one declared TVD
    bucket cannot hide from it. Exact integer cross products over the
    merged order statistics; the cumulative counts ride the two-level
    prefix scan (operators/prefix.py pattern — every window PARTITIONED
    by range bucket), and the oracle is the independent native-window
    formulation, proving the decomposition."""
    from avro_diff_spark.functions.drift import ks_distance

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return ks_distance(
        o.where(F.col("o_orderstatus") == "F"),
        o.where(F.col("o_orderstatus") == "O"),
        "o_totalprice",
    )


def _drift_ks_sql() -> str:
    from avro_diff_spark.functions.drift import ks_distance_sql

    return ks_distance_sql(
        "(SELECT o_totalprice FROM orders WHERE o_orderstatus = 'F')",
        "(SELECT o_totalprice FROM orders WHERE o_orderstatus = 'O')",
        "o_totalprice",
    )


DRIFT_KS_SQL = _drift_ks_sql()


def events_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured schema-on-read: the events table's ``props``
    column is a JSON string; parse it with a DECLARED schema
    (``from_json`` — typed, vectorized, null on malformed input: the
    lakehouse answer to schemaless event payloads, no UDF, no driver
    sniffing pass) and aggregate the extracted field per event type.
    Catalyst prunes the scan to (event_type, props); at 100 TB the
    parse rides the same single aggregation pass as the counts."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = F.from_json(F.col("props"), "k long")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("k").alias("n_parsed"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


EVENTS_PROPS_SQL = """
SELECT event_type,
       count(*)::BIGINT AS n,
       count(CAST(props->>'$.k' AS BIGINT))::BIGINT AS n_parsed,
       sum(CAST(props->>'$.k' AS BIGINT))::BIGINT AS k_sum,
       min(CAST(props->>'$.k' AS BIGINT))::BIGINT AS k_min,
       max(CAST(props->>'$.k' AS BIGINT))::BIGINT AS k_max
FROM events
GROUP BY event_type
"""


def price_quantiles_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED bounded-state quantiles: each order priority's price
    quartiles from its own 256-row deterministic bottom-k sample
    (functions/sketches.py) — per-segment distribution monitoring where
    exact per-group percentiles sort every group in full. The sample
    rank window is PARTITIONED by the group (k rows state per group)."""
    from avro_diff_spark.functions import sketches as SK

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return SK.grouped_bottomk_quantiles(
        o, ["o_orderpriority"], "o_orderkey", "o_totalprice", k=256
    )


def _price_quantiles_by_priority_sql() -> str:
    from avro_diff_spark.functions import sketches as SK

    return SK.grouped_bottomk_quantiles_sql(
        "orders", ["o_orderpriority"], "o_orderkey", "o_totalprice", k=256
    )


PRICE_QUANTILES_BY_PRIORITY_SQL = _price_quantiles_by_priority_sql()


def hll_custkey_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED HLL: per-priority distinct-customer estimates from the
    deterministic 512-register sketch (one groups x 512-row shuffle)
    joined with the exact per-group count — the segment-cardinality
    dashboard shape at fixed state per group."""
    from avro_diff_spark.functions import sketches as SK

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    est = SK.hll_estimate(
        SK.hll_registers(o, "o_custkey", ["o_orderpriority"]),
        ["o_orderpriority"],
    )
    exact = o.groupBy("o_orderpriority").agg(
        F.count_distinct(F.col("o_custkey")).alias("exact_distinct")
    )
    return est.join(exact, "o_orderpriority")


def _hll_custkey_by_priority_sql() -> str:
    from avro_diff_spark.functions import sketches as SK

    est = SK.hll_estimate_sql("orders", "o_custkey", ["o_orderpriority"])
    return f"""
WITH est AS ({est}),
ex AS (SELECT o_orderpriority, count(DISTINCT o_custkey)::BIGINT AS exact_distinct
       FROM orders GROUP BY o_orderpriority)
SELECT est.*, ex.exact_distinct FROM est JOIN ex USING (o_orderpriority)
"""


HLL_CUSTKEY_BY_PRIORITY_SQL = _hll_custkey_by_priority_sql()


def fuzzy_match_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage (operators/linkage.py): dirty customer records
    (every 5th name's last character corrupted — the tail-typo error
    model) matched back to the master list via BLOCKED fuzzy join — two
    blocking passes robust to different error positions, levenshtein <= 1
    verification only inside blocks. The plan is hash equi-joins on the
    block keys + a residual distance filter; a distance join without
    blocking would be the |A| x |B| nested loop the plan gate bans."""
    from avro_diff_spark.operators.linkage import fuzzy_join

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    dirty = c.where(F.col("c_custkey") % 5 == 0).select(
        F.col("c_custkey").alias("probe_key"),
        F.concat(
            F.expr("substring(c_name, 1, length(c_name) - 1)"), F.lit("X")
        ).alias("c_name"),
    )
    master = c.select(F.col("c_custkey").alias("master_key"), "c_name")
    return fuzzy_join(
        dirty,
        master,
        "c_name",
        blocks=[
            lambda s: F.substring(s, 1, 16),
            lambda s: F.substring(s, 3, 16),
        ],
        max_dist=1,
        a_keep=["probe_key"],
        b_keep=["master_key"],
    )


_DIRTY_CASE = (
    "CASE c_custkey % 3 "
    "WHEN 0 THEN substr(c_name, 1, p - 1) || 'X' || substr(c_name, p + 1) "
    "WHEN 1 THEN substr(c_name, 1, p - 1) || substr(c_name, p + 1) "
    "ELSE substr(c_name, 1, p) || 'X' || substr(c_name, p + 1) END"
)


def qgram_match_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General-edit record linkage (operators/linkage.py
    ``fuzzy_join_passjoin``): every 5th customer name corrupted by a
    SUBSTITUTION, DELETION or INSERTION at a key-dependent position —
    no declared error positions for the blocking to lean on — then
    matched back to the master list under the PassJoin positional-
    segment pigeonhole blocking (any pair within levenshtein 1 shares
    one unedited segment at a start shift <= 1). The oracle is the pure
    BRUTE-FORCE distance join, so the recorded hash IS the completeness
    proof: one candidate pair missed by the blocking breaks it. Plan:
    hash equi-joins on (length, segment index, segment text) + residual
    levenshtein — never the |A| x |B| nested loop."""
    from avro_diff_spark.operators.linkage import fuzzy_join_passjoin

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    dirty = (
        c.where(
            (F.col("c_custkey") % 5 == 0)
            & F.col("c_name").isNotNull()
            & (F.length("c_name") >= 3)
        )
        .withColumn(
            "p", F.expr("1 + (c_custkey * 7) % (length(c_name) - 2)")
        )
        .select(
            F.col("c_custkey").alias("probe_key"),
            F.expr(_DIRTY_CASE).alias("c_name"),
        )
    )
    master = c.select(F.col("c_custkey").alias("master_key"), "c_name")
    return fuzzy_join_passjoin(
        dirty,
        master,
        "c_name",
        max_dist=1,
        a_keep=["probe_key"],
        b_keep=["master_key"],
    )


QGRAM_MATCH_CUSTOMERS_SQL = f"""
WITH dirty AS (
  SELECT probe_key, {_DIRTY_CASE.replace("c_custkey", "probe_key")} AS a_c_name
  FROM (SELECT c_custkey AS probe_key, c_name,
               1 + (c_custkey * 7) % (length(c_name) - 2) AS p
        FROM customer
        WHERE c_custkey % 5 = 0 AND c_name IS NOT NULL AND length(c_name) >= 3)
),
m AS (SELECT c_custkey AS master_key, c_name AS b_c_name
      FROM customer WHERE c_name IS NOT NULL)
SELECT probe_key, a_c_name, master_key, b_c_name,
       levenshtein(a_c_name, b_c_name)::BIGINT AS dist
FROM dirty, m
WHERE levenshtein(a_c_name, b_c_name) <= 1
"""


FUZZY_MATCH_CUSTOMERS_SQL = """
WITH dirty AS (
  SELECT c_custkey AS probe_key,
         substr(c_name, 1, length(c_name) - 1) || 'X' AS a_c_name
  FROM customer WHERE c_custkey % 5 = 0 AND c_name IS NOT NULL
),
m AS (SELECT c_custkey AS master_key, c_name AS b_c_name
      FROM customer WHERE c_name IS NOT NULL),
pairs AS (
  SELECT d.probe_key, d.a_c_name, m.master_key, m.b_c_name
  FROM dirty d JOIN m ON substr(d.a_c_name, 1, 16) = substr(m.b_c_name, 1, 16)
  WHERE levenshtein(d.a_c_name, m.b_c_name) <= 1
  UNION
  SELECT d.probe_key, d.a_c_name, m.master_key, m.b_c_name
  FROM dirty d JOIN m ON substr(d.a_c_name, 3, 16) = substr(m.b_c_name, 3, 16)
  WHERE levenshtein(d.a_c_name, m.b_c_name) <= 1
)
SELECT probe_key, a_c_name, master_key, b_c_name,
       levenshtein(a_c_name, b_c_name)::BIGINT AS dist
FROM pairs
"""


def running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global running revenue by order date (operators/prefix.py): the
    textbook ``sum(x) OVER (ORDER BY t)`` computed WITHOUT the
    single-partition window trap — range buckets from a deterministic
    hash sample, per-bucket totals folded into exclusive offsets
    (bounded driver collect), cumulative windows PARTITIONED by bucket.
    Money rides exact integer cents (floor(p*100+0.5)); the oracle is
    DuckDB's NATIVE single-window running sum — an independent
    formulation, so the hash match proves the two-level decomposition
    correct end to end."""
    from avro_diff_spark.operators.prefix import running_sum

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        ts_micros(F.col("o_orderdate")).alias("od_us"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).alias("cents"),
    )
    return running_sum(
        o, ["od_us", "o_orderkey"], "cents", buckets=64, alias="running_cents"
    )


RUNNING_REVENUE_SQL = """
SELECT o_orderkey, epoch_us(o_orderdate) AS od_us,
       CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
       CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
         OVER (ORDER BY epoch_us(o_orderdate), o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents
FROM orders
"""


def orders_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global dense row numbering by (order date, key) — the
    order-respecting zipWithIndex (operators/prefix.py
    global_row_number), every window PARTITIONED; oracle = the native
    single-window row_number, independently formulated."""
    from avro_diff_spark.operators.prefix import global_row_number

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", ts_micros(F.col("o_orderdate")).alias("od_us")
    )
    return global_row_number(o, ["od_us", "o_orderkey"], buckets=64)


ORDERS_RANKED_SQL = """
SELECT o_orderkey, epoch_us(o_orderdate) AS od_us,
       CAST(row_number() OVER (ORDER BY epoch_us(o_orderdate), o_orderkey) AS BIGINT) AS rn
FROM orders
"""


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profiling report over ``lineitem`` — the
    Deequ-`ColumnProfiler` / Great-Expectations onboarding pass
    (operators/profile.py). One row per column: rows, nulls, exact
    distinct, native-order min/max under the canonical repr law.

    Scale shape: null+distinct counts ride ONE melt →
    groupBy(col, repr) → groupBy(col) (two keyed shuffles, both
    map-side combined, shuffle volume Σ ndv(col) not ncols × nrows);
    min/max is a separate 1-row whole-stage aggregate broadcast-joined
    on (≤ ncols rows). No collects; partials merge associatively, so
    at 100 TB the same plan profiles per-partition and combines."""
    from avro_diff_spark.operators.profile import profile_table
    from avro_diff_spark.sources.tables import spread_small

    # spread_small: the melt's per-value repr/hash work runs BEFORE the
    # first shuffle, so on a small-split scan it serializes onto the
    # scan's few tasks; a no-op at real scale (plenty of splits)
    return profile_table(spread_small(load_table(spark, sf_dir, "lineitem")))


def _profile_sql_one(col: str, kind: str) -> str:
    reprs = {
        "int": f"CAST({col} AS VARCHAR)",
        "double": f"CAST(CAST({col} AS DECIMAL(18,2)) AS VARCHAR)",
        "varchar": col,
        "ts": f"CAST(epoch_us({col}) AS VARCHAR)",
    }
    mins = {
        "int": f"CAST(min({col}) AS VARCHAR)",
        "double": f"CAST(CAST(min({col}) AS DECIMAL(18,2)) AS VARCHAR)",
        "varchar": f"min({col})",
        "ts": f"CAST(epoch_us(min({col})) AS VARCHAR)",
    }
    maxs = {k: v.replace("min(", "max(") for k, v in mins.items()}
    return (
        f"SELECT '{col}' AS col_name, count(*) AS n_rows, "
        f"count(*) - count({col}) AS n_nulls, "
        f"count(DISTINCT {reprs[kind]}) AS n_distinct, "
        f"{mins[kind]} AS min_repr, {maxs[kind]} AS max_repr FROM lineitem"
    )


TABLE_PROFILE_SQL = "\nUNION ALL\n".join(
    _profile_sql_one(c, k)
    for c, k in [
        ("l_orderkey", "int"), ("l_partkey", "int"), ("l_suppkey", "int"),
        ("l_linenumber", "int"), ("l_quantity", "double"),
        ("l_extendedprice", "double"), ("l_discount", "double"),
        ("l_tax", "double"), ("l_returnflag", "varchar"),
        ("l_linestatus", "varchar"), ("l_shipdate", "ts"),
    ]
)


def table_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``table_profile``'s 100 TB onboarding form
    (operators/profile.py ``approx=True``): per-column HyperLogLog NDV
    sketches instead of the exact melt-distinct — the melt's shuffle
    carries at most ncols x 512 integer register rows (map-side max
    combine) rather than Σ ndv(col), and rows/nulls/min/max all ride
    ONE 1-row whole-stage aggregate. Sketch state is bit-deterministic
    (md5 registers, integer fold, one correctly-rounded double finish),
    so the oracle pins every field exactly — no tolerance; error bounds
    of the derived NDV estimate are pytest-pinned (tests/test_profile.py)."""
    from avro_diff_spark.operators.profile import profile_table
    from avro_diff_spark.sources.tables import spread_small

    # spread_small: the per-value md5/register work is map-side before
    # the (tiny) register shuffle — spread it across cores (no-op at scale)
    return profile_table(
        spread_small(load_table(spark, sf_dir, "lineitem")), approx=True
    )


_PROFILE_KINDS = [
    ("l_orderkey", "int"), ("l_partkey", "int"), ("l_suppkey", "int"),
    ("l_linenumber", "int"), ("l_quantity", "double"),
    ("l_extendedprice", "double"), ("l_discount", "double"),
    ("l_tax", "double"), ("l_returnflag", "varchar"),
    ("l_linestatus", "varchar"), ("l_shipdate", "ts"),
]


def _profile_approx_sql_one(col: str, kind: str) -> str:
    from avro_diff_spark.functions.sketches import hll_estimate_sql
    from avro_diff_spark.operators.profile import empty_sketch_constants

    reprs = {
        "int": col,
        "double": f"CAST({col} AS DECIMAL(18,2))",
        "varchar": col,
        "ts": f"epoch_us({col})",
    }
    mins = {
        "int": f"CAST(min({col}) AS VARCHAR)",
        "double": f"CAST(CAST(min({col}) AS DECIMAL(18,2)) AS VARCHAR)",
        "varchar": f"min({col})",
        "ts": f"CAST(epoch_us(min({col})) AS VARCHAR)",
    }
    maxs = {k: v.replace("min(", "max(") for k, v in mins.items()}
    ez, es, ee = empty_sketch_constants()
    return (
        f"SELECT '{col}' AS col_name, ex.n_rows, ex.n_nulls, "
        f"COALESCE(est.zero_registers, {ez}) AS zero_registers, "
        f"COALESCE(est.s_scaled, {es}) AS s_scaled, "
        f"COALESCE(est.est_x1000, {ee}) AS est_x1000, "
        f"ex.min_repr, ex.max_repr "
        f"FROM (SELECT count(*) AS n_rows, count(*) - count({col}) AS n_nulls, "
        f"{mins[kind]} AS min_repr, {maxs[kind]} AS max_repr FROM lineitem) ex "
        f"LEFT JOIN ({hll_estimate_sql('lineitem', reprs[kind])}) est ON TRUE"
    )


def _table_profile_approx_sql() -> str:
    return "\nUNION ALL\n".join(
        _profile_approx_sql_one(c, k) for c, k in _PROFILE_KINDS
    )


def join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew report over ``lineitem.l_suppkey`` (operators/
    skew.py ``skew_report``): the top-20 hottest supplier keys with
    exact counts and integer share/skew ratios — the pre-join diagnosis
    that decides between a plain shuffle join, broadcast, and
    ``salted_join``. One map-side-combined count, a TakeOrdered top-N,
    and a broadcast totals join; nothing corpus-sized moves."""
    from avro_diff_spark.operators.skew import skew_report

    return skew_report(load_table(spark, sf_dir, "lineitem"), ["l_suppkey"], top=20)


JOIN_KEY_SKEW_SQL = """
WITH pk AS (SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total, count(*) AS n_keys FROM pk),
top AS (SELECT l_suppkey, n FROM pk ORDER BY n DESC, l_suppkey ASC LIMIT 20)
SELECT CAST(row_number() OVER (ORDER BY n DESC, l_suppkey ASC) AS INT) AS rank,
       l_suppkey,
       CAST(n AS BIGINT) AS n_rows,
       CAST((n * 1000000) // n_total AS BIGINT) AS share_x1e6,
       CAST((n * n_keys * 1000000) // n_total AS BIGINT) AS skew_x1e6,
       n_total,
       CAST(n_keys AS BIGINT) AS n_keys
FROM top CROSS JOIN t
"""


def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of ``o_totalprice`` (operators/profile.py
    ``column_histogram``): 24 buckets over [0, 600000) plus clamped
    under/overflow — one map-side-combined keyed aggregate whose
    shuffle carries ≤ 26 rows per map task at ANY corpus size."""
    from avro_diff_spark.operators.profile import column_histogram

    return column_histogram(
        load_table(spark, sf_dir, "orders"), "o_totalprice", 0.0, 600000.0, 24
    )


PRICE_HISTOGRAM_SQL = """
SELECT CAST(least(greatest(floor((o_totalprice - 0.0) / 25000.0), -1), 24) AS INT) AS bucket,
       count(*) AS n_rows,
       CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
FROM orders
WHERE o_totalprice IS NOT NULL
GROUP BY 1
"""


def price_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile-bucket) histogram of ``o_totalprice``
    (operators/profile.py ``equi_depth_histogram``): 16 near-equal-count
    buckets with exact counts, cent-law edges and sums. The global rank
    rides the two-level scan — no single-partition window — and the
    oracle re-derives the same bucket law from a native row_number."""
    from avro_diff_spark.operators.profile import equi_depth_histogram

    return equi_depth_histogram(
        load_table(spark, sf_dir, "orders"), "o_totalprice", ["o_orderkey"], 16
    )


PRICE_DEPTH_HISTOGRAM_SQL = """
WITH r AS (
  SELECT o_totalprice,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
         row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
         count(*) OVER () AS n_total
  FROM orders WHERE o_totalprice IS NOT NULL
)
SELECT CAST(((rn - 1) * 16) // n_total AS INT) AS bucket,
       count(*) AS n_rows,
       min(cents) AS lo_cents,
       max(cents) AS hi_cents,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM r GROUP BY 1
"""
