"""Relational operator inventory over the TPC-H-ish testdata.

Each query re-expresses an operator family the reference engine executes
on Snowflake (SURVEY.md §2.2) as idiomatic PySpark: declarative
DataFrame/Spark SQL plans that Catalyst can push down, prune, and pick
join strategies for. Reference citations are in each docstring.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..engine.catalog import load_table, register_testdata
from . import query


def _dec(c, scale=2):
    return F.col(c).cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------------------
# Aggregation: grouped sum/avg/count with exact-decimal arithmetic.
# Reference surface: SUM + GROUP BY (transactions_daily.sql:8-11),
# count(*) probes (macros/apps/salesforce.sql:11).
# ---------------------------------------------------------------------------
@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "filter"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped grouped aggregation (sum/avg/count, pushed filter)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    charge = disc * (F.lit(1) + _dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).alias("_sq"),
            F.sum(_dec("l_extendedprice")).alias("_sbp"),
            F.sum(disc).alias("_sdp"),
            F.sum(charge).alias("_sc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("_sq").cast("double").alias("sum_qty"),
            F.col("_sbp").cast("double").alias("sum_base_price"),
            F.col("_sdp").cast("double").alias("sum_disc_price"),
            F.col("_sc").cast("double").alias("sum_charge"),
            (F.col("_sq").cast("double") / F.col("count_order")).alias("avg_qty"),
            "count_order",
        )
    )


# ---------------------------------------------------------------------------
# Multi-way join + aggregation (customer-orders-lineitem-nation-region).
# The reference never joins two large relations (SURVEY.md §2.2 joins) --
# Catalyst gives us broadcast/shuffle strategy selection for free; the
# small dims (nation, region) broadcast automatically.
# ---------------------------------------------------------------------------
@query(
    "revenue_by_nation",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderstatus = 'F'
    GROUP BY n_name
    """,
    tags=("join", "agg"),
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped star join; dims broadcast, facts shuffle on keys."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        cu.join(od, cu.c_custkey == od.o_custkey)
        .join(li, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).alias("_rev"), F.count(F.lit(1)).alias("n_items"))
        .select("n_name", F.col("_rev").cast("double").alias("revenue"), "n_items")
    )


# ---------------------------------------------------------------------------
# Anti join: the reference's incremental NOT-IN filter
# (accounts_load.sql:23-28) -> left_anti (keys are non-null by contract).
# ---------------------------------------------------------------------------
@query(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    tags=("join", "anti"),
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN (subquery) anti-join (accounts_load.sql:23-28 shape)."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    return cu.join(od, cu.c_custkey == od.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "customers_with_open_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
    tags=("join", "semi"),
)
def customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS semi-join (complement of the anti-join surface)."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return cu.join(od, cu.c_custkey == od.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# Scalar-subquery high-watermark filter (transactions_daily.sql:19).
# ---------------------------------------------------------------------------
@query(
    "recent_orders_watermark",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderdate > (SELECT MAX(o_orderdate) - INTERVAL 90 DAY FROM orders)
    """,
    tags=("filter", "scalar-subquery"),
)
def recent_orders_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-watermark incremental filter: scalar max then filter above it."""
    od = load_table(spark, sf_dir, "orders")
    wm = od.agg(F.max("o_orderdate").alias("wm")).collect()[0]["wm"]
    cutoff = wm - _dt.timedelta(days=90)
    return od.filter(F.col("o_orderdate") > F.lit(cutoff)).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


# ---------------------------------------------------------------------------
# Window functions: partitioned row_number (the reference uses global
# row numbering, marketing_cloud_data_extension_upload.sql:56; we expose
# the general partitioned form, scale-safe because it partitions by key).
# ---------------------------------------------------------------------------
@query(
    "top_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
    tags=("window",),
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned row_number window, top-3 per key (deterministic tiebreak)."""
    od = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        od.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "global_top_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("sort", "limit"),
)
def global_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans this as TakeOrderedAndProject (no full sort)."""
    od = load_table(spark, sf_dir, "orders")
    return (
        od.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Batching shape (SFMC staging): batch = floor(idx / 100), then per-batch
# array_agg (marketing_cloud_data_extension_upload.sql:57-63). For the
# deterministic oracle we derive the index from the dense o_orderkey; at
# scale the engine uses ops.rownum.with_global_index (order-free, no
# single-partition window).
# ---------------------------------------------------------------------------
@query(
    "staging_batches",
    oracle="""
    SELECT CAST(FLOOR(o_orderkey / 100) AS INT) AS batch_number,
           COUNT(*) AS n_rows,
           MIN(o_orderkey) AS min_key,
           MAX(o_orderkey) AS max_key,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS batch_value
    FROM orders
    GROUP BY 1
    """,
    tags=("agg", "batching"),
)
def staging_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-of-100 grouping with per-batch stats (SFMC staging shape)."""
    od = load_table(spark, sf_dir, "orders")
    return (
        od.withColumn(
            "batch_number", F.floor(F.col("o_orderkey") / 100).cast("int")
        )
        .groupBy("batch_number")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
            F.sum(_dec("o_totalprice")).cast("double").alias("batch_value"),
        )
    )


# ---------------------------------------------------------------------------
# 1-row metadata cross join (salesforce_bulk_load.sql:47): the job
# descriptor is joined to every record; in Spark, broadcast by construction.
# ---------------------------------------------------------------------------
@query(
    "records_with_job_metadata",
    oracle="""
    SELECT c_custkey, c_name, meta.max_order_date, meta.n_orders
    FROM customer,
         (SELECT MAX(o_orderdate) AS max_order_date, COUNT(*) AS n_orders
          FROM orders) AS meta
    """,
    tags=("join", "cross", "broadcast"),
)
def records_with_job_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row stream x 1-row metadata via broadcast cross join."""
    cu = load_table(spark, sf_dir, "customer")
    meta = load_table(spark, sf_dir, "orders").agg(
        F.max("o_orderdate").alias("max_order_date"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return cu.crossJoin(F.broadcast(meta)).select(
        "c_custkey", "c_name", "max_order_date", "n_orders"
    )


# ---------------------------------------------------------------------------
# Semi-structured surface: OBJECT_CONSTRUCT -> JSON -> path extraction
# (accounts_load.sql:14-15, RECORD:"AccountID__c"::varchar at :23).
# ---------------------------------------------------------------------------
@query(
    "record_json_roundtrip",
    oracle="""
    SELECT c_custkey,
           json_extract_string(rec, '$.Name') AS name_out,
           json_extract_string(rec, '$.AccountID__c') AS account_id_out
    FROM (SELECT c_custkey,
                 to_json(struct_pack(Name := c_name,
                                     AccountID__c := CAST(c_custkey AS VARCHAR))) AS rec
          FROM customer)
    """,
    tags=("json", "record"),
)
def record_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OBJECT_CONSTRUCT + variant-path extraction parity over JSON strings."""
    cu = load_table(spark, sf_dir, "customer")
    rec = F.to_json(
        F.struct(
            F.col("c_name").alias("Name"),
            F.col("c_custkey").cast("string").alias("AccountID__c"),
        )
    )
    return cu.select(
        "c_custkey",
        F.get_json_object(rec, "$.Name").alias("name_out"),
        F.get_json_object(rec, "$.AccountID__c").alias("account_id_out"),
    )


@query(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    tags=("json", "agg"),
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction on a string column + grouped integer aggs."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------------
# Time-bucketed aggregation over the event stream (batch form; the
# streaming wrapper reuses the same plan with a watermark).
# Continuous doubles are integer-ized (floor(x*1000)) for exact parity.
# ---------------------------------------------------------------------------
@query(
    "events_hourly",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS value_millis
    FROM events
    GROUP BY 1, 2
    """,
    tags=("agg", "time"),
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-hour aggregation (count, distinct users, exact scaled sum)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias("value_millis"),
    )


# ---------------------------------------------------------------------------
# Sessionization: gap-based sessions via lag + running sum windows.
# (Beyond-reference op; standard SQL in both engines.)
# ---------------------------------------------------------------------------
_SESSION_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, event_id,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sessions
GROUP BY user_id, session_id
"""


@query(
    "events_sessionized",
    oracle=_SESSION_SQL.replace("FROM events", "FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events)", 1),
    tags=("window", "session"),
)
def events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + running sum."""
    register_testdata(spark, sf_dir, ["events"])
    return spark.sql(_SESSION_SQL)


# ---------------------------------------------------------------------------
# Set operations + distinct (not used by the reference; free in Spark SQL,
# SURVEY.md §2.2 'Set operations').
# ---------------------------------------------------------------------------
@query(
    "distinct_union_labels",
    oracle="""
    SELECT val, src FROM (
      SELECT DISTINCT c_mktsegment AS val, 'segment' AS src FROM customer
      UNION ALL
      SELECT DISTINCT o_orderpriority AS val, 'priority' AS src FROM orders
    )
    """,
    tags=("set", "distinct"),
)
def distinct_union_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT + UNION ALL over two labelled domains."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    a = cu.select(F.col("c_mktsegment").alias("val")).distinct().withColumn(
        "src", F.lit("segment")
    )
    b = od.select(F.col("o_orderpriority").alias("val")).distinct().withColumn(
        "src", F.lit("priority")
    )
    return a.unionByName(b)


@query(
    "segments_except_negative",
    oracle="""
    SELECT c_mktsegment FROM customer
    EXCEPT
    SELECT c_mktsegment FROM customer WHERE c_acctbal < 0
    """,
    tags=("set",),
)
def segments_except_negative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference) between two projections."""
    cu = load_table(spark, sf_dir, "customer")
    return cu.select("c_mktsegment").subtract(
        cu.filter(F.col("c_acctbal") < 0).select("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Grouped list collection (array_agg, marketing_cloud...upload.sql:61) --
# output stringified + sorted for order-insensitive comparison.
# ---------------------------------------------------------------------------
@query(
    "nations_per_segment",
    oracle="""
    SELECT c_mktsegment,
           array_to_string(list_sort(list_distinct(list(n_name))), ',') AS nations,
           COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY c_mktsegment
    """,
    tags=("agg", "collect"),
)
def nations_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_agg/collect_set surface with deterministic ordering."""
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    return (
        cu.join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(F.array_sort(F.collect_set("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


# ---------------------------------------------------------------------------
# String expression surface: concat (||, transactions_daily_load.sql:12-13),
# casts, CASE.
# ---------------------------------------------------------------------------
@query(
    "customer_duplicate_keys",
    oracle="""
    SELECT c_custkey,
           c_name || '_' || n_name AS duplicate_key,
           CASE WHEN c_acctbal >= 5000 THEN 'high'
                WHEN c_acctbal >= 0 THEN 'mid'
                ELSE 'negative' END AS balance_band
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
    tags=("scalar", "string"),
)
def customer_duplicate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String concat composite key (|| operator parity) + CASE banding."""
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    return cu.join(F.broadcast(na), cu.c_nationkey == na.n_nationkey).select(
        "c_custkey",
        F.concat_ws("_", F.col("c_name"), F.col("n_name")).alias("duplicate_key"),
        F.when(F.col("c_acctbal") >= 5000, "high")
        .when(F.col("c_acctbal") >= 0, "mid")
        .otherwise("negative")
        .alias("balance_band"),
    )


# ---------------------------------------------------------------------------
# Latest-record-per-key: the MERGE/upsert read-side semantic of the
# tracking_table materialization (tracking_table_materialization.sql:28-35)
# expressed as a pure query (dedup to most recent version).
# ---------------------------------------------------------------------------
@query(
    "latest_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders)
    WHERE rn = 1
    """,
    tags=("window", "upsert-read"),
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert read-side semantics: newest row per key via window dedup."""
    od = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        od.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


@query(
    "shipping_priority_top10",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
)
def shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, pushed filters on every input,
    grouped revenue, global top-10 (TakeOrderedAndProject, no full
    sort). Exact decimal revenue with unique orderkey tiebreak."""
    cu = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        cu.join(od, cu.c_custkey == od.o_custkey)
        .join(li, li.l_orderkey == od.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "order_priority_counts",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o.o_orderkey AND l_shipdate > o.o_orderdate
    )
    GROUP BY o_orderpriority
    """,
    tags=("semi-join", "agg"),
)
def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS -> left-semi join with a
    non-equi conjunct, then grouped count."""
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    semi = od.join(
        li,
        (od.o_orderkey == li.l_orderkey) & (li.l_shipdate > od.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@query(
    "shipmode_priority_buckets",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate < o_orderdate + INTERVAL 90 DAY
    GROUP BY l_returnflag
    """,
    tags=("join", "case", "agg"),
)
def shipmode_priority_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join with a date-arithmetic predicate, CASE/IN
    bucketed conditional counts."""
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        od.join(li, od.o_orderkey == li.l_orderkey)
        .filter(
            F.col("l_shipdate")
            < F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@query(
    "events_funnel_conversion",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS first_signup
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS pts
      FROM events WHERE event_type = 'purchase'
    ),
    conv AS (
      SELECT s.user_id, MIN(p.pts) AS first_purchase_after
      FROM s LEFT JOIN p
        ON p.user_id = s.user_id AND p.pts > s.first_signup
      GROUP BY s.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_signup_users,
           CAST(COUNT(first_purchase_after) AS BIGINT) AS n_converted,
           CAST(COUNT(first_purchase_after) AS DOUBLE) / COUNT(*)
             AS conversion_rate
    FROM conv
    """,
    tags=("events", "funnel"),
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel (signup -> later purchase, per user): the event-
    sequence conversion shape. One user-keyed shuffle per step; the
    step join is user-co-keyed so no fact table is broadcast."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_signup"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts")
    )
    conv = (
        s.join(p, (p.user_id == s.user_id) & (F.col("pts") > F.col("first_signup")), "left")
        .groupBy(s.user_id)
        .agg(F.min("pts").alias("first_purchase_after"))
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_signup_users"),
        F.count("first_purchase_after").alias("n_converted"),
        (
            F.count("first_purchase_after").cast("double") / F.count(F.lit(1))
        ).alias("conversion_rate"),
    )


@query(
    "events_hourly_retention",
    oracle="""
    WITH a AS (
      SELECT DISTINCT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, user_id
      FROM events
    )
    SELECT a.h AS hour,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_retained
    FROM a LEFT JOIN a b
      ON b.user_id = a.user_id AND b.h = a.h + INTERVAL 1 HOUR
    GROUP BY a.h
    """,
    tags=("events", "retention"),
)
def events_hourly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-over-hour cohort retention: of the users active in hour h,
    how many are active again in h+1. Distinct (hour, user) frame
    self-joined on (user, adjacent hour) — user-co-keyed shuffle, no
    all-pairs, scales with active-user-hours."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.select(
        F.date_trunc("hour", F.col("ts")).alias("h"), "user_id"
    ).distinct()
    b = a.select(F.col("h").alias("bh"), F.col("user_id").alias("buser"))
    joined = a.join(
        b,
        (F.col("buser") == F.col("user_id"))
        & (F.col("bh") == F.col("h") + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return joined.groupBy(F.col("h").alias("hour")).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("buser").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_retained"),
    )


@query(
    "events_hourly_anomalies",
    oracle="""
    WITH hc AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_hours,
             CAST(SUM(n) AS BIGINT) AS sum_n,
             CAST(SUM(n * n) AS BIGINT) AS sum_n2
      FROM hc GROUP BY event_type
    )
    SELECT event_type, h AS hour, n,
           CAST(n_hours AS BIGINT) AS n_hours,
           (CAST(n AS DOUBLE) - CAST(sum_n AS DOUBLE) / n_hours)
             / sqrt(CAST(sum_n2 AS DOUBLE) / n_hours
                    - (CAST(sum_n AS DOUBLE) / n_hours)
                      * (CAST(sum_n AS DOUBLE) / n_hours)) AS zscore
    FROM hc JOIN stats USING (event_type)
    WHERE (CAST(n AS DOUBLE) - CAST(sum_n AS DOUBLE) / n_hours)
          * (CAST(n AS DOUBLE) - CAST(sum_n AS DOUBLE) / n_hours)
          > 4.0 * (CAST(sum_n2 AS DOUBLE) / n_hours
                   - (CAST(sum_n AS DOUBLE) / n_hours)
                     * (CAST(sum_n AS DOUBLE) / n_hours))
    """,
    tags=("events", "anomaly"),
)
def events_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hours where an event type's count deviates > 2 sigma from that
    type's hourly mean — the volume-anomaly detector shape. Counts,
    sums and sums-of-squares stay BIGINT (exact, order-independent);
    the mean/variance/z-score are fixed-order double expressions, so
    the oracle matches bit-for-bit. The sigma test is applied on the
    squared inequality (no sqrt in the predicate) to avoid comparing
    against a NaN sigma when a type has constant counts."""
    ev = load_table(spark, sf_dir, "events")
    hc = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = hc.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("n").alias("sum_n"),
        F.sum(F.col("n") * F.col("n")).alias("sum_n2"),
    )
    mean = F.col("sum_n").cast("double") / F.col("n_hours")
    var = F.col("sum_n2").cast("double") / F.col("n_hours") - mean * mean
    dev = F.col("n").cast("double") - mean
    return (
        hc.join(stats, "event_type")
        .filter(dev * dev > F.lit(4.0) * var)
        .select(
            "event_type",
            F.col("h").alias("hour"),
            "n",
            F.col("n_hours").cast("long").alias("n_hours"),
            (dev / F.sqrt(var)).alias("zscore"),
        )
    )


@query(
    "parts_market_basket",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    pairs AS (
      SELECT a.pk AS part_a, b.pk AS part_b
      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
    ),
    counted AS (
      SELECT part_a, part_b, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM pairs GROUP BY part_a, part_b
    )
    SELECT part_a, part_b, n_orders
    FROM counted
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 100
    """,
    tags=("tpch", "basket"),
)
def parts_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: top part pairs bought together.
    The self-join is co-keyed on the order key (pair fan-out bounded by
    per-order basket size, never corpus-all-pairs); the pair count is a
    map-side-combining groupBy; top-100 is TakeOrderedAndProject with a
    full deterministic tiebreak."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = a.join(
        b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk"))
    ).select(F.col("a.pk").alias("part_a"), F.col("b.pk").alias("part_b"))
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(100)
    )


@query(
    "customer_rfm_segments",
    oracle="""
    WITH c AS (
      SELECT o_custkey AS custkey,
             MAX(CAST(o_orderdate AS TIMESTAMP)) AS last_order,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
      FROM orders GROUP BY o_custkey
    )
    SELECT custkey, n_orders, total_spend,
           CASE WHEN last_order >= TIMESTAMP '2000-08-01 00:00:00' THEN 3
                WHEN last_order >= TIMESTAMP '1999-08-01 00:00:00' THEN 2
                ELSE 1 END AS r_score,
           CASE WHEN n_orders >= 15 THEN 3
                WHEN n_orders >= 8 THEN 2 ELSE 1 END AS f_score,
           CASE WHEN total_spend >= 3000000.0 THEN 3
                WHEN total_spend >= 1500000.0 THEN 2 ELSE 1 END AS m_score,
           'RFM-' ||
             CAST(CASE WHEN last_order >= TIMESTAMP '2000-08-01 00:00:00' THEN 3
                       WHEN last_order >= TIMESTAMP '1999-08-01 00:00:00' THEN 2
                       ELSE 1 END AS VARCHAR) ||
             CAST(CASE WHEN n_orders >= 15 THEN 3
                       WHEN n_orders >= 8 THEN 2 ELSE 1 END AS VARCHAR) ||
             CAST(CASE WHEN total_spend >= 3000000.0 THEN 3
                       WHEN total_spend >= 1500000.0 THEN 2 ELSE 1 END AS VARCHAR)
             AS segment
    FROM c
    """,
    tags=("orders", "rfm"),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency/frequency/monetary score
    buckets): one customer-keyed aggregation, money summed as
    decimal(18,2) per the engine's exactness discipline, fixed-threshold
    bucketing so the segment labels are engine-exact."""
    o = load_table(spark, sf_dir, "orders")
    c = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.col("o_orderdate").cast("timestamp")).alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_spend"),
    )
    r = (
        F.when(F.col("last_order") >= F.expr("TIMESTAMP '2000-08-01 00:00:00'"), 3)
        .when(F.col("last_order") >= F.expr("TIMESTAMP '1999-08-01 00:00:00'"), 2)
        .otherwise(1)
    )
    f = F.when(F.col("n_orders") >= 15, 3).when(F.col("n_orders") >= 8, 2).otherwise(1)
    m = (
        F.when(F.col("total_spend") >= 3000000.0, 3)
        .when(F.col("total_spend") >= 1500000.0, 2)
        .otherwise(1)
    )
    return c.select(
        "custkey",
        "n_orders",
        "total_spend",
        r.alias("r_score"),
        f.alias("f_score"),
        m.alias("m_score"),
        F.concat(
            F.lit("RFM-"),
            r.cast("string"),
            f.cast("string"),
            m.cast("string"),
        ).alias("segment"),
    )


@query(
    "events_type_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY CAST(ts AS TIMESTAMP), event_id)
               AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n_transitions
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
    tags=("events", "sequence"),
)
def events_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition counts (the Markov-chain /
    user-journey matrix). The lag window partitions by user — parallel
    across users, each group bounded by one user's history; the
    (event_id) tiebreak makes simultaneous events deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    seq = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@query(
    "orders_mom_growth",
    oracle="""
    WITH m AS (
      SELECT date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month, revenue, prev_revenue,
           (revenue - prev_revenue) / prev_revenue AS growth
    FROM (
      SELECT month, revenue,
             lag(revenue) OVER (ORDER BY month) AS prev_revenue
      FROM m
    )
    WHERE prev_revenue IS NOT NULL
    """,
    tags=("orders", "timeseries"),
)
def orders_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: the calendar series is BOUNDED
    (months, not rows), so the unpartitioned lag window operates on an
    already-aggregated ~80-row frame — not a single-partition scan of
    the fact table. Money summed as decimal(18,2) then one double
    division per row."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate").cast("timestamp")).alias("month")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue")
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return (
        m.select("month", "revenue", prev.alias("prev_revenue"))
        .filter(F.col("prev_revenue").isNotNull())
        .withColumn(
            "growth",
            (F.col("revenue") - F.col("prev_revenue")) / F.col("prev_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# dbt generic (schema) tests (r6b): the four canonical dbt-core tests
# as failure-row queries (engine/generic_tests.py). Two are configured
# to FAIL with deterministic counts — the restricted accepted-values
# list and a thinned parent key set — so the non-zero failure paths
# are oracle-verified, not just the all-green ones.
# ---------------------------------------------------------------------------
@query(
    "orders_generic_test_summary",
    oracle="""
    SELECT 'unique__o_orderkey' AS test_name, COUNT(*) AS n_failures
    FROM (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL
          GROUP BY 1 HAVING COUNT(*) > 1)
    UNION ALL
    SELECT 'not_null__o_custkey', COUNT(*)
    FROM orders WHERE o_custkey IS NULL
    UNION ALL
    -- dbt's accepted_values failure rows are GROUPED by value (one row
    -- per offending value), like unique's are grouped by key
    SELECT 'accepted_values__o_orderstatus', COUNT(*)
    FROM (SELECT o_orderstatus FROM orders
          WHERE o_orderstatus IS NOT NULL
            AND o_orderstatus NOT IN ('F', 'O')
          GROUP BY 1)
    UNION ALL
    SELECT 'relationships__o_custkey', COUNT(*)
    FROM orders o
    WHERE o_custkey IS NOT NULL AND NOT EXISTS (
      SELECT 1 FROM customer c
      WHERE c.c_custkey = o.o_custkey AND c.c_custkey % 3 <> 0
    )
    """,
    tags=("dbt", "generic-tests", "quality"),
)
def orders_generic_test_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Failure counts for dbt's four generic tests over orders:
    unique(o_orderkey) and not_null(o_custkey) pass (0), while
    accepted_values restricted to ('F','O') counts the 'P' orders and
    relationships against a thinned customer key set (custkey % 3 != 0)
    counts the orphaned third. unique = one hash agg; relationships =
    broadcast LEFT ANTI."""
    from ..engine.generic_tests import (
        accepted_values_failures,
        not_null_failures,
        relationships_failures,
        unique_failures,
    )

    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 3 != 0
    )
    parts = [
        ("unique__o_orderkey", unique_failures(od, "o_orderkey")),
        ("not_null__o_custkey", not_null_failures(od, "o_custkey")),
        (
            "accepted_values__o_orderstatus",
            accepted_values_failures(od, "o_orderstatus", ["F", "O"]),
        ),
        (
            "relationships__o_custkey",
            relationships_failures(od, "o_custkey", cu, "c_custkey"),
        ),
    ]
    out = None
    for name, df in parts:
        one = df.agg(F.count(F.lit(1)).alias("n_failures")).select(
            F.lit(name).alias("test_name"), "n_failures"
        )
        out = one if out is None else out.unionByName(one)
    return out


# ---------------------------------------------------------------------------
# Recursive CTE: iterative hierarchy traversal (Spark 4 native recursion).
# (Beyond-reference op; identical ANSI WITH RECURSIVE text in both engines.)
# ---------------------------------------------------------------------------
_HIERARCHY_SQL = """
WITH RECURSIVE
edges AS (
  SELECT c_custkey AS child, CAST(FLOOR(c_custkey / 10) AS BIGINT) AS parent
  FROM customer WHERE c_custkey >= 10
),
walk AS (
  SELECT c_custkey AS node, c_custkey AS anc, CAST(0 AS BIGINT) AS depth
  FROM customer
  UNION ALL
  SELECT w.node, e.parent, w.depth + 1
  FROM walk w JOIN edges e ON e.child = w.anc
)
SELECT node AS c_custkey, MAX(depth) AS depth,
       CAST(MAX(CASE WHEN anc < 10 THEN anc END) AS BIGINT) AS root_key
FROM walk GROUP BY node
"""


@query(
    "customers_hierarchy_recursive",
    oracle=_HIERARCHY_SQL,
    tags=("recursive", "cte", "hierarchy"),
)
def customers_hierarchy_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE hierarchy walk: every customer climbs a
    deterministic parent chain (parent = custkey div 10) to its
    single-digit root, reporting depth and root key. Runs Spark 4's
    native ``WITH RECURSIVE`` (SPARK-24497) — each recursion round is
    one equi-join against the dimension-sized edge set, and the depth
    is bounded by log10(max key), so 100 TB of keys costs ~7 rounds of
    hash joins, not row-count-proportional iterations. The oracle is
    the byte-identical SQL text under DuckDB's recursive evaluator —
    cross-engine parity of iterative semantics."""
    register_testdata(spark, sf_dir, ["customer"])
    return spark.sql(_HIERARCHY_SQL)


@query(
    "events_trailing_hour_stats",
    oracle="""
    SELECT user_id, event_id,
           COUNT(*) OVER w AS n_trailing,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER w AS BIGINT)
             AS trailing_cents
    FROM (SELECT user_id, event_id, value,
                 CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS tsec
          FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY tsec
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "range-frame", "time"),
)
def events_trailing_hour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: per event, count and exact fixed-point
    sum of the same user's events in the trailing hour (inclusive).
    The frame key is epoch SECONDS on both sides — the testdata's
    timestamps carry microseconds, and a truncated key on one side
    against a full-precision interval on the other would disagree for
    events sitting within the sub-second band around the 1-hour
    boundary. ONE keyed window shuffle, value range [-3600, 0]; ties
    on the second all share the frame (RANGE, not ROWS), keeping the
    result deterministic and oracle-exact."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp(F.col("ts").cast("timestamp")))
        .rangeBetween(-3600, 0)
    )
    cents = F.floor(F.col("value") * 100).cast("long")
    return ev.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        F.sum(cents).over(w).alias("trailing_cents"),
    )
