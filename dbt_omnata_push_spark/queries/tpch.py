"""TPC-H-shaped analogs completing the Q1-Q22 operator families.

The reference executes arbitrary model SQL on Snowflake (its own surface
is in `macros/materializations/push.sql` + the README's "define a model,
we push it" contract), so the relational families these queries exercise
— correlated scalar subqueries, EXISTS / NOT EXISTS rewritten as
semi/anti joins, CASE-in-aggregate ratios, CTE reuse, HAVING against a
global scalar — are all part of what a reference user can run today.
Together with queries/relational.py and queries/extended.py this module
completes analogs of all 22 TPC-H query shapes over the driver testdata
(no partsupp table: the part<->supplier relation is derived from
lineitem's (l_partkey, l_suppkey) pairs; no p_container/o_comment/
c_phone: equivalent predicates use the columns that exist).

Determinism: money aggregated as decimal(18,2) and cast to double at the
end; ratio columns are a single division of two exact values; every
LIMIT carries a unique tiebreak (oracle-determinism discipline in
queries/__init__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.catalog import load_table
from . import query


def _dec(c, scale=2):
    return F.col(c).cast(f"decimal(18,{scale})")


_DISC = lambda: _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))  # noqa: E731


# ---------------------------------------------------------------------------
# Q6: single-table filter + arithmetic aggregate. The whole query is one
# parquet scan with every predicate pushed down — at 100 TB this is the
# canonical "scan speed is the query" plan (no shuffle at all beyond the
# final 1-row partial-agg combine).
# ---------------------------------------------------------------------------
@query(
    "forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("filter", "agg", "pushdown"),
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: fully pushed-down filter + one-row aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & _dec("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Q2: correlated "supplier with the minimum cost for this part" subquery,
# rewritten as aggregate-then-equijoin (the scalable form: the per-part
# min table is tiny after the part filter and broadcasts).
# ---------------------------------------------------------------------------
@query(
    "min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l_partkey, l_suppkey, MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eligible AS (
      SELECT p_partkey, l_suppkey, cost
      FROM part JOIN costs ON p_partkey = l_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_type = 'LARGE' AND p_size <= 15 AND n_regionkey = 3
    )
    SELECT e.p_partkey, e.l_suppkey AS s_suppkey, s_name,
           CAST(e.cost AS DOUBLE) AS cost
    FROM eligible e
    JOIN (SELECT p_partkey AS mk, MIN(cost) AS mc FROM eligible GROUP BY p_partkey) m
      ON e.p_partkey = m.mk AND e.cost = m.mc
    JOIN supplier ON e.l_suppkey = s_suppkey
    ORDER BY cost, p_partkey, s_suppkey
    """,
    tags=("join", "subquery", "agg"),
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part minimum-cost supplier via agg-then-join
    (ties kept, as in Q2). The part<->supplier cost relation derives from
    lineitem since the testdata has no partsupp table."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_dec("l_extendedprice")).alias("cost")
    )
    eligible = (
        pt.filter((F.col("p_type") == "LARGE") & (F.col("p_size") <= 15))
        .join(costs, pt.p_partkey == costs.l_partkey)
        .join(sup, costs.l_suppkey == sup.s_suppkey)
        .join(nat.filter(F.col("n_regionkey") == 3), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("p_partkey", "l_suppkey", "cost")
    )
    mins = eligible.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("cost").alias("mc")
    )
    return (
        # mins grows with part (one row per eligible partkey) — no forced
        # broadcast; AQE picks the strategy from runtime size.
        eligible.join(
            mins,
            (eligible.p_partkey == mins.mk) & (eligible.cost == mins.mc),
        )
        .join(sup, eligible.l_suppkey == sup.s_suppkey)
        .select(
            "p_partkey",
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            F.col("cost").cast("double").alias("cost"),
        )
        .orderBy("cost", "p_partkey", "s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q8: market-share ratio — CASE inside an aggregate, two exact decimal
# sums, ONE final division (IEEE-identical across engines).
# ---------------------------------------------------------------------------
@query(
    "nation_market_share",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(CAST(SUM(CASE WHEN n2.n_name = 'NATION_5'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS DOUBLE) AS mkt_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey AND n1.n_regionkey = 2
    JOIN part     ON l_partkey = p_partkey AND p_type = 'PROMO'
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    GROUP BY year(o_orderdate)
    ORDER BY o_year
    """,
    tags=("join", "agg", "case"),
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: supplier-nation market share of PROMO-part revenue
    sold to ASIA customers, per order year. Dims (nation, part-filter,
    supplier) broadcast; the fact tables shuffle once on the join keys."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    pt = load_table(spark, sf_dir, "part")
    sup = load_table(spark, sf_dir, "supplier")
    n1 = nat.filter(F.col("n_regionkey") == 2).select(
        F.col("n_nationkey").alias("c_nk")
    )
    n2 = nat.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("s_nation"))
    vol = _DISC()
    joined = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cust, od.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        # part/supplier grow linearly with scale — no forced broadcast
        # (a hint bypasses AQE's size check and OOMs at 100x); only the
        # bounded nation dims keep hints.
        .join(pt.filter(F.col("p_type") == "PROMO"), li.l_partkey == pt.p_partkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("s_nation") == "NATION_5", vol).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            )
            .cast("double")
            .alias("_num"),
            F.sum(vol).cast("double").alias("_den"),
        )
        .select(
            "o_year",
            (F.col("_num") / F.col("_den")).cast("double").alias("mkt_share"),
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9: profit by supplier nation and year. Cost side uses the part's
# retail price (no partsupp.supplycost in the testdata); all arithmetic
# stays in exact decimals until the final cast.
# ---------------------------------------------------------------------------
@query(
    "product_profit_by_nation_year",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                  - CAST(p_retailprice AS DECIMAL(18,2))
                    * CAST(l_quantity AS DECIMAL(18,2))
                    * CAST(0.5 AS DECIMAL(2,1))) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN part     ON l_partkey = p_partkey AND p_name LIKE '%widget%'
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY n_name, year(o_orderdate)
    ORDER BY nation, o_year
    """,
    tags=("join", "agg", "arithmetic"),
)
def product_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: widget-part profit per supplier nation per year
    (revenue minus a retail-price-based cost expression, exact decimal)."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    pt = load_table(spark, sf_dir, "part")
    od = load_table(spark, sf_dir, "orders")
    nat = load_table(spark, sf_dir, "nation")
    profit = _DISC() - _dec("p_retailprice") * _dec("l_quantity") * F.lit(0.5).cast(
        "decimal(2,1)"
    )
    return (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(
            pt.filter(F.col("p_name").like("%widget%")),
            li.l_partkey == pt.p_partkey,
        )
        .join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", "o_year")
    )


# ---------------------------------------------------------------------------
# Q11: HAVING against a global scalar (fraction of total). The total is a
# 1-row aggregate broadcast-cross-joined into the per-part frame — no
# driver round-trip, no second scan of the base data (the grouped frame
# feeds both sides).
# ---------------------------------------------------------------------------
@query(
    "important_part_values",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey AS partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_regionkey = 0
      GROUP BY l_partkey
    )
    SELECT partkey, CAST(value AS DOUBLE) AS value
    FROM per_part
    WHERE value > (SELECT SUM(value) * 0.001 FROM per_part)
    ORDER BY value DESC, partkey
    """,
    tags=("agg", "subquery", "having"),
)
def important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose AFRICA-supplied value exceeds a
    fraction of the total — global scalar via broadcast cross join."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    per_part = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(
            F.broadcast(nat.filter(F.col("n_regionkey") == 0)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(_dec("l_extendedprice")).alias("value"))
    )
    total = per_part.agg(
        (F.sum("value") * F.lit(0.001).cast("decimal(4,3)")).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("partkey", F.col("value").cast("double").alias("value"))
        .orderBy(F.desc("value"), "partkey")
    )


# ---------------------------------------------------------------------------
# Q15: CTE reused twice (revenue per supplier + its max) — the classic
# "view + scalar subquery" shape. The revenue frame is computed once and
# feeds both the max and the equality filter.
# ---------------------------------------------------------------------------
@query(
    "top_revenue_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("agg", "subquery", "cte"),
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue;
    the revenue CTE feeds both the max scalar and the final join.

    The revenue frame is PERSISTED (r6): without it, both consumers
    re-derive the CTE and lineitem is scanned twice — the plan test
    pins exactly one lineitem scan. The cached frame is
    supplier-cardinality (bounded), safe at any corpus size."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.sum(_DISC()).alias("total_revenue"))
    ).persist()
    mx = revenue.agg(F.max("total_revenue").alias("_mx"))
    return (
        sup.join(revenue, sup.s_suppkey == revenue.suppkey)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16: COUNT(DISTINCT supplier) per part attribute group, with a NOT IN
# exclusion subquery rewritten as a broadcast anti-join.
# ---------------------------------------------------------------------------
@query(
    "supplier_count_by_part",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("agg", "distinct", "anti-join"),
)
def supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    excluding suppliers with negative balance (the NOT IN -> anti-join;
    the complaint-comment predicate has no column here)."""
    pt = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    bad = sup.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        pt.filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
        )
        .join(li, pt.p_partkey == li.l_partkey)
        .join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q20: nested semi-join chain — suppliers (in one region) having a part
# whose 1997 shipped quantity exceeds half its all-time quantity. Both
# aggregates come from ONE grouped pass (conditional agg), not two scans.
# ---------------------------------------------------------------------------
@query(
    "excess_inventory_suppliers",
    oracle="""
    WITH per_ps AS (
      SELECT l_partkey, l_suppkey,
             SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                       AND l_shipdate < TIMESTAMP '1998-01-01'
                      THEN CAST(l_quantity AS DECIMAL(18,2))
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS qty_1997,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_all
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'small%'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT DISTINCT s_suppkey, s_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey AND n_regionkey = 1
    JOIN per_ps ON s_suppkey = l_suppkey
    WHERE qty_1997 * 2 > qty_all
    ORDER BY s_suppkey
    """,
    tags=("join", "semi-join", "subquery"),
)
def excess_inventory_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: AMERICA suppliers who shipped more than half of a
    small-part's all-time quantity in 1997 alone. The halved comparison
    is cleared of division (qty_1997 * 2 > qty_all, exact decimals)."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    in_1997 = (
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    per_ps = (
        li.join(
            pt.filter(F.col("p_name").like("small%")),
            li.l_partkey == pt.p_partkey,
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(
                F.when(in_1997, _dec("l_quantity")).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            ).alias("qty_1997"),
            F.sum(_dec("l_quantity")).alias("qty_all"),
        )
        .filter(F.col("qty_1997") * 2 > F.col("qty_all"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        sup.join(
            F.broadcast(nat.filter(F.col("n_regionkey") == 1)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(per_ps, sup.s_suppkey == per_ps.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q21: EXISTS + NOT EXISTS over the same fact table, rewritten as one
# grouped pass per order (distinct suppliers / distinct late suppliers)
# joined back — the multi-self-join becomes a single shuffle on orderkey.
# ---------------------------------------------------------------------------
@query(
    "suppliers_waiting_orders",
    oracle="""
    WITH li_o AS (
      SELECT l_orderkey, l_suppkey,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END AS is_late
      FROM lineitem JOIN orders
        ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
    ), per_order AS (
      SELECT l_orderkey AS ok,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late
      FROM li_o GROUP BY l_orderkey
    )
    SELECT s_name, CAST(COUNT(DISTINCT l.l_orderkey) AS BIGINT) AS numwait
    FROM li_o l
    JOIN per_order ON l.l_orderkey = ok AND n_supp >= 2 AND n_late = 1
    JOIN supplier ON l.l_suppkey = s_suppkey
    WHERE l.is_late = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
    tags=("join", "exists", "anti-join", "agg"),
)
def suppliers_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper on a
    multi-supplier finalized order ("late" = shipped >60 days after the
    order date; the testdata has no commit/receipt dates). EXISTS/NOT
    EXISTS collapse into one per-order distinct-count pass."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    li_o = (
        li.join(
            od.filter(F.col("o_orderstatus") == "F"),
            li.l_orderkey == od.o_orderkey,
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).cast("int").alias("is_late"),
        )
    )
    per_order = li_o.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("is_late") == 1, F.col("l_suppkey"))
        ).alias("n_late"),
    )
    return (
        li_o.filter(F.col("is_late") == 1)
        .join(
            per_order,
            (li_o.l_orderkey == per_order.ok)
            & (per_order.n_supp >= 2)
            & (per_order.n_late == 1),
        )
        .join(sup, li_o.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


# ---------------------------------------------------------------------------
# Q22: scalar average subquery + NOT EXISTS anti-join. The average is
# computed as exact-decimal sum / count (one division, IEEE-identical),
# broadcast into the filter; "no orders" is a left anti join.
# ---------------------------------------------------------------------------
@query(
    "idle_customer_balance",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(COUNT(*) AS BIGINT) AS threshold
      FROM customer
      WHERE c_acctbal > 0
        AND c_mktsegment IN ('BUILDING', 'MACHINERY', 'HOUSEHOLD')
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'HOUSEHOLD')
      AND c_acctbal > threshold
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("subquery", "anti-join", "agg"),
)
def idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no RECENT
    orders (every sf0.01 customer has some order, so "idle" means none
    since 2000), grouped by market segment (the phone-country-code
    grouping has no column here; mktsegment plays that role)."""
    cust = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    segs = ("BUILDING", "MACHINERY", "HOUSEHOLD")
    in_segs = cust.filter(F.col("c_mktsegment").isin(*segs))
    avg_bal = in_segs.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))
        ).alias("threshold")
    )
    return (
        in_segs.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(
            od.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")),
            F.col("c_custkey") == od.o_custkey,
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )
