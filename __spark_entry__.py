"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the declared operator inventory (SURVEY.md §2 +
llmops extensions) for the driver's DuckDB-oracle correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dbt_omnata_push_spark.queries import load_all


def _configure(spark: SparkSession) -> SparkSession:
    # Session-level conf the engine relies on regardless of who built the
    # SparkSession (see dbt_omnata_push_spark.engine.session).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _configure(spark)
    registry = load_all()
    return registry["pricing_summary"].fn(spark, "/root/testdata/sf0.001")


# Driver-coverage rotation (judge r2 #3): the driver hash-checks 50
# queries per round in dict order, so entries never (or longest-ago)
# driver-checked lead. Head = flagship + the 41 queries with no
# CORRECTNESS row in r1/r2 + the 6 checked only in r1; the r2-checked
# remainder follows in registry order. Recompute next round from the
# union of CORRECTNESS_r*.json keys.
_DRIVER_ORDER_HEAD = [
    "pricing_summary",
    # never driver-checked (r1+r2)
    "stream_events_sessions", "stream_error_prior_clicks",
    "orders_status_pivot", "orders_by_month", "documents_quality_filter",
    "order_value_percentiles", "multimodal_metadata",
    "events_type_counts_salted", "global_index_stats",
    "events_asof_last_error", "events_range_join_error_window",
    "events_approx_distinct_rollup", "orders_approx_quantiles",
    "documents_stratified_sample", "customer_running_total",
    "events_value_delta", "revenue_cube",
    "segments_intersect_building_markets", "customer_order_distribution",
    "promo_revenue_by_month", "small_quantity_revenue",
    "large_volume_orders", "brand_bracket_revenue",
    "returned_revenue_top_customers", "nation_pair_trade",
    "nation_customer_supplier_fullouter", "customer_balance_deciles",
    "order_flags_unpivot", "forecast_revenue", "min_cost_supplier",
    "nation_market_share", "product_profit_by_nation_year",
    "important_part_values", "top_revenue_supplier",
    "supplier_count_by_part", "excess_inventory_suppliers",
    "suppliers_waiting_orders", "idle_customer_balance",
    "corpus_sequence_packing", "corpus_shuffle_split", "ngram_lm_coverage",
    # checked only in round 1 (stalest of the rest)
    "revenue_rollup", "parts_brand_stats", "supplier_regions",
    "words_posexplode", "dedup_canonical_docs", "orders_ordered_index",
]


def _ordered_names(registry) -> list[str]:
    head = [n for n in _DRIVER_ORDER_HEAD if n in registry]
    seen = set(head)
    return head + [n for n in registry if n not in seen]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ llmops)."""
    registry = load_all()

    def wrap(name):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _configure(spark)
            return registry[name].fn(spark, sf_dir)

        run.__name__ = f"query_{name}"
        return run

    return {name: wrap(name) for name in _ordered_names(registry)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    registry = load_all()
    return {
        name: registry[name].oracle
        for name in _ordered_names(registry)
        if registry[name].oracle is not None
    }
