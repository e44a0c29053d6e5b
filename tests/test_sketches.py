"""Accuracy + algebraic properties of the approximate sketch operators
(no exact oracle is possible, so the bounds ARE the contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_omnata_push_spark.engine.catalog import load_table
from dbt_omnata_push_spark.ops.sketches import (
    approx_distinct_rollup,
    approx_quantiles,
    distinct_sketches,
    merge_sketches,
)


def test_hll_estimate_within_rse(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    est = {
        r["event_type"]: r["approx_distinct"]
        for r in approx_distinct_rollup(
            ev.withColumn("day", F.to_date("ts")),
            ["event_type", "day"],
            ["event_type"],
            "user_id",
        ).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        # lg_k=12 -> ~2.5% RSE; allow 3 sigma plus small-count slack
        assert abs(est[k] - n) <= max(3, 0.08 * n), (k, est[k], n)


def test_hll_merge_equals_direct_sketch(spark, sf_dir):
    """Union-merging fine sketches == sketching the raw data directly."""
    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    merged = merge_sketches(
        distinct_sketches(ev, ["event_type", "day"], "user_id"), ["event_type"]
    )
    direct = merge_sketches(
        distinct_sketches(ev, ["event_type"], "user_id"), ["event_type"]
    )
    m = {r["event_type"]: r["approx_distinct"] for r in merged.collect()}
    d = {r["event_type"]: r["approx_distinct"] for r in direct.collect()}
    assert m == d  # identical HLL state, not merely close estimates


def test_gk_quantiles_rank_error(spark, sf_dir):
    od = load_table(spark, sf_dir, "orders")
    vals = sorted(r["o_totalprice"] for r in od.select("o_totalprice").collect())
    n = len(vals)
    approx = {
        r["prob"]: r["value"]
        for r in approx_quantiles(od, "o_totalprice", [0.25, 0.5, 0.75]).collect()
    }
    import bisect

    for p, v in approx.items():
        rank = bisect.bisect_left(vals, v)
        assert abs(rank - p * n) <= max(2, n / 1000), (p, rank, p * n)
