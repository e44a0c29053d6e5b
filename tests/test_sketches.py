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


class TestCountMin:
    def _words(self, spark):
        rows = (
            [("alpha",)] * 50 + [("beta",)] * 20 + [("gamma",)] * 5
            + [(f"rare{i}",) for i in range(200)]
        )
        return spark.createDataFrame(rows, "term string")

    def test_never_underestimates_and_heavy_hitters_exact(self, spark):
        from dbt_omnata_push_spark.ops.sketches import cms_build, cms_estimate

        words = self._words(spark)
        cms = cms_build(words, "term")
        exact = {
            r["term"]: r["c"]
            for r in words.groupBy("term").agg(F.count(F.lit(1)).alias("c")).collect()
        }
        est = {
            r["term"]: r["est"]
            for r in cms_estimate(cms, words.distinct(), "term").collect()
        }
        assert set(est) == set(exact)
        for t, c in exact.items():
            assert est[t] >= c, (t, est[t], c)  # one-sided error only
        # heavy hitters rise above the colliding tail mass: with
        # 275 items over 4x256 counters, expected collision mass per
        # counter ~ 1; the 50-count hitter must estimate within +25
        assert est["alpha"] - exact["alpha"] <= 25

    def test_merge_equals_whole(self, spark):
        from dbt_omnata_push_spark.ops.sketches import (
            cms_build,
            cms_estimate,
            cms_merge,
        )

        words = self._words(spark).withColumn(
            "half", (F.length("term") % 2 == 0).cast("int")
        )
        whole = cms_build(words, "term")
        merged = cms_merge(
            cms_build(words.filter("half = 0"), "term"),
            cms_build(words.filter("half = 1"), "term"),
        )
        probe = words.select("term").distinct()
        a = {r["term"]: r["est"] for r in cms_estimate(whole, probe, "term").collect()}
        b = {r["term"]: r["est"] for r in cms_estimate(merged, probe, "term").collect()}
        assert a == b

    def test_absent_key_estimates_bounded_by_collisions(self, spark):
        from dbt_omnata_push_spark.ops.sketches import cms_build, cms_estimate

        words = self._words(spark)
        cms = cms_build(words, "term")
        ghosts = spark.createDataFrame(
            [(f"ghost{i}",) for i in range(20)], "term string"
        )
        est = {r["term"]: r["est"] for r in cms_estimate(cms, ghosts, "term").collect()}
        # absent keys read only colliding mass; with load factor ~1 the
        # min over 4 rows stays tiny
        assert all(v <= 10 for v in est.values()), est


# ----------------------------------------------------------------- KMV


def test_kmv_exact_below_k_and_bounded_error_above(spark):
    from dbt_omnata_push_spark.ops.sketches import kmv_estimate, kmv_sketch

    rows = [("small", i % 50) for i in range(500)] + [
        ("big", i) for i in range(20000)
    ]
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    est = {
        r["g"]: r
        for r in kmv_estimate(
            kmv_sketch(df, "event_type", F.col("user_id"))
        ).collect()
    }
    assert est["small"]["n_seen"] == 50
    assert est["small"]["kmv_est"] == 50.0  # exact below k
    # saturated group: standard KMV RSE ~ 1/sqrt(k-2) ~ 6.3%; allow 4x
    assert abs(est["big"]["kmv_est"] - 20000) / 20000 < 0.25


def test_kmv_merge_equals_direct_union_sketch(spark):
    from dbt_omnata_push_spark.ops.sketches import kmv_merge, kmv_sketch

    rows = [("a", i) for i in range(3000)] + [("b", i + 1500) for i in range(3000)]
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    merged = kmv_merge(kmv_sketch(df, "event_type", F.col("user_id")))
    direct = kmv_sketch(
        df.withColumn("event_type", F.lit("__union__")),
        "event_type",
        F.col("user_id"),
    )
    a = sorted(r["h"] for r in merged.collect())
    b = sorted(r["h"] for r in direct.collect())
    assert a == b  # merging per-group sketches == sketching the union


def test_theta_set_ops_exact_below_k(spark):
    """Unsaturated sketches (theta=1): set-op outputs ARE the true
    distinct cardinalities."""
    from dbt_omnata_push_spark.ops.sketches import kmv_sketch, theta_set_ops

    rows = [("a", i) for i in range(40)] + [("b", i + 25) for i in range(40)]
    df = spark.createDataFrame(rows, "g string, user_id long")
    sk = kmv_sketch(df, "g", F.col("user_id"), k=256)
    got = {r["op"]: (r["n"], r["est"]) for r in
           theta_set_ops(sk, "a", "b", k=256).collect()}
    assert got["union"] == (65, 65.0)
    assert got["intersect"] == (15, 15.0)
    assert got["a_minus_b"] == (25, 25.0)
    assert got["b_minus_a"] == (25, 25.0)


def test_theta_set_ops_saturated_accuracy(spark):
    """Saturated sketches: each estimate within ~4x the theta-sketch
    RSE (~1/sqrt(k)) of the true cardinality."""
    from dbt_omnata_push_spark.ops.sketches import kmv_sketch, theta_set_ops

    k = 256
    rows = [("a", i) for i in range(6000)] + [
        ("b", i + 4000) for i in range(6000)
    ]
    df = spark.createDataFrame(rows, "g string, user_id long")
    sk = kmv_sketch(df, "g", F.col("user_id"), k=k)
    got = {r["op"]: r["est"] for r in theta_set_ops(sk, "a", "b", k=k).collect()}
    truth = {"union": 10000, "intersect": 2000,
             "a_minus_b": 4000, "b_minus_a": 4000}
    for op, true_n in truth.items():
        rel = abs(got[op] - true_n) / true_n
        assert rel < 4 / (k ** 0.5), (op, got[op], true_n, rel)


def test_theta_set_ops_disjoint_and_empty_edge(spark):
    from dbt_omnata_push_spark.ops.sketches import kmv_sketch, theta_set_ops

    rows = [("a", i) for i in range(10)] + [("b", i + 100) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, user_id long")
    sk = kmv_sketch(df, "g", F.col("user_id"), k=64)
    got = {r["op"]: r["n"] for r in theta_set_ops(sk, "a", "b", k=64).collect()}
    assert got["intersect"] == 0
    assert got["union"] == 20


def test_theta_overlap_matrix_exact_below_k_and_accuracy(spark):
    from dbt_omnata_push_spark.ops.sketches import (
        kmv_sketch,
        theta_overlap_matrix,
    )

    # exact mode: three small audiences with known overlaps
    rows = (
        [("a", i) for i in range(30)]
        + [("b", i + 20) for i in range(30)]  # |a∩b| = 10
        + [("c", i + 100) for i in range(10)]  # disjoint from both
    )
    df = spark.createDataFrame(rows, "g string, user_id long")
    sk = kmv_sketch(df, "g", F.col("user_id"), k=256)
    cells = {
        (r["g1"], r["g2"]): r
        for r in theta_overlap_matrix(sk, k=256).collect()
    }
    assert len(cells) == 3
    ab = cells[("a", "b")]
    assert (ab["n_inter"], ab["est_inter"], ab["est_union"]) == (10, 10.0, 50.0)
    assert ab["jaccard"] == 10.0 / 50.0
    ac = cells[("a", "c")]
    assert ac["n_inter"] == 0 and ac["jaccard"] == 0.0

    # saturated mode: estimates within ~4x RSE
    k = 256
    big = spark.createDataFrame(
        [("x", i) for i in range(6000)] + [("y", i + 3000) for i in range(6000)],
        "g string, user_id long",
    )
    cell = theta_overlap_matrix(
        kmv_sketch(big, "g", F.col("user_id"), k=k), k=k
    ).collect()[0]
    assert abs(cell["est_inter"] - 3000) / 3000 < 4 / (k ** 0.5)
    assert abs(cell["est_union"] - 9000) / 9000 < 4 / (k ** 0.5)
