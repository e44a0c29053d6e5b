"""Unit tests for the training-batch assembly ops (ops/packing.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_omnata_push_spark.ops.packing import (
    pack_sequences,
    shuffle_split,
    with_prefix_sum,
)


def test_prefix_sum_matches_serial(spark):
    """Exclusive prefix sum over a many-partition frame equals the
    serial cumulative sum in key order."""
    n = 10_000
    df = (
        spark.range(n)
        .repartition(16)
        .select(
            F.col("id").alias("k"),
            ((F.col("id") * 37) % 101 + 1).alias("v"),
        )
    )
    got = {
        r["k"]: r["p"]
        for r in with_prefix_sum(df, ["k"], "v", out="p").collect()
    }
    running = 0
    for k in range(n):
        assert got[k] == running
        running += (k * 37) % 101 + 1


def test_prefix_sum_inclusive_and_empty(spark):
    df = spark.range(5).select(F.col("id").alias("k"), F.lit(2).alias("v"))
    rows = (
        with_prefix_sum(df, ["k"], "v", out="p", exclusive=False)
        .orderBy("k")
        .collect()
    )
    assert [r["p"] for r in rows] == [2, 4, 6, 8, 10]
    empty = df.filter("k < 0")
    assert with_prefix_sum(empty, ["k"], "v").count() == 0


def test_pack_sequences_invariants(spark):
    """Every bin except possibly the last starts within budget of its
    predecessor; bins are dense from 0; total tokens conserved."""
    df = spark.range(1000).select(
        F.col("id").alias("k"), ((F.col("id") % 17) + 1).alias("tok")
    )
    packed = pack_sequences(df, "tok", budget=100, order_cols=["k"])
    bins = (
        packed.groupBy("bin_id")
        .agg(F.sum("tok").alias("t"), F.count("*").alias("n"))
        .orderBy("bin_id")
        .collect()
    )
    assert [r["bin_id"] for r in bins] == list(range(len(bins)))
    assert sum(r["t"] for r in bins) == sum((i % 17) + 1 for i in range(1000))
    # a doc lands in bin b iff its first token is before (b+1)*budget, so
    # each bin's cumulative start is under budget*bin_id + budget
    cum = 0
    for r in bins:
        assert cum < (r["bin_id"] + 1) * 100
        cum += r["t"]


def test_shuffle_split_deterministic_and_disjoint(spark):
    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    a = shuffle_split(df, "doc_id").collect()
    b = shuffle_split(df, "doc_id").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    counts = {
        r["split"]: r["n"]
        for r in shuffle_split(df, "doc_id")
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000
    # ~80/10/10 with generous tolerance
    assert 0.70 <= counts["train"] / 2000 <= 0.90
    # a different seed produces a different assignment
    other = {
        (r["doc_id"], r["split"])
        for r in shuffle_split(df, "doc_id", seed="other").collect()
    }
    assert other != {(r["doc_id"], r["split"]) for r in a}


def test_prefix_sum_no_single_partition_window(spark):
    """The plan must not collapse to one partition: no Window without a
    partitioning spec (scale guard, same discipline as ops/rownum)."""
    df = spark.range(100).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    plan = (
        with_prefix_sum(df, ["k"], "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "_pid" in line, f"global window found: {line.strip()[:200]}"
