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


def test_keyed_prefix_sum_matches_serial(spark):
    from dbt_omnata_push_spark.ops.packing import with_keyed_prefix_sum

    rows = [(f"s{i % 3}", i, (i * 7) % 11 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "k string, o long, v long").repartition(8)
    got = {
        (r["k"], r["o"]): r["ps"]
        for r in with_keyed_prefix_sum(df, "k", ["o"], "v", out="ps").collect()
    }
    # Serial reference: exclusive running sum per key in o order.
    expect = {}
    for key in ("s0", "s1", "s2"):
        acc = 0
        for k, o, v in sorted(r for r in rows if r[0] == key):
            expect[(k, o)] = acc
            acc += v
    assert got == expect


def test_keyed_prefix_sum_key_spanning_partitions(spark):
    from dbt_omnata_push_spark.ops.packing import with_keyed_prefix_sum

    # One dominant key (180 of 200 rows) must span multiple range
    # partitions and still sum correctly — the 'one source dominates'
    # case a plain Window.partitionBy(key) would serialize.
    rows = [("big" if i < 180 else f"t{i}", i, 1) for i in range(200)]
    df = spark.createDataFrame(rows, "k string, o long, v long").repartition(8)
    out = with_keyed_prefix_sum(df, "k", ["o"], "v", out="ps", exclusive=False)
    big = {r["o"]: r["ps"] for r in out.filter(F.col("k") == "big").collect()}
    assert big == {i: i + 1 for i in range(180)}
    # And the plan never uses a window partitioned by the bare key over
    # row data: every windowspec over the data path includes _pid.
    plan = out._jdf.queryExecution().executedPlan().toString()
    data_windows = [
        line
        for line in plan.splitlines()
        if "windowspecdefinition(" in line and "_t#" not in line and "_pid" in line
    ]
    assert data_windows, "expected a _pid-scoped window on the data path"


def test_token_budget_and_rate_cap_invariants(spark):
    from dbt_omnata_push_spark.llmops.budget import source_rate_cap, token_budget_cap

    rows = [(i, f"s{i % 2}", "w " * ((i % 5) + 1) + "end") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    capped = token_budget_cap(docs, budget=25, key_col="source").collect()
    by_src = {}
    for r in capped:
        by_src.setdefault(r["source"], []).append(r)
    for src, kept in by_src.items():
        assert max(r["cum_tokens"] for r in kept) <= 25
        # Budgets are prefix-closed: kept set = all docs with cum <= budget.
        assert all(r["cum_tokens"] >= r["n_tokens"] for r in kept)
    # Determinism + monotonicity: a bigger budget keeps a superset.
    more = token_budget_cap(docs, budget=40, key_col="source").collect()
    assert {r["doc_id"] for r in capped} <= {r["doc_id"] for r in more}

    capped2 = source_rate_cap(docs, max_per_key=7, key_col="source").collect()
    cnt = {}
    for r in capped2:
        cnt[r["source"]] = cnt.get(r["source"], 0) + 1
    assert all(v == 7 for v in cnt.values())  # 30 rows per source, cap binds
    # Same seed -> same picks.
    again = {r["doc_id"] for r in source_rate_cap(docs, max_per_key=7, key_col="source").collect()}
    assert again == {r["doc_id"] for r in capped2}


def test_quantize_int8_roundtrip_bounds(spark):
    from dbt_omnata_push_spark.llmops.embeddings import quantize_int8

    rows = [
        (1, [0.5, -1.0, 0.25]),
        (2, [0.0, 0.0]),  # all-zero vector -> q all zero, no divide
        (3, [2.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    assert out[1]["min_q"] == -127 and out[1]["max_q"] == 64
    # Quantization error is bounded by half a step: amax/127/2 (+eps).
    assert out[1]["max_abs_err"] <= out[1]["max_abs"] / 127.0 / 2 + 1e-12
    assert out[2]["sum_q"] == 0 and out[2]["max_abs_err"] == 0.0
    assert out[3]["max_q"] == 127 and out[3]["n_dims"] == 1
