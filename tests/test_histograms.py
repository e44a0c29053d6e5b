"""Histogram operators (ops/profile.py): equi-width value_histogram and
equi-depth equidepth_histogram — hand-computed expectations; the
sf-level oracles live in test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_omnata_push_spark.ops.profile import equidepth_histogram, value_histogram


def test_value_histogram_hand_computed(spark):
    df = spark.createDataFrame(
        [(float(v),) for v in [0, 1, 2, 3, 4, 5, 6, 7, 8, 10]], "v double"
    )
    out = {r["bin"]: r for r in value_histogram(df, "v", 5).collect()}
    # range [0,10], width 2: bins [0,2) [2,4) [4,6) [6,8) [8,10]
    assert len(out) == 5
    assert [out[i]["n"] for i in range(5)] == [2, 2, 2, 2, 2]
    assert out[0]["lo_edge"] == 0.0 and out[4]["hi_edge"] == 10.0


def test_value_histogram_max_value_in_last_bin(spark):
    df = spark.createDataFrame([(0.0,), (10.0,)], "v double")
    out = {r["bin"]: r["n"] for r in value_histogram(df, "v", 4).collect()}
    assert out == {0: 1, 1: 0, 2: 0, 3: 1}  # max lands in bin n-1, not n


def test_value_histogram_nulls_ignored_and_dense(spark):
    df = spark.createDataFrame([(1.0,), (None,), (3.0,)], "v double")
    rows = value_histogram(df, "v", 3).collect()
    assert sum(r["n"] for r in rows) == 2
    assert len(rows) == 3  # dense: empty middle bin emitted


def test_equidepth_histogram_balanced_counts(spark):
    df = spark.createDataFrame(
        [(float(i), i) for i in range(100)], "v double, k long"
    )
    out = {r["bucket"]: r for r in equidepth_histogram(df, "v", 4, "k").collect()}
    assert [out[i]["n"] for i in range(4)] == [25, 25, 25, 25]
    assert out[0]["lo"] == 0.0 and out[3]["hi"] == 99.0
    # bucket ranges tile the domain in order
    assert out[0]["hi"] < out[1]["lo"] or out[0]["hi"] <= out[1]["lo"]


def test_equidepth_histogram_uneven_split(spark):
    # 10 rows into 4 buckets: sizes 3,2,3,2 by the ((rn-1)*n) div total rule
    df = spark.createDataFrame(
        [(float(i), i) for i in range(10)], "v double, k long"
    )
    out = {r["bucket"]: r["n"] for r in equidepth_histogram(df, "v", 4, "k").collect()}
    assert sum(out.values()) == 10
    assert max(out.values()) - min(out.values()) <= 1


def test_equidepth_histogram_skew_still_balanced(spark):
    # heavy skew: equi-width would put 90% in one bin; equi-depth stays flat
    vals = [0.0] * 0 + [float(v) for v in ([1] * 90 + list(range(100, 110)))]
    df = spark.createDataFrame(
        [(v, i) for i, v in enumerate(vals)], "v double, k long"
    )
    out = {r["bucket"]: r["n"] for r in equidepth_histogram(df, "v", 10, "k").collect()}
    assert max(out.values()) == 10 and min(out.values()) == 10
