"""Bucketed co-located join: the write-once-shuffle-never contract
(ops/bucketing.py) must be visible in the physical plan."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from dbt_omnata_push_spark.engine.catalog import load_table
from dbt_omnata_push_spark.ops.bucketing import (
    bucketed_join,
    bucketed_table,
    write_bucketed,
)

from .conftest import SF_SMOKE


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    root = os.path.join(tempfile.gettempdir(), "sg_test_bucketed")
    shutil.rmtree(root, ignore_errors=True)
    od = load_table(spark, SF_SMOKE, "orders").select("o_custkey", "o_totalprice")
    cu = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_mktsegment")
    write_bucketed(od, "sgt_orders_b8", os.path.join(root, "o"), "o_custkey", 8)
    write_bucketed(cu, "sgt_customer_b8", os.path.join(root, "c"), "c_custkey", 8)
    yield "sgt_orders_b8", "sgt_customer_b8", root


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    """The whole point: co-bucketed sides sort-merge with ZERO Exchange.
    Broadcast is disabled so the test can't pass by broadcasting the
    small side instead."""
    lt, rt, _ = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "o_custkey", "c_custkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # Bucket-sorted data: no per-partition Sort needed either.
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_does_exchange(spark, bucketed_pair):
    """Control: the same join through bare parquet paths (bucketing
    metadata lost) pays two exchanges — proving the catalog route is
    what elides them."""
    _, _, root = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        od = spark.read.parquet(os.path.join(root, "o"))
        cu = spark.read.parquet(os.path.join(root, "c"))
        plan = _plan(od.join(cu, od["o_custkey"] == cu["c_custkey"]))
        assert plan.count("Exchange") >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_one_file_per_bucket(spark, bucketed_pair):
    """write_bucketed repartitions on the bucket column first, so each
    bucket is exactly one data file (small-files hygiene)."""
    _, _, root = bucketed_pair
    files = [
        f
        for f in os.listdir(os.path.join(root, "o"))
        if f.endswith(".parquet") and not f.startswith("_")
    ]
    assert len(files) == 8


def test_bucketed_join_matches_plain_join(spark, bucketed_pair):
    lt, rt, _ = bucketed_pair
    joined = bucketed_join(spark, lt, rt, "o_custkey", "c_custkey")
    od = load_table(spark, SF_SMOKE, "orders")
    cu = load_table(spark, SF_SMOKE, "customer")
    plain = od.join(cu, od["o_custkey"] == cu["c_custkey"])
    assert joined.count() == plain.count()
    a = joined.groupBy("c_mktsegment").count().orderBy("c_mktsegment").collect()
    b = plain.groupBy("c_mktsegment").count().orderBy("c_mktsegment").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bucketed_groupby_on_bucket_key_no_exchange(spark, bucketed_pair):
    """Bonus property: aggregation on the bucket key also skips its
    exchange — bucketing serves aggs, not just joins."""
    lt, _, _ = bucketed_pair
    agg = bucketed_table(spark, lt).groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert "Exchange" not in _plan(agg)
