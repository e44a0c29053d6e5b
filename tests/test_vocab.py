"""Distributed prefix sum + vocabulary analytics."""

from __future__ import annotations

import pyspark.sql.functions as F

from dbt_omnata_push_spark.llmops.vocab import source_vocab_overlap, vocab_growth
from dbt_omnata_push_spark.ops.prefix import with_running_sum


def test_running_sum_matches_python_across_partitions(spark):
    rows = [(i, (i * 37) % 101) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(13)
    got = {
        r["k"]: r["running_sum"]
        for r in with_running_sum(df, ["k"], "v").collect()
    }
    acc = 0
    for k, v in sorted(rows):
        acc += v
        assert got[k] == acc
    # no single-partition exchange in the plan
    plan = (
        with_running_sum(df, ["k"], "v")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan


def test_running_sum_empty_frame(spark):
    df = spark.createDataFrame([], "k long, v long")
    assert with_running_sum(df, ["k"], "v").count() == 0


def test_vocab_growth_curve(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c"),
            (2, "a b"),        # nothing new
            (3, "c d"),        # d new
            (4, "e f g a"),    # e f g new
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["new_terms"], r["vocab_size"])
        for r in vocab_growth(docs).collect()
    }
    assert got == {1: (3, 3), 3: (1, 4), 4: (3, 7)}


def test_source_vocab_overlap_jaccard(spark):
    docs = spark.createDataFrame(
        [
            ("s1", "a b c d"),
            ("s2", "c d e"),
            ("s3", "x y"),
        ],
        "source string, text string",
    )
    got = {
        (r["source_a"], r["source_b"]): (r["n_common"], r["jaccard"])
        for r in source_vocab_overlap(docs).collect()
    }
    assert got[("s1", "s2")] == (2, 2 / 5)
    assert got[("s1", "s3")][0] == 0 if ("s1", "s3") in got else True
    # disjoint pairs produce no row (inner join on token)
    assert ("s1", "s3") not in got and ("s2", "s3") not in got
