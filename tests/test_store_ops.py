"""Unit tests: versioned table store + scale-safe ops building blocks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_omnata_push_spark.engine.store import TableStore
from dbt_omnata_push_spark.ops.batching import collect_batches, with_batch_number
from dbt_omnata_push_spark.ops.rownum import with_global_index


@pytest.fixture()
def store(tmp_path):
    return TableStore(str(tmp_path))


def test_create_read_roundtrip(spark, store):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    store.create(spark, "t", df)
    assert store.exists("t")
    assert sorted(r["v"] for r in store.read(spark, "t").collect()) == ["a", "b"]


def test_append(spark, store):
    store.create(spark, "t", spark.createDataFrame([(1,)], "k int"))
    store.append(spark, "t", spark.createDataFrame([(2,)], "k int"))
    assert store.read(spark, "t").count() == 2


def test_merge_upsert_replaces_and_inserts(spark, store):
    store.create(spark, "t", spark.createDataFrame([(1, "old"), (2, "keep")], "k int, v string"))
    store.merge_upsert(
        spark, "t", spark.createDataFrame([(1, "new"), (3, "ins")], "k int, v string"), "k"
    )
    rows = {r["k"]: r["v"] for r in store.read(spark, "t").collect()}
    assert rows == {1: "new", 2: "keep", 3: "ins"}


def test_merge_upsert_schema_widening(spark, store):
    """expand_target_column_types parity: new columns appear, old rows null."""
    store.create(spark, "t", spark.createDataFrame([(1, "a")], "k int, v string"))
    store.merge_upsert(
        spark, "t",
        spark.createDataFrame([(2, "b", "extra")], "k int, v string, w string"),
        "k",
    )
    rows = {r["k"]: r.asDict() for r in store.read(spark, "t").collect()}
    assert rows[2]["w"] == "extra"
    assert rows[1]["w"] is None


def test_update_from_patches_only_matches(spark, store):
    store.create(
        spark, "t",
        spark.createDataFrame([("j1", None), ("j2", None)], "job_id string, close string"),
    )
    store.update_from(
        spark, "t",
        spark.createDataFrame([("j1", "done")], "job_id string, close string"),
        "job_id", ["close"],
    )
    rows = {r["job_id"]: r["close"] for r in store.read(spark, "t").collect()}
    assert rows == {"j1": "done", "j2": None}


def test_version_swap_keeps_old_reader_valid(spark, store):
    store.create(spark, "t", spark.createDataFrame([(1,)], "k int"))
    old_reader = store.read(spark, "t")
    store.merge_upsert(spark, "t", spark.createDataFrame([(2,)], "k int"), "k")
    # The pre-merge DataFrame still scans its own (retained) version.
    assert old_reader.count() == 1
    assert store.read(spark, "t").count() == 2


def test_vacuum_removes_superseded_versions(spark, store, tmp_path):
    import os

    store.create(spark, "t", spark.createDataFrame([(1,)], "k int"))
    store.merge_upsert(spark, "t", spark.createDataFrame([(2,)], "k int"), "k")
    store.vacuum("t")
    entries = sorted(
        e for e in os.listdir(tmp_path / "t") if e.startswith("v=")
    )
    assert entries == ["v=1"]
    assert store.read(spark, "t").count() == 2


def test_global_index_dense_unique(spark):
    df = spark.range(0, 1000).repartition(7).selectExpr("CAST(id AS string) AS record")
    out = with_global_index(df, "idx", one_based=True)
    idxs = sorted(r["idx"] for r in out.collect())
    assert idxs == list(range(1, 1001))


def test_global_index_empty(spark):
    df = spark.createDataFrame([], "record string")
    assert with_global_index(df, "idx").count() == 0


def test_batching_shapes(spark):
    df = spark.range(0, 250).selectExpr("CAST(id AS string) AS record")
    idx = with_global_index(df, "row_idx", one_based=False)
    b = with_batch_number(idx, "row_idx", batch_size=100)
    sizes = {
        r["batch_number"]: r["n"]
        for r in b.groupBy("batch_number").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {0: 100, 1: 100, 2: 50}
    collected = collect_batches(b)
    assert collected.count() == 3
    total = collected.select(F.sum(F.size("rows")).alias("s")).collect()[0]["s"]
    assert total == 250
