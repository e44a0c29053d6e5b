"""Regression tests for schema evolution on append (ADVICE r7 #1).

The high-severity finding: on a PARTITIONED table, ALTER TABLE ADD
COLUMN followed by an INSERT carrying values for the new column lost
those values — append() never refreshed _META's pinned schema, read()
pins reader.schema from _META for partitioned tables, so the column
was dropped at scan and re-added as typed NULLs by the added_columns
loop. These tests pin the fixed behavior for partitioned and
unpartitioned tables, and for plain (no prior ALTER) schema widening.
"""
from __future__ import annotations

import pytest

from dbt_omnata_push_spark.engine.store import TableStore


@pytest.fixture()
def store(tmp_path):
    return TableStore(str(tmp_path / "store"))


def _rows(df):
    return {
        tuple(sorted(r.asDict().items())) for r in df.collect()
    }


class TestPartitionedAppendSchemaEvolution:
    def test_add_column_then_append_keeps_values(self, spark, store):
        base = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "id int, p string, amt int"
        )
        store.create(spark, "t", base, partition_by="p")
        store.add_column(spark, "t", "note", "string")
        # existing rows surface the new column as NULL
        assert {
            r["note"] for r in store.read(spark, "t").collect()
        } == {None}
        # append a row that CARRIES a value for the added column
        store.append(
            spark,
            "t",
            spark.createDataFrame(
                [(3, "a", 30, "filled")],
                "id int, p string, amt int, note string",
            ),
        )
        got = {r["id"]: r["note"] for r in store.read(spark, "t").collect()}
        assert got == {1: None, 2: None, 3: "filled"}

    def test_materialized_column_leaves_added_columns(self, spark, store):
        base = spark.createDataFrame([(1, "a")], "id int, p string")
        store.create(spark, "t", base, partition_by="p")
        store.add_column(spark, "t", "note", "string")
        store.append(
            spark,
            "t",
            spark.createDataFrame(
                [(2, "b", "x")], "id int, p string, note string"
            ),
        )
        meta = store.meta("t")
        assert [e[0] for e in meta.get("added_columns", [])] == []
        names = [f["name"] for f in meta["schema"]["fields"]]
        assert "note" in names

    def test_plain_widening_append_without_alter(self, spark, store):
        """mergeSchema-style widening: append carries a brand-new column
        with no prior ALTER — values must survive the pinned-schema read."""
        base = spark.createDataFrame([(1, "a")], "id int, p string")
        store.create(spark, "t", base, partition_by="p")
        store.append(
            spark,
            "t",
            spark.createDataFrame(
                [(2, "b", 9.5)], "id int, p string, score double"
            ),
        )
        got = {r["id"]: r["score"] for r in store.read(spark, "t").collect()}
        assert got == {1: None, 2: 9.5}

    def test_time_travel_unaffected(self, spark, store):
        """Historical versions stay physical: the pre-append version must
        not grow the new column retroactively."""
        base = spark.createDataFrame([(1, "a")], "id int, p string")
        store.create(spark, "t", base, partition_by="p")
        v0 = store.current_version("t")
        store.append(
            spark,
            "t",
            spark.createDataFrame(
                [(2, "b", "x")], "id int, p string, note string"
            ),
        )
        assert "note" not in store.read_version(spark, "t", v0).columns
        assert "note" in store.read(spark, "t").columns


class TestUnpartitionedAppendSchemaEvolution:
    def test_append_new_column_values_survive(self, spark, store):
        store.create(
            spark, "u", spark.createDataFrame([(1,)], "id int")
        )
        store.add_column(spark, "u", "note", "string")
        store.append(
            spark,
            "u",
            spark.createDataFrame([(2, "y")], "id int, note string"),
        )
        got = {r["id"]: r["note"] for r in store.read(spark, "u").collect()}
        assert got == {1: None, 2: "y"}
        # meta reflects materialization here too
        assert store.meta("u").get("added_columns", []) == []

    def test_append_without_new_columns_leaves_meta_alone(self, spark, store):
        store.create(
            spark, "u", spark.createDataFrame([(1,)], "id int")
        )
        store.add_column(spark, "u", "note", "string")
        before = store.meta("u")
        store.append(
            spark, "u", spark.createDataFrame([(2,)], "id int")
        )
        after = store.meta("u")
        assert after.get("added_columns") == before.get("added_columns")
        got = {r["id"]: r["note"] for r in store.read(spark, "u").collect()}
        assert got == {1: None, 2: None}
