"""dbt generic (schema) tests: the four canonical builders
(engine/generic_tests.py) and their Engine raise-on-failure wiring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.generic_tests import (
    accepted_values_failures,
    not_null_failures,
    relationships_failures,
    unique_failures,
)
from dbt_omnata_push_spark.engine.store import TableStore


def test_unique_ignores_nulls_counts_dupe_groups(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (2,), (2,), (3,), (None,), (None,)], "k int"
    )
    rows = unique_failures(df, "k").collect()
    assert len(rows) == 1  # one duplicated value group; NULLs not dupes
    assert rows[0]["value"] == 2 and rows[0]["n_rows"] == 3


def test_not_null_failures_are_exactly_null_rows(spark):
    df = spark.createDataFrame([(1, "a"), (None, "b")], "k int, v string")
    rows = not_null_failures(df, "k").collect()
    assert [r["v"] for r in rows] == ["b"]


def test_accepted_values_ignores_nulls(spark):
    df = spark.createDataFrame(
        [("F",), ("O",), ("P",), ("P",), (None,)], "s string"
    )
    rows = {r["value"]: r["n_rows"] for r in accepted_values_failures(df, "s", ["F", "O"]).collect()}
    assert rows == {"P": 2}


def test_relationships_orphans_only_nonnull(spark):
    child = spark.createDataFrame([(1,), (2,), (9,), (None,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    rows = relationships_failures(child, "fk", parent, "pk").collect()
    assert [r["fk"] for r in rows] == [9]  # NULL child key is not an orphan


def test_relationships_plan_is_broadcast_anti(spark):
    child = spark.createDataFrame([(1,)], "fk int")
    parent = spark.createDataFrame([(1,)], "pk int")
    plan = (
        relationships_failures(child, "fk", parent, "pk")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan


def test_engine_generic_test_raises_on_failures(spark, tmp_path):
    eng = Engine(spark, TableStore(str(tmp_path)))
    good = spark.createDataFrame([(1,), (2,)], "k int")
    eng.generic_test("unique", good, "k")  # passes silently
    bad = spark.createDataFrame([(1,), (1,)], "k int")
    with pytest.raises(AssertionError, match="unique test failed"):
        eng.generic_test("unique", bad, "k")
    with pytest.raises(ValueError, match="unknown generic test"):
        eng.generic_test("no_such", good, "k")


def test_engine_generic_test_relationships_end_to_end(spark, tmp_path):
    eng = Engine(spark, TableStore(str(tmp_path)))
    child = spark.createDataFrame([(1,), (7,)], "fk int")
    parent = spark.createDataFrame([(1,)], "pk int")
    with pytest.raises(AssertionError, match="relationships test failed: 1"):
        eng.generic_test("relationships", child, "fk", parent, "pk")


def test_run_schema_tests_end_to_end(spark, tmp_path):
    """dbt-style column_tests config through materialize + report."""
    from dbt_omnata_push_spark.engine.model import Model

    eng = Engine(spark, TableStore(str(tmp_path / "st")))
    eng.seed(
        "customers_src",
        spark.createDataFrame([(1, "F"), (2, "O"), (2, "X")], "id int, s string"),
    )
    eng.register(
        Model(
            name="customers_m",
            sql="SELECT * FROM {{ ref('customers_src') }}",
            config={
                "materialized": "table",
                "column_tests": {
                    "id": ["unique", "not_null"],
                    "s": [{"accepted_values": {"values": ["F", "O"]}}],
                },
            },
        )
    )
    eng.register(
        Model(
            name="orders_m",
            sql="SELECT id + 10 AS cust_ref FROM {{ ref('customers_m') }}",
            config={
                "materialized": "table",
                "column_tests": {
                    "cust_ref": [
                        {"relationships": {"to": "customers_m", "field": "id"}}
                    ]
                },
            },
        )
    )
    eng.run()
    res = eng.run_schema_tests()
    by = {k: (v.status, v.rows_affected) for k, v in res.items()}
    assert by["unique__customers_m__id"] == ("error", 1)  # id=2 dup group
    assert by["not_null__customers_m__id"] == ("success", 0)
    assert by["accepted_values__customers_m__s"] == ("error", 1)  # 'X'
    assert by["relationships__orders_m__cust_ref"] == ("error", 3)  # all orphaned
    # every declared test reported, none raised
    assert len(res) == 4
