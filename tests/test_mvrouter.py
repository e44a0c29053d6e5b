"""Materialized-view routing (ops/mvrouter.py): subsumption rules,
NULL-sum semantics, and the reads-the-MV-not-the-fact-table proof."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_omnata_push_spark.engine.store import TableStore
from dbt_omnata_push_spark.ops.ivm import apply_cdc
from dbt_omnata_push_spark.ops.mvrouter import (
    MaterializedView,
    create_mv,
    route,
)


def _setup(spark, tmp_path):
    store = TableStore(str(tmp_path / "s"))
    df = spark.createDataFrame(
        [(i, "s" + str(i % 3), "p" + str(i % 2), i * 10) for i in range(60)],
        "id long, status string, prio string, cents long",
    )
    mv = MaterializedView(
        table="rollup", source="facts",
        group_cols=["status", "prio"], sum_cols=["cents"],
    )
    create_mv(spark, store, mv, df)
    return store, mv, df


def test_routed_rollup_matches_direct_and_reads_only_mv(spark, tmp_path):
    store, mv, df = _setup(spark, tmp_path)
    routed = route(spark, store, [mv], "facts", ["status"], ["cents"])
    direct = df.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("cents").alias("sum_cents")
    )
    assert sorted(map(tuple, routed.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # the plan reads MV files only — the fact table never existed on disk
    assert all("rollup" in f for f in routed.inputFiles())


def test_route_refuses_non_subsumed_requests(spark, tmp_path):
    store, mv, df = _setup(spark, tmp_path)
    assert route(spark, store, [mv], "facts", ["id"], ["cents"]) is None
    assert route(spark, store, [mv], "facts", ["status"], ["other"]) is None
    assert route(spark, store, [mv], "elsewhere", ["status"], ["cents"]) is None


def test_route_global_aggregate_and_null_sum_semantics(spark, tmp_path):
    store = TableStore(str(tmp_path / "s"))
    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", None), (3, "b", 5)],
        "id long, status string, cents long",
    )
    mv = MaterializedView(
        table="rollup", source="facts",
        group_cols=["status"], sum_cols=["cents"],
    )
    create_mv(spark, store, mv, df)
    rows = {
        r["status"]: r["sum_cents"]
        for r in route(spark, store, [mv], "facts", ["status"], ["cents"]).collect()
    }
    assert rows["a"] is None  # all-NULL group stays NULL through the MV
    assert rows["b"] == 5
    g = route(spark, store, [mv], "facts", [], ["cents"]).collect()[0]
    assert g["n_rows"] == 3 and g["sum_cents"] == 5


def test_ivm_maintained_mv_keeps_serving_correct_answers(spark, tmp_path):
    """The loop the module exists for: MV built once, kept fresh by
    apply_cdc, served by the router — equals a fresh rebuild."""
    store, mv, df = _setup(spark, tmp_path)
    changes = spark.createDataFrame(
        [(100, "s0", "p0", 7, "insert"), (0, "s0", "p0", 0, "delete")],
        "id long, status string, prio string, cents long, change_type string",
    )
    maintained = apply_cdc(
        store.read(spark, "rollup"), changes, ["status", "prio"], ["cents"]
    )
    store.overwrite(spark, "rollup", maintained)
    routed = {
        r["status"]: (r["n_rows"], r["sum_cents"])
        for r in route(spark, store, [mv], "facts", ["status"], ["cents"]).collect()
    }
    base = {r[0]: r for r in df.collect()}
    # new base state: row 0 gone, row 100 (s0, 7) added
    import collections

    exp = collections.defaultdict(lambda: [0, 0])
    for i in range(1, 60):
        exp["s" + str(i % 3)][0] += 1
        exp["s" + str(i % 3)][1] += i * 10
    exp["s0"][0] += 1
    exp["s0"][1] += 7
    assert routed == {k: tuple(v) for k, v in exp.items()}
