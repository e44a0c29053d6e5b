"""Snowflake STREAM objects (round 9): offset-tracked CDC consumption.

CREATE [OR REPLACE] STREAM s ON TABLE t [AT(VERSION => n)] records an
offset; SELECT FROM s yields the net delta offset -> current with
METADATA$ACTION / METADATA$ISUPDATE; a DML statement that reads the
stream advances the offset when it succeeds (a plain SELECT does not —
Snowflake semantics). Row identity = the table's single-column
informational PRIMARY KEY; stream reads are policy-governed like every
engine read surface. Built on store.read_changes + the r9 PK/CHANGES
machinery (engine/dml.py, engine/dag.py::stream_frame).
"""
from __future__ import annotations

import pytest

from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.store import TableStore


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, TableStore(str(tmp_path / "store")))


def _mk(engine):
    engine.query(
        "create table src as "
        "select 1 as id, 'a' as tag, 10 as val "
        "union all select 2, 'b', 20 "
        "union all select 3, 'c', 30"
    )
    engine.query("alter table src add primary key (id)")
    engine.query("create stream st on table src")


class TestStreamLifecycle:
    def test_fresh_stream_is_empty(self, spark, engine):
        _mk(engine)
        assert engine.query("select * from st").count() == 0

    def test_stream_sees_changes_since_offset(self, spark, engine):
        _mk(engine)
        engine.query("update src set val = 11 where id = 1")
        engine.query("insert into src select 4, 'd', 40")
        rows = engine.query(
            "select id, `METADATA$ACTION` as action, "
            "`METADATA$ISUPDATE` as isupdate, val from st"
        ).collect()
        got = sorted((r["id"], r["action"], r["isupdate"], r["val"]) for r in rows)
        assert got == [
            (1, "DELETE", True, 10),
            (1, "INSERT", True, 11),
            (4, "INSERT", False, 40),
        ]

    def test_plain_select_does_not_advance(self, spark, engine):
        _mk(engine)
        engine.query("insert into src select 4, 'd', 40")
        assert engine.query("select * from st").count() == 1
        assert engine.query("select * from st").count() == 1  # still there

    def test_consuming_dml_advances_offset(self, spark, engine):
        _mk(engine)
        engine.query("insert into src select 4, 'd', 40")
        engine.query(
            "create table consumed as "
            "select id, val, `METADATA$ACTION` as action from st"
        )
        assert engine.query("select count(*) as n from consumed").collect()[0]["n"] == 1
        # offset advanced: the stream is now empty
        assert engine.query("select * from st").count() == 0
        # new changes AFTER consumption appear again
        engine.query("delete from src where id = 2")
        rows = engine.query(
            "select id, `METADATA$ACTION` as action from st"
        ).collect()
        assert [(r["id"], r["action"]) for r in rows] == [(2, "DELETE")]

    def test_insert_consumption_advances(self, spark, engine):
        _mk(engine)
        engine.query("update src set val = 99 where id = 3")
        engine.query("create table sink as select 0 as id, 0 as val limit 0")
        engine.query(
            "insert into sink select id, val from st "
            "where `METADATA$ACTION` = 'INSERT'"
        )
        assert engine.query("select * from st").count() == 0
        assert engine.query("select val from sink").collect()[0]["val"] == 99

    def test_non_consuming_dml_does_not_advance_other_streams(
        self, spark, engine
    ):
        _mk(engine)
        engine.query("insert into src select 4, 'd', 40")
        # a DML that does NOT reference the stream leaves it alone
        engine.query("create table unrelated as select 1 as x")
        assert engine.query("select * from st").count() == 1

    def test_stream_name_inside_string_literal_does_not_advance(
        self, spark, engine
    ):
        _mk(engine)
        engine.query("insert into src select 4, 'd', 40")
        # the literal 'st' is data, not a stream reference
        engine.query("create table tagged as select 'st' as label")
        assert engine.query("select * from st").count() == 1

    def test_show_create_replace_drop(self, spark, engine):
        _mk(engine)
        rows = engine.query("show streams").collect()
        assert [(r["name"], r["table_name"]) for r in rows] == [("st", "src")]
        with pytest.raises(ValueError, match="already exists"):
            engine.query("create stream st on table src")
        engine.query("update src set val = 0 where id = 1")
        # OR REPLACE resets the offset to current — stream empties
        engine.query("create or replace stream st on table src")
        assert engine.query("select * from st").count() == 0
        engine.query("drop stream st")
        assert engine.query("show streams").count() == 0
        with pytest.raises(ValueError, match="not found"):
            engine.query("drop stream st")

    def test_at_version_offset(self, spark, engine):
        _mk(engine)
        engine.query("update src set val = 11 where id = 1")  # v1
        engine.query("create stream st0 on table src at(version => 0)")
        # st0 sees the v0 -> current delta even though created at v1
        rows = engine.query("select id from st0").collect()
        assert sorted(set(r["id"] for r in rows)) == [1]

    def test_requires_primary_key(self, spark, engine):
        engine.query("create table nopk as select 1 as id")
        with pytest.raises(ValueError, match="PRIMARY KEY"):
            engine.query("create stream s2 on table nopk")

    def test_incremental_model_consumes_stream_exactly_once(
        self, spark, engine
    ):
        """The dbt-on-Snowflake idiom: an incremental model refs a
        stream; each successful run processes the unconsumed delta and
        advances the offset — re-running without new changes appends
        nothing; a failed run leaves the offset (re-delivery)."""
        from pyspark.sql import functions as F

        from dbt_omnata_push_spark.engine.model import Model

        _mk(engine)

        def builder(ctx):
            return (
                ctx.ref("st")
                .filter(
                    (F.col("METADATA$ACTION") == "INSERT")
                    & (~F.col("METADATA$ISUPDATE"))
                )
                .select("id", "val")
            )

        engine.register(
            Model(
                "new_rows",
                builder=builder,
                config={
                    "materialized": "incremental",
                    "incremental_strategy": "append",
                },
                depends_on=["st"],
            )
        )
        assert engine.run()["new_rows"].status == "success"
        assert engine.ref("new_rows").count() == 0  # fresh stream empty
        engine.query("insert into src select 4, 'd', 40")
        engine.run()
        got = [r["id"] for r in engine.ref("new_rows").collect()]
        assert got == [4]
        engine.run()  # nothing new: the delta was consumed
        assert engine.ref("new_rows").count() == 1
        engine.query("insert into src select 5, 'e', 50")
        engine.run()
        assert sorted(
            r["id"] for r in engine.ref("new_rows").collect()
        ) == [4, 5]

    def test_failed_model_run_redelivers_stream_delta(self, spark, engine):
        from dbt_omnata_push_spark.engine.model import Model

        _mk(engine)
        engine.query("insert into src select 4, 'd', 40")
        state = {"fail": True}

        def builder(ctx):
            df = ctx.ref("st").select("id", "val")
            if state["fail"]:
                raise RuntimeError("boom")
            return df

        engine.register(
            Model(
                "flaky",
                builder=builder,
                config={
                    "materialized": "incremental",
                    "incremental_strategy": "append",
                },
                depends_on=["st"],
            )
        )
        assert engine.run()["flaky"].status == "error"
        state["fail"] = False
        assert engine.run()["flaky"].status == "success"
        # the failed run did NOT advance: the delta arrived on retry
        assert [r["id"] for r in engine.ref("flaky").collect()] == [4]

    def test_transactional_script_rolls_back_stream_offset(
        self, spark, engine
    ):
        """A failing transactional script must not keep a consumed
        stream's advanced offset — the delta would be silently lost."""
        _mk(engine)
        engine.query("insert into src select 4, 'd', 40")
        with pytest.raises(Exception):
            engine.execute_script(
                """
                create table consumed as select id, val from st;
                select boom from nowhere;
                """,
                transaction=True,
            )
        # offset rolled back with the tables: the delta is still there
        assert engine.query("select * from st").count() == 1
        # and a stream CREATED by the failed script is gone
        with pytest.raises(Exception):
            engine.execute_script(
                """
                create stream st2 on table src;
                select boom from nowhere;
                """,
                transaction=True,
            )
        assert "st2" not in engine.store.streams()

    def test_stream_reads_are_policy_governed(self, spark, engine):
        _mk(engine)
        engine.query(
            "create masking policy vmask as (v int) returns int -> "
            "case when current_role() = 'ADMIN' then v else -1 end"
        )
        engine.query(
            "alter table src modify column val set masking policy vmask"
        )
        engine.query("insert into src select 4, 'd', 40")
        rows = engine.query("select id, val from st").collect()
        assert [(r["id"], r["val"]) for r in rows] == [(4, -1)]
        engine.vars["role"] = "ADMIN"
        rows = engine.query("select id, val from st").collect()
        assert [(r["id"], r["val"]) for r in rows] == [(4, 40)]
