"""INFORMATION_SCHEMA.TASK_HISTORY (r12): every task execution
attempt — manual EXECUTE TASK and run_due ticks alike — appends a
history row (SUCCEEDED / FAILED / SKIPPED with detail), a failing task
body no longer aborts the DAG run (Snowflake records the failure and
skips the subtree), and the Snowflake table-function form
``TABLE(INFORMATION_SCHEMA.TASK_HISTORY())`` reads it back."""
from __future__ import annotations

from datetime import datetime, timezone

import pytest

from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.store import TableStore


@pytest.fixture()
def engine(spark, tmp_path):
    eng = Engine(spark, TableStore(str(tmp_path / "store")))
    eng.query("create table t as select 1 as x")
    return eng


class TestTaskHistory:
    def test_manual_execute_records_history(self, spark, engine):
        engine.query("create task t1 as select * from t")
        engine.query("create task t2 after t1 as select * from t")
        engine.query("alter task t2 resume")
        engine.query("execute task t1")
        th = engine.store.task_history()
        assert [(r["name"], r["state"]) for r in th] == [
            ("t1", "SUCCEEDED"),
            ("t2", "SUCCEEDED"),
        ]
        assert all(r["root"] == "t1" for r in th)
        assert all(r["scheduled_time"] is None for r in th)

    def test_failed_body_recorded_and_subtree_skipped(
        self, spark, engine
    ):
        engine.query("create task bad as select * from no_such_table")
        engine.query("create task child after bad as select * from t")
        engine.query("alter task child resume")
        rows = {
            (r["task_name"], r["status"])
            for r in engine.query("execute task bad").collect()
        }
        assert ("bad", "failed") in rows
        assert ("child", "skipped_upstream") in rows
        th = {r["name"]: r for r in engine.store.task_history()}
        assert th["bad"]["state"] == "FAILED"
        assert th["bad"]["error"]
        assert th["child"]["state"] == "SKIPPED"
        assert th["child"]["status_detail"] == "skipped_upstream"

    def test_failed_task_keeps_run_due_ticking(self, spark, engine):
        engine.query(
            "create task bad schedule = '60 minute' "
            "as select * from no_such_table"
        )
        engine.query(
            "create task good schedule = '60 minute' as select * from t"
        )
        engine.query("alter task bad resume")
        engine.query("alter task good resume")
        tick = engine.run_due(
            datetime(2026, 8, 16, 10, tzinfo=timezone.utc)
        )
        got = {(r["task_name"], r["status"]) for r in tick.collect()}
        assert ("bad", "failed") in got
        assert ("good", "success") in got
        sched = {
            r["name"]: r["scheduled_time"]
            for r in engine.store.task_history()
        }
        assert sched["good"] is not None  # run_due stamps fire time

    def test_sql_table_function_surface(self, spark, engine):
        engine.query("create task t1 as select * from t")
        engine.query("execute task t1")
        df = engine.query(
            "select name, state from "
            "table(information_schema.task_history()) "
            "where state = 'SUCCEEDED'"
        )
        assert [(r["name"], r["state"]) for r in df.collect()] == [
            ("t1", "SUCCEEDED")
        ]

    def test_when_skip_recorded(self, spark, engine):
        engine.query("create task gated when 1 = 0 as select * from t")
        engine.query("execute task gated")
        th = engine.store.task_history()
        assert th[-1]["state"] == "SKIPPED"
        assert th[-1]["status_detail"] == "skipped_when"

    def test_history_empty_before_any_task_runs(self, spark, engine):
        """r13 (r12 advice): querying task history before any task has
        run returns an EMPTY result, as Snowflake does — not
        TABLE_OR_VIEW_NOT_FOUND."""
        df = engine.query(
            "select name, state from "
            "table(information_schema.task_history())"
        )
        assert df.collect() == []

    def test_user_table_named_task_history_not_shadowed(
        self, spark, engine
    ):
        """r13 (r12 advice): the history view lives under an internal
        name, so a user table called task_history keeps resolving to
        the user's data while the TABLE(INFORMATION_SCHEMA...) form
        reads the real history."""
        engine.query(
            "create table task_history as select 'mine' as who"
        )
        engine.query("create task t1 as select * from t")
        engine.query("execute task t1")
        user = engine.query("select who from task_history").collect()
        assert [r["who"] for r in user] == ["mine"]
        hist = engine.query(
            "select name from table(information_schema.task_history())"
        ).collect()
        assert [r["name"] for r in hist] == ["t1"]
