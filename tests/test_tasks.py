"""Snowflake TASK objects (round 9): a DAG of SQL statements.

CREATE [OR REPLACE] TASK t [SCHEDULE = '...'] [AFTER t1[, t2]] AS
<statement> records a node (created SUSPENDED, like Snowflake; the
SCHEDULE string is metadata only — no scheduler in a batch engine);
ALTER TASK RESUME/SUSPEND flips the state; EXECUTE TASK t manually
triggers t (regardless of its own state, Snowflake's manual-trigger
rule) plus its RESUMED descendants in topological order — a suspended
child's subtree is skipped. DROP TASK refuses while children point at
it; OR REPLACE cannot close a cycle through an existing ancestor chain.
"""
from __future__ import annotations

import pytest

from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.store import TableStore


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, TableStore(str(tmp_path / "store")))


def _mk(engine):
    engine.query("create table src as select id from range(5)")
    engine.query(
        "create task t_root as create or replace table agg as "
        "select count(*) as n from src"
    )


class TestTaskLifecycle:
    def test_show_tasks(self, spark, engine):
        _mk(engine)
        rows = engine.query("show tasks").collect()
        assert [(r["name"], r["state"], r["after"]) for r in rows] == [
            ("t_root", "suspended", "")
        ]

    def test_duplicate_create_errors(self, spark, engine):
        _mk(engine)
        with pytest.raises(ValueError, match="already exists"):
            engine.query("create task t_root as select 1")

    def test_after_must_exist(self, spark, engine):
        with pytest.raises(ValueError, match="predecessor"):
            engine.query("create task t1 after nope as select 1")

    def test_or_replace_cycle_refused(self, spark, engine):
        engine.query("create task a as select 1")
        engine.query("create task b after a as select 1")
        with pytest.raises(ValueError, match="cycle"):
            engine.query("create or replace task a after b as select 1")

    def test_drop_with_children_refused_then_ok(self, spark, engine):
        _mk(engine)
        engine.query("create task t_child after t_root as select 1")
        with pytest.raises(ValueError, match="child"):
            engine.query("drop task t_root")
        engine.query("drop task t_child")
        engine.query("drop task t_root")
        assert engine.query("show tasks").count() == 0

    def test_drop_missing_errors(self, spark, engine):
        with pytest.raises(ValueError, match="not found"):
            engine.query("drop task nope")

    def test_alter_resume_suspend(self, spark, engine):
        _mk(engine)
        engine.query("alter task t_root resume")
        assert (
            engine.query("show tasks").collect()[0]["state"] == "started"
        )
        engine.query("alter task t_root suspend")
        assert (
            engine.query("show tasks").collect()[0]["state"] == "suspended"
        )


class TestExecuteTask:
    def test_named_task_runs_even_suspended(self, spark, engine):
        _mk(engine)
        rows = engine.query("execute task t_root").collect()
        assert [(r["task_name"], r["status"]) for r in rows] == [
            ("t_root", "success")
        ]
        assert engine.query("select n from agg").collect()[0]["n"] == 5

    def test_suspended_child_subtree_skipped(self, spark, engine):
        _mk(engine)
        engine.query(
            "create task t_child after t_root as create or replace "
            "table agg2 as select n * 2 as n2 from agg"
        )
        rows = engine.query("execute task t_root").collect()
        assert [r["task_name"] for r in rows] == ["t_root"]
        with pytest.raises(Exception):
            engine.query("select * from agg2").collect()

    def test_resumed_chain_runs_in_order(self, spark, engine):
        _mk(engine)
        engine.query(
            "create task t_mid after t_root as create or replace table "
            "agg2 as select n * 2 as n2 from agg"
        )
        engine.query(
            "create task t_leaf after t_mid as create or replace table "
            "agg3 as select n2 + 1 as n3 from agg2"
        )
        engine.query("alter task t_mid resume")
        engine.query("alter task t_leaf resume")
        rows = engine.query("execute task t_root").collect()
        assert [r["task_name"] for r in sorted(rows, key=lambda r: r["run_order"])] == [
            "t_root",
            "t_mid",
            "t_leaf",
        ]
        assert engine.query("select n3 from agg3").collect()[0]["n3"] == 11

    def test_diamond_runs_child_once_after_both_parents(
        self, spark, engine
    ):
        _mk(engine)
        engine.query(
            "create task t_a after t_root as create or replace table "
            "ta as select n + 1 as v from agg"
        )
        engine.query(
            "create task t_b after t_root as create or replace table "
            "tb as select n + 2 as v from agg"
        )
        engine.query(
            "create task t_join after t_a, t_b as create or replace "
            "table tj as select (select v from ta) + (select v from tb) "
            "as v"
        )
        for t in ("t_a", "t_b", "t_join"):
            engine.query(f"alter task {t} resume")
        rows = sorted(
            engine.query("execute task t_root").collect(),
            key=lambda r: r["run_order"],
        )
        names = [r["task_name"] for r in rows]
        assert names[0] == "t_root" and names[-1] == "t_join"
        assert set(names[1:3]) == {"t_a", "t_b"}
        assert len(names) == 4  # diamond child runs exactly once
        assert engine.query("select v from tj").collect()[0]["v"] == 13

    def test_execute_missing_errors(self, spark, engine):
        with pytest.raises(ValueError, match="not found"):
            engine.query("execute task nope")


class TestTaskWhenClause:
    """r10 (VERDICT r9 #6): WHEN <bool expr> gates a task at run time —
    FALSE skips the task AND its subtree, like Snowflake's conditional
    tasks; the condition surfaces in SHOW TASKS."""

    def test_when_false_skips_task_and_subtree(self, spark, engine):
        engine.query("create table src as select id from range(5)")
        engine.query(
            "create task t_gate when 1 = 2 as "
            "create or replace table never as select 1 as x"
        )
        engine.query(
            "create task t_child after t_gate as "
            "create or replace table also_never as select 2 as x"
        )
        engine.query("alter task t_child resume")
        rows = {
            r["task_name"]: r["status"]
            for r in engine.query("execute task t_gate").collect()
        }
        assert rows == {
            "t_gate": "skipped_when",
            "t_child": "skipped_upstream",
        }
        assert not engine.store.exists("never")
        assert not engine.store.exists("also_never")

    def test_when_true_runs(self, spark, engine):
        engine.query("create table src as select id from range(5)")
        engine.query(
            "create task t_go when (select count(*) from src) > 3 as "
            "create or replace table made as select count(*) as n from src"
        )
        rows = engine.query("execute task t_go").collect()
        assert [(r["task_name"], r["status"]) for r in rows] == [
            ("t_go", "success")
        ]
        assert engine.store.exists("made")

    def test_when_with_cast_as_inside_condition(self, spark, engine):
        # the WHEN/AS boundary must be the first TOP-LEVEL `as`
        engine.query(
            "create task t_cast when cast(1 as int) = 1 as "
            "create or replace table made2 as select 1 as x"
        )
        rows = engine.query("execute task t_cast").collect()
        assert rows[0]["status"] == "success"
        assert engine.store.exists("made2")

    def test_show_tasks_surfaces_condition_and_after(self, spark, engine):
        engine.query("create task t_a when 1 = 1 as select 1")
        engine.query("create task t_b after t_a as select 2")
        rows = {
            r["name"]: (r["condition"], r["after"])
            for r in engine.query("show tasks").collect()
        }
        assert rows == {"t_a": ("1 = 1", ""), "t_b": (None, "t_a")}
