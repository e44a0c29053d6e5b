"""Scheduled TASK execution (r11, VERDICT r10 #3).

``CREATE TASK ... SCHEDULE = '...'`` is interpreted by
``Engine.run_due(now)``: an explicit scheduler tick with an INJECTABLE
clock — deterministic tests, no wall-clock in queries. Interval
('N MINUTE') and cron ('USING CRON m h dom mon dow [tz]') subsets;
missed ticks collapse into one run; suspended roots never fire.
"""
from __future__ import annotations

from datetime import datetime, timezone

import pytest

from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.schedule import parse_schedule
from dbt_omnata_push_spark.engine.store import TableStore


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, TableStore(str(tmp_path / "store")))


def _dt(s: str) -> datetime:
    return datetime.fromisoformat(s).replace(tzinfo=timezone.utc)


class TestScheduleParsing:
    def test_interval_minutes(self):
        s = parse_schedule("5 MINUTE")
        assert s.kind == "interval"
        assert s.interval.total_seconds() == 300
        assert parse_schedule("2 hours").interval.total_seconds() == 7200

    def test_cron_fields(self):
        s = parse_schedule("USING CRON */15 8-10 * * MON-FRI UTC")
        assert s.kind == "cron"
        assert s.fields[0] == {0, 15, 30, 45}
        assert s.fields[1] == {8, 9, 10}
        assert s.fields[4] == {1, 2, 3, 4, 5}

    def test_broken_schedule_fails_create(self, spark, engine):
        with pytest.raises(ValueError, match="SCHEDULE"):
            engine.query(
                "create task bad schedule = 'whenever' as select 1"
            )

    def test_schedule_with_after_rejected(self, spark, engine):
        engine.query("create task root1 as select 1")
        with pytest.raises(ValueError, match="mutually exclusive"):
            engine.query(
                "create task child1 schedule = '1 minute' after root1 "
                "as select 1"
            )

    def test_cron_out_of_range_rejected(self):
        with pytest.raises(ValueError, match="range"):
            parse_schedule("USING CRON 61 * * * *")


class TestIntervalDue:
    def test_never_fired_is_due(self):
        s = parse_schedule("10 MINUTE")
        assert s.due(None, _dt("2026-01-01T00:00:00")) is not None

    def test_not_elapsed_not_due(self):
        s = parse_schedule("10 MINUTE")
        assert (
            s.due(_dt("2026-01-01T00:00:00"), _dt("2026-01-01T00:09:59"))
            is None
        )

    def test_elapsed_due(self):
        s = parse_schedule("10 MINUTE")
        fire = s.due(_dt("2026-01-01T00:00:00"), _dt("2026-01-01T00:10:00"))
        assert fire == _dt("2026-01-01T00:10:00")


class TestCronDue:
    def test_match_in_window(self):
        s = parse_schedule("USING CRON 30 14 * * * UTC")
        fire = s.due(_dt("2026-01-01T14:00:00"), _dt("2026-01-01T15:00:00"))
        assert fire == _dt("2026-01-01T14:30:00")

    def test_no_match_in_window(self):
        s = parse_schedule("USING CRON 30 14 * * *")
        assert (
            s.due(_dt("2026-01-01T14:31:00"), _dt("2026-01-01T15:00:00"))
            is None
        )

    def test_missed_ticks_collapse_to_latest(self):
        s = parse_schedule("USING CRON 0 * * * *")
        fire = s.due(_dt("2026-01-01T00:00:00"), _dt("2026-01-01T05:10:00"))
        assert fire == _dt("2026-01-01T05:00:00")

    def test_dow_restriction(self):
        # 2026-01-04 is a Sunday
        s = parse_schedule("USING CRON 0 9 * * SUN")
        assert s._matches(_dt("2026-01-04T09:00:00"))
        assert not s._matches(_dt("2026-01-05T09:00:00"))

    def test_timezone(self):
        # 09:00 in New York = 14:00 UTC in January (EST)
        s = parse_schedule("USING CRON 0 9 * * * America/New_York")
        assert s._matches(_dt("2026-01-05T14:00:00"))
        assert not s._matches(_dt("2026-01-05T09:00:00"))


class TestRunDue:
    def _mk_task(self, engine, sched="10 MINUTE", resume=True):
        engine.query(
            "create table log as select cast(id as bigint) as n from range(0)"
        )
        engine.query(
            f"create task tick schedule = '{sched}' as "
            "insert into log select 1"
        )
        if resume:
            engine.query("alter task tick resume")

    def test_elapsed_fires_and_stamps(self, spark, engine):
        self._mk_task(engine)
        t0 = _dt("2026-01-01T00:00:00")
        rows = engine.run_due(t0).collect()
        assert [(r["task_name"], r["status"]) for r in rows] == [
            ("tick", "success")
        ]
        assert engine.query("select * from log").count() == 1
        shown = {
            r["name"]: r["last_run"]
            for r in engine.query("show tasks").collect()
        }
        assert shown["tick"] == t0.isoformat()

    def test_not_elapsed_does_not_fire(self, spark, engine):
        self._mk_task(engine)
        engine.run_due(_dt("2026-01-01T00:00:00"))
        again = engine.run_due(_dt("2026-01-01T00:05:00"))
        assert again.count() == 0
        assert engine.query("select * from log").count() == 1
        # ...and once elapsed, fires again
        third = engine.run_due(_dt("2026-01-01T00:10:00"))
        assert third.count() == 1
        assert engine.query("select * from log").count() == 2

    def test_suspended_root_never_fires(self, spark, engine):
        self._mk_task(engine, resume=False)
        assert engine.run_due(_dt("2026-01-01T00:00:00")).count() == 0
        assert engine.query("select * from log").count() == 0

    def test_suspend_resume_transitions(self, spark, engine):
        self._mk_task(engine)
        engine.run_due(_dt("2026-01-01T00:00:00"))
        engine.query("alter task tick suspend")
        assert engine.run_due(_dt("2026-01-01T01:00:00")).count() == 0
        engine.query("alter task tick resume")
        assert engine.run_due(_dt("2026-01-01T02:00:00")).count() == 1
        assert engine.query("select * from log").count() == 2

    def test_scheduled_root_fires_when_gated_dag(self, spark, engine):
        engine.query(
            "create table log as select cast(id as bigint) as n from range(0)"
        )
        engine.query(
            "create task root schedule = '1 minute' as "
            "insert into log select 1"
        )
        engine.query(
            "create task child after root when 1 = 0 as "
            "insert into log select 2"
        )
        engine.query("alter task root resume")
        engine.query("alter task child resume")
        rows = engine.run_due(_dt("2026-01-01T00:00:00")).collect()
        statuses = {r["task_name"]: r["status"] for r in rows}
        assert statuses == {"root": "success", "child": "skipped_when"}
        assert engine.query("select * from log").count() == 1

    def test_cron_task_fires_on_match_only(self, spark, engine):
        self._mk_task(engine, sched="USING CRON 0 12 * * * UTC")
        assert engine.run_due(_dt("2026-01-01T11:59:00")).count() == 0
        assert engine.run_due(_dt("2026-01-01T12:00:30")).count() == 1
        # same cron minute, already stamped: no double fire
        assert engine.run_due(_dt("2026-01-01T12:00:59")).count() == 0
        assert engine.query("select * from log").count() == 1

    def test_two_roots_one_due(self, spark, engine):
        engine.query(
            "create table log as select cast(id as bigint) as n from range(0)"
        )
        engine.query(
            "create task a schedule = '1 minute' as insert into log select 1"
        )
        engine.query(
            "create task b schedule = '120 minute' as "
            "insert into log select 2"
        )
        engine.query("alter task a resume")
        engine.query("alter task b resume")
        engine.run_due(_dt("2026-01-01T00:00:00"))  # both due (never fired)
        rows = engine.run_due(_dt("2026-01-01T00:30:00")).collect()
        assert [r["root"] for r in rows] == ["a"]


class TestAlterTaskSchedule:
    def test_set_and_unset_schedule(self, spark, engine):
        engine.query(
            "create table log as select cast(id as bigint) as n from range(0)"
        )
        engine.query("create task t1 as insert into log select 1")
        engine.query("alter task t1 set schedule = '5 minute'")
        shown = {
            r["name"]: r["schedule"]
            for r in engine.query("show tasks").collect()
        }
        assert shown["t1"] == "5 minute"
        engine.query("alter task t1 resume")
        assert engine.run_due(_dt("2026-01-01T00:00:00")).count() == 1
        engine.query("alter task t1 unset schedule")
        assert engine.run_due(_dt("2026-01-01T01:00:00")).count() == 0

    def test_set_schedule_revalidates(self, spark, engine):
        engine.query("create task t2 as select 1")
        with pytest.raises(ValueError, match="SCHEDULE"):
            engine.query("alter task t2 set schedule = 'nope'")

    def test_set_schedule_on_child_rejected(self, spark, engine):
        engine.query("create task root as select 1")
        engine.query("create task kid after root as select 1")
        with pytest.raises(ValueError, match="mutually exclusive"):
            engine.query("alter task kid set schedule = '1 minute'")

    def test_set_schedule_clears_last_run_anchor(self, spark, engine):
        engine.query(
            "create table log as select cast(id as bigint) as n from range(0)"
        )
        engine.query(
            "create task t3 schedule = '60 minute' as insert into log select 1"
        )
        engine.query("alter task t3 resume")
        engine.run_due(_dt("2026-01-01T00:00:00"))  # fires, stamps
        engine.query("alter task t3 set schedule = '999 minute'")
        # anchor cleared -> never-fired -> due at the next tick
        assert engine.run_due(_dt("2026-01-01T00:01:00")).count() == 1
