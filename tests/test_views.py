"""Snowflake non-materialized VIEWs (round 9): stored SELECTs,
re-resolved at every read.

CREATE [OR REPLACE] VIEW v AS <select> stores the body and validates it
resolves immediately (Snowflake errors on a broken definition at
create); SELECT FROM v always reflects the base tables' CURRENT
versions; views may reference other views (fixpoint registration);
reads inherit governance because view bodies resolve against the
engine's masked/filtered table views, never raw storage.
"""
from __future__ import annotations

import pytest

from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.store import TableStore


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, TableStore(str(tmp_path / "store")))


def _mk(engine):
    engine.query("create table src as select id, id % 3 as grp from range(9)")
    engine.query(
        "create view v1 as select grp, count(*) as n from src group by grp"
    )


class TestViews:
    def test_read_and_show(self, spark, engine):
        _mk(engine)
        rows = engine.query("select grp, n from v1 order by grp").collect()
        assert [(r["grp"], r["n"]) for r in rows] == [(0, 3), (1, 3), (2, 3)]
        shows = engine.query("show views").collect()
        assert [r["name"] for r in shows] == ["v1"]

    def test_view_over_view(self, spark, engine):
        _mk(engine)
        engine.query("create view v2 as select sum(n) as total from v1")
        assert (
            engine.query("select total from v2").collect()[0]["total"] == 9
        )

    def test_reads_reflect_current_version(self, spark, engine):
        _mk(engine)
        engine.query("create view v2 as select sum(n) as total from v1")
        engine.query("insert into src select 100, 0")
        assert (
            engine.query("select total from v2").collect()[0]["total"] == 10
        )

    def test_duplicate_create_errors_or_replace_works(self, spark, engine):
        _mk(engine)
        with pytest.raises(ValueError, match="already exists"):
            engine.query("create view v1 as select 1 as x")
        engine.query("create or replace view v1 as select 1 as x")
        assert engine.query("select x from v1").collect()[0]["x"] == 1

    def test_broken_definition_fails_at_create_and_rolls_back(
        self, spark, engine
    ):
        _mk(engine)
        with pytest.raises(Exception, match="missing_t"):
            engine.query("create view bad as select nope from missing_t")
        assert [r["name"] for r in engine.query("show views").collect()] == [
            "v1"
        ]

    def test_table_name_collision_refused(self, spark, engine):
        _mk(engine)
        with pytest.raises(ValueError, match="table with that name"):
            engine.query("create view src as select 1")

    def test_drop_view(self, spark, engine):
        _mk(engine)
        engine.query("drop view v1")
        assert engine.query("show views").count() == 0
        with pytest.raises(ValueError, match="not found"):
            engine.query("drop view v1")

    def test_view_reads_are_masked(self, spark, engine):
        """Governance composes: a view over a masked table serves
        masked values — the body resolves against the engine's
        governed temp views, not raw storage."""
        engine.vars["role"] = "PUBLIC"
        engine.query("create table pii as select 1 as id, 'alice' as name")
        engine.query(
            "create masking policy hide_name as (val string) returns "
            "string -> case when current_role() = 'ADMIN' then val "
            "else '***' end"
        )
        engine.query(
            "alter table pii modify column name set masking policy "
            "hide_name"
        )
        engine.query("create view pv as select name from pii")
        assert (
            engine.query("select name from pv").collect()[0]["name"]
            == "***"
        )
        engine.vars["role"] = "ADMIN"
        assert (
            engine.query("select name from pv").collect()[0]["name"]
            == "alice"
        )


class TestViewTransactions:
    def test_ddl_auto_commits_in_failed_transaction(self, spark, engine):
        """Snowflake parity: DDL is never transactional — a view
        created inside a script that later fails STAYS created (only
        table DATA rolls back)."""
        _mk(engine)
        with pytest.raises(Exception):
            engine.execute_script(
                """
                create view vtx as select count(*) as n from src;
                select not_a_column from nowhere;
                """,
                transaction=True,
            )
        names = [r["name"] for r in engine.query("show views").collect()]
        assert "vtx" in names
