"""Snowflake CHANGES clause + informational PRIMARY KEY (round 9).

``ALTER TABLE t ADD [CONSTRAINT n] PRIMARY KEY (col)`` records an
informational PK (Snowflake records, does not enforce); the PK is the
row identity for ``FROM t CHANGES(INFORMATION => DEFAULT|APPEND_ONLY)
AT(VERSION => n) [END(VERSION => m)]``, which resolves to the store's
version-diff CDC (store.read_changes) rendered with Snowflake's
METADATA$ACTION / METADATA$ISUPDATE columns, policy-governed like any
engine read. Also covers the SQL surface for CHECK constraints
(previously engine-API only).
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
        "create table acct as "
        "select 1 as id, 'alice' as name, 100 as bal "
        "union all select 2, 'bob', 200 "
        "union all select 3, 'carol', 300"
    )
    engine.query("alter table acct add constraint acct_pk primary key (id)")


class TestPrimaryKey:
    def test_add_show_drop(self, spark, engine):
        _mk(engine)
        rows = engine.query("show primary keys").collect()
        assert [(r["table_name"], r["constraint_name"], r["columns"]) for r in rows] == [
            ("acct", "acct_pk", "id")
        ]
        engine.query("alter table acct drop primary key")
        assert engine.query("show primary keys").count() == 0

    def test_unnamed_form_defaults_name(self, spark, engine):
        engine.query("create table t1 as select 1 as id")
        engine.query("alter table t1 add primary key (id)")
        assert engine.store.primary_key("t1")["name"] == "pk"

    def test_duplicate_pk_refuses(self, spark, engine):
        _mk(engine)
        with pytest.raises(ValueError, match="already has"):
            engine.query("alter table acct add primary key (name)")

    def test_missing_column_refuses(self, spark, engine):
        engine.query("create table t2 as select 1 as id")
        with pytest.raises(ValueError, match="not on"):
            engine.query("alter table t2 add primary key (nope)")

    def test_pk_survives_rewrite(self, spark, engine):
        _mk(engine)
        engine.query("update acct set bal = bal + 1")
        assert engine.store.primary_key("acct")["columns"] == ["id"]


class TestCheckConstraintSql:
    def test_add_enforces_on_write(self, spark, engine):
        _mk(engine)
        engine.query(
            "alter table acct add constraint bal_pos check (bal > 0)"
        )
        with pytest.raises(Exception):
            engine.query("insert into acct select 4, 'dave', -5")
        # violating write never committed
        assert engine.query("select count(*) as n from acct").collect()[0]["n"] == 3
        engine.query("alter table acct drop constraint bal_pos")
        engine.query("insert into acct select 4, 'dave', -5")
        assert engine.query("select count(*) as n from acct").collect()[0]["n"] == 4

    def test_drop_missing_constraint_errors(self, spark, engine):
        _mk(engine)
        with pytest.raises(ValueError, match="not found"):
            engine.query("alter table acct drop constraint nope")

    def test_broken_predicate_fails_at_alter(self, spark, engine):
        _mk(engine)
        with pytest.raises(Exception):
            engine.query(
                "alter table acct add constraint bad check (no_col > 0)"
            )
        # not registered
        assert not (engine.store.meta("acct").get("constraints") or {})


class TestChangesClause:
    def test_default_emits_full_delta(self, spark, engine):
        _mk(engine)  # v0
        engine.query("update acct set bal = 150 where id = 1")  # v1
        engine.query("delete from acct where id = 2")  # v2
        engine.query("insert into acct select 4, 'dave', 400")  # v3
        rows = engine.query(
            "select id, name, bal, `METADATA$ACTION` as action, "
            "`METADATA$ISUPDATE` as isupdate "
            "from acct changes(information => default) at(version => 0)"
        ).collect()
        got = sorted((r["id"], r["action"], r["isupdate"], r["bal"]) for r in rows)
        assert got == [
            (1, "DELETE", True, 100),  # update pre-image
            (1, "INSERT", True, 150),  # update post-image
            (2, "DELETE", False, 200),
            (4, "INSERT", False, 400),
        ]

    def test_end_version_bounds_the_window(self, spark, engine):
        _mk(engine)
        engine.query("update acct set bal = 150 where id = 1")  # v1
        engine.query("delete from acct where id = 2")  # v2
        rows = engine.query(
            "select id, `METADATA$ACTION` as action "
            "from acct changes(information => default) "
            "at(version => 0) end(version => 1)"
        ).collect()
        assert sorted(set(r["id"] for r in rows)) == [1]  # v2 delete excluded

    def test_append_only_shows_inserts_only(self, spark, engine):
        _mk(engine)
        engine.query("update acct set bal = 150 where id = 1")  # v1
        engine.query("insert into acct select 4, 'dave', 400")  # v2
        rows = engine.query(
            "select id, `METADATA$ACTION` as action, "
            "`METADATA$ISUPDATE` as isupdate "
            "from acct changes(information => append_only) at(version => 0)"
        ).collect()
        assert [(r["id"], r["action"], r["isupdate"]) for r in rows] == [
            (4, "INSERT", False)
        ]

    def test_requires_primary_key(self, spark, engine):
        engine.query("create table nopk as select 1 as id")
        engine.query("update nopk set id = 2")
        with pytest.raises(ValueError, match="PRIMARY KEY"):
            engine.query(
                "select * from nopk changes(information => default) "
                "at(version => 0)"
            )

    def test_composite_pk_changes(self, spark, engine):
        """r9: composite primary keys fold null-safe equality over
        every part — an update to a NON-key column on a two-part key
        emits exactly one pre/post pair."""
        engine.query(
            "create table mpk as "
            "select 1 as a, 10 as b, 'x' as payload "
            "union all select 1, 20, 'y' "
            "union all select 2, 10, 'z'"
        )
        engine.query("alter table mpk add primary key (a, b)")
        engine.query("update mpk set payload = 'Y2' where a = 1 and b = 20")
        rows = engine.query(
            "select a, b, payload, `METADATA$ACTION` as action, "
            "`METADATA$ISUPDATE` as isupdate "
            "from mpk changes(information => default) at(version => 0)"
        ).collect()
        got = sorted((r["a"], r["b"], r["payload"], r["action"]) for r in rows)
        assert got == [(1, 20, "Y2", "INSERT"), (1, 20, "y", "DELETE")]
        assert all(r["isupdate"] for r in rows)

    def test_changes_are_policy_governed(self, spark, engine):
        """Masks and row access filters apply to change rows, like
        every other engine read surface."""
        _mk(engine)
        engine.query(
            "create masking policy balmask as (val int) returns int -> "
            "case when current_role() = 'FINANCE' then val else -1 end"
        )
        engine.query(
            "create row access policy not_bob as (n string) returns "
            "boolean -> current_role() = 'ADMIN' or n <> 'bob'"
        )
        engine.query(
            "alter table acct modify column bal set masking policy balmask"
        )
        engine.query(
            "alter table acct add row access policy not_bob on (name)"
        )
        engine.query("update acct set bal = bal + 7")  # v1: all rows change
        rows = engine.query(
            "select id, bal from acct changes(information => default) "
            "at(version => 0)"
        ).collect()
        assert sorted(set(r["id"] for r in rows)) == [1, 3]  # bob hidden
        assert {r["bal"] for r in rows} == {-1}  # masked
        engine.vars["role"] = "FINANCE"
        rows = engine.query(
            "select id, bal from acct changes(information => default) "
            "at(version => 0)"
        ).collect()
        assert {r["bal"] for r in rows} != {-1}  # FINANCE sees raw bal
