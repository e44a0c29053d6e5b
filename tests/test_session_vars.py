"""Snowflake session variables (round 9): SET x = expr, $x references.

SET evaluates the scalar expression NOW and stores the VALUE (Snowflake
semantics, not a lazy macro); $x substitutes as a typed SQL literal
outside string literals; METADATA$ACTION-style identifiers (a ``$``
following a word character) are never touched; unbound references and
UNSET of an unset variable raise.
"""
from __future__ import annotations

import pytest

from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.store import TableStore


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, TableStore(str(tmp_path / "store")))


def _mk(engine):
    engine.query("create table src as select id from range(10)")


class TestSessionVars:
    def test_set_evaluates_now_and_show(self, spark, engine):
        engine.query("set threshold = 3 + 4")
        rows = engine.query("show variables").collect()
        assert [(r["name"], r["value"], r["type"]) for r in rows] == [
            ("threshold", "7", "int")
        ]

    def test_reference_in_select_and_dml(self, spark, engine):
        _mk(engine)
        engine.query("set threshold = 7")
        n = engine.query(
            "select count(*) as n from src where id >= $threshold"
        ).collect()[0]["n"]
        assert n == 3
        engine.query("delete from src where id >= $threshold")
        assert (
            engine.query("select count(*) as n from src").collect()[0]["n"]
            == 7
        )

    def test_string_value_quotes_escaped(self, spark, engine):
        engine.query("set label = 'big''one'")
        assert (
            engine.query("select $label as l").collect()[0]["l"]
            == "big'one"
        )

    def test_dollar_inside_string_literal_untouched(self, spark, engine):
        assert (
            engine.query("select '$nope' as s").collect()[0]["s"]
            == "$nope"
        )

    def test_metadata_dollar_identifiers_untouched(self, spark, engine):
        engine.query(
            "create table m as select 'INSERT' as `METADATA$ACTION`"
        )
        assert (
            engine.query("select `METADATA$ACTION` as a from m").collect()[
                0
            ]["a"]
            == "INSERT"
        )

    def test_unbound_reference_raises(self, spark, engine):
        with pytest.raises(ValueError, match="not set"):
            engine.query("select $missing")

    def test_unset(self, spark, engine):
        engine.query("set x = 1")
        engine.query("unset x")
        assert engine.query("show variables").count() == 0
        with pytest.raises(ValueError, match="not set"):
            engine.query("unset x")

    def test_set_from_another_var(self, spark, engine):
        engine.query("set a = 10")
        engine.query("set b = $a * 2")
        assert engine.query("select $b as v").collect()[0]["v"] == 20
