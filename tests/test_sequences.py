"""Snowflake SEQUENCE objects (round 9): block-allocated NEXTVAL.

CREATE [OR REPLACE] SEQUENCE s [START [WITH] n] [INCREMENT [BY] m]
records a counter; ``s.nextval`` in a SELECT body resolves to
``counter + increment * k`` with k the global row index (the existing
two-pass global-rownum machinery — never a single-partition Window).
A consuming INSERT/CTAS advances the counter by the rows it inserted;
a plain SELECT re-reads the same block (documented divergence from
Snowflake, which burns values on any evaluation — the engine's model
matches its STREAM offset semantics). Values are unique and
block-allocated; which row gets which value is arbitrary, as in
Snowflake.
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
    engine.query("create sequence sq start with 1000 increment by 2")


class TestSequenceLifecycle:
    def test_show_sequences(self, spark, engine):
        _mk(engine)
        rows = engine.query("show sequences").collect()
        assert [
            (r["name"], r["start"], r["increment"], r["next_value"])
            for r in rows
        ] == [("sq", 1000, 2, 1000)]

    def test_duplicate_create_errors(self, spark, engine):
        _mk(engine)
        with pytest.raises(ValueError, match="already exists"):
            engine.query("create sequence sq")

    def test_or_replace_resets_counter(self, spark, engine):
        _mk(engine)
        engine.query("create table t1 as select sq.nextval as v from src")
        assert (
            engine.query("show sequences").collect()[0]["next_value"] == 1010
        )
        engine.query("create or replace sequence sq start with 7")
        assert (
            engine.query("show sequences").collect()[0]["next_value"] == 7
        )

    def test_drop_missing_errors(self, spark, engine):
        with pytest.raises(ValueError, match="not found"):
            engine.query("drop sequence nope")

    def test_zero_increment_errors(self, spark, engine):
        with pytest.raises(ValueError, match="nonzero"):
            engine.query("create sequence z increment by 0")

    def test_defaults(self, spark, engine):
        engine.query("create sequence plain")
        r = engine.query("show sequences").collect()[0]
        assert (r["start"], r["increment"], r["next_value"]) == (1, 1, 1)


class TestNextval:
    def test_ctas_assigns_unique_block(self, spark, engine):
        _mk(engine)
        engine.query(
            "create table t1 as select sq.nextval as v, id from src"
        )
        vals = sorted(r["v"] for r in engine.query("select v from t1").collect())
        assert vals == [1000, 1002, 1004, 1006, 1008]

    def test_insert_continues_block(self, spark, engine):
        _mk(engine)
        engine.query("create table t1 as select sq.nextval as v from src")
        engine.query("insert into t1 select sq.nextval from src")
        vals = sorted(r["v"] for r in engine.query("select v from t1").collect())
        assert vals == [1000 + 2 * k for k in range(10)]

    def test_plain_select_does_not_advance(self, spark, engine):
        _mk(engine)
        a = sorted(
            r["v"]
            for r in engine.query("select sq.nextval as v from src").collect()
        )
        b = sorted(
            r["v"]
            for r in engine.query("select sq.nextval as v from src").collect()
        )
        assert a == b == [1000, 1002, 1004, 1006, 1008]
        assert (
            engine.query("show sequences").collect()[0]["next_value"] == 1000
        )

    def test_stale_select_draw_does_not_leak_into_unrelated_dml(
        self, spark, engine
    ):
        _mk(engine)
        engine.query("select sq.nextval as v from src").collect()
        engine.query("create table other as select 1 as x")
        assert (
            engine.query("show sequences").collect()[0]["next_value"] == 1000
        )

    def test_nextval_in_string_literal_is_data(self, spark, engine):
        _mk(engine)
        rows = engine.query(
            "create table lit as select 'sq.nextval' as s from src"
        )
        got = engine.query("select s from lit").collect()
        assert {r["s"] for r in got} == {"sq.nextval"}
        assert (
            engine.query("show sequences").collect()[0]["next_value"] == 1000
        )

    def test_negative_increment(self, spark, engine):
        engine.query("create table src2 as select id from range(3)")
        engine.query("create sequence dn start with 0 increment by -5")
        engine.query("create table t as select dn.nextval as v from src2")
        vals = sorted(r["v"] for r in engine.query("select v from t").collect())
        assert vals == [-10, -5, 0]
        assert (
            engine.query("show sequences").collect()[0]["next_value"] == -15
        )

    def test_filtered_select_draws_per_result_row(self, spark, engine):
        """Values fill over the RESULT frame, so a WHERE filter neither
        burns values nor collides the next block (the pre-filter
        numbering bug this design replaced)."""
        _mk(engine)
        engine.query(
            "create table t1 as select sq.nextval as v, id from src "
            "where id >= 3"
        )
        vals = sorted(r["v"] for r in engine.query("select v from t1").collect())
        assert vals == [1000, 1002]  # gap-free block for the 2 rows
        engine.query(
            "insert into t1 select sq.nextval, id from src where id < 3"
        )
        vals = sorted(r["v"] for r in engine.query("select v from t1").collect())
        assert vals == [1000, 1002, 1004, 1006, 1008]  # disjoint blocks

    def test_two_sequences_one_statement(self, spark, engine):
        _mk(engine)
        engine.query("create sequence other start with 50")
        engine.query(
            "create table t as select sq.nextval as a, other.nextval as b "
            "from src"
        )
        rows = engine.query("select a, b from t").collect()
        assert sorted(r["a"] for r in rows) == [1000, 1002, 1004, 1006, 1008]
        assert sorted(r["b"] for r in rows) == [50, 51, 52, 53, 54]
        nv = {
            r["name"]: r["next_value"]
            for r in engine.query("show sequences").collect()
        }
        assert nv == {"sq": 1010, "other": 55}


class TestSequenceTransactions:
    def test_failed_transaction_does_not_refund_draws(self, spark, engine):
        """Snowflake parity: sequence values consumed inside a
        rolled-back transaction are NOT returned — the counter never
        rolls back, only table data does."""
        _mk(engine)
        with pytest.raises(Exception):
            engine.execute_script(
                """
                create table t1 as select sq.nextval as v from src;
                select not_a_column from nowhere;
                """,
                transaction=True,
            )
        # table rolled back, counter did not
        assert not engine.store.exists("t1")
        assert (
            engine.query("show sequences").collect()[0]["next_value"]
            == 1010
        )
        # the next consumer mints a disjoint block
        engine.query("create table t2 as select sq.nextval as v from src")
        vals = sorted(r["v"] for r in engine.query("select v from t2").collect())
        assert vals == [1010 + 2 * k for k in range(5)]


class TestFromlessTrailingClauses:
    """ADVICE r10: a FROM-less `SELECT seq.nextval ORDER BY 1` must keep
    its trailing clause (the select-list scan bounds at top-level
    ORDER BY / LIMIT, not just FROM)."""

    def test_fromless_order_by(self, spark, engine):
        engine.query("create sequence fsq start with 5 increment by 1")
        df = engine.query("select fsq.nextval order by 1")
        assert [r["nextval"] for r in df.collect()] == [5]

    def test_fromless_limit(self, spark, engine):
        engine.query("create sequence fsq2 start with 1 increment by 1")
        df = engine.query("select fsq2.nextval limit 1")
        assert [r["nextval"] for r in df.collect()] == [1]

    def test_order_by_after_from_still_works(self, spark, engine):
        engine.query("create sequence fsq3 start with 0 increment by 10")
        engine.query("create table fsq_t as select id from range(3)")
        df = engine.query(
            "select id, fsq3.nextval as n from fsq_t order by id limit 2"
        )
        rows = df.collect()
        assert len(rows) == 2
        assert {r["n"] for r in rows} <= {0, 10, 20}
