"""SQL-surface MATCH_RECOGNIZE (r11, engine/mrsql.py): the Snowflake
clause pasted into Engine.query rewrites to the distributed operator.
Semantics are certified operator-side (tests/test_matchrec.py); these
tests certify the TRANSLATION — clause parsing, DEFINE condition
dialect, measure prefixes, skip forms, and governance composition."""
from __future__ import annotations

import pytest

from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.mrsql import _cond_to_pandas
from dbt_omnata_push_spark.engine.store import TableStore


@pytest.fixture()
def engine(spark, tmp_path):
    eng = Engine(spark, TableStore(str(tmp_path / "store")))
    eng.query(
        "create table ticks as "
        "select 1 as g, 1 as seq, 10.0 as price "
        "union all select 1, 2, 8.0 "
        "union all select 1, 3, 6.0 "
        "union all select 1, 4, 9.0 "
        "union all select 1, 5, 12.0 "
        "union all select 2, 1, 5.0 "
        "union all select 2, 2, 4.0 "
        "union all select 2, 3, 6.0"
    )
    return eng


class TestCondTranslation:
    def test_prev_next_and_equals(self):
        assert (
            _cond_to_pandas("price < PREV(price)") == "price < prev_price"
        )
        assert _cond_to_pandas("a = NEXT(b)") == "a == next_b"
        assert _cond_to_pandas("a <> b") == "a != b"
        assert _cond_to_pandas("a >= b") == "a >= b"

    def test_boolean_tree(self):
        got = _cond_to_pandas("a = 1 AND b > 2 OR NOT c < 3")
        assert got == "((a == 1) & (b > 2)) | (~(c < 3))"

    def test_true_literal(self):
        assert _cond_to_pandas("TRUE") == "True"

    def test_sql_isms_rejected(self):
        with pytest.raises(ValueError, match="unsupported DEFINE"):
            _cond_to_pandas("a IN (1, 2)")
        with pytest.raises(ValueError, match="unsupported DEFINE"):
            _cond_to_pandas("a LIKE 'x%'")


class TestSqlClause:
    def test_one_row_per_match(self, spark, engine):
        df = engine.query(
            """
            select g, s, e, n from ticks match_recognize (
                partition by g
                order by seq
                measures first(seq) as s, last(seq) as e, count(*) as n
                pattern (D+ U+)
                define D as price < prev(price),
                       U as price > prev(price)
            )
            """
        )
        got = sorted(tuple(r) for r in df.collect())
        assert got == [(1, 2, 5, 4), (2, 2, 3, 2)]

    def test_all_rows_running_and_skip_next_row(self, spark, engine):
        df = engine.query(
            """
            select g, seq, rc, fs from ticks match_recognize (
                partition by g
                order by seq
                measures count(*) as rc, final first(seq) as fs
                all rows per match
                after match skip to next row
                pattern (D{2})
                define D as price < prev(price)
            )
            """
        )
        got = sorted(tuple(r) for r in df.collect())
        # g=1: D-rows at seq 2,3 -> one match (2,3); g=2: D at 2 only
        assert got == [(1, 2, 1, 2), (1, 3, 2, 2)]

    def test_count_sym_and_classifier(self, spark, engine):
        df = engine.query(
            """
            select g, nd, cls from ticks match_recognize (
                partition by g
                order by seq
                measures count(D.*) as nd, classifier() as cls
                pattern (D+ U)
                define D as price < prev(price),
                       U as price > prev(price)
            )
            """
        )
        got = sorted(tuple(r) for r in df.collect())
        assert got == [(1, 2, "U"), (2, 1, "U")]

    def test_skip_to_last_symbol_form(self, spark, engine):
        engine.query(
            "create table wts as "
            "select 1 as g, 1 as seq, 10.0 as price "
            "union all select 1, 2, 7.0 "
            "union all select 1, 3, 11.0 "
            "union all select 1, 4, 8.0 "
            "union all select 1, 5, 12.0"
        )
        df = engine.query(
            """
            select s, e from wts match_recognize (
                partition by g
                order by seq
                measures first(seq) as s, last(seq) as e
                after match skip to last U
                pattern (D+ U+)
                define D as price < prev(price),
                       U as price > prev(price)
            )
            """
        )
        assert sorted(tuple(r) for r in df.collect()) == [(2, 3), (4, 5)]

    def test_outer_query_composes(self, spark, engine):
        df = engine.query(
            """
            select g, max(n) as max_n from ticks match_recognize (
                partition by g
                order by seq
                measures count(*) as n
                pattern (D+)
                define D as price < prev(price)
            )
            where n > 1
            group by g
            """
        )
        assert sorted(tuple(r) for r in df.collect()) == [(1, 2)]

    def test_masking_policy_composes(self, spark, engine):
        engine.query(
            "create masking policy hide_price as "
            "(val double) returns double -> 0.0"
        )
        engine.query(
            "alter table ticks modify column price "
            "set masking policy hide_price"
        )
        df = engine.query(
            """
            select g, n from ticks match_recognize (
                partition by g
                order by seq
                measures count(*) as n
                pattern (D+)
                define D as price < prev(price)
            )
            """
        )
        # masked price is constant 0.0 -> no D rows -> no matches
        assert df.count() == 0

    def test_order_by_desc(self, spark, engine):
        """r13 (VERDICT r12 #6): ORDER BY ... DESC sorts each
        partition descending before matching. g=1 in seq-desc order
        has prices 12,9,6,8,10 — the only D+ run is seqs 4,3."""
        out = engine.query(
            """
            select g, s, e, n from ticks match_recognize (
                partition by g order by seq desc
                measures first(seq) as s, last(seq) as e,
                         count(*) as n
                pattern (D+)
                define D as price < prev(price)
            )
            """
        )
        rows = sorted(
            (r["g"], r["s"], r["e"], r["n"]) for r in out.collect()
        )
        assert rows == [(1, 4, 3, 2), (2, 2, 2, 1)]


class TestSqlAggregates:
    def test_sum_min_max_avg_measures(self, spark, engine):
        df = engine.query(
            """
            select g, tot, lo, hi, mean from ticks match_recognize (
                partition by g
                order by seq
                measures sum(price) as tot, min(price) as lo,
                         max(price) as hi, avg(price) as mean
                pattern (D+ U+)
                define D as price < prev(price),
                       U as price > prev(price)
            )
            """
        )
        rows = {r["g"]: r for r in df.collect()}
        # g=2 match: prices 4.0 (D), 6.0 (U)
        assert rows[2]["tot"] == 10.0 and rows[2]["lo"] == 4.0
        assert rows[2]["hi"] == 6.0 and rows[2]["mean"] == 5.0

    def test_string_literal_with_equals_untouched(self):
        got = _cond_to_pandas("tag = 'a=b'")
        assert got == "tag == 'a=b'"

    def test_prev_offset_translation(self):
        assert (
            _cond_to_pandas("price < PREV(price, 3)")
            == "price < prev3_price"
        )
        assert (
            _cond_to_pandas("NEXT(v, 2) = 1") == "next2_v == 1"
        )
