"""SQL-surface ASOF JOIN (r13): Snowflake's clause resolved inside
Engine.query into the distributed as-of operator (ops/asof.py —
union-merge + one keyed window, never a range cross-join)."""

from __future__ import annotations

import datetime as dt

import pytest

from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.store import TableStore


@pytest.fixture()
def engine(spark, tmp_path):
    eng = Engine(spark, TableStore(str(tmp_path / "store")))
    eng.query(
        "create table trades as "
        "select 'A' as sym, timestamp'2024-01-01 10:00:03' as ts, "
        "100.0 as qty "
        "union all select 'A', timestamp'2024-01-01 10:00:10', 200.0 "
        "union all select 'B', timestamp'2024-01-01 10:00:01', 50.0"
    )
    eng.query(
        "create table quotes as "
        "select 'A' as sym, timestamp'2024-01-01 10:00:01' as qts, "
        "cast(9.9 as double) as px "
        "union all select 'A', timestamp'2024-01-01 10:00:03', cast(10.1 as double) "
        "union all select 'A', timestamp'2024-01-01 10:00:08', cast(10.5 as double) "
        "union all select 'C', timestamp'2024-01-01 10:00:00', cast(1.0 as double)"
    )
    return eng


class TestAsofSql:
    def test_inclusive_backward_join(self, engine):
        out = engine.query(
            """
            select sym, ts, qty, px, matched_qts
            from trades t asof join quotes q
                 match_condition (t.ts >= q.qts)
                 on t.sym = q.sym
            where qty > 0
            """
        ).collect()
        res = {(r["sym"], r["ts"]): (r["px"], r["matched_qts"]) for r in out}
        assert res[("A", dt.datetime(2024, 1, 1, 10, 0, 3))] == (
            10.1,
            dt.datetime(2024, 1, 1, 10, 0, 3),
        )
        assert res[("A", dt.datetime(2024, 1, 1, 10, 0, 10))] == (
            10.5,
            dt.datetime(2024, 1, 1, 10, 0, 8),
        )
        # no quote for B: left-outer NULLs, like Snowflake
        assert res[("B", dt.datetime(2024, 1, 1, 10, 0, 1))] == (
            None,
            None,
        )

    def test_strict_form_excludes_equal_ts(self, engine):
        out = engine.query(
            """
            select sym, ts, px from trades t asof join quotes q
                 match_condition (t.ts > q.qts) on t.sym = q.sym
            """
        ).collect()
        res = {(r["sym"], r["ts"]): r["px"] for r in out}
        assert res[("A", dt.datetime(2024, 1, 1, 10, 0, 3))] == 9.9

    def test_flipped_condition_normalizes(self, engine):
        out = engine.query(
            """
            select sym, px from trades t asof join quotes q
                 match_condition (q.qts <= t.ts) on q.sym = t.sym
                 where ts = timestamp'2024-01-01 10:00:03'
            """
        ).collect()
        assert [r["px"] for r in out] == [10.1]

    def test_forward_inclusive_join(self, engine):
        # r14 (VERDICT r13 #1): earliest right at-or-after the left ts
        out = engine.query(
            """
            select sym, ts, px, matched_qts
            from trades t asof join quotes q
                 match_condition (t.ts <= q.qts) on t.sym = q.sym
            """
        ).collect()
        res = {(r["sym"], r["ts"]): (r["px"], r["matched_qts"]) for r in out}
        assert res[("A", dt.datetime(2024, 1, 1, 10, 0, 3))] == (
            10.1,
            dt.datetime(2024, 1, 1, 10, 0, 3),
        )
        # no quote at-or-after 10:00:10 -> left-outer NULLs
        assert res[("A", dt.datetime(2024, 1, 1, 10, 0, 10))] == (
            None,
            None,
        )
        assert res[("B", dt.datetime(2024, 1, 1, 10, 0, 1))] == (
            None,
            None,
        )

    def test_forward_strict_excludes_equal_ts(self, engine):
        out = engine.query(
            """
            select sym, ts, px from trades t asof join quotes q
                 match_condition (t.ts < q.qts) on t.sym = q.sym
            """
        ).collect()
        res = {(r["sym"], r["ts"]): r["px"] for r in out}
        assert res[("A", dt.datetime(2024, 1, 1, 10, 0, 3))] == 10.5

    def test_subquery_operands(self, engine):
        # r14 (VERDICT r13 #2): parenthesized subquery operands
        out = engine.query(
            """
            select sym, ts, px
            from (select * from trades where qty > 60) t
                 asof join (select sym, qts, px from quotes) q
                 match_condition (t.ts >= q.qts) on t.sym = q.sym
            """
        ).collect()
        res = {(r["sym"], r["ts"]): r["px"] for r in out}
        assert res == {
            ("A", dt.datetime(2024, 1, 1, 10, 0, 3)): 10.1,
            ("A", dt.datetime(2024, 1, 1, 10, 0, 10)): 10.5,
        }

    def test_subquery_operand_requires_alias(self, engine):
        with pytest.raises(ValueError, match="alias"):
            engine.query(
                "select * from (select * from trades) "
                "asof join quotes q "
                "match_condition (ts >= q.qts) on sym = q.sym"
            )

    def test_cte_feeds_asof_operand(self, engine):
        out = engine.query(
            """
            with recent as (
                select * from trades
                where ts >= timestamp'2024-01-01 10:00:02'
            )
            select sym, ts, px from recent t asof join quotes q
                 match_condition (t.ts >= q.qts) on t.sym = q.sym
            """
        ).collect()
        res = {(r["sym"], r["ts"]): r["px"] for r in out}
        assert res == {
            ("A", dt.datetime(2024, 1, 1, 10, 0, 3)): 10.1,
            ("A", dt.datetime(2024, 1, 1, 10, 0, 10)): 10.5,
        }

    def test_chained_asof_joins(self, engine):
        # two ASOF JOINs in one statement: the resolved view of the
        # first becomes the left operand of the second, and its alias
        # qualifiers re-point at the view
        engine.query(
            "create table marks as "
            "select 'A' as msym, "
            "timestamp'2024-01-01 10:00:02' as mts, 1 as flag "
            "union all select 'A', "
            "timestamp'2024-01-01 10:00:09', 2"
        )
        out = engine.query(
            """
            select sym, ts, px, flag
            from trades t asof join quotes q
                 match_condition (t.ts >= q.qts) on t.sym = q.sym
            asof join marks m
                 match_condition (t.ts >= m.mts) on t.sym = m.msym
            where t.sym = 'A'
            """
        ).collect()
        res = {r["ts"]: (r["px"], r["flag"]) for r in out}
        assert res == {
            dt.datetime(2024, 1, 1, 10, 0, 3): (10.1, 1),
            dt.datetime(2024, 1, 1, 10, 0, 10): (10.5, 2),
        }

    def test_string_literal_with_alias_dot_survives(self, engine):
        # ADVICE r13 #3: the alias re-qualification must not touch
        # string literals containing 't.' / 'q.'
        out = engine.query(
            """
            select sym, 'contact t. smith' as note
            from trades t asof join quotes q
                 match_condition (t.ts >= q.qts) on t.sym = q.sym
            """
        ).collect()
        assert all(r["note"] == "contact t. smith" for r in out)

    def test_bad_on_condition_raises(self, engine):
        with pytest.raises(ValueError, match="ON"):
            engine.query(
                "select * from trades t asof join quotes q "
                "match_condition (t.ts >= q.qts) on t.sym <> q.sym"
            )

    def test_no_on_clause_refused(self, engine):
        # Snowflake allows a global ASOF JOIN; this engine refuses it
        # loudly (one global ordering = a single-partition window, the
        # same posture as the null-window rule)
        with pytest.raises(ValueError, match="single"):
            engine.query(
                """
                select sym, ts, px from trades t asof join quotes q
                     match_condition (t.ts >= q.qts)
                """
            )

    def test_aliases_default_to_table_names(self, engine):
        out = engine.query(
            """
            select sym, ts, px from trades asof join quotes
                 match_condition (trades.ts >= quotes.qts)
                 on trades.sym = quotes.sym
            """
        ).collect()
        assert len(out) == 3


class TestNestedAsof:
    """r14: ASOF JOIN clauses nested inside derived tables or CTE
    bodies resolve recursively (the enclosing subquery runs through
    engine.query, which resolves its own clause)."""

    def test_asof_inside_derived_table(self, engine):
        out = engine.query(
            """
            select sym, cnt from (
                select sym, count(*) as cnt
                from trades t asof join quotes q
                     match_condition (t.ts >= q.qts)
                     on t.sym = q.sym
                where px is not null
                group by sym
            ) z where cnt > 0
            """
        ).collect()
        assert {(r["sym"], r["cnt"]) for r in out} == {("A", 2)}

    def test_asof_inside_cte_body(self, engine):
        out = engine.query(
            """
            with matched as (
                select sym, px
                from trades t asof join quotes q
                     match_condition (t.ts >= q.qts)
                     on t.sym = q.sym
            )
            select sym, count(px) as n from matched group by sym
            """
        ).collect()
        assert {(r["sym"], r["n"]) for r in out} == {("A", 2), ("B", 0)}

    def test_literal_asof_join_text_untouched(self, engine):
        out = engine.query(
            "select 'use asof join here' as tip, count(*) as n "
            "from trades group by tip"
        ).collect()
        assert out[0]["tip"] == "use asof join here"
