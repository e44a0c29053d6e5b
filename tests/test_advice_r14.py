"""Regression tests for the five ADVICE r14 findings (round 15):

1. high — asofsql._mask left quote chars visible inside paren bodies,
   so a subquery operand containing a string literal never matched
   the masked operand pattern (wrong binding or wrong results).
2. medium — dag._sql_table_refs dropped quoted identifiers / tables
   named like stop keywords WITHOUT flagging, silently enabling the
   dynamic-table skip gate on a missed base.
3. medium — REGEXP_INSTR: capture counting inside character classes,
   and occurrence>1 with a runtime pattern silently reading the wrong
   group.
4. low — asofsql alias re-qualification rewrote same-named aliases in
   unrelated subquery scopes.
5. low — dag._dt_redirect_query rewrote base names inside string
   literals.
"""

from __future__ import annotations

import re

import pytest

from dbt_omnata_push_spark.engine.dag import Engine, _sql_table_refs
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
        "union all select 'A', timestamp'2024-01-01 10:00:03', "
        "cast(10.1 as double) "
        "union all select 'B', timestamp'2024-01-01 10:00:00', "
        "cast(1.0 as double)"
    )
    return eng


class TestAsofSubqueryLiteral:
    """ADVICE r14 #1 (high): string literal inside a subquery operand."""

    def test_subquery_operand_with_string_literal(self, engine):
        rows = engine.query(
            """
            select t.sym, t.qty, q.px
            from (select * from trades where sym = 'A') t
            asof join quotes q
            match_condition (t.ts >= q.qts)
            on t.sym = q.sym
            order by t.qty
            """
        ).collect()
        # the filter INSIDE the operand must apply: only sym='A' rows
        assert [(r.sym, r.qty, r.px) for r in rows] == [
            ("A", 100.0, 10.1),
            ("A", 200.0, 10.1),
        ]

    def test_both_operands_subqueries_with_literals(self, engine):
        rows = engine.query(
            """
            select t.sym, t.qty, q.px
            from (select * from trades where sym = 'B') t
            asof join (select * from quotes where sym = 'B') q
            match_condition (t.ts >= q.qts)
            on t.sym = q.sym
            """
        ).collect()
        assert [(r.sym, r.qty, r.px) for r in rows] == [("B", 50.0, 1.0)]

    def test_alias_naming_existing_table_is_not_silently_unfiltered(
        self, engine
    ):
        # the `(select ... where ...) trades` idiom: the alias names an
        # existing table — the old bug bound the alias AS the left
        # relation, silently joining the UNFILTERED base
        rows = engine.query(
            """
            select trades.sym, trades.qty, q.px
            from (select * from trades where qty > 60.0) trades
            asof join quotes q
            match_condition (trades.ts >= q.qts)
            on trades.sym = q.sym
            order by trades.qty
            """
        ).collect()
        assert [(r.sym, r.qty) for r in rows] == [
            ("A", 100.0),
            ("A", 200.0),
        ]


class TestAsofRequalifyScope:
    """ADVICE r14 #4 (low): a subquery that redefines the same alias
    keeps its own scope during alias re-qualification."""

    def test_scalar_subquery_with_same_alias_survives(self, engine):
        engine.query(
            "create table limits as select 'A' as sym, 500.0 as cap "
            "union all select 'B', 90.0"
        )
        # the scalar subquery defines ITS OWN alias `t` over a table
        # whose column (cap) does not exist on the ASOF view: the old
        # blanket rewrite repointed t.cap at the view and broke
        rows = engine.query(
            """
            select t.sym, t.qty, q.px,
                   (select max(t.cap) from limits t) as max_cap
            from trades t asof join quotes q
            match_condition (t.ts >= q.qts)
            on t.sym = q.sym
            order by t.sym, t.qty
            """
        ).collect()
        assert all(r.max_cap == 500.0 for r in rows)
        assert [r.qty for r in rows] == [100.0, 200.0, 50.0]


class TestSqlTableRefsKeywords:
    """ADVICE r14 #2 (medium): stop keywords in relation position."""

    def test_quoted_identifier_is_never_a_keyword(self):
        refs, unknown = _sql_table_refs('select * from "start"')
        assert refs == {"start"}
        assert not unknown

    def test_unquoted_stop_keyword_flags_unknown(self):
        # a table actually named `start` (unquoted) cannot be told
        # apart from syntax — must flag, never silently skip
        refs, unknown = _sql_table_refs("select * from start")
        assert unknown

    def test_values_and_lateral_stay_syntax(self):
        refs, unknown = _sql_table_refs(
            "select * from values (1, 2) as v(a, b)"
        )
        assert not unknown
        refs, unknown = _sql_table_refs(
            "select * from orders, lateral flatten(input => x) f"
        )
        # lateral itself is syntax; flatten() sets the table-function
        # flag — either way orders is captured
        assert "orders" in refs

    def test_keyword_named_base_never_silently_skips(self, engine):
        # end-to-end: a DT joining a base named like a stop keyword
        # (`sample`) to a normal base. The old scan dropped `sample`
        # without flagging — the version map held only `other`, so the
        # refresh SKIPPED forever while `sample` changed. The fix
        # flags the unaccountable base, which disables the skip gate.
        engine.query("create table sample as select 1 as k, 10 as x")
        engine.query("create table other as select 1 as k, 'a' as y")
        engine.query(
            "create dynamic table dt_kw target_lag = '1 minute' as "
            "select s.x, o.y from sample s join other o on s.k = o.k"
        )
        engine.refresh_dynamic_table("dt_kw", force=True)
        engine.query("insert into sample select 1, 20")
        assert engine.refresh_dynamic_table("dt_kw") == "refreshed"
        assert (
            engine.query("select count(*) as c from dt_kw").collect()[0].c
            == 2
        )


class TestRegexpInstrAdvice:
    """ADVICE r14 #3 (medium): REGEXP_INSTR capture counting."""

    def test_char_class_paren_not_counted_occurrence(self, engine):
        # '[(]x' matches a literal '(x'; occurrence 2 of it in
        # 'a(x b(x c(x' starts at position 6 — the '(' inside the
        # class must not shift the wrapper's group arithmetic
        r = engine.query(
            "select regexp_instr('a(x b(x c(x', '[(]x', 1, 2) as p"
        ).collect()[0]
        assert r.p == 6

    def test_char_class_paren_not_counted_group(self, engine):
        # pattern with '[(]' before the real capture group: group 1 of
        # the first match of '[(](\\w)' in 'a(b a(c' is 'b' at pos 3
        r = engine.query(
            "select regexp_instr('a(b a(c', '[(](\\\\w)', 1, 1, 0, "
            "'c', 1) as p"
        ).collect()[0]
        assert r.p == 3

    def test_occurrence_gt1_runtime_pattern_raises(self, engine):
        with pytest.raises(ValueError, match="string-literal pattern"):
            engine.query(
                "select regexp_instr(sym, sym, 1, 2) as p from trades"
            )


class TestDtRedirectLiteral:
    """ADVICE r14 #5 (low): base names inside string literals."""

    def test_literal_mentioning_base_survives_redirect(self, engine):
        engine.query("create table ord_a as select 1 as x")
        delta = engine.spark.range(1).selectExpr("42 as x")
        out = engine._dt_redirect_query(
            "select 'rows from ord_a feed' as lbl, x from ord_a",
            {"ord_a": delta},
        ).collect()
        assert [(r.lbl, r.x) for r in out] == [
            ("rows from ord_a feed", 42)
        ]
