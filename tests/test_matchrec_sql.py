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

    def test_sql_isms_offload_to_spark_terms(self):
        # r14 (VERDICT r13 #3): IN/LIKE/BETWEEN/CASE/IS offload to
        # Spark SQL boolean columns instead of raising
        terms: dict[str, str] = {}
        assert _cond_to_pandas("a IN (1, 2)", terms) == "__mrsql0__"
        assert terms == {"__mrsql0__": "a IN (1, 2)"}
        terms = {}
        got = _cond_to_pandas("a LIKE 'x%' AND b > 1", terms)
        assert got == "(__mrsql0__) & (b > 1)"
        assert terms == {"__mrsql0__": "a LIKE 'x%'"}

    def test_between_and_case_offload(self):
        terms: dict[str, str] = {}
        got = _cond_to_pandas("a BETWEEN 1 AND 5 AND b = 2", terms)
        assert got == "(__mrsql0__) & (b == 2)"
        assert "BETWEEN" in terms["__mrsql0__"]
        terms = {}
        got = _cond_to_pandas(
            "CASE WHEN a > 0 THEN true ELSE false END", terms
        )
        assert got == "__mrsql0__"
        assert terms["__mrsql0__"].upper().startswith("CASE")

    def test_sql_isms_still_rejected_when_mixed_or_subquery(self):
        with pytest.raises(ValueError, match="subquer"):
            _cond_to_pandas("a IN (select x from t)")
        # r15: PREV over an offloadable predicate now FOLDS (uniform
        # navigation — the predicate evaluates on the previous row's
        # columns only), reading the shifted SQL flag column
        terms: dict = {}
        out = _cond_to_pandas("PREV(a) LIKE 'x%'", terms)
        assert out == "(prev___mrsql0__ == True)"
        assert terms == {"__mrsql0__": "a LIKE 'x%'"}
        # match-dependent navigation (FIRST/LAST/aggregates) cannot
        # fold into a pre-computed SQL column — still raises
        with pytest.raises(ValueError, match="combine"):
            _cond_to_pandas("FIRST(A.a) IN (1, 2)")
        # bare current-row refs alongside navigation cannot fold
        with pytest.raises(ValueError, match="combine"):
            _cond_to_pandas("PREV(a) + a IN (1, 2)")

    def test_running_aggregate_tokens(self):
        assert _cond_to_pandas("COUNT(B.*) < 3") == "__mrcount__B__ < 3"
        assert _cond_to_pandas("COUNT(*) <= 5") == "__mrcount____ <= 5"
        assert (
            _cond_to_pandas("SUM(value) > 10") == "__mrsum____value > 10"
        )
        assert (
            _cond_to_pandas("AVG(A.x) >= 2 OR MAX(x) = 1")
            == "(__mravg__A__x >= 2) | (__mrmax____x == 1)"
        )


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


class TestSqlDefinePredicates:
    """r14 (VERDICT r13 #3): DEFINE conditions carrying IN / LIKE /
    BETWEEN / CASE / IS NULL pre-evaluate as Spark SQL boolean columns
    before the matcher (JVM-side, vectorized), composing with the
    pandas-eval terms through AND/OR/NOT."""

    def test_like_define_end_to_end(self, engine):
        engine.query(
            "create table logs as "
            "select 1 as g, 1 as seq, 'ERR: boom' as msg "
            "union all select 1, 2, 'ERR: again' "
            "union all select 1, 3, 'ok' "
            "union all select 1, 4, 'ERR: late'"
        )
        rows = engine.query(
            """
            select g, s, e from logs match_recognize (
                partition by g order by seq
                measures first(seq) as s, last(seq) as e
                pattern (E+)
                define E as msg like 'ERR%'
            )
            """
        ).collect()
        assert sorted((r["s"], r["e"]) for r in rows) == [(1, 2), (4, 4)]

    def test_in_and_null_define(self, engine):
        engine.query(
            "create table evs as "
            "select 1 as g, 1 as seq, 10 as kind "
            "union all select 1, 2, 20 "
            "union all select 1, 3, cast(null as int) "
            "union all select 1, 4, 30"
        )
        rows = engine.query(
            """
            select g, n from evs match_recognize (
                partition by g order by seq
                measures count(*) as n
                pattern (K+)
                define K as kind in (10, 20) and kind is not null
            )
            """
        ).collect()
        assert [r["n"] for r in rows] == [2]

    def test_between_mixed_with_prev(self, engine):
        # BETWEEN offloads to SQL; PREV stays pandas-side — the
        # boolean tree composes both
        rows = engine.query(
            """
            select g, s, e from ticks match_recognize (
                partition by g order by seq
                measures first(seq) as s, last(seq) as e
                pattern (D+)
                define D as price between 4 and 9
                            and price < prev(price)
            )
            """
        ).collect()
        # g=1: 8<10 (in range), 6<8 (in range) -> seq 2..3;
        # g=2: 4<5 -> seq 2..2
        assert sorted((r["g"], r["s"], r["e"]) for r in rows) == [
            (1, 2, 3),
            (2, 2, 2),
        ]

    def test_helper_columns_never_surface(self, engine):
        df = engine.query(
            """
            select * from ticks match_recognize (
                partition by g order by seq
                measures count(*) as n
                all rows per match
                pattern (B+)
                define B as price between 1 and 100
            )
            """
        )
        assert not [c for c in df.columns if c.startswith("__mrsql")]
        assert len(df.collect()) == 8  # every row matches


class TestRunningAggregateDefines:
    """r14 (VERDICT r13 #4): running aggregates in DEFINE — the NFA
    carries per-attempt accumulators with SQL:2016 running semantics
    (current row tentatively included)."""

    def test_count_caps_run_length(self, engine):
        rows = engine.query(
            """
            select g, s, n from ticks match_recognize (
                partition by g order by seq
                measures first(seq) as s, count(*) as n
                pattern (C+)
                define C as count(c.*) <= 2
            )
            """
        ).collect()
        got = sorted((r["g"], r["s"], r["n"]) for r in rows)
        assert got == [
            (1, 1, 2),
            (1, 3, 2),
            (1, 5, 1),
            (2, 1, 2),
            (2, 3, 1),
        ]

    def test_sum_budget_bounds_match(self, engine):
        rows = engine.query(
            """
            select g, s, n from ticks match_recognize (
                partition by g order by seq
                measures first(seq) as s, count(*) as n
                pattern (B+)
                define B as sum(price) <= 18
            )
            """
        ).collect()
        got = sorted((r["g"], r["s"], r["n"]) for r in rows)
        # g=1: 10+8=18 ok, +6 exceeds -> (1..2); 6+9=15 ok, +12
        # exceeds -> (3..4); 12 -> (5); g=2: 5+4=9, +6 -> 15 ok: all 3
        assert got == [
            (1, 1, 2),
            (1, 3, 2),
            (1, 5, 1),
            (2, 1, 3),
        ]

    def test_avg_qualified_aggregate(self, engine):
        rows = engine.query(
            """
            select g, s, n from ticks match_recognize (
                partition by g order by seq
                measures first(seq) as s, count(*) as n
                pattern (A+)
                define A as avg(a.price) >= 6
            )
            """
        ).collect()
        got = sorted((r["g"], r["s"], r["n"]) for r in rows)
        # g=1: 10; (10+8)/2=9; (10+8+6)/3=8; +9 -> 8.25; +12 -> 9 ->
        # all 5 rows; g=2: 5 fails at row 1, 4 fails, 6 -> (3..3)
        assert got == [(1, 1, 5), (2, 3, 1)]


class TestBareSymbolRefs:
    """r14: SQL:2016 bare symbol-qualified DEFINE references —
    ``B AS price > A.price`` reads the LAST row mapped to A so far
    (running semantics), translating to the same NFA navigation as
    LAST(A.price)."""

    def test_bare_ref_equals_last_navigation(self, engine):
        q = """
            select g, s, e from ticks match_recognize (
                partition by g order by seq
                measures first(seq) as s, last(seq) as e
                pattern (A B+)
                define A as price < 6,
                       B as price > {ref}
            )
        """
        bare = engine.query(q.format(ref="a.price")).collect()
        nav = engine.query(q.format(ref="last(a.price)")).collect()
        assert sorted(map(tuple, bare)) == sorted(map(tuple, nav))
        # g=2: A at seq 2 (price 4), B at seq 3 (6 > 4)
        assert sorted(map(tuple, bare)) == [(2, 2, 3)]

    def test_non_symbol_qualifier_raises(self, engine):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="defined pattern symbol"):
            engine.query(
                """
                select g from ticks match_recognize (
                    partition by g order by seq
                    measures count(*) as n
                    pattern (A+)
                    define A as price > tkx.price
                )
                """
            )


class TestNavigationOffsets:
    """r14: FIRST/LAST logical offsets in DEFINE navigation —
    FIRST(A.price, 1) is the SECOND row mapped to A so far; fewer
    mapped rows than the offset reads NULL (condition not true)."""

    def test_first_with_offset(self, engine):
        rows = engine.query(
            """
            select g, s, e from ticks match_recognize (
                partition by g order by seq
                measures first(seq) as s, last(seq) as e
                pattern (A A B)
                define A as true,
                       B as price > first(a.price, 1)
            )
            """
        ).collect()
        # g=1: A=(10,8) B needs price > 8 -> seq3 price 6 no; next
        # scan from 2: A=(8,6), B: 9 > 6 yes -> (2,4); g=2: A=(5,4),
        # B: 6 > 4 -> (1,3)
        assert sorted(map(tuple, rows)) == [(1, 2, 4), (2, 1, 3)]

    def test_offset_beyond_mapped_rows_is_null(self, engine):
        rows = engine.query(
            """
            select g, n from ticks match_recognize (
                partition by g order by seq
                measures count(*) as n
                pattern (A B)
                define A as true,
                       B as price > last(a.price, 5)
            )
            """
        ).collect()
        assert rows == []  # offset 5 never has enough A rows


class TestMeasureOffsets:
    """r14: FIRST/LAST logical offsets in MEASURES (FINAL semantics;
    RUNNING + offset raises)."""

    def test_offsets_in_measures(self, engine):
        rows = engine.query(
            """
            select g, s2, e2 from ticks match_recognize (
                partition by g order by seq
                measures first(seq, 1) as s2, last(seq, 1) as e2
                pattern (A+)
                define A as true
            )
            """
        ).collect()
        # g=1: rows 1..5 -> second=2, second-to-last=4;
        # g=2: rows 1..3 -> 2, 2
        assert sorted(map(tuple, rows)) == [(1, 2, 4), (2, 2, 2)]

    def test_offset_beyond_match_is_null(self, engine):
        rows = engine.query(
            """
            select g, x from ticks match_recognize (
                partition by g order by seq
                measures first(seq, 9) as x
                pattern (A+)
                define A as true
            )
            """
        ).collect()
        assert [r["x"] for r in rows] == [None, None]

    def test_running_offset_raises(self, engine):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="offset"):
            engine.query(
                """
                select g from ticks match_recognize (
                    partition by g order by seq
                    measures running first(seq, 1) as x
                    all rows per match
                    pattern (A+)
                    define A as true
                )
                """
            )


class TestUnmatchedRows:
    """r14: ALL ROWS PER MATCH WITH UNMATCHED ROWS — input rows in no
    match emit with every measure NULL (Snowflake semantics,
    CLASSIFIER()/MATCH_NUMBER() included)."""

    def test_unmatched_rows_emit_with_null_measures(self, engine):
        rows = engine.query(
            """
            select g, seq, n, cls from ticks match_recognize (
                partition by g order by seq
                measures final count(*) as n, classifier() as cls
                all rows per match with unmatched rows
                pattern (D+)
                define D as price < prev(price)
            )
            """
        ).collect()
        # every input row appears exactly once
        assert len(rows) == 8
        got = {(r["g"], r["seq"]): (r["n"], r["cls"]) for r in rows}
        # matched: g=1 seq 2,3 (D D); g=2 seq 2
        assert got[(1, 2)] == (2, "D") and got[(1, 3)] == (2, "D")
        assert got[(2, 2)] == (1, "D")
        # unmatched rows carry NULL measures
        for key in [(1, 1), (1, 4), (1, 5), (2, 1), (2, 3)]:
            assert got[key] == (None, None), key

    def test_plain_all_rows_unchanged(self, engine):
        rows = engine.query(
            """
            select g, seq from ticks match_recognize (
                partition by g order by seq
                measures count(*) as n
                all rows per match
                pattern (D+)
                define D as price < prev(price)
            )
            """
        ).collect()
        assert len(rows) == 3  # matched rows only
