"""Round-15 VERDICT r14 tasks 1-2:

1. The dynamic-table incremental-join delta leg broadcasts only while
   its optimizer size estimate stays under
   spark.sql.autoBroadcastJoinThreshold — above the bound the hint is
   dropped (AQE picks the strategy) and the refresh STAYS incremental,
   instead of a forced broadcast that OOMs at adversarial delta sizes.
2. Keyed-upsert maintenance deletes via DELETE ... USING (semi-join
   against the changed-key frame): no driver-collected IN-list, so the
   r14 100k-key cap is gone — a >100k-changed-keys window still
   records an incremental refresh.
"""

from __future__ import annotations

import pytest

from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.store import TableStore
from dbt_omnata_push_spark.ops.partitioning import (
    _parse_bytes,
    maybe_broadcast,
)


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, TableStore(str(tmp_path / "store")))


class TestMaybeBroadcast:
    def test_parse_bytes_forms(self):
        assert _parse_bytes("10485760") == 10 * 1024 * 1024
        assert _parse_bytes("10MB") == 10 * 1024 * 1024
        assert _parse_bytes("1g") == 1024**3
        assert _parse_bytes("-1") == -1

    def test_small_frame_gets_hint(self, spark):
        df = spark.range(10)
        plan = (
            maybe_broadcast(df)
            ._jdf.queryExecution()
            .analyzed()
            .toString()
        )
        assert "ResolvedHint" in plan

    def test_over_threshold_drops_hint(self, spark):
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
            df = spark.range(100_000)
            plan = (
                maybe_broadcast(df)
                ._jdf.queryExecution()
                .analyzed()
                .toString()
            )
            assert "ResolvedHint" not in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_disabled_threshold_drops_hint(self, spark):
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", "-1"
            )
            plan = (
                maybe_broadcast(spark.range(2))
                ._jdf.queryExecution()
                .analyzed()
                .toString()
            )
            assert "ResolvedHint" not in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


class TestLargeDeltaJoinStaysIncremental:
    """VERDICT r14 #1: an adversarially large delta leg must neither
    carry a forced broadcast hint nor knock the refresh off the
    incremental path."""

    def _mk(self, engine):
        engine.query(
            "create table fact as select 1 as k, 10 as v "
            "union all select 2, 20"
        )
        engine.query(
            "create table dims as select 1 as k, 'x' as tag "
            "union all select 2, 'y'"
        )
        engine.query(
            "create dynamic table dt_big target_lag = '1 minute' as "
            "select f.k as k, f.v as v, d.tag as tag "
            "from fact f join dims d on f.k = d.k"
        )

    def test_large_delta_plan_has_no_forced_broadcast(self, engine):
        spark = engine.spark
        self._mk(engine)
        engine.query(
            "insert into fact select cast(id % 2 + 1 as int) as k, "
            "cast(id as int) as v from range(50000)"
        )
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            # force 'over the bound' without a GB-sized fixture
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", "1KB"
            )
            meta = engine.store.dynamic_tables()["dt_big"]
            delta = engine._dt_incremental_join(meta)
            assert delta is not None  # still the incremental path
            plan = (
                delta._jdf.queryExecution().analyzed().toString()
            )
            assert "ResolvedHint" not in plan
            engine.query("alter dynamic table dt_big refresh")
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        hist = engine.store.dt_refresh_history()
        assert hist[-1]["mode"] == "incremental"
        assert (
            engine.query(
                "select count(*) as n from dt_big"
            ).collect()[0]["n"]
            == 50002
        )

    def test_small_delta_still_broadcasts(self, engine):
        self._mk(engine)
        engine.query("insert into fact select 2 as k, 99 as v")
        meta = engine.store.dynamic_tables()["dt_big"]
        delta = engine._dt_incremental_join(meta)
        plan = delta._jdf.queryExecution().executedPlan().toString()
        assert "Broadcast" in plan


class TestUpsertBeyondKeyCap:
    """VERDICT r14 #2: >100k changed keys in one CHANGES window still
    maintains incrementally (the delete is a distributed semi-join,
    not a driver IN-list)."""

    def test_120k_changed_keys_stay_incremental(self, engine):
        engine.query(
            "create table src as select cast(id as int) as id, "
            "cast(id * 2 as int) as v from range(150000)"
        )
        engine.query("alter table src add primary key (id)")
        engine.query(
            "create dynamic table dt_wide target_lag = '1 minute' as "
            "select id, v + 1 as dv from src where v >= 0"
        )
        engine.query("update src set v = v + 10 where id < 120000")
        engine.query("alter dynamic table dt_wide refresh")
        assert (
            engine.store.dt_refresh_history()[-1]["mode"]
            == "incremental"
        )
        got = engine.query(
            "select cast(count(*) as bigint) as n, "
            "cast(sum(dv) as bigint) as s from dt_wide"
        ).collect()[0]
        want = engine.query(
            "select cast(count(*) as bigint) as n, "
            "cast(sum(v + 1) as bigint) as s from src where v >= 0"
        ).collect()[0]
        assert (got["n"], got["s"]) == (want["n"], want["s"])

    def test_composite_key_semi_join_delete(self, engine):
        # composite PKs were capped at 5k under the OR-tree; the
        # semi-join form has no per-key plan leaves at all
        engine.query(
            "create table src2 as select cast(id % 100 as int) as a, "
            "cast(id as int) as b, cast(id as int) as v "
            "from range(20000)"
        )
        engine.query("alter table src2 add primary key (a, b)")
        engine.query(
            "create dynamic table dt_comp target_lag = '1 minute' as "
            "select a, b, v * 2 as dv from src2"
        )
        engine.query("update src2 set v = v + 1 where b < 10000")
        engine.query("alter dynamic table dt_comp refresh")
        assert (
            engine.store.dt_refresh_history()[-1]["mode"]
            == "incremental"
        )
        got = engine.query(
            "select cast(sum(dv) as bigint) as s, "
            "cast(count(*) as bigint) as n from dt_comp"
        ).collect()[0]
        want = engine.query(
            "select cast(sum(v * 2) as bigint) as s, "
            "cast(count(*) as bigint) as n from src2"
        ).collect()[0]
        assert (got["s"], got["n"]) == (want["s"], want["n"])

class TestMultiJoinChainIncremental:
    """VERDICT r14 #4: Δ(A⋈B⋈C) = ΔA⋈B⋈C ∪ A_old⋈ΔB⋈C ∪
    A_old⋈B_old⋈ΔC — one delta-sized leg per changed base, earlier
    bases anchored via time travel, later bases current."""

    def _mk(self, engine):
        engine.query(
            "create table f3 as select 1 as k, 10 as v "
            "union all select 2, 20"
        )
        engine.query(
            "create table d3 as select 1 as k, 'x' as tag "
            "union all select 2, 'y'"
        )
        engine.query(
            "create table c3 as select 'x' as tag, 100 as w "
            "union all select 'y', 200"
        )
        engine.query(
            "create dynamic table dt3 target_lag = '1 minute' as "
            "select f.k as k, f.v as v, c.w as w from f3 f "
            "join d3 d on f.k = d.k join c3 c on d.tag = c.tag"
        )

    def _mode(self, engine):
        return engine.store.dt_refresh_history()[-1]["mode"]

    def _full(self, engine):
        return sorted(
            tuple(r)
            for r in engine.query(
                "select f.k as k, f.v as v, c.w as w from f3 f "
                "join d3 d on f.k = d.k join c3 c on d.tag = c.tag"
            ).collect()
        )

    def _dt(self, engine):
        return sorted(
            tuple(r)
            for r in engine.query("select * from dt3").collect()
        )

    def test_single_base_delta(self, engine):
        self._mk(engine)
        engine.query("insert into f3 select 2, 22")
        engine.query("alter dynamic table dt3 refresh")
        assert self._mode(engine) == "incremental"
        assert self._dt(engine) == self._full(engine)

    def test_all_three_bases_change_no_double_count(self, engine):
        # new fact x new dim x new cat rows cross all three deltas —
        # the telescoping legs must count each output row exactly once
        self._mk(engine)
        engine.query("insert into f3 select 3, 33")
        engine.query("insert into d3 select 3, 'z'")
        engine.query("insert into c3 select 'z', 300")
        engine.query("alter dynamic table dt3 refresh")
        assert self._mode(engine) == "incremental"
        rows = self._dt(engine)
        assert rows.count((3, 33, 300)) == 1
        assert rows == self._full(engine)

    def test_middle_base_only(self, engine):
        self._mk(engine)
        engine.query("insert into f3 select 3, 30")
        engine.query("alter dynamic table dt3 refresh")
        engine.query("insert into d3 select 3, 'y'")
        engine.query("alter dynamic table dt3 refresh")
        assert self._mode(engine) == "incremental"
        assert self._dt(engine) == self._full(engine)

    def test_on_condition_with_function_call_stays_incremental(
        self, engine
    ):
        # parens/commas INSIDE an ON condition must not knock the
        # chain off the incremental path
        engine.query(
            "create table fp as select 1 as k, 10 as v "
            "union all select 2, 20"
        )
        engine.query(
            "create table dp as select 1 as k, 'x' as tag "
            "union all select 2, 'y'"
        )
        engine.query(
            "create dynamic table dt_fp target_lag = '1 minute' as "
            "select f.k as k, f.v as v, d.tag as tag from fp f "
            "join dp d on coalesce(f.k, 0) = d.k"
        )
        engine.query("insert into fp select 2, 22")
        engine.query("alter dynamic table dt_fp refresh")
        assert self._mode(engine) == "incremental"
        got = sorted(
            tuple(r)
            for r in engine.query("select * from dt_fp").collect()
        )
        assert (2, 22, "y") in got

    def test_comma_join_still_refuses(self, engine):
        engine.query("create table fc as select 1 as k, 10 as v")
        engine.query("create table dc2 as select 1 as k, 'x' as tag")
        engine.query(
            "create dynamic table dt_cj target_lag = '1 minute' as "
            "select f.k as k, d.tag as tag from fc f, dc2 d "
            "where f.k = d.k"
        )
        engine.query("insert into fc select 2, 20")
        engine.query("alter dynamic table dt_cj refresh")
        assert self._mode(engine) == "full"

    def test_update_on_any_base_refuses_to_full(self, engine):
        self._mk(engine)
        engine.query("update d3 set tag = 'y' where k = 1")
        engine.query("alter dynamic table dt3 refresh")
        assert self._mode(engine) == "full"
        assert self._dt(engine) == self._full(engine)


class TestJoinAggIncremental:
    """VERDICT r14 #3: the fact⋈dim rollup — GROUP BY over an inner
    equi-join maintains by aggregating each delta-join leg through
    the defining query and re-combining with the group-sized current
    output."""

    def _mk(self, engine):
        engine.query(
            "create table fga as select 1 as k, 10 as v "
            "union all select 2, 20 union all select 2, 22"
        )
        engine.query(
            "create table dga as select 1 as k, 'x' as tag "
            "union all select 2, 'y'"
        )
        engine.query(
            "create dynamic table dt_ja target_lag = '1 minute' as "
            "select d.tag as tag, cast(sum(f.v) as bigint) as s, "
            "cast(count(*) as bigint) as n, min(f.v) as lo, "
            "max(f.v) as hi "
            "from fga f join dga d on f.k = d.k group by d.tag"
        )

    def _mode(self, engine):
        return engine.store.dt_refresh_history()[-1]["mode"]

    def _check(self, engine):
        got = sorted(
            tuple(r)
            for r in engine.query("select * from dt_ja").collect()
        )
        want = sorted(
            tuple(r)
            for r in engine.query(
                "select d.tag as tag, cast(sum(f.v) as bigint) as s, "
                "cast(count(*) as bigint) as n, min(f.v) as lo, "
                "max(f.v) as hi "
                "from fga f join dga d on f.k = d.k group by d.tag"
            ).collect()
        )
        assert got == want

    def test_fact_delta_recombines(self, engine):
        self._mk(engine)
        engine.query("insert into fga select 1, 5")
        engine.query("alter dynamic table dt_ja refresh")
        assert self._mode(engine) == "incremental_agg"
        self._check(engine)

    def test_both_sides_new_group(self, engine):
        self._mk(engine)
        engine.query("insert into fga select 3, 30")
        engine.query("insert into dga select 3, 'z'")
        engine.query("alter dynamic table dt_ja refresh")
        assert self._mode(engine) == "incremental_agg"
        self._check(engine)

    def test_where_composes(self, engine):
        engine.query(
            "create table fgw as select 1 as k, 10 as v "
            "union all select 2, 20"
        )
        engine.query(
            "create table dgw as select 1 as k, 'x' as tag "
            "union all select 2, 'y'"
        )
        engine.query(
            "create dynamic table dt_jw target_lag = '1 minute' as "
            "select d.tag as tag, cast(sum(f.v) as bigint) as s "
            "from fgw f join dgw d on f.k = d.k "
            "where f.v >= 15 group by d.tag"
        )
        engine.query("insert into fgw select 1, 100")
        engine.query("insert into fgw select 2, 3")  # filtered out
        engine.query("alter dynamic table dt_jw refresh")
        assert self._mode(engine) == "incremental_agg"
        got = sorted(
            tuple(r)
            for r in engine.query("select * from dt_jw").collect()
        )
        assert got == [("x", 100), ("y", 20)]

    def test_agg_over_three_base_chain(self, engine):
        # join_agg rides the N-way legs builder, so a 3-base rollup
        # is incremental too
        engine.query(
            "create table f3a as select 1 as k, 10 as v "
            "union all select 2, 20"
        )
        engine.query(
            "create table d3a as select 1 as k, 'x' as tag "
            "union all select 2, 'y'"
        )
        engine.query(
            "create table c3a as select 'x' as tag, 100 as w "
            "union all select 'y', 200"
        )
        engine.query(
            "create dynamic table dt_ja3 target_lag = '1 minute' as "
            "select c.w as w, cast(sum(f.v) as bigint) as s "
            "from f3a f join d3a d on f.k = d.k "
            "join c3a c on d.tag = c.tag group by c.w"
        )
        engine.query("insert into f3a select 2, 22")
        engine.query("insert into d3a select 3, 'x'")
        engine.query("insert into f3a select 3, 33")
        engine.query("alter dynamic table dt_ja3 refresh")
        assert self._mode(engine) == "incremental_agg"
        got = sorted(
            tuple(r)
            for r in engine.query("select * from dt_ja3").collect()
        )
        want = sorted(
            tuple(r)
            for r in engine.query(
                "select c.w as w, cast(sum(f.v) as bigint) as s "
                "from f3a f join d3a d on f.k = d.k "
                "join c3a c on d.tag = c.tag group by c.w"
            ).collect()
        )
        assert got == want

    def test_avg_refuses_to_full(self, engine):
        self._mk(engine)
        engine.query(
            "create dynamic table dt_avg target_lag = '1 minute' as "
            "select d.tag as tag, avg(f.v) as a "
            "from fga f join dga d on f.k = d.k group by d.tag"
        )
        engine.query("insert into fga select 1, 7")
        engine.query("alter dynamic table dt_avg refresh")
        assert self._mode(engine) == "full"


class TestMrDefineParenMix:
    """VERDICT r14 #5: a parenthesized DEFINE term mixing navigation
    and SQL-offload predicates decomposes (paren-strip recursion in
    the boolean tree) instead of raising as one mixed leaf."""

    @pytest.fixture()
    def mr_engine(self, spark, tmp_path):
        eng = Engine(spark, TableStore(str(tmp_path / "mr")))
        eng.query(
            "create table tk as "
            "select 1 as id, 1 as seq, cast(10.0 as double) as price, 'ok' as state "
            "union all select 1, 2, cast(12.0 as double), 'err1' "
            "union all select 1, 3, cast(15.0 as double), 'err2' "
            "union all select 1, 4, cast(9.0 as double), 'ok'"
        )
        eng.query(
            "create table errstates as select 'err1' as s "
            "union all select 'err2' union all select null"
        )
        return eng

    def _mr(self, eng, cond):
        return eng.query(
            "select * from tk match_recognize ("
            "partition by id order by seq "
            "measures count(*) as cnt "
            "one row per match "
            f"pattern (B+) define B as {cond})"
        ).collect()

    def test_paren_nav_and_like_one_term(self, mr_engine):
        rows = self._mr(
            mr_engine,
            "(price > prev(price) and state like 'err%')",
        )
        assert [r.cnt for r in rows] == [2]

    def test_double_parens(self, mr_engine):
        rows = self._mr(
            mr_engine,
            "((price > prev(price) and state like 'err%'))",
        )
        assert [r.cnt for r in rows] == [2]

    def test_paren_group_does_not_strip_partial(self, mr_engine):
        # leading paren that does NOT wrap the whole term
        rows = self._mr(
            mr_engine, "(price - 1.0) > 8.0 and state like 'err%'"
        )
        assert [r.cnt for r in rows] == [2]


class TestMrDefineInSubquery:
    """VERDICT r14 #6: `<expr> [NOT] IN (SELECT ...)` DEFINE terms
    pre-evaluate as broadcast-joined boolean columns through the
    engine, with SQL three-valued semantics folded to the matcher's
    TRUE/not-TRUE."""

    @pytest.fixture()
    def mr_engine(self, spark, tmp_path):
        eng = Engine(spark, TableStore(str(tmp_path / "mr2")))
        eng.query(
            "create table tk as "
            "select 1 as id, 1 as seq, cast(10.0 as double) as price, 'ok' as state "
            "union all select 1, 2, cast(12.0 as double), 'err1' "
            "union all select 1, 3, cast(15.0 as double), 'err2' "
            "union all select 1, 4, cast(9.0 as double), 'ok'"
        )
        eng.query(
            "create table errstates as select 'err1' as s "
            "union all select 'err2' union all select null"
        )
        return eng

    def _mr(self, eng, cond, measures="count(*) as cnt"):
        return eng.query(
            "select * from tk match_recognize ("
            "partition by id order by seq "
            f"measures {measures} "
            "one row per match "
            f"pattern (B+) define B as {cond})"
        ).collect()

    def test_in_subquery(self, mr_engine):
        rows = self._mr(
            mr_engine,
            "state in (select s from errstates where s is not null)",
        )
        assert [r.cnt for r in rows] == [2]

    def test_in_subquery_null_in_set_is_ignored(self, mr_engine):
        rows = self._mr(
            mr_engine, "state in (select s from errstates)"
        )
        assert [r.cnt for r in rows] == [2]

    def test_not_in_null_set_never_matches(self, mr_engine):
        # SQL: x NOT IN (set containing NULL) is never TRUE
        rows = self._mr(
            mr_engine, "state not in (select s from errstates)"
        )
        assert rows == []

    def test_not_in_clean_set(self, mr_engine):
        rows = self._mr(
            mr_engine,
            "state not in "
            "(select s from errstates where s is not null)",
        )
        assert sorted(r.cnt for r in rows) == [1, 1]

    def test_subquery_and_navigation_compose(self, mr_engine):
        rows = self._mr(
            mr_engine,
            "state in (select s from errstates) "
            "and price > prev(price)",
        )
        assert [r.cnt for r in rows] == [2]

    def test_all_rows_does_not_leak_flag_column(self, mr_engine):
        out = mr_engine.query(
            "select * from tk match_recognize ("
            "partition by id order by seq "
            "measures classifier() as cls "
            "all rows per match "
            "pattern (B+) define B as state in "
            "(select s from errstates where s is not null))"
        )
        assert out.columns == ["id", "seq", "price", "state", "cls"]
        assert out.count() == 2

    def test_nav_lhs_subquery_still_raises(self, mr_engine):
        # navigation on the IN's left side cannot pre-evaluate on the
        # raw frame — must refuse, never mis-evaluate
        with pytest.raises(ValueError, match="IN \\(SELECT"):
            self._mr(
                mr_engine,
                "prev(state) in (select s from errstates)",
            )


class TestAsofRecursiveCte:
    """VERDICT r14 #8: WITH RECURSIVE feeding an ASOF JOIN operand —
    the self-referencing CTE materializes through Spark's native
    WITH RECURSIVE, then the fixed point is a plain view to the ASOF
    resolver."""

    def test_recursive_cte_operand(self, engine):
        engine.query(
            "create table edges as select 1 as child, "
            "cast(null as int) as parent, 'g' as grp, "
            "timestamp'2024-01-01 10:00:00' as ts "
            "union all select 2, 1, 'g', "
            "timestamp'2024-01-01 10:00:05' "
            "union all select 3, 2, 'g', "
            "timestamp'2024-01-01 10:00:09'"
        )
        engine.query(
            "create table quotes as select 'g' as grp, "
            "timestamp'2024-01-01 10:00:04' as qts, "
            "cast(1.5 as double) as px "
            "union all select 'g', "
            "timestamp'2024-01-01 10:00:08', cast(2.5 as double)"
        )
        rows = engine.query(
            """
            with recursive tree as (
                select child, parent, grp, ts, 1 as depth
                from edges where parent is null
                union all
                select e.child, e.parent, e.grp, e.ts, t.depth + 1
                from tree t join edges e on e.parent = t.child
            )
            select t.child, t.depth, q.px
            from tree t asof join quotes q
                 match_condition (t.ts >= q.qts) on t.grp = q.grp
            order by t.child
            """
        ).collect()
        assert [(r.child, r.depth, r.px) for r in rows] == [
            (1, 1, None),
            (2, 2, 1.5),
            (3, 3, 2.5),
        ]

    def test_non_recursive_cte_under_recursive_keyword(self, engine):
        # WITH RECURSIVE where the CTE does NOT self-reference: plain
        # materialization path
        engine.query(
            "create table tq as select 'g' as grp, "
            "timestamp'2024-01-01 10:00:01' as ts, 1 as n"
        )
        engine.query(
            "create table tr as select 'g' as grp, "
            "timestamp'2024-01-01 10:00:00' as qts, 7 as v"
        )
        rows = engine.query(
            """
            with recursive lhs as (
                select grp, ts, n from tq
            )
            select l.n, q.v from lhs l asof join tr q
                 match_condition (l.ts >= q.qts) on l.grp = q.grp
            """
        ).collect()
        assert [(r.n, r.v) for r in rows] == [(1, 7)]


class TestDtUnionAllIncremental:
    """r15 (beyond the verdict list): a top-level UNION ALL of
    single-base per-row transforms maintains incrementally — each
    changed base's leg applies to its own appended rows only."""

    def _mk(self, engine):
        engine.query("create table s1 as select 1 as k, 10 as v")
        engine.query("create table s2 as select 2 as k, 20 as v")
        engine.query(
            "create dynamic table dt_ua target_lag = '1 minute' as "
            "select k, v * 2 as dv from s1 where v > 0 "
            "union all select k, v * 3 as dv from s2"
        )

    def _mode(self, engine):
        return engine.store.dt_refresh_history()[-1]["mode"]

    def _check(self, engine):
        got = sorted(
            tuple(r)
            for r in engine.query("select * from dt_ua").collect()
        )
        want = sorted(
            tuple(r)
            for r in engine.query(
                "select k, v * 2 as dv from s1 where v > 0 "
                "union all select k, v * 3 as dv from s2"
            ).collect()
        )
        assert got == want

    def test_one_leg_changes(self, engine):
        self._mk(engine)
        engine.query("insert into s1 select 3, 30")
        engine.query("alter dynamic table dt_ua refresh")
        assert self._mode(engine) == "incremental"
        self._check(engine)

    def test_both_legs_change_where_composes(self, engine):
        self._mk(engine)
        engine.query("insert into s1 select 5, -5")  # filtered out
        engine.query("insert into s2 select 4, 40")
        engine.query("alter dynamic table dt_ua refresh")
        assert self._mode(engine) == "incremental"
        self._check(engine)

    def test_same_base_in_two_legs(self, engine):
        engine.query("create table sb as select 1 as k, 10 as v")
        engine.query(
            "create dynamic table dt_2x target_lag = '1 minute' as "
            "select k, v as dv from sb "
            "union all select k, -v as dv from sb"
        )
        engine.query("insert into sb select 7, 70")
        engine.query("alter dynamic table dt_2x refresh")
        assert self._mode(engine) == "incremental"
        got = sorted(
            tuple(r)
            for r in engine.query("select * from dt_2x").collect()
        )
        assert got == [(1, -10), (1, 10), (7, -70), (7, 70)]

    def test_legs_with_different_aliases_bind_positionally(
        self, engine
    ):
        # SQL UNION ALL takes column names from the FIRST leg and
        # binds later legs positionally — the incremental path must
        # do the same, never a by-name bind
        engine.query("create table p1 as select 1 as k, 10 as v")
        engine.query("create table p2 as select 2 as k, 20 as v")
        engine.query(
            "create dynamic table dt_pos target_lag = '1 minute' as "
            "select k as key_out, v * 2 as val_out from p1 "
            "union all select k, v * 3 from p2"
        )
        engine.query("insert into p2 select 4, 40")
        engine.query("alter dynamic table dt_pos refresh")
        assert self._mode(engine) == "incremental"
        got = sorted(
            tuple(r)
            for r in engine.query("select * from dt_pos").collect()
        )
        assert got == [(1, 20), (2, 60), (4, 120)]

    def test_union_of_join_leg_composes(self, engine):
        # a UNION ALL leg may itself be an inner equi-join chain: the
        # leg contributes its own telescoped join-delta legs
        engine.query("create table u1 as select 1 as k, 10 as v")
        engine.query("create table u2 as select 2 as k, 20 as v")
        engine.query(
            "create table ud as select 1 as k, 'x' as tag "
            "union all select 2, 'y'"
        )
        engine.query(
            "create dynamic table dt_uj target_lag = '1 minute' as "
            "select s.k as k, s.v * 2 as val, 'plain' as src "
            "from u1 s "
            "union all "
            "select s.k, s.v, d.tag from u2 s join ud d on s.k = d.k"
        )

        def full():
            return sorted(
                tuple(r)
                for r in engine.query(
                    "select s.k as k, s.v * 2 as val, 'plain' as src "
                    "from u1 s union all select s.k, s.v, d.tag "
                    "from u2 s join ud d on s.k = d.k"
                ).collect()
            )

        engine.query("insert into u1 select 3, 30")
        engine.query("insert into u2 select 4, 40")
        engine.query("insert into ud select 4, 'z'")
        engine.query("alter dynamic table dt_uj refresh")
        assert self._mode(engine) == "incremental"
        got = sorted(
            tuple(r)
            for r in engine.query("select * from dt_uj").collect()
        )
        assert got == full()
        # dim-only window: the join leg's ΔB side alone
        engine.query("insert into ud select 9, 'q'")
        engine.query("insert into u2 select 9, 90")
        engine.query("alter dynamic table dt_uj refresh")
        assert self._mode(engine) == "incremental"
        got = sorted(
            tuple(r)
            for r in engine.query("select * from dt_uj").collect()
        )
        assert got == full()

    def test_unclaimed_base_refuses_to_full(self, engine):
        # base_versions covering a base no leg claims must refuse —
        # its deltas would silently never contribute
        engine.query("create table w1 as select 1 as k")
        engine.query("create table w2 as select 2 as k")
        engine.query(
            "create dynamic table dt_w target_lag = '1 minute' as "
            "select k from w1 union all select k from w1"
        )
        # both legs claim w1; w2 is not a base at all — refresh after
        # a w1 change stays incremental
        engine.query("insert into w1 select 3")
        engine.query("alter dynamic table dt_w refresh")
        assert self._mode(engine) == "incremental"
        got = sorted(
            r.k for r in engine.query("select * from dt_w").collect()
        )
        assert got == [1, 1, 3, 3]

    def test_bare_union_refuses_to_full(self, engine):
        self._mk(engine)
        engine.query(
            "create dynamic table dt_bu target_lag = '1 minute' as "
            "select k from s1 union select k from s2"
        )
        engine.query("insert into s1 select 9, 90")
        engine.query("alter dynamic table dt_bu refresh")
        assert self._mode(engine) == "full"

    def test_update_on_a_leg_base_refuses_to_full(self, engine):
        self._mk(engine)
        engine.query("update s2 set v = 21 where k = 2")
        engine.query("alter dynamic table dt_ua refresh")
        assert self._mode(engine) == "full"
        self._check(engine)


class TestDtDistinctIncremental:
    """r15: SELECT DISTINCT maintenance — the transformed delta's
    distinct rows anti-join (NULL-safe) against the group-sized
    current output; only genuinely new rows append."""

    def _mode(self, engine):
        return engine.store.dt_refresh_history()[-1]["mode"]

    def test_new_and_duplicate_rows(self, engine):
        engine.query(
            "create table sd as select 1 as k, 'a' as t "
            "union all select 1, 'a' union all select 2, 'b'"
        )
        engine.query(
            "create dynamic table dt_di target_lag = '1 minute' as "
            "select distinct k, t from sd where k > 0"
        )
        engine.query("insert into sd select 1, 'a'")  # existing
        engine.query("insert into sd select 3, 'c'")  # new
        engine.query("insert into sd select 3, 'c'")  # dup in delta
        engine.query("alter dynamic table dt_di refresh")
        assert self._mode(engine) == "incremental"
        got = sorted(
            tuple(r)
            for r in engine.query("select * from dt_di").collect()
        )
        assert got == [(1, "a"), (2, "b"), (3, "c")]

    def test_null_rows_dedup_null_safely(self, engine):
        engine.query(
            "create table sn as select cast(null as int) as k, "
            "'x' as t"
        )
        engine.query(
            "create dynamic table dt_dn target_lag = '1 minute' as "
            "select distinct k, t from sn"
        )
        engine.query("insert into sn select cast(null as int), 'x'")
        engine.query("alter dynamic table dt_dn refresh")
        assert self._mode(engine) == "incremental"
        assert (
            engine.query(
                "select count(*) as n from dt_dn"
            ).collect()[0]["n"]
            == 1
        )

    def test_base_update_refuses_to_full(self, engine):
        engine.query("create table su as select 1 as k, 'a' as t")
        engine.query(
            "create dynamic table dt_du2 target_lag = '1 minute' as "
            "select distinct k, t from su"
        )
        engine.query("update su set t = 'b' where k = 1")
        engine.query("alter dynamic table dt_du2 refresh")
        assert self._mode(engine) == "full"
        got = [
            tuple(r)
            for r in engine.query("select * from dt_du2").collect()
        ]
        assert got == [(1, "b")]


class TestMrNavPredicateFold:
    """r15: a leaf mixing SQL predicates with UNIFORM navigation folds
    — PREV(state) LIKE 'err%' ≡ the predicate on the previous row, so
    the inner predicate offloads as an SQL flag column and the define
    reads its shifted value."""

    @pytest.fixture()
    def mr_engine(self, spark, tmp_path):
        eng = Engine(spark, TableStore(str(tmp_path / "mrf")))
        eng.query(
            "create table tk as select 1 as id, 1 as seq, "
            "cast(10.0 as double) as price, 'ok' as state "
            "union all select 1, 2, cast(12.0 as double), 'err1' "
            "union all select 1, 3, cast(15.0 as double), 'err2' "
            "union all select 1, 4, cast(9.0 as double), 'ok'"
        )
        return eng

    def _mr(self, eng, cond):
        return [
            (r.s, r.cnt)
            for r in eng.query(
                "select * from tk match_recognize ("
                "partition by id order by seq "
                "measures count(*) as cnt, first(seq) as s "
                "one row per match "
                f"pattern (B+) define B as {cond})"
            ).collect()
        ]

    def test_prev_like(self, mr_engine):
        assert self._mr(
            mr_engine, "prev(state) like 'err%'"
        ) == [(3, 2)]

    def test_next_in_list(self, mr_engine):
        assert self._mr(
            mr_engine, "next(state) in ('err1','err2')"
        ) == [(1, 2)]

    def test_prev_between(self, mr_engine):
        assert self._mr(
            mr_engine, "prev(price) between 11.0 and 16.0"
        ) == [(3, 2)]

    def test_prev_offset_2(self, mr_engine):
        assert self._mr(
            mr_engine, "prev(state, 2) like 'err%'"
        ) == [(4, 1)]

    def test_folds_compose_with_plain_terms(self, mr_engine):
        assert self._mr(
            mr_engine, "prev(state) like 'err%' and state = 'ok'"
        ) == [(4, 1)]

    def test_bare_column_alongside_nav_still_raises(self, mr_engine):
        with pytest.raises(ValueError, match="cannot combine"):
            self._mr(
                mr_engine,
                "(prev(price) + price) between 1 and 50",
            )

    def test_mixed_navigations_in_one_term_still_raise(
        self, mr_engine
    ):
        with pytest.raises(ValueError, match="cannot combine"):
            self._mr(
                mr_engine,
                "prev(price) + next(price) in (19.0, 27.0)",
            )

    def test_not_over_offload_keeps_null_semantics(
        self, spark, tmp_path
    ):
        # NOT (state LIKE ...) over a NULL state is NULL in SQL —
        # never a match; the negation must happen INSIDE the SQL
        # offload, not Python-side on the coalesced flag
        eng = Engine(spark, TableStore(str(tmp_path / "mrn")))
        eng.query(
            "create table tn as select 1 as id, 1 as seq, "
            "'ok' as state "
            "union all select 1, 2, cast(null as string) "
            "union all select 1, 3, 'err'"
        )
        rows = eng.query(
            "select * from tn match_recognize ("
            "partition by id order by seq "
            "measures count(*) as cnt, first(seq) as s "
            "one row per match "
            "pattern (B+) define B as not (state like 'err%'))"
        ).collect()
        # only the 'ok' row matches: the NULL row is excluded
        assert [(r.s, r.cnt) for r in rows] == [(1, 1)]

    def test_prev_is_null_refuses_to_fold(self, mr_engine):
        # PREV(x) IS NULL is TRUE on the boundary row in SQL; the
        # shifted-flag fold would say false there — must refuse
        with pytest.raises(ValueError, match="cannot combine"):
            self._mr(mr_engine, "prev(state) is null")


class TestMrDerivedTableInput:
    """r15: `FROM (subquery) [alias] MATCH_RECOGNIZE (...)` — the
    subquery resolves through the full dialect before the matcher."""

    @pytest.fixture()
    def mr_engine(self, spark, tmp_path):
        eng = Engine(spark, TableStore(str(tmp_path / "mri")))
        eng.query(
            "create table tk as select 1 as id, 1 as seq, "
            "'ok' as state "
            "union all select 1, 2, 'err' "
            "union all select 1, 3, 'err' "
            "union all select 2, 1, 'err' "
            "union all select 2, 2, 'ok'"
        )
        return eng

    def test_subquery_input(self, mr_engine):
        rows = mr_engine.query(
            """
            select * from (select id, seq, state from tk
                           where id = 1) t
            match_recognize (
                partition by id order by seq
                measures count(*) as cnt
                one row per match
                pattern (E+) define E as state = 'err')
            """
        ).collect()
        assert [(r.id, r.cnt) for r in rows] == [(1, 2)]

    def test_table_form_still_resolves(self, mr_engine):
        rows = mr_engine.query(
            """
            select * from tk match_recognize (
                partition by id order by seq
                measures count(*) as cnt
                one row per match
                pattern (E+) define E as state = 'err')
            order by id
            """
        ).collect()
        assert [(r.id, r.cnt) for r in rows] == [(1, 2), (2, 1)]


class TestDeleteWhereUsing:
    def test_delete_where_using_requires_on(self, engine, spark):
        engine.query("create table t1 as select 1 as id")
        with pytest.raises(ValueError, match="using requires on"):
            engine.store.delete_where(
                spark, "t1", using=spark.range(1)
            )
        with pytest.raises(ValueError, match="exactly one"):
            engine.store.delete_where(spark, "t1")
