"""Snowflake DYNAMIC TABLES (r13): declarative auto-refreshed
materializations. CREATE DYNAMIC TABLE ... TARGET_LAG = '...' AS
<select> builds immediately (INITIALIZE = ON_CREATE); refreshes run
through ALTER ... REFRESH or the Engine.run_due lag tick, and are
version-gated — when every base table's version pointer is unchanged
the refresh records SKIPPED and commits NOTHING (the 100 TB posture:
idle lag ticks are O(1) metadata reads). Direct DML against a dynamic
table is refused, like Snowflake."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.store import TableStore


@pytest.fixture()
def engine(spark, tmp_path):
    eng = Engine(spark, TableStore(str(tmp_path / "store")))
    eng.query(
        "create table base as select 1 as k, 10 as v "
        "union all select 2, 20 union all select 2, 22"
    )
    return eng


def _create(engine, lag="'60 seconds'"):
    return engine.query(
        f"create dynamic table dt_sum target_lag = {lag} as "
        "select k, cast(sum(v) as bigint) as total from base group by k"
    )


class TestLifecycle:
    def test_create_builds_immediately(self, engine):
        _create(engine)
        rows = sorted(
            (r["k"], r["total"])
            for r in engine.query("select * from dt_sum").collect()
        )
        assert rows == [(1, 10), (2, 42)]
        dts = engine.store.dynamic_tables()
        assert dts["dt_sum"]["state"] == "started"
        assert dts["dt_sum"]["lag_s"] == 60
        assert dts["dt_sum"]["base_versions"] == {"base": 0}

    def test_refresh_skips_when_bases_unchanged(self, engine):
        _create(engine)
        v0 = engine.store.current_version("dt_sum")
        out = engine.query("alter dynamic table dt_sum refresh")
        assert out.collect()[0]["status"] == "skipped"
        # O(1) skip: the backing table got NO new version
        assert engine.store.current_version("dt_sum") == v0
        hist = engine.store.dt_refresh_history()
        assert hist[-1]["state"] == "SKIPPED"

    def test_refresh_picks_up_base_changes(self, engine):
        _create(engine)
        engine.query("insert into base select 1 as k, 5 as v")
        out = engine.query("alter dynamic table dt_sum refresh")
        assert out.collect()[0]["status"] == "refreshed"
        rows = sorted(
            (r["k"], r["total"])
            for r in engine.query("select * from dt_sum").collect()
        )
        assert rows == [(1, 15), (2, 42)]

    def test_downstream_lag_never_self_schedules(self, engine):
        _create(engine, lag="DOWNSTREAM")
        engine.query("insert into base select 9 as k, 9 as v")
        tick = engine.run_due(datetime(2027, 1, 1, tzinfo=timezone.utc))
        assert tick.collect() == []  # no lag -> no tick-driven refresh
        # manual refresh still works
        out = engine.query("alter dynamic table dt_sum refresh")
        assert out.collect()[0]["status"] == "refreshed"

    def test_drop_removes_meta_and_table(self, engine):
        _create(engine)
        engine.query("drop dynamic table dt_sum")
        assert "dt_sum" not in engine.store.dynamic_tables()
        assert not engine.store.exists("dt_sum")
        # IF EXISTS tolerates the gone table
        out = engine.query("drop dynamic table if exists dt_sum")
        assert out.collect()[0]["dynamic_tables_dropped"] == 0

    def test_show_dynamic_tables(self, engine):
        _create(engine)
        rows = engine.query("show dynamic tables").collect()
        assert [
            (r["name"], r["state"], r["target_lag"]) for r in rows
        ] == [("dt_sum", "started", "60 seconds")]


class TestScheduling:
    def test_run_due_refreshes_after_lag(self, engine):
        _create(engine)
        engine.query("insert into base select 3 as k, 30 as v")
        t0 = datetime(2027, 1, 1, 12, 0, tzinfo=timezone.utc)
        tick = engine.run_due(t0)
        got = {(r["task_name"], r["status"]) for r in tick.collect()}
        assert ("dt_sum", "dt_refreshed") in got
        # within the lag window: no new attempt at all
        tick2 = engine.run_due(
            datetime(2027, 1, 1, 12, 0, 30, tzinfo=timezone.utc)
        )
        assert tick2.collect() == []
        # past the lag with unchanged bases: attempt happens, SKIPPED
        tick3 = engine.run_due(
            datetime(2027, 1, 1, 12, 2, tzinfo=timezone.utc)
        )
        got3 = {(r["task_name"], r["status"]) for r in tick3.collect()}
        assert ("dt_sum", "dt_skipped") in got3

    def test_suspend_blocks_tick_resume_restores(self, engine):
        _create(engine)
        engine.query("alter dynamic table dt_sum suspend")
        engine.query("insert into base select 4 as k, 40 as v")
        tick = engine.run_due(datetime(2027, 2, 1, tzinfo=timezone.utc))
        assert tick.collect() == []
        engine.query("alter dynamic table dt_sum resume")
        tick2 = engine.run_due(datetime(2027, 2, 1, tzinfo=timezone.utc))
        got = {(r["task_name"], r["status"]) for r in tick2.collect()}
        assert ("dt_sum", "dt_refreshed") in got

    def test_refresh_history_surface(self, engine):
        _create(engine)
        engine.query("alter dynamic table dt_sum refresh")  # SKIPPED
        rows = engine.query(
            "select name, state from table(information_schema."
            "dynamic_table_refresh_history())"
        ).collect()
        assert [(r["name"], r["state"]) for r in rows] == [
            ("dt_sum", "SUCCEEDED"),
            ("dt_sum", "SKIPPED"),
        ]


class TestGuards:
    @pytest.mark.parametrize(
        "stmt",
        [
            "insert into dt_sum select 9, 9",
            "update dt_sum set total = 0 where k = 1",
            "delete from dt_sum where k = 1",
            "truncate table dt_sum",
            "merge into dt_sum t using base b on t.k = b.k "
            "when matched then update set total = 0",
        ],
    )
    def test_dml_refused(self, engine, stmt):
        _create(engine)
        with pytest.raises(ValueError, match="dynamic table"):
            engine.query(stmt)

    def test_drop_table_redirects(self, engine):
        _create(engine)
        with pytest.raises(ValueError, match="DROP DYNAMIC TABLE"):
            engine.query("drop table dt_sum")

    def test_create_over_existing_table_requires_replace(self, engine):
        engine.query("create table taken as select 1 as x")
        with pytest.raises(ValueError, match="already exists"):
            engine.query(
                "create dynamic table taken target_lag = '1 minute' "
                "as select * from base"
            )
        engine.query(
            "create or replace dynamic table taken target_lag = "
            "'1 minute' as select k from base"
        )
        assert "taken" in engine.store.dynamic_tables()

    def test_bad_target_lag_rejected(self, engine):
        with pytest.raises(ValueError, match="TARGET_LAG"):
            engine.query(
                "create dynamic table bad target_lag = 'sometimes' "
                "as select * from base"
            )
        with pytest.raises(ValueError, match="TARGET_LAG"):
            engine.query(
                "create dynamic table bad as select * from base"
            )


class TestComposition:
    def test_seed_base_disables_skip(self, spark, engine):
        # a seed has no version pointer: refreshes must never skip
        engine.seed(
            "sd", spark.createDataFrame([(1,)], "x int")
        )
        engine.query(
            "create dynamic table dt_seed target_lag = '1 minute' "
            "as select count(*) as n from sd"
        )
        out = engine.query("alter dynamic table dt_seed refresh")
        assert out.collect()[0]["status"] == "refreshed"

    def test_time_travel_and_changes_compose(self, engine):
        # the backing table is a normal versioned store table
        _create(engine)
        engine.query("insert into base select 1 as k, 5 as v")
        engine.query("alter dynamic table dt_sum refresh")
        old = engine.query(
            "select total from dt_sum at (version => 0) where k = 1"
        ).collect()
        new = engine.query(
            "select total from dt_sum where k = 1"
        ).collect()
        assert old[0]["total"] == 10 and new[0]["total"] == 15

    def test_dt_over_dt_refreshes_on_upstream_version(self, engine):
        _create(engine)
        engine.query(
            "create dynamic table dt_top target_lag = '1 minute' as "
            "select cast(sum(total) as bigint) as grand from dt_sum"
        )
        assert (
            engine.query("select grand from dt_top").collect()[0][
                "grand"
            ]
            == 52
        )
        engine.query("insert into base select 1 as k, 8 as v")
        # refresh upstream first, then downstream sees its new version
        engine.query("alter dynamic table dt_sum refresh")
        out = engine.query("alter dynamic table dt_top refresh")
        assert out.collect()[0]["status"] == "refreshed"
        assert (
            engine.query("select grand from dt_top").collect()[0][
                "grand"
            ]
            == 60
        )


class TestIncrementalRefresh:
    """REFRESH_MODE AUTO/INCREMENTAL (r13): a single-base per-row
    transform refreshes by appending the transformed insert-only delta
    (read from the per-commit 'files' CDC manifests — O(delta), no
    full-table scan); anything that could break the multiset algebra
    (aggregates, joins, deletes/updates on the base, FULL mode) falls
    back to the full recompute. History rows record which path ran."""

    def _mk(self, engine, mode="auto", sql=None):
        sql = sql or (
            "select k, v * 2 as v2 from base where v >= 10"
        )
        engine.query(
            "create dynamic table dt_inc target_lag = '1 minute' "
            f"refresh_mode = '{mode}' as {sql}"
        )

    def _content(self, engine):
        return sorted(
            tuple(r) for r in engine.query("select * from dt_inc").collect()
        )

    def _last_mode(self, engine):
        return engine.store.dt_refresh_history()[-1]["mode"]

    def test_append_only_delta_refreshes_incrementally(self, engine):
        self._mk(engine)
        engine.query("insert into base select 7 as k, 70 as v")
        engine.query("insert into base select 8 as k, 3 as v")  # filtered
        out = engine.query("alter dynamic table dt_inc refresh")
        assert out.collect()[0]["status"] == "refreshed"
        assert self._last_mode(engine) == "incremental"
        assert self._content(engine) == [
            (1, 20),
            (2, 40),
            (2, 44),
            (7, 140),
        ]

    def test_incremental_equals_full_recompute(self, engine):
        self._mk(engine)
        engine.query("insert into base select 9 as k, 90 as v")
        engine.query("alter dynamic table dt_inc refresh")
        inc = self._content(engine)
        rows = sorted(
            tuple(r)
            for r in engine.query(
                "select k, v * 2 as v2 from base where v >= 10"
            ).collect()
        )
        assert inc == rows

    def test_decomposable_aggregate_uses_agg_path(self, engine):
        # r13 second pass: SUM/COUNT/MIN/MAX group-bys maintain
        # incrementally too (see TestIncrementalAggregate); only
        # non-decomposable shapes fall back to full
        self._mk(
            engine,
            sql=(
                "select k, cast(sum(v) as bigint) as total "
                "from base group by k"
            ),
        )
        engine.query("insert into base select 1 as k, 100 as v")
        engine.query("alter dynamic table dt_inc refresh")
        assert self._last_mode(engine) == "incremental_agg"
        rows = dict(
            (r["k"], r["total"])
            for r in engine.query("select * from dt_inc").collect()
        )
        assert rows[1] == 110

    def test_base_update_falls_back_to_full(self, engine):
        self._mk(engine)
        engine.query("update base set v = 11 where k = 1")
        engine.query("alter dynamic table dt_inc refresh")
        assert self._last_mode(engine) == "full"
        assert (1, 22) in self._content(engine)

    def test_full_mode_never_incremental(self, engine):
        self._mk(engine, mode="full")
        engine.query("insert into base select 7 as k, 70 as v")
        engine.query("alter dynamic table dt_inc refresh")
        assert self._last_mode(engine) == "full"
        assert (7, 140) in self._content(engine)

    def test_multi_insert_window_composes(self, engine):
        self._mk(engine)
        for i in range(3):
            engine.query(
                f"insert into base select {10 + i} as k, {100 + i} as v"
            )
        engine.query("alter dynamic table dt_inc refresh")
        assert self._last_mode(engine) == "incremental"
        got = self._content(engine)
        assert (10, 200) in got and (12, 204) in got

    def test_history_surfaces_mode_column(self, engine):
        self._mk(engine)
        engine.query("insert into base select 7 as k, 70 as v")
        engine.query("alter dynamic table dt_inc refresh")
        rows = engine.query(
            "select state, mode from table(information_schema."
            "dynamic_table_refresh_history()) order by refreshed_at"
        ).collect()
        assert [(r["state"], r["mode"]) for r in rows] == [
            ("SUCCEEDED", "full"),
            ("SUCCEEDED", "incremental"),
        ]


class TestChainTick:
    def test_one_tick_propagates_through_dt_chain(self, engine):
        """DT-over-DT (r13): run_due refreshes in dependency order, so
        a single tick carries a base change through the chain."""
        _create(engine)
        engine.query(
            "create dynamic table zz_top target_lag = '1 minute' as "
            "select cast(sum(total) as bigint) as grand from dt_sum"
        )
        engine.query("insert into base select 1 as k, 8 as v")
        tick = engine.run_due(
            datetime(2027, 3, 1, tzinfo=timezone.utc)
        )
        got = {(r["task_name"], r["status"]) for r in tick.collect()}
        # zz_top sorts AFTER dt_sum only because of the dependency
        # order (alphabetically it would come last anyway — the chain
        # below asserts the propagated VALUE, which only holds if
        # dt_sum ran first)
        assert ("dt_sum", "dt_refreshed") in got
        assert ("zz_top", "dt_refreshed") in got
        assert (
            engine.query("select grand from zz_top").collect()[0][
                "grand"
            ]
            == 60
        )

    def test_reverse_alpha_chain_still_ordered(self, engine):
        # upstream name sorts AFTER downstream alphabetically: only a
        # topological order refreshes upstream first
        engine.query(
            "create dynamic table zz_up target_lag = '1 minute' as "
            "select k, v from base"
        )
        engine.query(
            "create dynamic table aa_down target_lag = '1 minute' as "
            "select cast(sum(v) as bigint) as s from zz_up"
        )
        engine.query("insert into base select 5 as k, 1000 as v")
        engine.run_due(datetime(2027, 3, 2, tzinfo=timezone.utc))
        assert (
            engine.query("select s from aa_down").collect()[0]["s"]
            == 1052
        )


class TestIncrementalAggregate:
    """Incremental AGGREGATE maintenance (r13): single-base GROUP BY
    with decomposable aggregates (SUM/COUNT/MIN/MAX, optionally cast)
    refreshes by aggregating ONLY the appended delta and re-combining
    with the group-sized current output — O(|DT| + delta), never a
    base rescan. AVG/DISTINCT/expression group keys refuse to full."""

    def _mk(self, engine, sql=None):
        sql = sql or (
            "select k, cast(sum(v) as bigint) as total, "
            "cast(count(*) as bigint) as n, "
            "min(v) as lo, max(v) as hi "
            "from base group by k"
        )
        engine.query(
            "create dynamic table dt_agg target_lag = '1 minute' "
            f"as {sql}"
        )

    def _rows(self, engine):
        return sorted(
            tuple(r)
            for r in engine.query("select * from dt_agg").collect()
        )

    def _last_mode(self, engine):
        return engine.store.dt_refresh_history()[-1]["mode"]

    def test_agg_refresh_is_incremental_and_exact(self, engine):
        self._mk(engine)
        engine.query("insert into base select 1 as k, 5 as v")
        engine.query("insert into base select 3 as k, 7 as v")
        engine.query("alter dynamic table dt_agg refresh")
        assert self._last_mode(engine) == "incremental_agg"
        assert self._rows(engine) == [
            (1, 15, 2, 5, 10),
            (2, 42, 2, 20, 22),
            (3, 7, 1, 7, 7),
        ]

    def test_agg_incremental_equals_full(self, engine):
        self._mk(engine)
        for i in range(4):
            engine.query(
                f"insert into base select {i % 2} as k, {i * 3} as v"
            )
        engine.query("alter dynamic table dt_agg refresh")
        inc = self._rows(engine)
        full = sorted(
            tuple(r)
            for r in engine.query(
                "select k, cast(sum(v) as bigint) as total, "
                "cast(count(*) as bigint) as n, "
                "min(v) as lo, max(v) as hi from base group by k"
            ).collect()
        )
        assert inc == full

    def test_where_clause_composes(self, engine):
        self._mk(
            engine,
            sql=(
                "select k, cast(sum(v) as bigint) as total "
                "from base where v >= 10 group by k"
            ),
        )
        engine.query("insert into base select 1 as k, 3 as v")  # filtered
        engine.query("insert into base select 1 as k, 100 as v")
        engine.query("alter dynamic table dt_agg refresh")
        assert self._last_mode(engine) == "incremental_agg"
        assert (1, 110) in self._rows(engine)

    def test_avg_refuses_to_full(self, engine):
        self._mk(
            engine,
            sql="select k, avg(v) as a from base group by k",
        )
        engine.query("insert into base select 1 as k, 30 as v")
        engine.query("alter dynamic table dt_agg refresh")
        assert self._last_mode(engine) == "full"
        rows = dict(
            (r["k"], r["a"])
            for r in engine.query("select * from dt_agg").collect()
        )
        assert rows[1] == 20.0

    def test_expression_group_key_refuses_to_full(self, engine):
        self._mk(
            engine,
            sql=(
                "select k % 2 as kb, cast(sum(v) as bigint) as total "
                "from base group by kb"
            ),
        )
        engine.query("insert into base select 4 as k, 1 as v")
        engine.query("alter dynamic table dt_agg refresh")
        assert self._last_mode(engine) == "full"

    def test_base_update_refuses_to_full(self, engine):
        self._mk(engine)
        engine.query("update base set v = 1000 where k = 2 and v = 20")
        engine.query("alter dynamic table dt_agg refresh")
        assert self._last_mode(engine) == "full"
        assert (2, 1022, 2, 22, 1000) in self._rows(engine)


class TestStreamOnDynamicTable:
    """Streams compose with dynamic tables (r13 certification): the
    backing table is a normal versioned store table, so CREATE STREAM
    ON TABLE <dt> (with the PK streams require) delivers each
    refresh's delta exactly once — the DT -> stream -> incremental
    consumer relay, Snowflake's standard pattern."""

    def test_stream_sees_incremental_refresh_delta(self, engine):
        # v % 10 = 0 keeps one row per key (the fixture's k=2 has a
        # second v=22 row; a stream PK needs unique keys)
        engine.query(
            "create dynamic table dt_v target_lag = '1 minute' as "
            "select k, v * 2 as v2 from base where v % 10 = 0"
        )
        engine.query("alter table dt_v add primary key (k)")
        engine.query("create stream s_dt on table dt_v")
        assert engine.query("select * from s_dt").collect() == []
        engine.query("insert into base select 3 as k, 30 as v")
        engine.query("alter dynamic table dt_v refresh")
        assert (
            engine.store.dt_refresh_history()[-1]["mode"]
            == "incremental"
        )
        rows = engine.query(
            "select k, v2, `METADATA$ACTION` as act from s_dt"
        ).collect()
        assert [(r["k"], r["v2"], r["act"]) for r in rows] == [
            (3, 60, "INSERT")
        ]
        # consuming DML advances the offset: delta delivered once
        engine.query("create table sink as select k, v2 from s_dt")
        assert engine.query("select * from s_dt").collect() == []

    def test_stream_sees_full_refresh_net_delta(self, engine):
        engine.query(
            "create dynamic table dt_s target_lag = '1 minute' as "
            "select k, cast(sum(v) as bigint) as total "
            "from base group by k"
        )
        engine.query("alter table dt_s add primary key (k)")
        engine.query("create stream s2 on table dt_s")
        engine.query("update base set v = 11 where k = 1 and v = 10")
        engine.query("alter dynamic table dt_s refresh")  # full path
        assert (
            engine.store.dt_refresh_history()[-1]["mode"] == "full"
        )
        rows = sorted(
            (r["k"], r["total"], r["METADATA$ACTION"], r["METADATA$ISUPDATE"])
            for r in engine.query("select * from s2").collect()
        )
        # net delta: k=1 total 10 -> 11 as an update pre/post pair
        assert rows == [
            (1, 10, "DELETE", True),
            (1, 11, "INSERT", True),
        ]


class TestCreateGuards:
    def test_ctas_over_dynamic_table_refused(self, engine):
        _create(engine)
        with pytest.raises(ValueError, match="DYNAMIC TABLE"):
            engine.query(
                "create or replace table dt_sum as select 1 as x"
            )
        with pytest.raises(ValueError, match="dynamic table"):
            engine.query("create table dt_sum like base")
        with pytest.raises(ValueError, match="dynamic table"):
            engine.query("create table dt_sum clone base")


class TestVersionGateCoverage:
    """ADVICE r13 #1: the version gate must account for EVERY
    table-position base — comma joins, quoted identifiers — and must
    DISABLE skipping whenever any reference cannot be mapped to a
    versioned store table (a partial version map silently pinned the
    table stale forever)."""

    def test_comma_join_base_changes_are_seen(self, engine):
        engine.query(
            "create table base2 as select 1 as k, 100 as w"
        )
        engine.query(
            "create dynamic table dt_cj target_lag = '1 minute' as "
            "select a.k as k, a.v as v, b.w as w "
            "from base a, base2 b where a.k = b.k"
        )
        engine.query("insert into base2 select 2 as k, 200 as w")
        out = engine.query("alter dynamic table dt_cj refresh")
        assert out.collect()[0]["status"] == "refreshed"
        assert (
            engine.query(
                "select count(*) as n from dt_cj"
            ).collect()[0]["n"]
            == 3  # k=1 x1, k=2 x2 (base has two k=2 rows)
        )
        # and with BOTH bases now covered, an idle refresh skips
        out2 = engine.query("alter dynamic table dt_cj refresh")
        assert out2.collect()[0]["status"] == "skipped"

    def test_quoted_base_is_tracked(self, engine):
        # the GATE must see a quoted base (running quoted identifiers
        # through Spark is a separate dialect concern)
        versions, unversioned = engine._dt_base_versions(
            'select k, v from "BASE"'
        )
        assert versions == {"base": 0} and not unversioned

    def test_unnameable_relation_disables_skip(self, engine):
        versions, unversioned = engine._dt_base_versions(
            "select k from base, table(generator(rowcount => 3))"
        )
        assert versions == {"base": 0} and unversioned

    def test_view_base_disables_skip(self, engine):
        # a view has no version pointer: the gate cannot account for
        # it, so refreshes must recompute rather than skip
        engine.query("create view vbase as select k, v from base")
        engine.query(
            "create dynamic table dt_v target_lag = '1 minute' as "
            "select k, v from vbase"
        )
        out = engine.query("alter dynamic table dt_v refresh")
        assert out.collect()[0]["status"] == "refreshed"


class TestDownstreamLag:
    """ADVICE r13 #2: TARGET_LAG = DOWNSTREAM tables refresh whenever
    a dependent refreshes (Snowflake semantics) — manually or via the
    lag tick — never going permanently stale behind a dependent's
    version gate."""

    def _chain(self, engine):
        engine.query(
            "create dynamic table dt_mid target_lag = downstream as "
            "select k, v from base"
        )
        engine.query(
            "create dynamic table dt_leaf target_lag = '1 minute' as "
            "select cast(sum(v) as bigint) as s from dt_mid"
        )

    def test_dependent_refresh_pulls_downstream_upstream(self, engine):
        self._chain(engine)
        engine.query("insert into base select 3 as k, 48 as v")
        out = engine.query("alter dynamic table dt_leaf refresh")
        assert out.collect()[0]["status"] == "refreshed"
        assert (
            engine.query("select s from dt_leaf").collect()[0]["s"]
            == 100
        )
        # the upstream itself was refreshed, not bypassed
        assert (
            engine.query(
                "select count(*) as n from dt_mid"
            ).collect()[0]["n"]
            == 4
        )

    def test_tick_pulls_downstream_upstream(self, engine):
        self._chain(engine)
        engine.query("insert into base select 4 as k, 8 as v")
        engine.run_due(datetime(2027, 4, 1, tzinfo=timezone.utc))
        assert (
            engine.query("select s from dt_leaf").collect()[0]["s"]
            == 60
        )

    def test_idle_dependent_refresh_still_skips(self, engine):
        self._chain(engine)
        engine.query("alter dynamic table dt_leaf refresh")
        out = engine.query("alter dynamic table dt_leaf refresh")
        assert out.collect()[0]["status"] == "skipped"


class TestIncrementalJoin:
    """r14 (VERDICT r13 #5): a two-base INNER equi-join DT under
    append-only deltas maintains via the delta expansion
    A⋈B = (A_old⋈B_old) ∪ (ΔA⋈B) ∪ (A_old⋈ΔB) — two delta-sized
    probes appended, never a full-join recompute."""

    def _mk(self, engine):
        engine.query(
            "create table dims as select 1 as k, 'x' as tag "
            "union all select 2, 'y'"
        )
        engine.query(
            "create dynamic table dt_j target_lag = '1 minute' as "
            "select b.k as k, b.v as v, d.tag as tag "
            "from base b join dims d on b.k = d.k"
        )

    def _rows(self, engine):
        return sorted(
            (r["k"], r["v"], r["tag"])
            for r in engine.query("select * from dt_j").collect()
        )

    def _last_mode(self, engine):
        return engine.store.dt_refresh_history()[-1]["mode"]

    def test_left_delta_refreshes_incrementally(self, engine):
        self._mk(engine)
        engine.query("insert into base select 2 as k, 24 as v")
        engine.query("alter dynamic table dt_j refresh")
        assert self._last_mode(engine) == "incremental"
        assert self._rows(engine) == [
            (1, 10, "x"),
            (2, 20, "y"),
            (2, 22, "y"),
            (2, 24, "y"),
        ]

    def test_right_delta_refreshes_incrementally(self, engine):
        self._mk(engine)
        engine.query("insert into base select 3 as k, 30 as v")
        engine.query("alter dynamic table dt_j refresh")
        engine.query("insert into dims select 3 as k, 'z' as tag")
        engine.query("alter dynamic table dt_j refresh")
        assert self._last_mode(engine) == "incremental"
        assert (3, 30, "z") in self._rows(engine)

    def test_both_deltas_compose_without_double_count(self, engine):
        # ΔA⋈B already sees ΔB (B is read current), so the second leg
        # must probe A_OLD — a new (k,v) x new dim row must appear
        # exactly once
        self._mk(engine)
        engine.query("insert into base select 7 as k, 70 as v")
        engine.query("insert into dims select 7 as k, 'q' as tag")
        engine.query("alter dynamic table dt_j refresh")
        assert self._last_mode(engine) == "incremental"
        rows = self._rows(engine)
        assert rows.count((7, 70, "q")) == 1
        # and equals the full recompute
        full = sorted(
            tuple(r)
            for r in engine.query(
                "select b.k as k, b.v as v, d.tag as tag "
                "from base b join dims d on b.k = d.k"
            ).collect()
        )
        assert rows == full

    def test_outer_join_refuses_to_full(self, engine):
        engine.query(
            "create table dims as select 1 as k, 'x' as tag"
        )
        engine.query(
            "create dynamic table dt_lj target_lag = '1 minute' as "
            "select b.k as k, d.tag as tag "
            "from base b left join dims d on b.k = d.k"
        )
        engine.query("insert into base select 9 as k, 1 as v")
        engine.query("alter dynamic table dt_lj refresh")
        assert (
            engine.store.dt_refresh_history()[-1]["mode"] == "full"
        )

    def test_base_update_in_join_refuses_to_full(self, engine):
        self._mk(engine)
        engine.query("update base set v = 11 where k = 1")
        engine.query("alter dynamic table dt_j refresh")
        assert self._last_mode(engine) == "full"
        assert (1, 11, "x") in self._rows(engine)


class TestIncrementalUpsert:
    """r14 (VERDICT r13 #6): a per-row-transform DT over a PRIMARY
    KEY base whose history carries updates/deletes maintains via the
    net CHANGES window — deletion-vector delete of the changed keys +
    append of the transformed post-images."""

    def _mk(self, engine):
        engine.query(
            "create table src as select 1 as id, 10 as v "
            "union all select 2, 20 union all select 3, 30"
        )
        engine.query("alter table src add primary key (id)")
        engine.query(
            "create dynamic table dt_u target_lag = '1 minute' as "
            "select id, v * 2 as dv from src where v >= 10"
        )

    def _rows(self, engine):
        return sorted(
            (r["id"], r["dv"])
            for r in engine.query("select * from dt_u").collect()
        )

    def _last_mode(self, engine):
        return engine.store.dt_refresh_history()[-1]["mode"]

    def test_update_maintains_incrementally(self, engine):
        self._mk(engine)
        engine.query("update src set v = 15 where id = 2")
        engine.query("alter dynamic table dt_u refresh")
        assert self._last_mode(engine) == "incremental"
        assert self._rows(engine) == [(1, 20), (2, 30), (3, 60)]

    def test_delete_maintains_incrementally(self, engine):
        self._mk(engine)
        engine.query("delete from src where id = 1")
        engine.query("alter dynamic table dt_u refresh")
        assert self._last_mode(engine) == "incremental"
        assert self._rows(engine) == [(2, 40), (3, 60)]

    def test_update_out_of_where_range_drops_row(self, engine):
        self._mk(engine)
        engine.query("update src set v = 5 where id = 3")
        engine.query("alter dynamic table dt_u refresh")
        assert self._last_mode(engine) == "incremental"
        assert self._rows(engine) == [(1, 20), (2, 40)]

    def test_equals_full_recompute(self, engine):
        self._mk(engine)
        engine.query("update src set v = 40 where id = 1")
        engine.query("delete from src where id = 2")
        engine.query("insert into src select 4 as id, 50 as v")
        engine.query("alter dynamic table dt_u refresh")
        assert self._last_mode(engine) == "incremental"
        full = sorted(
            tuple(r)
            for r in engine.query(
                "select id, v * 2 as dv from src where v >= 10"
            ).collect()
        )
        assert self._rows(engine) == full

    def test_no_primary_key_refuses_to_full(self, engine):
        engine.query(
            "create table src2 as select 1 as id, 10 as v"
        )
        engine.query(
            "create dynamic table dt_u2 target_lag = '1 minute' as "
            "select id, v from src2"
        )
        engine.query("update src2 set v = 11 where id = 1")
        engine.query("alter dynamic table dt_u2 refresh")
        assert (
            engine.store.dt_refresh_history()[-1]["mode"] == "full"
        )

    def test_transformed_key_refuses_to_full(self, engine):
        engine.query(
            "create table src3 as select 1 as id, 10 as v"
        )
        engine.query("alter table src3 add primary key (id)")
        engine.query(
            "create dynamic table dt_u3 target_lag = '1 minute' as "
            "select id + 1 as id, v from src3"
        )
        engine.query("update src3 set v = 11 where id = 1")
        engine.query("alter dynamic table dt_u3 refresh")
        assert (
            engine.store.dt_refresh_history()[-1]["mode"] == "full"
        )


class TestIncrementalJoinPlanShape:
    """r14: the incremental join refresh must APPEND delta-probe rows
    (hard-linked files + new parquet), never rewrite the backing
    table, and the delta probes must carry the broadcast hint on the
    delta side."""

    def test_refresh_commits_append_and_broadcasts_delta(
        self, spark, engine
    ):
        engine.query(
            "create table dims as select 1 as k, 'x' as tag "
            "union all select 2, 'y'"
        )
        engine.query(
            "create dynamic table dt_pj target_lag = '1 minute' as "
            "select b.k as k, b.v as v, d.tag as tag "
            "from base b join dims d on b.k = d.k"
        )
        engine.query("insert into base select 2 as k, 99 as v")
        # the delta the refresh would append: broadcast-hinted probe
        meta = engine.store.dynamic_tables()["dt_pj"]
        delta = engine._dt_incremental_join(meta)
        assert delta is not None
        plan = delta._jdf.queryExecution().executedPlan().toString()
        assert "Broadcast" in plan
        assert "CartesianProduct" not in plan
        engine.query("alter dynamic table dt_pj refresh")
        hist = engine.store.history(spark, "dt_pj").collect()
        # newest commit first: the incremental refresh appended
        assert hist[0]["op"] == "append"


class TestChainedIncrementalComposition:
    """r14: DT-over-DT chains stay INCREMENTAL at every level — an
    upstream incremental refresh is an append commit whose files
    manifest exposes the delta to the downstream DT's own incremental
    path. No special wiring: the composition falls out of the store's
    unconditional append manifests."""

    def test_per_row_then_aggregate_chain(self, engine):
        engine.query(
            "create dynamic table c_dt1 target_lag = '1 minute' as "
            "select k, v * 2 as v2 from base"
        )
        engine.query(
            "create dynamic table c_dt2 target_lag = '1 minute' as "
            "select k, cast(sum(v2) as bigint) as total "
            "from c_dt1 group by k"
        )
        engine.query("insert into base select 1 as k, 5 as v")
        engine.query("alter dynamic table c_dt1 refresh")
        engine.query("alter dynamic table c_dt2 refresh")
        modes = [
            (h["name"], h["mode"])
            for h in engine.store.dt_refresh_history()
        ]
        assert ("c_dt1", "incremental") in modes
        assert ("c_dt2", "incremental_agg") in modes
        assert sorted(
            (r["k"], r["total"])
            for r in engine.query("select * from c_dt2").collect()
        ) == [(1, 30), (2, 84)]

    def test_per_row_then_join_chain(self, engine):
        engine.query(
            "create table c_dims as select 1 as k, 'x' as tag "
            "union all select 2, 'y'"
        )
        engine.query(
            "create dynamic table c_j1 target_lag = '1 minute' as "
            "select k, v from base"
        )
        engine.query(
            "create dynamic table c_j2 target_lag = '1 minute' as "
            "select a.k as k, a.v as v, d.tag as tag "
            "from c_j1 a join c_dims d on a.k = d.k"
        )
        engine.query("insert into base select 2 as k, 7 as v")
        engine.query("alter dynamic table c_j1 refresh")
        engine.query("alter dynamic table c_j2 refresh")
        modes = [
            (h["name"], h["mode"])
            for h in engine.store.dt_refresh_history()
        ]
        assert ("c_j1", "incremental") in modes
        assert ("c_j2", "incremental") in modes
        assert (2, 7, "y") in [
            (r["k"], r["v"], r["tag"])
            for r in engine.query("select * from c_j2").collect()
        ]

    def test_one_tick_keeps_chain_incremental(self, engine):
        engine.query(
            "create dynamic table t_dt1 target_lag = '1 minute' as "
            "select k, v from base"
        )
        engine.query(
            "create dynamic table t_dt2 target_lag = '1 minute' as "
            "select k, cast(count(*) as bigint) as n "
            "from t_dt1 group by k"
        )
        engine.query("insert into base select 9 as k, 1 as v")
        engine.run_due(datetime(2027, 5, 1, tzinfo=timezone.utc))
        modes = [
            (h["name"], h["mode"])
            for h in engine.store.dt_refresh_history()
        ]
        assert ("t_dt1", "incremental") in modes
        assert ("t_dt2", "incremental_agg") in modes


class TestSetTargetLag:
    """r14: ALTER DYNAMIC TABLE ... SET TARGET_LAG retunes the
    schedule in place — the next tick honors the new lag, and setting
    DOWNSTREAM drops self-scheduling."""

    def test_set_lag_changes_tick_schedule(self, engine):
        _create(engine)  # 60-second lag
        engine.query(
            "alter dynamic table dt_sum set target_lag = '1 hour'"
        )
        assert (
            engine.store.dynamic_tables()["dt_sum"]["lag_s"] == 3600
        )
        engine.query("insert into base select 8 as k, 80 as v")
        # 2 minutes after the create-time refresh (which stamped the
        # real clock): inside the new 1-hour lag, so no attempt fires
        from datetime import timedelta

        tick = engine.run_due(
            datetime.now(timezone.utc) + timedelta(minutes=2)
        )
        assert tick.collect() == []

    def test_set_downstream_drops_self_schedule(self, engine):
        _create(engine)
        engine.query(
            "alter dynamic table dt_sum set target_lag = downstream"
        )
        assert (
            engine.store.dynamic_tables()["dt_sum"]["lag_s"] is None
        )
        engine.query("insert into base select 8 as k, 80 as v")
        tick = engine.run_due(datetime(2028, 1, 1, tzinfo=timezone.utc))
        assert tick.collect() == []
        # manual refresh still works
        out = engine.query("alter dynamic table dt_sum refresh")
        assert out.collect()[0]["status"] == "refreshed"

    def test_bad_lag_value_rejected(self, engine):
        _create(engine)
        with pytest.raises(ValueError, match="TARGET_LAG"):
            engine.query(
                "alter dynamic table dt_sum set target_lag = 'soon'"
            )
