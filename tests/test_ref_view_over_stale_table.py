"""ref() must prefer THIS run's view-materialized output over a stale
store table of the same name (r13, r12 advice).

Scenario: a model was once table-materialized (its table persists in
the store), then its materialization is switched to view. Without the
fix, downstream refs silently resolve to the stale table. Store-backed
materializations clear the preference, so the r12 store-first rule
(fresh version-pointer reads, never cache-pinned tables) is preserved.
"""

from __future__ import annotations

import pytest

from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.model import Model
from dbt_omnata_push_spark.engine.store import TableStore


@pytest.fixture()
def engine(spark, tmp_path):
    eng = Engine(spark, TableStore(str(tmp_path / "store")))
    eng.seed("src", spark.createDataFrame([(1,), (2,)], "x int"))
    return eng


def _run_upstream(engine, materialized: str, sql: str):
    engine.models.clear()
    engine.register(
        Model(
            name="up",
            sql=sql,
            config={"materialized": materialized},
        )
    )
    engine.register(
        Model(
            name="down",
            sql="select sum(x) as s from {{ ref('up') }}",
            config={"materialized": "view"},
        )
    )
    res = engine.run()
    assert all(r.status == "success" for r in res.values()), res
    return engine.ref("down").collect()[0]["s"]


def test_view_rematerialization_shadows_stale_table(engine):
    # run 1: `up` is a TABLE — its store table persists
    assert _run_upstream(
        engine, "table", "select x from {{ ref('src') }}"
    ) == 3
    assert engine.store.exists("up")
    # run 2: materialization switched to VIEW with new logic; the old
    # table is still in the store but must NOT win the ref
    assert _run_upstream(
        engine, "view", "select x * 10 as x from {{ ref('src') }}"
    ) == 30


def test_table_rematerialization_clears_preference(engine):
    # view first, then back to table: the store-backed publish clears
    # the nonstore mark so refs return to fresh store reads
    assert _run_upstream(
        engine, "view", "select x from {{ ref('src') }}"
    ) == 3
    assert _run_upstream(
        engine, "table", "select x * 100 as x from {{ ref('src') }}"
    ) == 300
    assert "up" not in engine._nonstore_published
    # a later direct DML on the table is visible to refs (the r12
    # store-first guarantee still holds once store-backed)
    engine.query("insert into up select 1000 as x")
    assert engine.ref("up").count() == 3


def test_out_of_band_ctas_unpins_view(engine):
    # r14 (ADVICE r13 #5): the view publish is pinned only while the
    # same-named store state is UNCHANGED — an ad-hoc CTAS through
    # engine.query (outside the materialization path) takes the name
    # over, and later refs must see the fresh store table, not the
    # cached view DataFrame
    assert _run_upstream(
        engine, "view", "select x from {{ ref('src') }}"
    ) == 3
    assert "up" in engine._nonstore_published
    engine.query("create or replace table up as select 7 as x")
    assert [r["x"] for r in engine.ref("up").collect()] == [7]
    assert "up" not in engine._nonstore_published


def test_out_of_band_insert_over_residue_unpins(engine):
    # table first (store residue exists), then view; an insert into
    # the residue table bumps its version -> the pin must drop
    assert _run_upstream(
        engine, "table", "select x from {{ ref('src') }}"
    ) == 3
    assert _run_upstream(
        engine, "view", "select x * 10 as x from {{ ref('src') }}"
    ) == 30
    engine.query("insert into up select 99 as x")
    assert sorted(r["x"] for r in engine.ref("up").collect()) == [
        1,
        2,
        99,
    ]
