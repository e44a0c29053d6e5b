"""Parallel DAG execution (dbt --threads): engine.run(threads=N)."""

from __future__ import annotations

import threading

import pytest

from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.model import Model
from dbt_omnata_push_spark.engine.store import TableStore


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, TableStore(str(tmp_path / "store")))


def test_independent_models_run_concurrently(spark, engine):
    """Both siblings must be in flight at once: each blocks on a
    2-party barrier that only releases when the OTHER is also running.
    threads=1 would deadlock (timeout -> error result); threads=2
    passes cleanly."""
    barrier = threading.Barrier(2, timeout=30)

    def make(tag):
        def build(ctx):
            barrier.wait()
            return spark.createDataFrame([(tag,)], "v string")

        return build

    engine.register(Model("left", builder=make("l"), config={"materialized": "table"}))
    engine.register(Model("right", builder=make("r"), config={"materialized": "table"}))
    results = engine.run(threads=2)
    assert {r.status for r in results.values()} == {"success"}
    assert engine.store.read(spark, "left").collect()[0]["v"] == "l"


def test_dependency_order_respected_and_no_level_barrier(spark, engine):
    """d waits for BOTH b and c; b and c wait for a. Start order is
    recorded; every model must start only after its deps finished."""
    order: list[str] = []
    lock = threading.Lock()

    def make(name, deps=()):
        def build(ctx):
            with lock:
                order.append(name)
            for d in deps:
                ctx.ref(d)  # upstream must be readable
            return spark.createDataFrame([(name,)], "v string")

        return build

    engine.register(Model("a", builder=make("a"), config={"materialized": "table"}))
    engine.register(
        Model("b", builder=make("b", ["a"]), depends_on=["a"],
              config={"materialized": "table"})
    )
    engine.register(
        Model("c", builder=make("c", ["a"]), depends_on=["a"],
              config={"materialized": "table"})
    )
    engine.register(
        Model("d", builder=make("d", ["b", "c"]), depends_on=["b", "c"],
              config={"materialized": "table"})
    )
    results = engine.run(threads=3)
    assert {r.status for r in results.values()} == {"success"}
    assert order[0] == "a"
    assert order[-1] == "d"
    assert set(order[1:3]) == {"b", "c"}


def test_error_isolation_under_threads(spark, engine):
    def ok(ctx):
        return spark.createDataFrame([(1,)], "v long")

    def boom(ctx):
        raise RuntimeError("kaput")

    engine.register(Model("good", builder=ok, config={"materialized": "table"}))
    engine.register(Model("bad", builder=boom, config={"materialized": "table"}))
    engine.register(
        Model(
            "child_of_bad",
            builder=ok,
            depends_on=["bad"],
            config={"materialized": "table"},
        )
    )
    results = engine.run(threads=2)
    assert results["good"].status == "success"
    assert results["bad"].status == "error"
    assert "kaput" in results["bad"].message
    assert results["child_of_bad"].status == "skipped"


def test_parallel_matches_sequential_results(spark, tmp_path):
    def build_engine(root):
        e = Engine(spark, TableStore(str(root)))
        for i in range(6):
            deps = ["m0"] if i > 0 else []
            e.register(
                Model(
                    f"m{i}",
                    builder=lambda ctx, i=i: spark.createDataFrame(
                        [(i, i * 10)], "k long, v long"
                    ),
                    depends_on=deps,
                    config={"materialized": "table"},
                )
            )
        return e

    seq = build_engine(tmp_path / "seq").run(threads=1)
    par = build_engine(tmp_path / "par").run(threads=4)
    assert {n: r.status for n, r in seq.items()} == {
        n: r.status for n, r in par.items()
    }


def test_fail_fast_raises_under_threads(spark, engine):
    def boom(ctx):
        raise RuntimeError("ff")

    engine.register(Model("x", builder=boom, config={"materialized": "table"}))
    with pytest.raises(RuntimeError, match="ff"):
        engine.run(threads=2, fail_fast=True)
