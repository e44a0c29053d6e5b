"""Failure semantics: transient retry, per-record failure capture, and
failed-record re-push on the next incremental run (the reference's own
recovery model — RESULT:"success"=false rows fail the NOT-IN filter and
are re-pushed, accounts_load.sql:19-30)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_omnata_push_spark.connectors import MockSalesforceConnector
from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.model import Model
from dbt_omnata_push_spark.engine.store import TableStore
from dbt_omnata_push_spark.materializations import tracking
from dbt_omnata_push_spark.ops.retry import RetryPolicy

from .fixtures import accounts_load_builder


def test_retry_policy_recovers_from_transient():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("transient")
        return "ok"

    assert RetryPolicy(max_attempts=3, base_delay_s=0.01).call(flaky) == "ok"
    assert calls["n"] == 3


def test_retry_policy_gives_up():
    def always_down():
        raise TimeoutError("down")

    with pytest.raises(TimeoutError):
        RetryPolicy(max_attempts=2, base_delay_s=0.01).call(always_down)


def test_retry_policy_does_not_retry_logic_errors():
    calls = {"n": 0}

    def broken():
        calls["n"] += 1
        raise ValueError("bad payload")

    with pytest.raises(ValueError):
        RetryPolicy(max_attempts=3, base_delay_s=0.01).call(broken)
    assert calls["n"] == 1


class PartialFailureSF(MockSalesforceConnector):
    """Records whose AccountID ends in an odd digit fail (API-level,
    success=false) — deterministic so the re-push run is predictable."""

    def load_batch(self, job_id, records):
        out = []
        for rec in records:
            ok = int(rec["AccountID__c"].rsplit("-", 1)[1]) % 2 == 0
            out.append(
                {"created": ok, "errors": [] if ok else ["DUPLICATE_VALUE"],
                 "id": "00Q0", "success": ok}
            )
        return out


def test_failed_records_are_repushed_next_run(spark, tmp_path):
    engine = Engine(spark, TableStore(str(tmp_path)))
    engine.seed(
        "accounts",
        spark.createDataFrame(
            [(f"Co {i}", f"co-{i}") for i in range(20)],
            "NAME string, ACCOUNT_ID string",
        ),
    )
    for t in (tracking.SFDC_LOAD_TASKS, tracking.SFDC_LOAD_TASK_LOGS):
        engine.register(
            Model(
                t,
                builder=lambda ctx, n=t: spark.createDataFrame(
                    [], tracking.SCHEMAS[n]
                ),
                config={"materialized": "tracking_table", "unique_key": "job_id"},
            )
        )
    engine.register(
        Model(
            "accounts_load",
            builder=accounts_load_builder("accounts_load"),
            config={
                "materialized": "omnata_push",
                "app": "salesforce",
                "operation": "bulk_load",
                "object_name": "Account",
                "external_id_field": "AccountID__c",
                "connector": PartialFailureSF(),
            },
            depends_on=["accounts", tracking.SFDC_LOAD_TASKS, tracking.SFDC_LOAD_TASK_LOGS],
        )
    )
    first = engine.run()
    assert first["accounts_load"].status == "success"
    logs = engine.store.read(spark, tracking.SFDC_LOAD_TASK_LOGS)
    assert logs.count() == 20
    failed = logs.filter(F.get_json_object("result", "$.success") == "false")
    assert failed.count() == 10  # odd-suffixed accounts

    # Second run: ONLY the 10 failed records clear the NOT-IN filter and
    # are pushed again (they fail again here; a fixed API would succeed).
    second = engine.run()
    assert second["accounts_load"].status == "success"
    assert second["accounts_load"].rows_affected == 10
    logs2 = engine.store.read(spark, tracking.SFDC_LOAD_TASK_LOGS)
    # 20 from run 1 + 10 re-pushes (new job => new deterministic ids).
    assert logs2.count() == 30
    repushed = {
        r[0]
        for r in logs2.filter(F.col("job_id") != first["accounts_load"].extra["job_id"])
        .select(F.get_json_object("record", "$.AccountID__c"))
        .collect()
    }
    assert repushed == {f"co-{i}" for i in range(1, 20, 2)}


def test_run_isolates_failures_and_skips_dependents(spark, tmp_path):
    """dbt error isolation (r7): an erroring model yields an 'error'
    result, its transitive dependents 'skipped', and INDEPENDENT models
    still run to success; fail_fast=True re-raises instead."""
    import pytest

    from dbt_omnata_push_spark.engine.dag import Engine, Model
    from dbt_omnata_push_spark.engine.store import TableStore

    engine = Engine(spark, TableStore(str(tmp_path / "s")))

    def boom(ctx):
        raise RuntimeError("builder exploded")

    engine.register(Model("bad", builder=boom, config={"materialized": "table"}))
    engine.register(
        Model(
            "child",
            builder=lambda ctx: ctx.ref("bad"),
            config={"materialized": "table"},
            depends_on=["bad"],
        )
    )
    engine.register(
        Model(
            "grandchild",
            builder=lambda ctx: ctx.ref("child"),
            config={"materialized": "table"},
            depends_on=["child"],
        )
    )
    engine.register(
        Model(
            "independent",
            builder=lambda ctx: spark.createDataFrame([(1,)], "x long"),
            config={"materialized": "table"},
        )
    )
    results = engine.run()
    assert results["bad"].status == "error"
    assert "builder exploded" in results["bad"].message
    assert results["child"].status == "skipped"
    assert results["grandchild"].status == "skipped"  # transitive
    assert results["independent"].status == "success"
    assert engine.store.exists("independent")
    assert not engine.store.exists("child")  # never executed

    with pytest.raises(RuntimeError, match="builder exploded"):
        engine.run(["bad"], fail_fast=True)
