"""End-to-end reverse-ETL DAG rehearsal (r12, VERDICT r11 #7): the
reference's whole purpose — warehouse data flowing OUT to a SaaS app —
composed through every engine surface in one pipeline:

    seed -> incremental model (high-watermark) -> STREAM on the
    model's table -> scheduled TASK (run_due tick, WHEN
    SYSTEM$STREAM_HAS_DATA gate) relaying the stream delta into a
    staging table -> omnata_push materialization with the mock
    Salesforce connector (tracking tables double-written).

Cycle assertions: the bootstrap load pushes everything once; an
incremental batch flows through stream -> task -> staging -> push
exactly once; a no-change cycle fires nothing (WHEN gate skips the
task, the push short-circuits with zero connector calls)."""
from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from dbt_omnata_push_spark.connectors import MockSalesforceConnector
from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.model import Model
from dbt_omnata_push_spark.engine.store import TableStore
from dbt_omnata_push_spark.materializations import tracking

N_BATCH1 = 40
N_BATCH2 = 15


def _accounts(spark, n, start=0, day0=1):
    return spark.createDataFrame(
        [
            (f"acct-{i:04d}", f"Account {i:04d}", day0 + (i - start) % 3)
            for i in range(start, start + n)
        ],
        "ACCOUNT_ID string, NAME string, UPDATED_DAY int",
    )


def _curated_builder(ctx):
    from dbt_omnata_push_spark.materializations.core import (
        high_watermark_incremental,
    )

    raw = ctx.ref("crm_accounts")
    return high_watermark_incremental(ctx, raw, "UPDATED_DAY")


def _staging_push_builder(ctx):
    st = ctx.ref("push_staging")
    rec = st.select(
        F.struct(
            F.col("NAME").alias("Name"),
            F.col("ACCOUNT_ID").alias("AccountID__c"),
        ).alias("record")
    )
    logs = ctx.ref(tracking.SFDC_LOAD_TASK_LOGS)
    loaded = logs.filter(
        (F.get_json_object("result", "$.success") == "true")
        & (F.col("load_task_name") == "staging_load")
    ).select(F.get_json_object("record", "$.AccountID__c").alias("_loaded"))
    return rec.join(
        loaded, rec["record.AccountID__c"] == loaded["_loaded"], "left_anti"
    )


@pytest.fixture()
def pipeline(spark, tmp_path):
    root = str(tmp_path / "store")
    sf = MockSalesforceConnector(call_log=f"{root}_sf_calls.log")
    engine = Engine(spark, TableStore(root))
    engine.seed("crm_accounts", _accounts(spark, N_BATCH1))

    def tracking_model(name):
        return Model(
            name=name,
            builder=lambda ctx, n=name: spark.createDataFrame(
                [], tracking.SCHEMAS[n]
            ),
            config={"materialized": "tracking_table", "unique_key": "job_id"},
        )

    for t in (tracking.SFDC_LOAD_TASKS, tracking.SFDC_LOAD_TASK_LOGS):
        engine.register(tracking_model(t))
    engine.register(
        Model(
            "accounts_curated",
            builder=_curated_builder,
            config={"materialized": "incremental"},
            depends_on=["crm_accounts"],
        )
    )
    engine.register(
        Model(
            "staging_load",
            builder=_staging_push_builder,
            config={
                "materialized": "omnata_push",
                "app": "salesforce",
                "operation": "bulk_load",
                "load_type": "upsert",
                "object_name": "Account",
                "external_id_field": "AccountID__c",
                "connector": sf,
            },
            depends_on=[
                tracking.SFDC_LOAD_TASKS,
                tracking.SFDC_LOAD_TASK_LOGS,
            ],
        )
    )
    return engine, sf


def _dt(h):
    return datetime(2026, 8, 16, h, 0, tzinfo=timezone.utc)


def _count(engine, name):
    return engine.store.read(engine.spark, name).count()


def _calls(path):
    try:
        with open(path) as f:
            return sum(1 for _ in f)
    except FileNotFoundError:
        return 0


class TestReverseEtlDag:
    def test_full_cycle(self, spark, pipeline):
        engine, sf = pipeline

        # -- bootstrap: incremental model materializes batch 1 ---------
        res = engine.run()
        assert res["accounts_curated"].status == "success"
        assert _count(engine, "accounts_curated") == N_BATCH1

        # -- stream + staging + scheduled relay task through SQL DDL ---
        engine.query(
            "alter table accounts_curated add primary key (ACCOUNT_ID)"
        )
        engine.query("create stream acct_stream on table accounts_curated")
        engine.query(
            "create table push_staging as "
            "select ACCOUNT_ID, NAME from accounts_curated"
        )
        engine.query(
            "create task relay_task schedule = '60 minute' "
            "when SYSTEM$STREAM_HAS_DATA('acct_stream') as "
            "insert into push_staging "
            "select ACCOUNT_ID, NAME from acct_stream "
            "where `METADATA$ACTION` = 'INSERT'"
        )
        engine.query("alter task relay_task resume")

        # -- cycle 1: push the bootstrap staging ------------------------
        res = engine.run(select=["staging_load"])
        assert res["staging_load"].status == "success"
        logs = engine.store.read(
            engine.spark, tracking.SFDC_LOAD_TASK_LOGS
        )
        assert logs.count() == N_BATCH1
        calls_after_c1 = _calls(sf.call_log)
        assert calls_after_c1 > 0

        # -- cycle 2: new source batch flows seed -> incremental ->
        #    stream -> scheduled task -> staging -> push ----------------
        engine.seed(
            "crm_accounts",
            _accounts(spark, N_BATCH1, 0, day0=1).unionByName(
                _accounts(spark, N_BATCH2, N_BATCH1, day0=9)
            ),
        )
        res = engine.run(select=["accounts_curated"])
        assert res["accounts_curated"].status == "success"
        assert _count(engine, "accounts_curated") == N_BATCH1 + N_BATCH2

        tick = engine.run_due(_dt(10))
        fired = {(r["task_name"], r["status"]) for r in tick.collect()}
        assert ("relay_task", "success") in fired
        assert _count(engine, "push_staging") == N_BATCH1 + N_BATCH2

        res = engine.run(select=["staging_load"])
        assert res["staging_load"].status == "success"
        assert _count(engine, tracking.SFDC_LOAD_TASK_LOGS) == (
            N_BATCH1 + N_BATCH2
        )
        # each pushed exactly once across cycles
        keys = [
            r["k"]
            for r in engine.store.read(
                engine.spark, tracking.SFDC_LOAD_TASK_LOGS
            )
            .select(
                F.get_json_object("record", "$.AccountID__c").alias("k")
            )
            .collect()
        ]
        assert len(keys) == len(set(keys))

        # -- cycle 3: nothing changed — the WHEN gate skips the task,
        #    the push short-circuits with ZERO connector calls ----------
        calls_before_c3 = _calls(sf.call_log)
        res = engine.run(select=["accounts_curated"])
        assert _count(engine, "accounts_curated") == N_BATCH1 + N_BATCH2
        tick = engine.run_due(_dt(12))
        fired = {(r["task_name"], r["status"]) for r in tick.collect()}
        assert ("relay_task", "skipped_when") in fired
        assert _count(engine, "push_staging") == N_BATCH1 + N_BATCH2
        res = engine.run(select=["staging_load"])
        assert res["staging_load"].status == "skipped"
        assert _calls(sf.call_log) == calls_before_c3

    def test_stream_has_data_unknown_stream_raises(self, spark, pipeline):
        engine, _ = pipeline
        engine.query("create task t1 schedule = '60 minute' "
                     "when SYSTEM$STREAM_HAS_DATA('nope') as select 1")
        engine.query("alter task t1 resume")
        with pytest.raises(ValueError, match="stream not found"):
            engine.run_due(_dt(9))

    def test_stream_has_data_gate_composes_with_sql(self, spark, pipeline):
        # the gate substitutes into a larger boolean expression
        engine, _ = pipeline
        engine.run(select=["accounts_curated"])
        engine.query(
            "alter table accounts_curated add primary key (ACCOUNT_ID)"
        )
        engine.query("create stream s2 on table accounts_curated")
        engine.query(
            "create task t2 schedule = '60 minute' "
            "when SYSTEM$STREAM_HAS_DATA('s2') and 1 = 1 as select 1"
        )
        engine.query("alter task t2 resume")
        tick = engine.run_due(_dt(9))
        fired = {(r["task_name"], r["status"]) for r in tick.collect()}
        assert ("t2", "skipped_when") in fired  # fresh stream is empty
