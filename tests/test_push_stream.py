"""Streaming Salesforce push (r7): per-micro-batch jobs, exactly-once
record delivery across checkpoint restarts AND fresh-checkpoint
replays (log-table anti-join)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dbt_omnata_push_spark.connectors import MockSalesforceConnector
from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.store import TableStore
from dbt_omnata_push_spark.materializations import tracking
from dbt_omnata_push_spark.streaming.push_stream import push_stream_salesforce


def _landing(spark, tmp_path, n_files=3, per_file=40):
    """Flat parquet landing dir of JSON record strings, n_files files."""
    landing = str(tmp_path / "landing")
    for i in range(n_files):
        rows = [
            (f'{{"Name": "acct-{i}-{j}", "AccountID__c": "{i * per_file + j}"}}',)
            for j in range(per_file)
        ]
        spark.createDataFrame(rows, "record string").coalesce(1).write.mode(
            "append"
        ).parquet(landing)
    return landing


def _stream(spark, landing):
    return (
        spark.readStream.schema("record string")
        .option("maxFilesPerTrigger", "1")
        .parquet(landing)
    )


def _tally(path):
    total = 0
    try:
        with open(path) as f:
            for line in f:
                kind, n = line.strip().split(",")
                if kind == "load_batch":
                    total += int(n)
    except FileNotFoundError:
        pass
    return total


@pytest.fixture()
def env(spark, tmp_path):
    conn = MockSalesforceConnector(call_log=str(tmp_path / "calls.log"))
    engine = Engine(spark, TableStore(str(tmp_path / "store")))
    cfg = {
        "app": "salesforce",
        "operation": "bulk_load",
        "load_type": "upsert",
        "object_name": "Account",
        "external_id_field": "AccountID__c",
        "connector": conn,
    }
    return engine, cfg, conn, str(tmp_path / "ckpt"), tmp_path


def test_stream_push_per_batch_jobs_and_logs(spark, env):
    engine, cfg, conn, ckpt, tmp_path = env
    landing = _landing(spark, tmp_path)
    results = push_stream_salesforce(
        spark, _stream(spark, landing), engine, "accounts_stream", cfg,
        "$.AccountID__c", checkpoint_dir=ckpt,
    )
    assert [r.status for r in results] == ["success"] * 3  # 1 job/batch
    tasks = engine.store.read(spark, tracking.SFDC_LOAD_TASKS)
    assert tasks.count() == 3
    logs = engine.store.read(spark, tracking.SFDC_LOAD_TASK_LOGS)
    assert logs.count() == 120
    assert _tally(conn.call_log) == 120  # every record pushed once

    # restart, same checkpoint: source fully consumed -> nothing runs
    r2 = push_stream_salesforce(
        spark, _stream(spark, landing), engine, "accounts_stream", cfg,
        "$.AccountID__c", checkpoint_dir=ckpt,
    )
    assert r2 == []
    assert _tally(conn.call_log) == 120

    # FRESH checkpoint: full source replay, but the log anti-join drops
    # every already-successful record -> skipped batches, 0 new calls
    r3 = push_stream_salesforce(
        spark, _stream(spark, landing), engine, "accounts_stream", cfg,
        "$.AccountID__c", checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    assert [r.status for r in r3] == ["skipped"] * 3
    assert engine.store.read(spark, tracking.SFDC_LOAD_TASKS).count() == 3
    assert _tally(conn.call_log) == 120


def test_stream_push_new_data_after_replay_still_flows(spark, env):
    engine, cfg, conn, ckpt, tmp_path = env
    landing = _landing(spark, tmp_path, n_files=1, per_file=10)
    push_stream_salesforce(
        spark, _stream(spark, landing), engine, "t2", cfg,
        "$.AccountID__c", checkpoint_dir=ckpt,
    )
    assert _tally(conn.call_log) == 10
    # new file arrives; same checkpoint picks up ONLY the new batch
    rows = [
        ('{"Name": "new-%d", "AccountID__c": "90%d"}' % (j, j),)
        for j in range(5)
    ]
    spark.createDataFrame(rows, "record string").coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    results = push_stream_salesforce(
        spark, _stream(spark, landing), engine, "t2", cfg,
        "$.AccountID__c", checkpoint_dir=ckpt,
    )
    assert [r.status for r in results] == ["success"]
    assert _tally(conn.call_log) == 15
    assert engine.store.read(spark, tracking.SFDC_LOAD_TASK_LOGS).count() == 15


def test_stream_push_marketing_cloud_exactly_once(spark, tmp_path):
    from dbt_omnata_push_spark.connectors import MockMarketingCloudConnector
    from dbt_omnata_push_spark.streaming.push_stream import (
        push_stream_marketing_cloud,
    )

    conn = MockMarketingCloudConnector(call_log=str(tmp_path / "mc.log"))
    engine = Engine(spark, TableStore(str(tmp_path / "store")))
    cfg = {
        "app": "marketing_cloud",
        "operation": "data_extension_upload",
        "data_extension_name": "Contacts DE",
        "connector": conn,
    }
    landing = str(tmp_path / "landing")
    for i in range(2):
        rows = [
            (f'{{"ContactID": "{i * 30 + j}", "EmailAddress": "u{i}-{j}@x"}}',)
            for j in range(30)
        ]
        spark.createDataFrame(rows, "record string").coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    def stream():
        return (
            spark.readStream.schema("record string")
            .option("maxFilesPerTrigger", "1")
            .parquet(landing)
        )

    r1 = push_stream_marketing_cloud(
        spark, stream(), engine, "contacts_stream", cfg, "$.ContactID",
        checkpoint_dir=str(tmp_path / "ck"),
    )
    assert [r.status for r in r1] == ["success", "success"]
    logs = engine.store.read(spark, tracking.SFMC_LOAD_TASK_LOGS)
    assert logs.count() == 60
    tasks = engine.store.read(spark, tracking.SFMC_LOAD_TASKS)
    assert tasks.count() == 2  # one import per batch

    # fresh checkpoint -> full replay -> anti-join drops everything
    r2 = push_stream_marketing_cloud(
        spark, stream(), engine, "contacts_stream", cfg, "$.ContactID",
        checkpoint_dir=str(tmp_path / "ck2"),
    )
    assert [r.status for r in r2] == ["skipped", "skipped"]
    assert engine.store.read(spark, tracking.SFMC_LOAD_TASK_LOGS).count() == 60
