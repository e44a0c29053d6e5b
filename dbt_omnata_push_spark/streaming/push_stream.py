"""Streaming push: a record stream drains into the Salesforce bulk-load
pipeline per micro-batch with EXACTLY-ONCE record delivery (r7).

The reference's push pipelines are batch-dbt; this is the same
tracking-table contract under Structured Streaming — the shape a
CDC-to-SaaS sync runs. Exactly-once here is layered, because remote
side effects cannot be rolled back:

1. Source progress checkpoints (a restart with the same checkpoint
   re-reads nothing).
2. A replayed/restarted batch re-filters against the LOG TABLE: the
   incremental NOT-IN anti-join on the record's business key drops
   every record a prior job already pushed successfully (the
   reference's own re-sync prevention, README.md:150-168, applied
   per micro-batch instead of per run).
3. Within a job, log-entry ids are deterministic (sha2(job_id||idx)),
   so a retried task upserts rather than duplicates (batch path,
   SURVEY.md §7 hard-part 1).

So even a FRESH checkpoint (full source replay) creates no duplicate
remote records: every batch sees the logs of every earlier batch.
Each non-empty filtered batch becomes one bulk-load job (create ->
load batches on executors -> close), giving per-batch task rows — the
streaming analogue of the reference's per-run job row. An
empty-after-filter batch short-circuits without a connector call.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.model import Model


def push_stream_salesforce(
    spark: SparkSession,
    record_stream: DataFrame,
    engine,
    load_task_name: str,
    config: dict,
    key_path: str,
    checkpoint_dir: str | None = None,
) -> list:
    """Drain ``record_stream`` (one 'record' column, struct or JSON
    string) into Salesforce bulk loads, one job per non-empty
    micro-batch (availableNow trigger). Returns the per-batch
    RunResults, in batch order."""
    from ..materializations import tracking
    from ..materializations.push import _records_json, _salesforce_bulk_load

    model = Model(
        name=load_task_name,
        builder=lambda ctx: None,  # records come from the stream
        config=dict(config),
    )
    results: list = []

    def _push(bdf: DataFrame, bid: int) -> None:
        records = _records_json(bdf)
        logs_tbl = tracking.resolve(engine, tracking.SFDC_LOAD_TASK_LOGS)
        if engine.store.exists(logs_tbl):
            logs = engine.store.read(spark, logs_tbl)
            loaded = logs.filter(
                (F.get_json_object("result", "$.success") == "true")
                & (F.col("load_task_name") == load_task_name)
            ).select(F.get_json_object("record", key_path).alias("_loaded"))
            records = records.join(
                loaded,
                F.get_json_object(F.col("record"), key_path)
                == F.col("_loaded"),
                "left_anti",
            )
        results.append(_salesforce_bulk_load(engine, model, records))

    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="sg_push_stream_")
    (
        record_stream.writeStream.foreachBatch(_push)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return results


def push_stream_marketing_cloud(
    spark: SparkSession,
    record_stream: DataFrame,
    engine,
    load_task_name: str,
    config: dict,
    key_path: str,
    checkpoint_dir: str | None = None,
) -> list:
    """SFMC data-extension analogue of ``push_stream_salesforce``: one
    import per non-empty micro-batch, with the same layered exactly-once
    (source checkpoint + per-batch anti-join against successful SFMC
    log rows + per-job deterministic log ids)."""
    from ..materializations import tracking
    from ..materializations.push import _marketing_cloud_upload, _records_json

    model = Model(
        name=load_task_name,
        builder=lambda ctx: None,
        config=dict(config),
    )
    results: list = []

    def _push(bdf: DataFrame, bid: int) -> None:
        records = _records_json(bdf)
        logs_tbl = tracking.resolve(engine, tracking.SFMC_LOAD_TASK_LOGS)
        if engine.store.exists(logs_tbl):
            logs = engine.store.read(spark, logs_tbl)
            loaded = logs.filter(
                (F.get_json_object("result", "$.success") == "true")
                & (F.col("load_task_name") == load_task_name)
            ).select(F.get_json_object("record", key_path).alias("_loaded"))
            records = records.join(
                loaded,
                F.get_json_object(F.col("record"), key_path)
                == F.col("_loaded"),
                "left_anti",
            )
        results.append(_marketing_cloud_upload(engine, model, records))

    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="sg_push_stream_mc_")
    (
        record_stream.writeStream.foreachBatch(_push)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return results
