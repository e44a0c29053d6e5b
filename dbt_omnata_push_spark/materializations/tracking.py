"""Tracking-table schemas (FIXTURES.md §4; declared in the reference as
zero-row ``select null::type ... where 0=1`` templates,
models/sfdc/sfdc_load_tasks.sql:7-17 etc.).

VARIANT columns are JSON strings at this boundary (SURVEY.md §1.2)."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import StringType, StructField, StructType, TimestampType

SFDC_LOAD_TASKS = "sfdc_load_tasks"
SFDC_LOAD_TASK_LOGS = "sfdc_load_task_logs"
SFMC_LOAD_TASKS = "sfmc_load_tasks"
SFMC_LOAD_TASK_LOGS = "sfmc_load_task_logs"

SCHEMAS: dict[str, StructType] = {
    # models/sfdc/sfdc_load_tasks.sql:7-17 (unique_key='job_id', line 3)
    SFDC_LOAD_TASKS: StructType(
        [
            StructField("job_id", StringType()),
            StructField("load_task_name", StringType()),
            StructField("object_name", StringType()),
            StructField("operation", StringType()),
            StructField("external_id_field", StringType()),
            StructField("creation_time", TimestampType()),
            StructField("creation_metadata", StringType()),
            StructField("close_metadata", StringType()),
        ]
    ),
    # models/sfdc/sfdc_load_task_logs.sql:7-17
    SFDC_LOAD_TASK_LOGS: StructType(
        [
            StructField("job_id", StringType()),
            StructField("job_log_entry_id", StringType()),
            StructField("load_task_name", StringType()),
            StructField("object_name", StringType()),
            StructField("operation", StringType()),
            StructField("external_id_field", StringType()),
            StructField("record", StringType()),
            StructField("result", StringType()),
        ]
    ),
    # models/sfmc/sfmc_load_tasks.sql:7-15
    SFMC_LOAD_TASKS: StructType(
        [
            StructField("job_id", StringType()),
            StructField("load_task_name", StringType()),
            StructField("object_name", StringType()),
            StructField("operation", StringType()),
            StructField("creation_time", TimestampType()),
            StructField("creation_metadata", StringType()),
        ]
    ),
    # models/sfmc/sfmc_load_task_logs.sql:7-16
    SFMC_LOAD_TASK_LOGS: StructType(
        [
            StructField("job_id", StringType()),
            StructField("job_log_entry_id", StringType()),
            StructField("load_task_name", StringType()),
            StructField("object_name", StringType()),
            StructField("operation", StringType()),
            StructField("record", StringType()),
            StructField("result", StringType()),
        ]
    ),
}


# Log tables grow by one job's worth of rows per run but are merged every
# run; partitioning by job_id makes that merge rewrite only the new job's
# directory (store._partition_scoped_merge) instead of the whole history.
# Task tables stay unpartitioned: one row per job, trivially small.
PARTITION_BY: dict[str, str] = {
    SFDC_LOAD_TASK_LOGS: "job_id",
    SFMC_LOAD_TASK_LOGS: "job_id",
}


def ensure_tracking_table(engine, name: str) -> None:
    """Create the table from its declared empty schema if missing
    (the reference forces these via '-- depends_on' edges; our push
    materializations ensure them directly)."""
    if not engine.store.exists(name):
        spark: SparkSession = engine.spark
        engine.store.create(
            spark,
            name,
            spark.createDataFrame([], SCHEMAS[name]),
            partition_by=PARTITION_BY.get(name),
        )
