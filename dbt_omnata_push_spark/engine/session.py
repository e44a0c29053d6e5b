"""SparkSession factory with scale-oriented defaults.

The reference (dbt-omnata-push) delegates all execution to Snowflake; our
engine delegates to Spark/Catalyst. Every knob here exists so the same code
runs unchanged from local[32] tests to a 1000-executor cluster:

- AQE on (runtime join re-planning, partition coalescing, skew-join
  handling) so plan shapes survive 100x data-scale changes.
- Arrow on for every pandas-UDF boundary (the connector push path).
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle and are cluster-independent.
- ``spark.sql.legacy.parquet.nanosAsLong`` because the events testdata uses
  nanosecond parquet timestamps, which Spark otherwise refuses to read
  (see catalog.load_table for the ns->us conversion).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Push stages have remote side effects; speculative duplicates of a
    # task would double-call the SaaS API (SURVEY.md §4 item 2).
    "spark.speculation": "false",
    # 128MB parquet split targets keep partition counts sane at 100TB.
    "spark.sql.files.maxPartitionBytes": "134217728",
}


def get_spark(
    app_name: str = "dbt-omnata-push-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Return (or create) a SparkSession with engine defaults applied."""
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    elif not SparkSession.getActiveSession():
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        builder = builder.master(f"local[{cpus}]")
    conf = dict(DEFAULT_CONF)
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # Session-level confs apply even when we join an existing session.
    for k in (
        "spark.sql.session.timeZone",
        "spark.sql.legacy.parquet.nanosAsLong",
        "spark.sql.adaptive.enabled",
    ):
        spark.conf.set(k, conf[k])
    return spark
