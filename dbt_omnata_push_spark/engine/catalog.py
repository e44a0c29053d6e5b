"""Table catalog over the data lake (parquet testdata + managed tables).

Maps the reference's Snowflake ``database.schema.table`` namespace
(tracking_table_materialization.sql:17-35 creates/reads qualified
relations) onto Spark: source tables are parquet scans registered as
views; engine-managed tables (tracking tables) live under a warehouse
directory via ``dbt_omnata_push_spark.engine.store``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark reads
    only as long (with spark.sql.legacy.parquet.nanosAsLong=true); convert
    to a microsecond TimestampType to match DuckDB's ``ts::timestamp``.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # Integer division: ns values exceed 2^53, so a double division
        # would lose microseconds.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_testdata(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> None:
    """Register every testdata table as a temp view (idempotent)."""
    for name in names or TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
