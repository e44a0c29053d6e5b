"""File sources/sinks: the engine's ingestion surface.

The reference ingests only CSV seeds (dbt seed, integration_tests/
README.md:5) and reads warehouse tables; a lake engine needs the wider
set. All formats go through one entry point so options (schema,
partitioning, compression) are uniform, and every format supports both
batch and streaming reads (file-arrival streaming at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

SUPPORTED_FORMATS = ("parquet", "csv", "json", "orc", "text")

_DEFAULTS: dict[str, dict] = {
    "csv": {"header": "true", "inferSchema": "true"},
    "json": {"multiLine": "false"},
}


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    streaming: bool = False,
    **options,
) -> DataFrame:
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported source format '{fmt}' (got {SUPPORTED_FORMATS})")
    opts = {**_DEFAULTS.get(fmt, {}), **options}
    reader = spark.readStream if streaming else spark.read
    if schema is not None:
        reader = reader.schema(schema)
        opts.pop("inferSchema", None)
    elif streaming:
        raise ValueError("streaming reads require an explicit schema")
    return reader.format(fmt).options(**opts).load(path)


def write_sink(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported sink format '{fmt}'")
    writer = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        # Partition columns become directory keys -> partition pruning on
        # read (the scan skips non-matching directories entirely).
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
