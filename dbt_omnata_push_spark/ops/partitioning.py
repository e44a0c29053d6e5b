"""Table layout for scale: partitioned writes and pruned reads.

At 100 TB the single biggest lever is never reading the data at all:
writing fact tables hive-partitioned by a low-cardinality time/tenant
key means a filter on that key prunes entire directories at planning
time (PartitionFilters in the scan node), independent of file count.
This module is the write-side discipline the engine's sources assume.

Partition-count hygiene: repartition by the partition columns before
the write so each hive partition is produced by as few tasks as
possible — otherwise every task writes a sliver into every partition
(the classic small-files explosion that ops/compact.py then has to
clean up).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    coalesce_per_partition: bool = True,
) -> None:
    """Write hive-partitioned parquet with small-file hygiene."""
    out = df.repartition(*partition_cols) if coalesce_per_partition else df
    out.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_pruned(
    spark: SparkSession, path: str, **partition_filters
) -> DataFrame:
    """Read with equality partition filters (pruned at planning time)."""
    df = spark.read.parquet(path)
    for col, val in partition_filters.items():
        df = df.filter(df[col] == val)
    return df
