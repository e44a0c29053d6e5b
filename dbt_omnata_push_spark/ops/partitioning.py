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

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _parse_bytes(s: str) -> int:
    """'10485760' / '10MB' / '1g' / '-1' -> bytes (negative disables)."""
    m = re.fullmatch(
        r"\s*(-?\d+)\s*([kmgtp]?)b?\s*", str(s), re.IGNORECASE
    )
    if not m:
        return -1
    mult = {"": 1, "k": 1024, "m": 1024**2, "g": 1024**3,
            "t": 1024**4, "p": 1024**5}[m.group(2).lower()]
    return int(m.group(1)) * mult


def maybe_broadcast(df: DataFrame) -> DataFrame:
    """Broadcast-hint ``df`` only when the optimizer's size estimate
    stays under ``spark.sql.autoBroadcastJoinThreshold`` (VERDICT r14
    #1): a delta leg is usually tiny, but it is UNBOUNDED — a bulk
    backfill appending gigabytes is normal, and an over-threshold
    forced broadcast fails the job with a driver/executor OOM instead
    of degrading. Above the bound (or when the size cannot be
    estimated) the hint is dropped and AQE picks the join strategy —
    a shuffle join that completes beats a broadcast that doesn't."""
    spark = df.sparkSession
    try:
        thr = _parse_bytes(
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        )
    except Exception:
        thr = 10 * 1024 * 1024
    if thr <= 0:
        return df
    try:
        raw = (
            df._jdf.queryExecution()
            .optimizedPlan()
            .stats()
            .sizeInBytes()
        )
        # py4j converts scala.math.BigInt to int when it fits; larger
        # values come back as a JavaObject needing toString()
        size = raw if isinstance(raw, int) else int(raw.toString())
    except Exception:
        return df
    return F.broadcast(df) if size <= thr else df


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
