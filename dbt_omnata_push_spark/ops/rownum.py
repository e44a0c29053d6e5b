"""Global sequential row numbering WITHOUT a single-partition window.

The reference numbers rows with ``row_number() over (partition by null
order by null)`` (marketing_cloud_data_extension_upload.sql:56,91) — on
Snowflake that's fine; on Spark a null-partition window collapses the whole
dataset into ONE partition, which is fatal at 100TB (SURVEY.md §4.1).

Semantics required: unique, dense, 0/1-based indices; ordering explicitly
arbitrary (``order by null``). We deliver that with a two-pass
DataFrame-native scheme that never leaves the JVM and never concentrates
data:

1. tag rows with ``spark_partition_id`` and a within-partition sequence
   derived from ``monotonically_increasing_id`` (low 33 bits = row number
   within the partition, by construction of MID);
2. count rows per partition (tiny aggregate, #partitions rows), compute
   cumulative offsets on the driver, broadcast-map them back.

Cost: one extra pass over the data for the per-partition counts — the same
cost profile as ``rdd.zipWithIndex`` but staying in Tungsten row format
(no Python/ser-de round trip) and AQE-compatible.
"""

from __future__ import annotations

from itertools import accumulate

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MID_ROW_MASK = (1 << 33) - 1


def with_ordered_global_index(
    df: DataFrame, order_cols: list[str], col_name: str = "row_idx"
) -> DataFrame:
    """Total-order global row number WITHOUT a single-partition window.

    ``row_number() over (order by cols)`` semantics at scale:
    repartitionByRange places partition i strictly before partition j in
    key order, sortWithinPartitions orders inside, and the same
    count-offset pass as with_global_index turns per-partition positions
    into a global 1..N ranking. Ties broken by partition placement
    (include a unique column in order_cols for full determinism).
    """
    ranged = df.repartitionByRange(*order_cols).sortWithinPartitions(*order_cols)
    return with_global_index(ranged, col_name, one_based=True)


def with_global_index(
    df: DataFrame, col_name: str = "row_idx", one_based: bool = True
) -> DataFrame:
    """Add a unique, dense global row index (arbitrary but stable order).

    The input DataFrame's partitioning is preserved; no shuffle, no
    single-partition window. Two Spark jobs total (count + main).
    """
    tagged = df.withColumn("_mid", F.monotonically_increasing_id()).withColumn(
        "_pid", F.spark_partition_id()
    )
    # MID is (partition_id << 33) + row_in_partition, so the low bits give a
    # dense 0-based sequence within each partition.
    tagged = tagged.withColumn("_local", F.col("_mid").bitwiseAND(F.lit(_MID_ROW_MASK)))
    counts = (
        tagged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n")).orderBy("_pid").collect()
    )
    pids = [r["_pid"] for r in counts]
    sizes = [r["_n"] for r in counts]
    offsets = dict(zip(pids, accumulate([0] + sizes[:-1])))
    base = 1 if one_based else 0
    # Broadcast the (tiny) offset table as a literal map expression.
    if offsets:
        mapping = F.create_map(
            *[F.lit(x) for pid, off in offsets.items() for x in (pid, off)]
        )
        out = tagged.withColumn(
            col_name, (mapping[F.col("_pid")] + F.col("_local") + F.lit(base)).cast("long")
        )
    else:
        out = tagged.withColumn(col_name, F.lit(base).cast("long"))
    return out.drop("_mid", "_pid", "_local")
