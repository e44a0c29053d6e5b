"""Distributed running (prefix) sums without a single-partition window.

``SUM(x) OVER (ORDER BY k)`` with no PARTITION BY collapses the whole
frame into one partition on Spark — the same scale bug as null-partition
row numbering (ops/rownum.py). The two-pass scheme here keeps the same
semantics distributed:

1. range-partition by the order key and sort within partitions, so
   partition i precedes partition j in key order;
2. aggregate per-partition totals (one tiny row per partition), compute
   exclusive prefix offsets on the driver, broadcast them back as a
   literal map;
3. a WITHIN-partition running sum (window partitioned by the partition
   id — every window group is one bounded partition, never the world)
   plus the partition's offset.

Cost: one extra aggregate pass + one narrow hash exchange on the
partition id. No group ever exceeds a range-partition's size.
"""

from __future__ import annotations

from itertools import accumulate

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_sum",
) -> DataFrame:
    """Add ``out_col`` = sum of ``value_col`` over all rows with order
    key <= this row's (ties share the value, RANGE-frame semantics —
    pass a unique order key for ROWS-like behavior)."""
    ranged = df.repartitionByRange(*order_cols).sortWithinPartitions(*order_cols)
    tagged = ranged.withColumn("_pid", F.spark_partition_id())
    totals = (
        tagged.groupBy("_pid")
        .agg(F.sum(F.col(value_col)).alias("_t"))
        .orderBy("_pid")
        .collect()
    )
    pids = [r["_pid"] for r in totals]
    sums = [r["_t"] or 0 for r in totals]
    offsets = dict(zip(pids, accumulate([0] + sums[:-1])))
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    if offsets:
        mapping = F.create_map(
            *[F.lit(x) for pid, off in offsets.items() for x in (pid, off)]
        )
        out = tagged.withColumn(
            out_col,
            (F.sum(F.col(value_col)).over(w) + mapping[F.col("_pid")]).cast(
                "long"
            ),
        )
    else:
        out = tagged.withColumn(out_col, F.lit(None).cast("long"))
    return out.drop("_pid")
