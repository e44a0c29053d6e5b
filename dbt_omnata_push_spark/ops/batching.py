"""Row batching for remote calls.

The reference batches rows into groups of 100 before each staging call via
``(row_number/100)::int`` + ``array_agg(array_construct(row_number, record))
group by batch_number`` (marketing_cloud_data_extension_upload.sql:57-63).
Spark equivalent: derive the batch key from a global index, then
``groupBy(batch).agg(collect_list(struct(idx, record)))`` — a single shuffle
keyed on batch_number whose fan-in is bounded by batch_size, so partitions
stay small no matter the total row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BATCH_SIZE = 100  # reference parity: fixed divisor 100


def with_batch_number(
    df: DataFrame,
    idx_col: str = "row_idx",
    batch_col: str = "batch_number",
    batch_size: int = DEFAULT_BATCH_SIZE,
) -> DataFrame:
    """batch_number = (row_idx / batch_size)::int, as in the reference."""
    return df.withColumn(
        batch_col, F.floor(F.col(idx_col) / F.lit(batch_size)).cast("int")
    )


def collect_batches(
    df: DataFrame,
    record_col: str = "record",
    idx_col: str = "row_idx",
    batch_col: str = "batch_number",
) -> DataFrame:
    """One row per batch: (batch_number, rows=[struct(idx, record), ...])."""
    return df.groupBy(batch_col).agg(
        F.collect_list(F.struct(F.col(idx_col), F.col(record_col))).alias("rows")
    )
