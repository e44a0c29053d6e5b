"""Incremental-load building blocks.

Three patterns from the reference:

- NOT-IN anti-join against already-pushed keys, injected at compile time on
  incremental runs (accounts_load.sql:19-30). SQL ``NOT IN (subquery)`` is
  null-sensitive; the reference's keys are non-null external ids, so a
  Spark ``left_anti`` join matches the intent (SURVEY.md §2.2 joins).
- High-watermark scalar-subquery filter
  (transactions_daily.sql:19): compute max(watermark) then filter above it.
- Empty-load probe: the reference runs ``select count(*)`` before any
  remote work (macros/apps/salesforce.sql:5-18); ``isEmpty`` (a limit-1
  scan) is the cheaper Spark equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def anti_join_incremental(
    df: DataFrame, loaded: DataFrame, key: Column, loaded_key: Column
) -> DataFrame:
    """Keep rows of df whose key does not appear in ``loaded``.

    At scale: Catalyst/AQE picks broadcast vs shuffle for the anti join;
    the loaded-keys side is pre-projected to the single key column so a
    broadcast is possible whenever the pushed-history slice is small.
    """
    right = loaded.select(loaded_key.alias("_loaded_key")).distinct()
    return df.join(right, on=key == F.col("_loaded_key"), how="left_anti")


def high_watermark_filter(
    df: DataFrame, existing: DataFrame | None, watermark_col: str
) -> DataFrame:
    """Rows of df strictly above max(existing.watermark_col)."""
    if existing is None:
        return df
    row = existing.agg(F.max(watermark_col).alias("wm")).collect()[0]
    if row["wm"] is None:
        return df
    return df.filter(F.col(watermark_col) > F.lit(row["wm"]))


def is_empty(df: DataFrame) -> bool:
    """Empty-load probe (limit-1 scan, not a full count)."""
    return df.isEmpty()
