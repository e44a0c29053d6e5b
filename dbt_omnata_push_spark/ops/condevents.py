"""Snowflake conditional window events as DataFrame ops.

Snowflake ships two window functions OSS Spark lacks
(reference dialect surface; functions documented in Snowflake's window
function family alongside the RATIO_TO_REPORT the transpiler rewrites
inline):

- ``CONDITIONAL_TRUE_EVENT(pred) OVER (PARTITION BY p ORDER BY o)`` —
  running count of rows (up to and including the current one) where the
  predicate held. Expressible as a single running SUM, so
  ``engine/sqlfront.py`` rewrites it inline in SQL text.
- ``CONDITIONAL_CHANGE_EVENT(expr) OVER (PARTITION BY p ORDER BY o)`` —
  running count of rows where ``expr`` differs from its value on the
  previous row. The change flag needs LAG *inside* a running SUM —
  nested window functions, illegal in Spark SQL (and ANSI) — so it
  cannot be rewritten inline; this module provides the two-pass
  DataFrame form (flag window, then sum window — both over the SAME
  (partition, order) key, so Catalyst plans ONE shuffle and two Window
  operators back to back, no extra exchange).

NULL semantics (documented, mirrored exactly in the oracle): the first
row of each partition is event 0, and a change is ``IS DISTINCT FROM``
— a transition to or from NULL counts as a change.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _win(partition_by: Sequence[str], order_by: Sequence[str]):
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def conditional_true_event(
    df: DataFrame,
    pred: Column,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    out: str = "event",
) -> DataFrame:
    """Running count of rows where ``pred`` held (incl. current row)."""
    w = (
        _win(partition_by, order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        out, F.sum(F.when(pred, F.lit(1)).otherwise(F.lit(0))).over(w)
    )


def conditional_change_event(
    df: DataFrame,
    expr: Column,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    out: str = "event",
) -> DataFrame:
    """Running count of changes of ``expr`` along the partition's order.

    First row = 0; a change is IS DISTINCT FROM (NULL transitions
    count). Two Window operators over one shuffle: the flag column
    (lag + comparison) and its running sum share the (partition, order)
    key, so the plan is scan -> exchange -> sort -> Window -> Window.
    """
    w = _win(partition_by, order_by)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(expr).over(w)
    first = F.row_number().over(w) == 1
    flag = (
        F.when(first, F.lit(0))
        .when(~expr.eqNullSafe(prev), F.lit(1))
        .otherwise(F.lit(0))
    )
    return df.withColumn("__cce_flag", flag).withColumn(
        out, F.sum("__cce_flag").over(wsum)
    ).drop("__cce_flag")
