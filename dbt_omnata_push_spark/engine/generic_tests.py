"""dbt's four generic (schema) tests as DataFrame builders.

The reference is a dbt package, so its users get dbt's built-in schema
tests for free on every model (`unique`, `not_null`, `accepted_values`,
`relationships` — dbt-core's canonical four); the engine supplies the
same semantics natively. Each builder returns the FAILURE rows (dbt's
contract: a test query's rows are the violations; empty result = pass),
so they compose as queries, and ``Engine.generic_test`` raises on any
row like the singular-test path (engine/dag.py:129).

dbt NULL semantics (worth pinning, they're subtle):
- `unique` ignores NULLs (two NULL keys are not duplicates);
- `not_null` is exactly the NULL rows;
- `accepted_values` ignores NULLs (pair with not_null to forbid them);
- `relationships` ignores NULL child keys (an orphan is a non-null
  child value with no parent).

Scale shapes: unique is one hash aggregation on the column;
relationships is a LEFT ANTI join (broadcast when the parent key set
is dim-sized); not_null/accepted_values are map-side filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unique_failures(df: DataFrame, column: str) -> DataFrame:
    """Non-null values of ``column`` appearing more than once:
    (value, n_rows)."""
    return (
        df.filter(F.col(column).isNotNull())
        .groupBy(F.col(column).alias("value"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def not_null_failures(df: DataFrame, column: str) -> DataFrame:
    """Rows where ``column`` IS NULL."""
    return df.filter(F.col(column).isNull())


def accepted_values_failures(
    df: DataFrame, column: str, values: list
) -> DataFrame:
    """Non-null values of ``column`` outside ``values``: (value, n_rows)."""
    return (
        df.filter(
            F.col(column).isNotNull() & ~F.col(column).isin(values)
        )
        .groupBy(F.col(column).alias("value"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def relationships_failures(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    broadcast_parent: bool = True,
) -> DataFrame:
    """Orphaned child rows: non-null ``child_col`` values with no match
    in ``parent.parent_col`` (referential integrity). LEFT ANTI join;
    the parent side projects its key only and broadcasts when
    dim-sized."""
    keys = parent.select(F.col(parent_col).alias("__pk")).distinct()
    if broadcast_parent:
        keys = F.broadcast(keys)
    return child.filter(F.col(child_col).isNotNull()).join(
        keys, F.col(child_col) == F.col("__pk"), "left_anti"
    )


GENERIC_TESTS = {
    "unique": unique_failures,
    "not_null": not_null_failures,
    "accepted_values": accepted_values_failures,
    "relationships": relationships_failures,
}
