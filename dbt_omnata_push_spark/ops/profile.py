"""Table profiling: per-column stats in ONE scan (the ANALYZE TABLE /
dbt-docs surface).

For each requested column: row count, null count, exact distinct
count, and min/max rendered as strings (bigint/string columns only in
the exact-oracle path — float rendering differs across engines; route
continuous columns through the HLL/GK sketches in ops/sketches.py at
scale, where exact ndv is the wrong tool anyway).

Plan shape: one aggregation computes every column's stats as struct
expressions (single scan, map-side partial for all but the exact
distincts), then the struct array explodes into one row per column.
Exact COUNT(DISTINCT) over k columns expands to k shuffles in Spark's
expand-based plan — the documented trade for exact numbers; the
sketch path keeps it one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)
    for each of ``cols``, exact, in one logical pass."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("_n").cast("long").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{c}")).cast("long").alias("n_nulls"),
                F.col(f"_nd_{c}").cast("long").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


def profile_oracle_sql(table: str, cols: list[str]) -> str:
    """The exact DuckDB equivalent, generated per column list."""
    selects = [
        f"""SELECT '{c}' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_value,
       CAST(MAX({c}) AS VARCHAR) AS max_value
FROM {table}"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(selects)
