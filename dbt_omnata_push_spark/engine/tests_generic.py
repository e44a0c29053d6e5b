"""dbt-style generic tests (D13 depth beyond the reference's two
singular tests): each returns a DataFrame of FAILING rows — empty means
pass, matching dbt's rows-returned => failure convention
(integration_tests/tests/sfdc_load_tasks_after_run.sql:1-5)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def not_null(df: DataFrame, column: str) -> DataFrame:
    return df.filter(F.col(column).isNull())


def unique(df: DataFrame, column: str) -> DataFrame:
    return (
        df.groupBy(column)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def accepted_values(df: DataFrame, column: str, values: list) -> DataFrame:
    return df.filter(~F.col(column).isin(values) | F.col(column).isNull())


def relationships(
    df: DataFrame, column: str, to: DataFrame, to_column: str
) -> DataFrame:
    """Referential integrity: rows whose key is absent from the parent."""
    parent = to.select(F.col(to_column).alias("_parent_key")).distinct()
    return df.filter(F.col(column).isNotNull()).join(
        parent, F.col(column) == F.col("_parent_key"), "left_anti"
    )


def run_generic_tests(engine, table: str, tests: dict) -> dict[str, int]:
    """Run a dbt-schema-yml-style test spec against a store table.

    tests: {column: ["not_null", "unique",
                     {"accepted_values": [...]},
                     {"relationships": ("parent_table", "parent_col")}]}
    Returns {test_name: failing_row_count} — all zeros means green.
    """
    df = engine.store.read(engine.spark, table)
    results: dict[str, int] = {}
    for column, specs in tests.items():
        for spec in specs:
            if spec == "not_null":
                results[f"{table}.{column}.not_null"] = not_null(df, column).count()
            elif spec == "unique":
                results[f"{table}.{column}.unique"] = unique(df, column).count()
            elif isinstance(spec, dict) and "accepted_values" in spec:
                results[f"{table}.{column}.accepted_values"] = accepted_values(
                    df, column, spec["accepted_values"]
                ).count()
            elif isinstance(spec, dict) and "relationships" in spec:
                parent, parent_col = spec["relationships"]
                results[f"{table}.{column}.relationships"] = relationships(
                    df, column, engine.store.read(engine.spark, parent), parent_col
                ).count()
            else:
                raise ValueError(f"unknown generic test spec: {spec}")
    return results
