"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the declared operator inventory (SURVEY.md §2 +
llmops extensions) for the driver's DuckDB-oracle correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dbt_omnata_push_spark.queries import load_all


def _configure(spark: SparkSession) -> SparkSession:
    # Session-level conf the engine relies on regardless of who built the
    # SparkSession (see dbt_omnata_push_spark.engine.session).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _configure(spark)
    registry = load_all()
    return registry["pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ llmops)."""
    registry = load_all()

    def wrap(name):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _configure(spark)
            return registry[name].fn(spark, sf_dir)

        run.__name__ = f"query_{name}"
        return run

    return {name: wrap(name) for name in registry}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    registry = load_all()
    return {
        name: spec.oracle for name, spec in registry.items() if spec.oracle is not None
    }
