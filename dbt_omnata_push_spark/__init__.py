"""dbt-omnata-push-spark: a PySpark-native analytics/push engine.

Re-implements the query and data-processing capabilities of the
``omnata-labs/dbt-omnata-push`` dbt package (reference at /root/reference)
as an idiomatic PySpark engine:

- ``engine``: SparkSession factory, table catalog, model registry + DAG,
  minimal Snowflake-dialect SQL front-end.
- ``materializations``: view / table / incremental / tracking_table /
  omnata_push (the reference's custom materializations, Spark-first).
- ``connectors``: the external-function surface (Salesforce Bulk API,
  Marketing Cloud data extensions) as Python connector classes; mocks
  mirror the reference's JS mock UDFs.
- ``ops``: scale-safe building blocks (global row index without a
  single-partition window, batching, record construction, incremental
  anti-join).
- ``llmops``: large-scale training-data pipeline operators (dedup,
  similarity search, text analysis, multimodal plumbing) beyond the
  reference surface.
- ``queries``: the declared query inventory wired to ``__spark_entry__``.
"""

__version__ = "0.1.0"
