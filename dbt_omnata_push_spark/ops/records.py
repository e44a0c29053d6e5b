"""Record construction helpers.

The reference's push models emit exactly one column ``RECORD`` built with
``OBJECT_CONSTRUCT(k1, v1, ...)`` (accounts_load.sql:14-15, README.md:73),
possibly nested (transactions_daily_load.sql:12-17). In Spark we construct
a typed struct in-flight and serialize to a JSON string only at the
tracking-table boundary (SURVEY.md §1.2 type decision).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def record_struct(df: DataFrame, mapping: dict[str, Column | str]) -> DataFrame:
    """Project df to a single ``record`` struct column.

    mapping: output field name -> source Column (or column name). Values may
    themselves be struct columns for nesting (OBJECT_CONSTRUCT-in-
    OBJECT_CONSTRUCT parity).
    """
    fields = [
        (F.col(v) if isinstance(v, str) else v).alias(k) for k, v in mapping.items()
    ]
    return df.select(F.struct(*fields).alias("record"))


def record_json(col: Column | str = "record") -> Column:
    """Serialize a record struct to its JSON-string boundary form."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_json(c)
