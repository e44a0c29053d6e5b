"""Declared query inventory (the correctness gate).

Every implemented operator from SURVEY.md §2 gets an entry here: a
PySpark implementation ``(spark, sf_dir) -> DataFrame`` plus, when the
semantics are SQL-expressible, an equivalent ANSI-SQL oracle that DuckDB
runs over the same parquet tables. The driver hash-compares both at
sf=0.01.

Determinism discipline (so value-hashes match exactly):
- money columns are exact 2-decimal values -> aggregate as decimal(18,2)
  and cast the final result back to double (identical in both engines);
- continuous doubles are never summed directly (summation order varies);
  use min/max/count or integer-ized sums (floor(x*K) as bigint);
- every ranking/limit carries a unique tiebreak key;
- timestamps are compared at microsecond precision (oracle casts ns->us).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, doc: str = "", tags: tuple = ()):
    """Decorator registering a query implementation (and its oracle)."""

    def deco(fn):
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc or fn.__doc__ or "", tags=tags)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module and return the populated registry."""
    from . import relational  # noqa: F401
    from . import llm  # noqa: F401
    from . import streaming_q  # noqa: F401
    from . import extended  # noqa: F401
    from . import tpch  # noqa: F401
    from . import training  # noqa: F401
    from . import curation  # noqa: F401
    from . import timeseries  # noqa: F401

    return REGISTRY
