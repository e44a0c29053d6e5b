"""Every oracle-declared query must match DuckDB exactly (the driver's
correctness gate, replicated locally and stricter)."""

from __future__ import annotations

import pytest

from dbt_omnata_push_spark.queries import load_all

from .oracle_utils import compare

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    ok, detail = compare(df, spec.oracle, sf_dir)
    assert ok, f"{name}: {detail}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
