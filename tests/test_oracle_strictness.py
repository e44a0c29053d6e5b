"""The local oracle gate must be driver-strict (r12 verdict #2).

Round 12 shipped a red driver row (`events_dialect_scalars`) because the
local comparator's `_norm` strips tzinfo: a DuckDB oracle typed
TIMESTAMPTZ (bare `to_timestamp(...)`) passed locally but failed the
driver's schema check against Spark's naive timestamps. These tests pin
the fix: `compare()` now rejects any tz-aware oracle column up front,
and the whole registry is swept for the failure mode without needing
Spark (the check is oracle-side only).
"""

from __future__ import annotations

import pytest

from dbt_omnata_push_spark.queries import load_all

from .oracle_utils import _tz_aware_oracle_cols, compare, duckdb_con


def test_bare_to_timestamp_oracle_rejected(spark, sf_dir):
    """A bare to_timestamp oracle (TIMESTAMPTZ) must fail locally even
    when wall-clock values match — reproduces the r12 driver failure."""
    df = spark.sql("SELECT timestamp'2024-01-02 03:04:05' AS ts")
    bad_oracle = "SELECT to_timestamp(1704164645) AS ts"
    ok, detail = compare(df, bad_oracle, sf_dir)
    assert not ok
    assert "tz-aware" in detail

    good_oracle = "SELECT CAST(to_timestamp(1704164645) AS TIMESTAMP) AS ts"
    ok, detail = compare(df, good_oracle, sf_dir)
    assert ok, detail


def test_tz_aware_detector():
    con = duckdb_con("/root/testdata/sf0.001")
    odf = con.execute(
        "SELECT to_timestamp(0) AS tz_col, "
        "CAST(to_timestamp(0) AS TIMESTAMP) AS naive_col, 1 AS i"
    ).fetchdf()
    assert _tz_aware_oracle_cols(odf) == ["tz_col"]


def test_registry_oracles_all_tz_naive():
    """No registered oracle may emit a TIMESTAMPTZ column — the driver
    records schema_match=false for it regardless of values. Oracle-side
    only, so the full 236-query sweep runs in seconds."""
    con = duckdb_con("/root/testdata/sf0.001")
    offenders = {}
    for name, spec in sorted(load_all().items()):
        if not spec.oracle:
            continue
        odf = con.execute(spec.oracle).fetchdf()
        tz = _tz_aware_oracle_cols(odf)
        if tz:
            offenders[name] = tz
    assert not offenders, f"tz-aware oracle columns: {offenders}"
