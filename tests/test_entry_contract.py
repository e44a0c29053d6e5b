"""Driver-contract smoke: the exact surface the round driver exercises
(__spark_entry__.entry/queries/oracle_sql), checked here so a
registration typo or contract regression fails fast in pytest rather
than in the driver gate.
"""

from __future__ import annotations

import importlib.util

import duckdb
import pytest


@pytest.fixture(scope="module")
def entry_mod():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_rows(spark, entry_mod):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns  # stable, non-empty schema


def test_contract_shape(entry_mod):
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(osql) <= set(qs)
    assert list(qs)[0] == "pricing_summary"  # flagship leads
    # every callable is actually callable and named
    for name, fn in qs.items():
        assert callable(fn), name
    # rotation is self-derived from CORRECTNESS_r*.json. The RECHECK
    # tier (entries whose oracle/implementation changed this round)
    # sorts right after the flagship, before the staleness cohorts.
    latest = entry_mod._latest_driver_round()
    recheck = set(entry_mod._RECHECK_PRIORITY)
    names = list(qs)
    tail = [n for n in names[1:] if n not in recheck]
    head = [n for n in names[1:] if n in recheck]
    # recheck entries form a contiguous block immediately after flagship
    assert names[1 : 1 + len(head)] == head
    # then: never-checked queries precede every already-checked one
    first_checked = next(
        (i for i, n in enumerate(tail) if n in latest), len(tail)
    )
    assert all(n not in latest for n in tail[:first_checked])
    checked_tail = [latest[n] for n in tail[first_checked:] if n in latest]
    # stalest-first: checked rounds never decrease along the tail
    assert checked_tail == sorted(checked_tail)


def test_every_oracle_parses_in_duckdb(entry_mod):
    """PREPARE-style parse check: catches SQL syntax drift without
    paying full execution for all queries (the parity suite does that)."""
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'"
        )
    for name, sql in entry_mod.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as ex:  # pragma: no cover - assertion formatting
            raise AssertionError(f"oracle for {name} failed to parse: {ex}")
