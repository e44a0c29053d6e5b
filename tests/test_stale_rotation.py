"""Driver-rotation staleness floor (VERDICT r8 #8).

The driver hash-checks 50 of the registry's queries per round, so with
~220 entries the stalest cohort's latest DRIVER verification can be ~4
rounds old. The full local parity gate (test_oracle_parity.py) runs
every oracle at sf0.001; this test additionally re-verifies the 20
entries whose latest driver check is OLDEST at the driver's own scale
(sf0.01) — exactly the comparison the driver would run, covering what
the rotation can't reach this round. Cadence: every local suite run,
20 entries/round, ordering identical to the driver's own
(`__spark_entry__._latest_driver_round`), so over ~10 rounds the whole
registry re-verifies at driver scale even if the driver never reaches
it.
"""
from __future__ import annotations

import importlib.util
import os

import pytest

from dbt_omnata_push_spark.queries import load_all

from .oracle_utils import compare

SF_DRIVER = "/root/testdata/sf0.01"
COHORT = 20


def _stalest_oracle_entries(n: int = COHORT) -> list[str]:
    entry_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "__spark_entry__.py",
    )
    spec = importlib.util.spec_from_file_location("_entry_stale", entry_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    latest = mod._latest_driver_round()
    registry = load_all()
    names = [name for name, s in registry.items() if s.oracle]
    order = {name: i for i, name in enumerate(registry)}
    # ascending latest-driver-checked round; registry order within a
    # round — the same cohort the driver's 50-query window misses
    names.sort(key=lambda nm: (latest.get(nm, -1), order[nm]))
    return names[:n]


STALEST = _stalest_oracle_entries()


@pytest.mark.parametrize("name", STALEST)
def test_stalest_cohort_matches_oracle_at_driver_scale(spark, name):
    if not os.path.isdir(SF_DRIVER):
        pytest.skip(f"{SF_DRIVER} not present")
    spec = load_all()[name]
    df = spec.fn(spark, SF_DRIVER)
    ok, detail = compare(df, spec.oracle, SF_DRIVER)
    assert ok, f"{name} (stalest-cohort, sf0.01): {detail}"
