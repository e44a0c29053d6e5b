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


# ---------------------------------------------------------------------------
# Recall floor for the no-oracle nine (VERDICT r9 #8): the driver
# records these as `no_oracle`, so their quality gate must live in the
# SAME rotation that covers driver correctness. Floors are set at
# driver scale (sf0.01) with margin under the values measured when the
# floor was pinned (r10: ivf* 0.86, lsh 0.90, pq raw-ADC 0.38 —
# documented opt-out — pq_refined 1.00); a regression in banding,
# codebook training, or re-ranking trips here before the bench's
# sf0.1 recall block ever runs.
# ---------------------------------------------------------------------------

ANN_RECALL_FLOORS = {
    "similarity_topk_ivf_trained": 0.78,
    "similarity_topk_ivf_indexed": 0.78,
    "similarity_topk_lsh_ann": 0.80,
    "similarity_topk_pq": 0.25,  # raw 4-bit ADC, documented opt-out
    "similarity_topk_ivfpq": 0.78,
    "similarity_topk_pq_refined": 0.90,
}


@pytest.fixture(scope="module")
def _exact_topk(spark):
    from pyspark.sql import functions as F

    from dbt_omnata_push_spark.llmops import similarity as S

    emb = spark.read.parquet(f"{SF_DRIVER}/embeddings.parquet")
    qvecs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    return {
        (r["q_id"], r["vec_id"])
        for r in S.brute_force_topk(
            emb, qvecs, k=10, allow_full_scan=True
        ).collect()
    }


@pytest.mark.parametrize("name", sorted(ANN_RECALL_FLOORS))
def test_no_oracle_ann_recall_floor(spark, name, _exact_topk):
    if not os.path.isdir(SF_DRIVER):
        pytest.skip(f"{SF_DRIVER} not present")
    got = {
        (r["q_id"], r["vec_id"])
        for r in load_all()[name].fn(spark, SF_DRIVER).collect()
    }
    recall = len(got & _exact_topk) / max(len(_exact_topk), 1)
    assert recall >= ANN_RECALL_FLOORS[name], (
        f"{name}: recall@10 {recall:.3f} fell below its published "
        f"floor {ANN_RECALL_FLOORS[name]}"
    )


def test_no_oracle_approx_distinct_error_bound(spark):
    from pyspark.sql import functions as F

    if not os.path.isdir(SF_DRIVER):
        pytest.skip(f"{SF_DRIVER} not present")
    got = {
        r["event_type"]: r["approx_distinct"]
        for r in load_all()["events_approx_distinct_rollup"]
        .fn(spark, SF_DRIVER)
        .collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(f"{SF_DRIVER}/events.parquet")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, v in got.items():
        rel = abs(v - exact[k]) / max(exact[k], 1)
        assert rel <= 0.15, f"{k}: HLL relative error {rel:.3f} > 0.15"


def test_no_oracle_approx_quantiles_rank_bound(spark):
    from pyspark.sql import functions as F

    if not os.path.isdir(SF_DRIVER):
        pytest.skip(f"{SF_DRIVER} not present")
    rows = load_all()["orders_approx_quantiles"].fn(
        spark, SF_DRIVER
    ).collect()
    orders = spark.read.parquet(f"{SF_DRIVER}/orders.parquet")
    n = orders.count()
    for r in rows:
        rank = (
            orders.filter(F.col("o_totalprice") <= r["value"]).count() / n
        )
        assert abs(rank - r["prob"]) <= 0.1, (
            f"quantile p={r['prob']}: value ranks at {rank:.3f}"
        )


def test_no_oracle_semantic_dedup_recall(spark):
    """SemDeDup keeps one canonical per duplicate group and flags the
    rest; the exact reference is the >=0.98-cosine graph over the same
    planted frame — flagged rows must be true duplicates (precision 1)
    and cover >=80% of the redundant copies (|dup vecs| - #groups)."""
    import numpy as np

    if not os.path.isdir(SF_DRIVER):
        pytest.skip(f"{SF_DRIVER} not present")
    from dbt_omnata_push_spark.queries.curation import _with_planted_dups
    from dbt_omnata_push_spark.queries.relational import load_table

    emb = _with_planted_dups(
        load_table(spark, SF_DRIVER, "embeddings")
    ).drop("label")
    rows = emb.collect()
    ids = [r["vec_id"] for r in rows]
    m = np.array([r["embedding"] for r in rows], dtype=float)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sim = m @ m.T
    np.fill_diagonal(sim, 0.0)
    adj = sim >= 0.98 - 1e-12
    # union-find over the exact near-dup graph
    parent = list(range(len(ids)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in zip(*np.nonzero(adj)):
        if i < j:
            parent[find(int(i))] = find(int(j))
    groups: dict[int, int] = {}
    dup_vecs = set()
    for idx in range(len(ids)):
        if adj[idx].any():
            dup_vecs.add(ids[idx])
            groups[find(idx)] = groups.get(find(idx), 0) + 1
    redundant = sum(c - 1 for c in groups.values())
    flagged = {
        r["vec_id"]
        for r in load_all()["dedup_semantic_ivf"]
        .fn(spark, SF_DRIVER)
        .collect()
        if r["is_dup"]
    }
    assert flagged <= dup_vecs, (
        f"false-positive dup flags: {sorted(flagged - dup_vecs)[:5]}"
    )
    assert len(flagged) >= 0.8 * redundant, (
        f"flagged {len(flagged)} of {redundant} redundant copies"
    )
