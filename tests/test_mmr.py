"""MMR diversified selection (llmops/mmr.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def _pool(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, rel double, embedding array<double>"
    )


def test_mmr_matches_python_replay(spark):
    """Spark cogrouped greedy == a pure-Python replay of the same
    rounded-cosine greedy on a hand-built pool."""
    import itertools
    import math

    from dbt_omnata_push_spark.llmops.mmr import mmr_select

    # two tight clusters + one outlier: pure top-k would take the
    # whole first cluster; MMR must interleave.
    vecs = {
        1: [1.0, 0.0, 0.0],
        2: [0.999, 0.01, 0.0],
        3: [0.998, 0.02, 0.0],
        4: [0.0, 1.0, 0.0],
        5: [0.01, 0.999, 0.0],
        6: [0.0, 0.0, 1.0],
    }
    rels = {1: 0.95, 2: 0.94, 3: 0.93, 4: 0.5, 5: 0.49, 6: 0.2}
    rows = [(7, d, rels[d], vecs[d]) for d in vecs]
    got = sorted(
        (r["doc_id"], r["mmr_rank"])
        for r in mmr_select(_pool(spark, rows), k=4, lam=0.5).collect()
    )

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 6)

    sim = {
        (a, b): cos(vecs[a], vecs[b])
        for a, b in itertools.permutations(vecs, 2)
    }
    selected: list[int] = []
    remaining = set(vecs)
    while len(selected) < 4:
        if not selected:
            best = max(remaining, key=lambda c: (rels[c], -c))
        else:
            best = max(
                remaining,
                key=lambda c: (
                    0.5 * rels[c]
                    - 0.5 * max(sim[(c, s)] for s in selected),
                    -c,
                ),
            )
        selected.append(best)
        remaining.discard(best)
    want = sorted((d, i + 1) for i, d in enumerate(selected))
    assert got == want
    # and the diversity property actually bit: rank 2 is NOT doc 2
    # (the near-clone of doc 1) but the second cluster's head.
    assert dict((rk, d) for d, rk in got)[2] == 4


def test_mmr_lambda_one_is_pure_topk(spark):
    from dbt_omnata_push_spark.llmops.mmr import mmr_select

    rows = [
        (1, d, 1.0 - d / 10.0, [float(d), 1.0, 0.5]) for d in range(1, 7)
    ]
    out = mmr_select(_pool(spark, rows), k=3, lam=1.0).collect()
    assert [(r["doc_id"], r["mmr_rank"]) for r in sorted(out, key=lambda r: r["mmr_rank"])] == [
        (1, 1),
        (2, 2),
        (3, 3),
    ]


def test_mmr_pool_smaller_than_k(spark):
    from dbt_omnata_push_spark.llmops.mmr import mmr_select

    rows = [(1, 1, 0.9, [1.0, 0.0]), (1, 2, 0.8, [0.0, 1.0])]
    out = mmr_select(_pool(spark, rows), k=10).collect()
    assert sorted(r["mmr_rank"] for r in out) == [1, 2]


def test_mmr_empty_pool(spark):
    from dbt_omnata_push_spark.llmops.mmr import mmr_select

    out = mmr_select(_pool(spark, []), k=5)
    assert out.count() == 0
    assert out.columns == ["query_id", "doc_id", "mmr_rank", "rel"]
