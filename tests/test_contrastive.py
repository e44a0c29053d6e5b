"""Contrastive pair mining: role/count invariants, label constraints,
determinism, and the broadcast-pool plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dbt_omnata_push_spark.llmops.contrastive import contrastive_pairs


@pytest.fixture(scope="module")
def emb(spark):
    rows = [
        (i, [float((i * 7 + d * 3) % 11) - 5.0 for d in range(8)], f"l{i % 4}")
        for i in range(40)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )


def test_counts_and_label_constraints(spark, emb):
    out = contrastive_pairs(emb, k_pos=2, k_neg=3, pool_size=16).persist()
    lab = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault((r["anchor"], r["role"]), []).append(r)
        if r["role"] == "pos":
            assert lab[r["anchor"]] == lab[r["cand"]]
        else:
            assert lab[r["anchor"]] != lab[r["cand"]]
        assert r["anchor"] != r["cand"]
    for (_, role), grp in per.items():
        assert len(grp) == (2 if role == "pos" else 3)
        assert sorted(r["rank"] for r in grp) == list(range(1, len(grp) + 1))
    # every anchor got both roles (4 labels x 10 members each)
    anchors = {r["anchor"] for r in rows}
    assert anchors == set(range(40))
    out.unpersist()


def test_positives_are_hardest_same_label(spark, emb):
    out = contrastive_pairs(emb, k_pos=1, k_neg=1, pool_size=16)
    top = {r["anchor"]: (r["cand"], r["sim"]) for r in out.collect() if r["role"] == "pos"}
    from dbt_omnata_push_spark.llmops.similarity import cosine

    a = emb.select(F.col("vec_id").alias("anchor"), F.col("label").alias("la"),
                   F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("cand"), F.col("label").alias("lb"),
                   F.col("embedding").alias("vb"))
    allp = (a.join(b, (F.col("la") == F.col("lb")) & (F.col("anchor") != F.col("cand")))
            .select("anchor", "cand", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("sim"))
            .collect())
    best = {}
    for r in allp:
        cur = best.get(r["anchor"])
        key = (-r["sim"], r["cand"])
        if cur is None or key < cur[0]:
            best[r["anchor"]] = (key, r["cand"], r["sim"])
    for anchor, (_, cand, sim) in best.items():
        assert top[anchor] == (cand, sim)


def test_deterministic_and_pool_bounded(spark, emb):
    one = sorted(map(tuple, contrastive_pairs(emb, pool_size=8).collect()))
    two = sorted(map(tuple, contrastive_pairs(emb, pool_size=8).collect()))
    assert one == two
    # negatives only ever come from the seeded 8-vector pool
    negs = {t[1] for t in one if t[2] == "neg"}
    assert len(negs) <= 8


def test_negative_pool_is_broadcast(spark, emb):
    plan = contrastive_pairs(emb)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
