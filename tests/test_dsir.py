"""DSIR importance weighting (llmops/dsir.py): planted-domain ranking,
log-weight sanity, and edge cases."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbt_omnata_push_spark.llmops.dsir import (
    dsir_scores,
    dsir_select_topk,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")


def test_target_like_doc_outranks_generic(spark):
    # Target domain speaks "quantum photon flux"; the pool has one doc
    # in-domain and two off-domain. The in-domain doc must rank first.
    rows = [
        (100, "quantum photon flux quantum photon", True),
        (101, "quantum flux photon photon quantum", True),
        (1, "quantum photon flux", False),
        (2, "market stock price trade", False),
        (3, "weather rain cloud wind", False),
    ]
    df = _docs(spark, rows)
    scores = dsir_scores(df, F.col("tgt"), text_col="text")
    out = {r["doc_id"]: r for r in scores.collect()}
    assert set(out) == {1, 2, 3}  # target rows held out
    assert out[1]["mean_ratio_ppm"] > out[2]["mean_ratio_ppm"]
    assert out[1]["mean_ratio_ppm"] > out[3]["mean_ratio_ppm"]
    # the true log weight agrees on the planted separation
    assert out[1]["log_weight"] > out[2]["log_weight"]
    top = dsir_select_topk(scores, 1).collect()
    assert [r["doc_id"] for r in top] == [1]


def test_log_weight_matches_hand_computation(spark):
    # One-token docs make the estimator hand-checkable: weight =
    # cnt*(ln(ct+1)-ln(cs+1)) + n*(ln(ns+B)-ln(nt+B)).
    rows = [
        (10, "alpha", True),
        (1, "alpha", False),
        (2, "beta", False),
    ]
    df = _docs(spark, rows)
    out = {
        r["doc_id"]: r
        for r in dsir_scores(df, F.col("tgt"), text_col="text").collect()
    }
    B = 4096
    norm = math.log(2 + B) - math.log(1 + B)  # ns=2, nt=1
    # doc 1: bucket(alpha) has ct=1, cs=1 -> ln(2)-ln(2)=0
    assert abs(out[1]["log_weight"] - (0.0 + 1 * norm)) < 1e-12
    # doc 2: bucket(beta) has ct=0, cs=1 -> ln(1)-ln(2)
    assert abs(out[2]["log_weight"] - (math.log(1) - math.log(2) + norm)) < 1e-12
    # exact integer ratio scores: doc1 (1+1)*1e6 div (1+1) = 1_000_000
    assert out[1]["score_ppm"] == 1_000_000
    assert out[2]["score_ppm"] == (0 + 1) * 1_000_000 // (1 + 1)


def test_empty_target_degrades_gracefully(spark):
    # No target rows: every ratio is (0+1)*1e6 div (cs+1) — uniform
    # down-weighting, no crash, every pool doc still scored.
    rows = [(1, "a b", False), (2, "c d", False)]
    df = _docs(spark, rows)
    out = dsir_scores(df, F.col("tgt"), text_col="text").collect()
    assert len(out) == 2
    assert all(r["score_ppm"] > 0 for r in out)


def test_empty_pool_yields_empty_scores(spark):
    rows = [(1, "a b", True)]
    df = _docs(spark, rows)
    assert dsir_scores(df, F.col("tgt"), text_col="text").count() == 0


# ------------------------------------------------- systematic resampling


def test_systematic_resample_exact_k_and_proportionality(spark):
    from dbt_omnata_push_spark.ops.sampling import systematic_weighted_resample

    df = spark.createDataFrame(
        [(i, 10 if i % 10 else 1000) for i in range(100)],
        "doc_id long, w long",
    )
    out = systematic_weighted_resample(df, 37, "w", "doc_id").collect()
    assert sum(r["n_copies"] for r in out) == 37  # exactly k, always
    # heavy rows (w=1000) hold ~53% of total mass (10*1000 / 18900);
    # systematic sampling puts within-1 of the proportional share there
    heavy = sum(r["n_copies"] for r in out if r["weight"] == 1000)
    exp = 37 * (10 * 1000) / (10 * 1000 + 90 * 10)
    assert abs(heavy - exp) <= 1.0


def test_systematic_resample_zero_weights_never_selected(spark):
    from dbt_omnata_push_spark.ops.sampling import systematic_weighted_resample

    df = spark.createDataFrame(
        [(1, 0), (2, 5), (3, 0), (4, 5)], "doc_id long, w long"
    )
    out = systematic_weighted_resample(df, 8, "w", "doc_id").collect()
    assert all(r["weight"] > 0 for r in out)
    assert sum(r["n_copies"] for r in out) == 8


def test_systematic_resample_all_zero_weight_empty(spark):
    from dbt_omnata_push_spark.ops.sampling import systematic_weighted_resample

    df = spark.createDataFrame([(1, 0), (2, 0)], "doc_id long, w long")
    assert systematic_weighted_resample(df, 5, "w", "doc_id").count() == 0


def test_resample_rejects_negative_and_fractional_weights(spark):
    """ADVICE r6: a negative (or silently-floored fractional) weight
    corrupts the tick arithmetic so sum(n_copies) != k with no error.
    The guard raises at execution instead."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from dbt_omnata_push_spark.ops.sampling import systematic_weighted_resample

    neg = spark.createDataFrame(
        [("a", 5), ("b", -3), ("c", 2)], "doc_id string, w long"
    )
    with pytest.raises(Exception) as ei:
        systematic_weighted_resample(neg, 4, "w", "doc_id").collect()
    assert "non-negative" in str(ei.value)

    frac = spark.createDataFrame(
        [("a", 5.0), ("b", 2.5)], "doc_id string, w double"
    )
    with pytest.raises(Exception) as ei2:
        systematic_weighted_resample(frac, 4, "w", "doc_id").collect()
    assert "non-negative" in str(ei2.value)

    # integral doubles are fine (exactness preserved by the cast)
    ok = spark.createDataFrame(
        [("a", 5.0), ("b", 3.0)], "doc_id string, w double"
    )
    out = systematic_weighted_resample(ok, 4, "w", "doc_id").collect()
    assert sum(r["n_copies"] for r in out) == 4


# ------------------------------------------------- A-ES weighted reservoir


def test_weighted_reservoir_matches_python_replay(spark):
    """The Spark top-k by ln(u)/w must equal a pure-Python replay of
    the same seeded-md5 A-ES keys (selection AND rank order)."""
    import hashlib
    import math

    from dbt_omnata_push_spark.ops.sampling import weighted_reservoir_topk

    rows = [(i, (i * 37) % 100 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = [
        (r["doc_id"], r["weight"], r["sel_rank"])
        for r in weighted_reservoir_topk(df, 25, "w", "doc_id").collect()
    ]

    def key(i, w):
        h = int(hashlib.md5(f"res:{i}".encode()).hexdigest()[:15], 16)
        return math.log((h + 1) / float(1 << 60)) / w

    ranked = sorted(rows, key=lambda t: (-key(*t), t[0]))[:25]
    want = [(i, w, rk + 1) for rk, (i, w) in enumerate(ranked)]
    assert sorted(got, key=lambda t: t[2]) == want


def test_weighted_reservoir_heavy_rows_overrepresented(spark):
    from dbt_omnata_push_spark.ops.sampling import weighted_reservoir_topk

    # 50 heavy rows (w=500) vs 450 light (w=1): heavies carry ~98% of
    # the mass, so a 40-draw A-ES sample is dominated by them.
    df = spark.createDataFrame(
        [(i, 500 if i < 50 else 1) for i in range(500)], "doc_id long, w long"
    )
    out = weighted_reservoir_topk(df, 40, "w", "doc_id").collect()
    assert len(out) == 40
    assert len({r["doc_id"] for r in out}) == 40  # without replacement
    assert sum(1 for r in out if r["weight"] == 500) >= 30


def test_weighted_reservoir_nonpositive_never_selected(spark):
    from dbt_omnata_push_spark.ops.sampling import weighted_reservoir_topk

    df = spark.createDataFrame(
        [(1, 0), (2, 7), (3, -4), (4, 7)], "doc_id long, w long"
    )
    out = weighted_reservoir_topk(df, 10, "w", "doc_id").collect()
    assert {r["doc_id"] for r in out} == {2, 4}


def test_grouped_reservoir_k_per_group_and_replay(spark):
    """Per-group A-ES: k rows per group, ranks match a pure-Python
    replay of the same seeded keys within each group."""
    import hashlib
    import math

    from dbt_omnata_push_spark.ops.sampling import weighted_reservoir_per_group

    rows = [(f"s{i % 3}", i, (i * 13) % 50 + 1) for i in range(90)]
    df = spark.createDataFrame(rows, "src string, doc_id long, w long")
    got = sorted(
        (r["src"], r["doc_id"], r["sel_rank"])
        for r in weighted_reservoir_per_group(
            df, ["src"], 7, "w", "doc_id", seed="gres"
        ).collect()
    )

    def key(i, w):
        h = int(hashlib.md5(f"gres:{i}".encode()).hexdigest()[:15], 16)
        return math.log((h + 1) / float(1 << 60)) / w

    want = []
    for g in ("s0", "s1", "s2"):
        members = [(i, w) for s, i, w in rows if s == g]
        ranked = sorted(members, key=lambda t: (-key(*t), t[0]))[:7]
        want += [(g, i, rk + 1) for rk, (i, _) in enumerate(ranked)]
    assert got == sorted(want)
