"""Prefix-filtered exact set-similarity join (ops/setjoin.py):
losslessness vs brute force, candidate-pruning proof, edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_omnata_push_spark.ops.setjoin import (
    jaccard_join_exact,
    tokenize_sets,
)


def _brute(rows, tau):
    out = set()
    sets = {i: set(t.split(" ")) for i, t in rows}
    ids = sorted(sets)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sets[ids[i]], sets[ids[j]]
            jac = len(a & b) / len(a | b)
            if jac >= tau:
                out.add((ids[i], ids[j]))
    return out


def test_prefix_join_is_lossless_vs_bruteforce(spark):
    rows = [
        (1, "a b c d e"),
        (2, "a b c d f"),        # J=4/6 with 1
        (3, "a b c d e"),        # identical to 1
        (4, "x y z w q"),
        (5, "x y z w e"),        # J=4/6 with 4
        (6, "completely different words here now"),
        (7, "a x c y e"),        # mixed, low overlap
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in jaccard_join_exact(
            tokenize_sets(df, "doc_id", "text"), 0.6
        ).collect()
    }
    assert got == _brute(rows, 0.6)


def test_prefix_join_prunes_candidates(spark):
    # 40 sets sharing ONE ubiquitous token but nothing else: the
    # rarest-first order puts the shared token LAST, so it never lands
    # in a prefix and the candidate set stays tiny.
    rows = [(i, f"shared u{i}a u{i}b u{i}c u{i}d") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sets = tokenize_sets(df, "doc_id", "text")
    out = jaccard_join_exact(sets, 0.6).collect()
    assert out == []  # no pair reaches 0.6 (only 1 of 9 tokens shared)


def test_prefix_join_exact_duplicates_score_one(spark):
    rows = [(1, "p q r s"), (2, "p q r s"), (3, "p q r s")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_join_exact(
            tokenize_sets(df, "doc_id", "text"), 0.9
        ).collect()
    }
    assert set(out) == {(1, 2), (1, 3), (2, 3)}
    assert all(v == 1.0 for v in out.values())


def test_prefix_join_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    assert jaccard_join_exact(
        tokenize_sets(df, "doc_id", "text"), 0.5
    ).count() == 0
