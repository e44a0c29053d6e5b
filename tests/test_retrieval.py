"""BM25 + RRF retrieval operators (r7, llmops/retrieval.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_omnata_push_spark.engine.catalog import load_table
from dbt_omnata_push_spark.llmops.retrieval import bm25_topk, rrf_fuse


def test_bm25_rejects_bad_terms(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(docs, [])
    with pytest.raises(ValueError):
        bm25_topk(docs, ["a", "a"])


def test_bm25_ranks_term_rich_docs_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "x x x x x x x x"),           # no query terms
            (2, "vector x x x x x x x"),      # 1 hit, long
            (3, "vector vector x x"),         # 2 hits, short
            (4, "vector x"),                  # 1 hit, very short
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, ["vector"], k=10).collect()
    ids = [r["doc_id"] for r in out]
    assert 1 not in ids  # zero-score docs are not ranked
    assert ids[0] == 3  # highest tf, shortest length wins
    ranks = [r["rank"] for r in out]
    assert ranks == list(range(1, len(out) + 1))
    # scores strictly ordered with the doc_id tiebreak
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_bm25_registry_shape(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = bm25_topk(docs, ["vector", "window", "merge"], k=20)
    rows = out.collect()
    assert len(rows) == 20
    assert out.columns == ["doc_id", "score", "rank"]


def test_rrf_fuses_both_lists(spark):
    a = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(20, 1), (40, 2)], "doc_id long, rank int"
    )
    out = {r["doc_id"]: (r["rrf_score"], r["rank"]) for r in rrf_fuse(a, b, k=10).collect()}
    # doc 20 appears in both lists -> highest fused score
    assert min(out, key=lambda d: out[d][1]) == 20
    assert out[20][0] == pytest.approx(1 / 61 + 1 / 62)
    # one-list docs still present with single-contribution scores
    assert out[10][0] == pytest.approx(1 / 61)
    assert out[40][0] == pytest.approx(1 / 62)
    assert set(out) == {10, 20, 30, 40}


def test_bm25_plan_shape(spark, sf_dir):
    """Scale contract: corpus scans once (doc_id+text only), stats ride
    a 1-row broadcast, top-k is TakeOrderedAndProject — no corpus-sized
    hash-partition shuffle anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    out = bm25_topk(docs, ["vector", "window", "merge"], k=20)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "hashpartitioning" not in plan, plan[:2000]
    assert "ReadSchema" not in plan or "text" in plan


def test_hashed_tf_embedding_counts(spark):
    from dbt_omnata_push_spark.llmops.retrieval import hashed_tf_embedding

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["vec"] for r in hashed_tf_embedding(docs, dim=8).collect()}
    assert sum(out[1]) == 3  # every token lands in exactly one bucket
    assert len(out[1]) == 8
    # 'a' twice -> one bucket holds 2
    assert max(out[1]) == 2
    assert sum(out[2]) == 1  # split('') yields one empty-string token


def test_knn_join_blocked_shape(spark, sf_dir):
    from dbt_omnata_push_spark.llmops.similarity import knn_join_blocked

    emb = load_table(spark, sf_dir, "embeddings")
    out = knn_join_blocked(emb, k=3, block_col="label")
    rows = out.collect()
    n = emb.count()
    assert len(rows) == n * 3  # every vector has >= 3 same-label peers
    per_src = {}
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    for r in rows:
        per_src.setdefault(r["src"], []).append(r)
        assert labels[r["src"]] == labels[r["dst"]]  # never crosses blocks
    assert all(sorted(x["rank"] for x in v) == [1, 2, 3] for v in per_src.values())
