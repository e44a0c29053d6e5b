"""Empty/degenerate-input behavior for round-7 operators: empty frames
must yield empty results (correct schema), never raise."""

from __future__ import annotations

from pyspark.sql import functions as F


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_bm25_empty_corpus(spark):
    from dbt_omnata_push_spark.llmops.retrieval import bm25_topk

    out = bm25_topk(_empty_docs(spark), ["vector"], k=5)
    assert out.count() == 0
    assert out.columns == ["doc_id", "score", "rank"]


def test_bm25_no_matching_docs(spark):
    from dbt_omnata_push_spark.llmops.retrieval import bm25_topk

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert bm25_topk(docs, ["zzz"], k=5).count() == 0


def test_rrf_both_empty(spark):
    from dbt_omnata_push_spark.llmops.retrieval import rrf_fuse

    e = spark.createDataFrame([], "doc_id long, rank int")
    assert rrf_fuse(e, e, k=5).count() == 0


def test_hashed_tf_empty(spark):
    from dbt_omnata_push_spark.llmops.retrieval import hashed_tf_embedding

    assert hashed_tf_embedding(_empty_docs(spark), dim=8).count() == 0


def test_knn_join_empty_and_singleton_blocks(spark):
    from dbt_omnata_push_spark.llmops.similarity import knn_join_blocked

    empty = spark.createDataFrame(
        [], "vec_id long, label int, embedding array<double>"
    )
    assert knn_join_blocked(empty, k=3).count() == 0
    # a block with a single member has no peers -> contributes no rows
    single = spark.createDataFrame(
        [(1, 0, [1.0, 0.0]), (2, 1, [0.0, 1.0]), (3, 1, [1.0, 1.0])],
        "vec_id long, label int, embedding array<double>",
    )
    out = knn_join_blocked(single, k=3).collect()
    assert {r["src"] for r in out} == {2, 3}


def test_lsh_candidates_empty_queries(spark, sf_dir):
    from dbt_omnata_push_spark.engine.catalog import load_table
    from dbt_omnata_push_spark.llmops.similarity import lsh_candidates

    emb = load_table(spark, sf_dir, "embeddings")
    no_q = emb.filter(F.col("vec_id") < 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    assert lsh_candidates(emb, no_q).count() == 0


def test_query_luts_empty_queries(spark, sf_dir):
    from dbt_omnata_push_spark.engine.catalog import load_table
    from dbt_omnata_push_spark.llmops import pq as PQ

    emb = load_table(spark, sf_dir, "embeddings")
    books = PQ.pq_train(emb, m=8, k=16, max_iter=1)
    no_q = emb.filter(F.col("vec_id") < 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    assert PQ.query_luts(no_q, books).count() == 0


def test_hashed_tf_null_text_is_empty_doc(spark):
    from dbt_omnata_push_spark.llmops.retrieval import hashed_tf_embedding

    docs = spark.createDataFrame([(1, None), (2, "a")], "doc_id long, text string")
    out = {r["doc_id"]: list(r["vec"]) for r in hashed_tf_embedding(docs, dim=4).collect()}
    # split('') -> one empty-string token: deterministic, never null
    assert sum(out[1]) == 1 and all(v is not None for v in out[1])
    assert sum(out[2]) == 1


def test_relay_rejects_reserved_progress_column(spark, tmp_path):
    import pytest

    from dbt_omnata_push_spark.engine.store import TableStore
    from dbt_omnata_push_spark.ops.cdcrelay import relay_changes

    src = TableStore(str(tmp_path / "src"))
    dst = TableStore(str(tmp_path / "dst"))
    src.create(
        spark, "t",
        spark.createDataFrame([(1, 0)], "k long, _src_version long"),
    )
    with pytest.raises(ValueError, match="reserved column"):
        relay_changes(spark, src, "t", dst, "f", "k")
