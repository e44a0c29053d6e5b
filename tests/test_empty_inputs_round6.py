"""Empty-input robustness for the round-6 operators (same contract as
test_empty_inputs_round5: zero rows must yield a well-formed empty
frame or a loud, specific error — never a crash or a malformed schema)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_omnata_push_spark.engine.store import TableStore


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_boilerplate_removal_empty(spark):
    from dbt_omnata_push_spark.llmops.dedup import boilerplate_block_removal

    out = boilerplate_block_removal(_empty_docs(spark))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_blocks", "n_kept", "rebuilt_text",
    ]


def test_invindex_empty_corpus_and_absent_terms(spark, tmp_path):
    from dbt_omnata_push_spark.ops.invindex import (
        build_postings_index,
        phrase_search_indexed,
    )

    store = TableStore(str(tmp_path / "idx"))
    build_postings_index(spark, store, "p", _empty_docs(spark))
    out = phrase_search_indexed(spark, store, "p", ["table", "value"])
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_hits", "first_pos",
    ]
    # non-empty corpus, phrase absent entirely
    store2 = TableStore(str(tmp_path / "idx2"))
    docs = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    build_postings_index(spark, store2, "p", docs)
    assert phrase_search_indexed(spark, store2, "p", ["not", "there"]).count() == 0
    with pytest.raises(ValueError, match="at least one term"):
        phrase_search_indexed(spark, store2, "p", [])


def test_cms_empty_build_and_probe(spark):
    from dbt_omnata_push_spark.ops.sketches import cms_build, cms_estimate

    empty = spark.createDataFrame([], "term string")
    cms = cms_build(empty, "term")
    assert cms.count() == 0
    # probing an empty sketch: every key estimates 0
    keys = spark.createDataFrame([("a",), ("b",)], "term string")
    est = {r["term"]: r["est"] for r in cms_estimate(cms, keys, "term").collect()}
    assert est == {"a": 0, "b": 0}
    # probing with zero keys yields an empty, well-formed frame
    assert cms_estimate(cms, empty, "term").count() == 0


def test_pq_guards_and_empty_queries(spark):
    from dbt_omnata_push_spark.llmops.pq import pq_encode, pq_topk_adc, pq_train

    df = spark.createDataFrame(
        [(i, [float(i), 0.0, 1.0, float(-i)]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(df, m=3, k=2)
    with pytest.raises(ValueError, match="to init"):
        pq_train(df, m=2, k=16)
    books = pq_train(df, m=2, k=2, max_iter=2)
    codes = pq_encode(df, books)
    assert codes.count() == 6
    no_queries = spark.createDataFrame(
        [], "q_id long, q_emb array<double>"
    )
    # zero queries -> zero rows (the broadcast-LUT join form scans
    # against an empty LUT frame; the old per-query-union form raised
    # IndexError here, which forced callers to special-case)
    assert pq_topk_adc(codes, no_queries, books).count() == 0


def test_scd2_first_snapshot_on_empty_source(spark, tmp_path):
    from dbt_omnata_push_spark.materializations.snapshot import snapshot_apply

    store = TableStore(str(tmp_path / "scd"))
    empty = spark.createDataFrame([], "k long, v string")
    snapshot_apply(
        spark, store, "d", empty, "k", snapshot_ts="2026-01-01 00:00:00"
    )
    assert store.read(spark, "d").count() == 0
    # a later non-empty round opens rows normally
    s2 = spark.createDataFrame([(1, "a")], "k long, v string")
    snapshot_apply(
        spark, store, "d", s2, "k", snapshot_ts="2026-02-01 00:00:00"
    )
    rows = store.read(spark, "d").collect()
    assert len(rows) == 1 and rows[0]["dbt_is_current"]


def test_recursive_hierarchy_terminates_on_cycle_guard(spark):
    """Native recursion must stop when the frontier empties: a chain
    whose parents all resolve below the root threshold terminates in
    <= depth rounds (no maxRecursion blowup)."""
    spark.createDataFrame(
        [(i,) for i in range(0, 1200, 7)], "c_custkey long"
    ).createOrReplaceTempView("customer")
    from dbt_omnata_push_spark.queries.relational import _HIERARCHY_SQL

    rows = spark.sql(_HIERARCHY_SQL).collect()
    assert len(rows) == len(range(0, 1200, 7))
    by_key = {r["c_custkey"]: r for r in rows}
    assert by_key[700]["depth"] == 2 and by_key[700]["root_key"] == 7
    assert by_key[7]["depth"] == 0 and by_key[7]["root_key"] == 7
