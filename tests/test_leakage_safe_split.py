"""Leakage-safe cluster-aware split (round 8).

Near-dup clusters must never straddle train/val/test: assignment
hashes the connected-component representative, not the doc id.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from dbt_omnata_push_spark.llmops import dedup as D
from dbt_omnata_push_spark.ops.packing import shuffle_split


def _split_by_group(spark, docs):
    pairs = D.near_duplicate_pairs(docs, threshold=0.3).select(
        "doc_a", "doc_b"
    )
    comp = D.connected_components(pairs)
    rep = (
        docs.select("doc_id")
        .join(comp, docs["doc_id"] == comp["node"], "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("group_id"),
        )
    )
    return shuffle_split(rep, "group_id").select("doc_id", "group_id", "split")


def test_planted_neardups_share_split(spark):
    base = "the quick brown fox jumps over the lazy dog again and again "
    rows = [(i, base + f"unique tail {i}") for i in range(20)]
    # plant 3 near-copies of doc 0 (shared long prefix -> Jaccard >= 0.3)
    rows += [(100 + j, base + "unique tail 0 almost") for j in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = _split_by_group(spark, docs)
    cluster = out.filter(F.col("doc_id").isin([0, 100, 101, 102])).collect()
    assert len({r["group_id"] for r in cluster}) == 1
    assert len({r["split"] for r in cluster}) == 1


def test_singletons_match_plain_shuffle_split(spark):
    """With no near-dup pairs, the assignment degenerates to the plain
    doc-id shuffle split (group_id == doc_id)."""
    rows = [
        (i, f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}")
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["group_id"], r["split"])
           for r in _split_by_group(spark, docs).collect()}
    plain = {
        r["doc_id"]: r["split"]
        for r in shuffle_split(docs, "doc_id").collect()
    }
    for did, (gid, split) in out.items():
        assert gid == did and split == plain[did]


def test_empty_corpus(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert _split_by_group(spark, docs).count() == 0


def test_every_doc_assigned_exactly_once(spark, sf_dir):
    from dbt_omnata_push_spark.engine.catalog import load_table
    from dbt_omnata_push_spark.queries import load_all

    reg = load_all()
    out = reg["corpus_leakage_safe_split"].fn(spark, sf_dir)
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs
    # groups are internally split-consistent
    assert (
        out.groupBy("group_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter("k > 1")
        .count()
        == 0
    )
