"""Edge-case tests for the round-5 curation operators: block-level
global dedup, SemDeDup semantic flags, and tercile bucketing."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_omnata_push_spark.llmops.dedup import block_dedup_rebuild
from dbt_omnata_push_spark.llmops.similarity import semantic_dedup_flags


def _rows(df, *cols):
    return {tuple(r) for r in df.select(*cols).collect()}


class TestBlockDedup:
    def test_cross_doc_block_drop_and_rebuild(self, spark):
        # doc 1's second block repeats doc 0's first block verbatim.
        a = " ".join(f"w{i}" for i in range(32))
        b = " ".join(f"x{i}" for i in range(32))
        docs = spark.createDataFrame(
            [(0, a + " " + b), (1, "unique only " + " ".join(["pad"] * 30) + " " + a)],
            "doc_id long, text string",
        )
        out = block_dedup_rebuild(docs, block_words=32)
        got = {r["doc_id"]: r.asDict() for r in out.collect()}
        assert got[0]["n_blocks"] == 2 and got[0]["n_kept"] == 2
        assert got[0]["rebuilt_text"] == a + " " + b
        # doc 1 loses the repeated block 'a' but keeps its own first block
        assert got[1]["n_blocks"] == 2 and got[1]["n_kept"] == 1
        assert a not in got[1]["rebuilt_text"]

    def test_fully_duplicated_doc_rebuilds_empty(self, spark):
        a = " ".join(f"w{i}" for i in range(32))
        docs = spark.createDataFrame(
            [(0, a), (5, a)], "doc_id long, text string"
        )
        got = {r["doc_id"]: r.asDict() for r in block_dedup_rebuild(docs).collect()}
        assert got[0]["n_kept"] == 1
        assert got[5]["n_kept"] == 0 and got[5]["rebuilt_text"] == ""

    def test_intra_doc_repeat_keeps_first(self, spark):
        a = " ".join(f"w{i}" for i in range(32))
        docs = spark.createDataFrame([(0, a + " " + a)], "doc_id long, text string")
        got = block_dedup_rebuild(docs).collect()[0]
        assert got["n_blocks"] == 2 and got["n_kept"] == 1
        assert got["rebuilt_text"] == a

    def test_short_doc_single_partial_block(self, spark):
        docs = spark.createDataFrame([(0, "just short")], "doc_id long, text string")
        got = block_dedup_rebuild(docs).collect()[0]
        assert got["n_blocks"] == 1 and got["n_kept"] == 1
        assert got["rebuilt_text"] == "just short"


class TestSemanticDedup:
    def _emb(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, label int, embedding array<float>"
        )

    def test_identical_same_cluster_flags_higher_id(self, spark):
        emb = self._emb(
            spark,
            [(1, 0, [1.0, 0.0]), (2, 0, [1.0, 0.0]), (3, 0, [0.0, 1.0])],
        )
        got = _rows(semantic_dedup_flags(emb, 0.9), "vec_id", "is_dup")
        assert got == {(1, False), (2, True), (3, False)}

    def test_cluster_blocking_hides_cross_cluster_dup(self, spark):
        # identical vectors but different labels: SemDeDup (by design)
        # only compares within a cluster.
        emb = self._emb(spark, [(1, 0, [1.0, 0.0]), (2, 1, [1.0, 0.0])])
        got = _rows(semantic_dedup_flags(emb, 0.9), "vec_id", "is_dup")
        assert got == {(1, False), (2, False)}

    def test_threshold_boundary_inclusive(self, spark):
        # cos(v1, v2) == 0.8 exactly after rounding -> >= 0.8 keeps it.
        emb = self._emb(spark, [(1, 0, [1.0, 0.0]), (2, 0, [0.8, 0.6])])
        flagged = _rows(semantic_dedup_flags(emb, 0.8), "vec_id", "is_dup")
        assert flagged == {(1, False), (2, True)}
        not_flagged = _rows(semantic_dedup_flags(emb, 0.81), "vec_id", "is_dup")
        assert not_flagged == {(1, False), (2, False)}


class TestTercileBuckets:
    def test_bucket_sizes_exact_thirds(self, spark, sf_dir):
        from dbt_omnata_push_spark.queries import load_all

        fn = load_all()["corpus_perplexity_buckets"].fn
        out = fn(spark, sf_dir)
        counts = {
            r["bucket"]: r["n"]
            for r in out.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        n = sum(counts.values())
        # exact integer terciles: ceil(n/3) head, then the next third
        assert counts["head"] == (n + 2) // 3
        assert counts["head"] + counts["middle"] == (2 * n + 2) // 3


class TestBlockDedupSkew:
    def test_hot_block_in_every_doc(self, spark):
        """Pathological skew: one block repeated in EVERY document (the
        boilerplate-header case). Winner election is a groupBy (partial
        aggregation absorbs the hot key); output stays correct."""
        hot = " ".join(["boiler"] * 32)
        docs = spark.createDataFrame(
            [(i, hot + " " + " ".join(f"u{i}w{j}" for j in range(32)))
             for i in range(200)],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r.asDict() for r in block_dedup_rebuild(docs).collect()}
        # doc 0 keeps both blocks; every other doc loses only the hot one
        assert out[0]["n_kept"] == 2
        for i in range(1, 200):
            assert out[i]["n_kept"] == 1, i
            assert "boiler" not in out[i]["rebuilt_text"]
