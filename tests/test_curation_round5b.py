"""Tests for the learned-cluster SemDeDup path, split-leakage QA, and
corrupt-JSONL ingest handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_omnata_push_spark.queries import load_all
from dbt_omnata_push_spark.queries.llm import _CLONE_N, _CLONE_OFFSET
from dbt_omnata_push_spark.sources import read_source


def test_semantic_ivf_flags_all_planted_clones(spark, sf_dir):
    """Identical vectors always co-assign to one k-means cluster, so
    every planted clone must be flagged (its original has a lower id)."""
    out = load_all()["dedup_semantic_ivf"].fn(spark, sf_dir)
    clones = out.filter(F.col("vec_id") >= _CLONE_OFFSET)
    assert clones.count() == _CLONE_N
    assert clones.filter(~F.col("is_dup")).count() == 0


def test_split_leakage_planted_leak(spark, tmp_path):
    """A val-split doc that copies a train doc's text must report 100%
    shared grams; a unique doc reports 0."""
    from dbt_omnata_push_spark.ops.packing import shuffle_split

    base = " ".join(f"tok{i}" for i in range(40))
    uniq = " ".join(f"only{i}" for i in range(40))
    # find doc ids landing in train vs non-train under the fixed seed
    ids = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    splits = {
        r["doc_id"]: r["split"]
        for r in shuffle_split(ids, "doc_id").collect()
    }
    train_id = next(i for i, s in sorted(splits.items()) if s == "train")
    val_ids = [i for i, s in sorted(splits.items()) if s != "train"]
    leak_id, clean_id = val_ids[0], val_ids[1]

    docs = spark.createDataFrame(
        [(train_id, base), (leak_id, base), (clean_id, uniq)],
        "doc_id long, text string",
    )
    # run the same pipeline the query runs, against this tiny corpus
    import dbt_omnata_push_spark.llmops.dedup as D

    sp = shuffle_split(docs, "doc_id").drop("shuffle_key")
    sh = D.with_shingles(sp, n=3)
    train_g = (
        sh.filter(F.col("split") == "train")
        .select(F.explode("shingles").alias("g"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    ev = sh.filter(F.col("split") != "train").select(
        "doc_id", F.explode("shingles").alias("g")
    )
    got = {
        r["doc_id"]: (r["n"], r["s"])
        for r in ev.join(train_g, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("s"),
        )
        .collect()
    }
    n, s = got[leak_id]
    assert n == s and n > 0  # full leak
    n, s = got[clean_id]
    assert s == 0  # no leak


def test_jsonl_corrupt_record_quarantine(spark, tmp_path):
    """PERMISSIVE JSONL ingest: bad lines land in _corrupt_record
    instead of failing the read — the quarantine column a 100 TB ingest
    needs (one bad crawl record must not kill the job)."""
    p = tmp_path / "in"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"doc_id": 1, "text": "good"}\n'
        "NOT JSON AT ALL\n"
        '{"doc_id": 2, "text": "also good"}\n'
    )
    back = read_source(
        spark,
        str(p),
        fmt="json",
        schema="doc_id long, text string, _corrupt_record string",
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    )
    rows = back.collect()
    good = {r["doc_id"] for r in rows if r["_corrupt_record"] is None}
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert good == {1, 2}
    assert len(bad) == 1 and "NOT JSON" in bad[0]["_corrupt_record"]


class TestBpe:
    def _train(self, spark, rows, n=5):
        from dbt_omnata_push_spark.llmops.bpe import bpe_train

        words = spark.createDataFrame(rows, "word string, freq long")
        return bpe_train(words, n_merges=n)

    def test_hand_computed_merges(self, spark):
        # 'ab' x10, 'abc' x5: round 1 merges (a,b) count 15; round 2
        # merges (ab,c) count 5; then no pairs remain -> early stop.
        got = self._train(spark, [("ab", 10), ("abc", 5)])
        assert got == [(1, "a", "b", 15), (2, "ab", "c", 5)]

    def test_adjacent_repeat_greedy_left_to_right(self, spark):
        # 'aaaa': pairs 'a a' x3 -> merge once; rewrite must produce
        # 'aa aa' (greedy left-to-right), then round 2 merges (aa,aa).
        got = self._train(spark, [("aaaa", 1)], n=2)
        assert got[0] == (1, "a", "a", 3)
        assert got[1] == (2, "aa", "aa", 1)

    def test_tiebreak_lexicographic(self, spark):
        # 'xy' and 'ab' both freq 1: pair counts tie at 1 -> 'a b' wins
        # the pair-string ascending tiebreak.
        got = self._train(spark, [("xy", 1), ("ab", 1)], n=1)
        assert got == [(1, "a", "b", 1)]
