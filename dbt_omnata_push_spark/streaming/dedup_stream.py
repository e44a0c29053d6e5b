"""Streaming near-duplicate dedup: a MinHash-LSH index maintained
across micro-batches (foreachBatch), admitting only documents that are
not near-dups of ANY earlier-seen document.

The batch-side machinery (llmops.dedup) already covers one-shot corpus
dedup and batch-vs-index incremental dedup; this is the ONLINE shape a
continuously-ingesting training-data pipeline needs: documents arrive
in micro-batches, each batch is checked against (a) itself and (b) the
persisted signature index of everything seen so far, survivors are
appended to the curated output, and the batch's signatures — survivors
AND rejects — are appended to the index.  Indexing rejects too gives
the classical first-wins semantics a closed form: a document d is
dropped iff SOME earlier document e (by ingest order) band-collides
with it at Jaccard >= threshold.  That predicate is independent of how
the stream was cut into batches (provided batches respect ingest
order), which is what makes the streaming output exactly equal to a
single batch computation — and exactly oracle-able in SQL.

Scale shape (the same posture as incremental_dedup_against_index,
reference llmops/dedup.py:460): the per-batch side is bounded by ingest
cadence, so its banded form broadcasts; the index is only ever STREAMED
(two map-side joins) and APPENDED — the historical corpus is never
reshuffled.  At 100 TB the index directory becomes a band-key-bucketed
table and the parquet landing dir becomes Kafka/autoloader; the
foreachBatch body is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llmops.dedup import (
    DEFAULT_BAND_SIZE,
    DEFAULT_NUM_PERM,
    incremental_dedup_against_index,
    minhash_signatures,
    near_duplicate_pairs,
    with_shingles,
)


def run_docs_lsh_dedup_stream(
    spark: SparkSession,
    landing_dir: str,
    index_dir: str,
    out_dir: str,
    schema,
    threshold: float = 0.3,
    num_perm: int = DEFAULT_NUM_PERM,
    band_size: int = DEFAULT_BAND_SIZE,
    shingle_n: int = 3,
    max_files_per_trigger: int = 1,
    checkpoint_dir: str | None = None,
) -> None:
    """Drain ``landing_dir`` (parquet files, one micro-batch per file)
    through the maintained-LSH-index dedup; survivors land in
    ``out_dir``, the growing signature index in ``index_dir``.

    Batches must respect ingest order (staged files ascending by both
    name and mtime; every doc in batch k precedes every doc in batch
    k+1) — the first-wins guarantee is stated in that order.
    """
    import tempfile

    sig_cols = ["doc_id", "shingles"] + [f"mh{j}" for j in range(num_perm)]

    def _dedup_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            docs = batch_df.select("doc_id", "text")
            # (a) within-batch: banded pairs (a < b) at >= threshold
            # drop the later doc of each colliding pair
            dropped_in = (
                near_duplicate_pairs(
                    docs,
                    threshold=threshold,
                    num_perm=num_perm,
                    band_size=band_size,
                    shingle_n=shingle_n,
                )
                .select(F.col("doc_b").alias("doc_id"))
                .distinct()
            )
            # (b) cross-batch: collide against the persisted index of
            # every earlier-seen document (index streams map-side; the
            # bounded batch broadcasts — llmops/dedup.py:460)
            try:
                index_sig = spark.read.parquet(index_dir)
                has_index = True
            except Exception:
                has_index = False
            if has_index:
                dropped_x = (
                    incremental_dedup_against_index(
                        index_sig,
                        docs,
                        threshold=threshold,
                        num_perm=num_perm,
                        band_size=band_size,
                        shingle_n=shingle_n,
                    )
                    .select(F.col("new_id").alias("doc_id"))
                    .distinct()
                )
                dropped = dropped_in.unionByName(dropped_x).distinct()
            else:
                dropped = dropped_in
            survivors = batch_df.join(dropped, "doc_id", "left_anti")
            survivors.write.mode("append").parquet(out_dir)
            # index EVERY batch doc (rejects too): any earlier-seen
            # document blocks later near-dups — the closed-form,
            # batch-split-invariant first-wins semantics
            batch_sig = minhash_signatures(
                with_shingles(docs, n=shingle_n), num_perm=num_perm
            ).select(*sig_cols)
            batch_sig.write.mode("append").parquet(index_dir)
        finally:
            batch_df.unpersist()

    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="sg_lshdedup_ckpt_")
    (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
        .writeStream.foreachBatch(_dedup_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def stage_ordered_batches(
    df: DataFrame, landing_dir: str, n_batches: int, order_col: str = "doc_id"
) -> None:
    """Stage ``df`` into ``landing_dir`` as ``n_batches`` flat parquet
    files range-partitioned by ``order_col``, file names AND mtimes
    ascending in range order, so maxFilesPerTrigger=1 consumes them as
    ingest-ordered micro-batches."""
    import shutil

    stage = landing_dir.rstrip("/") + "_stage"
    shutil.rmtree(stage, ignore_errors=True)
    shutil.rmtree(landing_dir, ignore_errors=True)
    df.repartitionByRange(n_batches, order_col).write.parquet(stage)
    os.makedirs(landing_dir)
    # part-00000..N of repartitionByRange are ascending ranges; copy in
    # sorted order with strictly increasing mtimes (the file source
    # orders by mtime)
    base = None
    k = 0
    for e in sorted(os.listdir(stage)):
        if not e.endswith(".parquet"):
            continue
        dst = os.path.join(landing_dir, f"b{k:03d}.parquet")
        shutil.copy(os.path.join(stage, e), dst)
        if base is None:
            base = os.path.getmtime(dst)
        os.utime(dst, (base + 60 * k, base + 60 * k))
        k += 1
    shutil.rmtree(stage)
