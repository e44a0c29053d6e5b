"""Streaming ingestion into tracking tables with exactly-once effects.

The reference's push pipelines are batch, but the same tracking-table
contract (append history, never duplicate a record) applies when the
source is a stream. Structured Streaming gives at-least-once micro
-batch delivery on restart/failure; exactly-once table state comes from
making the per-batch write *idempotent*: foreachBatch + keyed upsert,
so a replayed micro-batch overwrites the identical rows instead of
appending duplicates. This is the standard Spark pattern (foreachBatch
+ MERGE) — here the MERGE is TableStore.merge_upsert.

At scale: the parquet directory source becomes Kafka/autoloader, the
TableStore becomes Delta, and the checkpoint directory lives on shared
storage; nothing else changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.store import TableStore
from .events import _events_stream


def ingest_batch(
    spark: SparkSession,
    store: TableStore,
    table: str,
    batch_df: DataFrame,
    batch_id: int,
    unique_key: str = "event_id",
) -> None:
    """Idempotent micro-batch upsert (safe under batch replay).

    The batch id is recorded per row so the tracking table tells you
    which micro-batch produced each record (the streaming analogue of
    the reference's per-job task rows).
    """
    stamped = batch_df.withColumn("batch_id", F.lit(batch_id)).withColumn(
        "ingested_at", F.current_timestamp()
    )
    store.merge_upsert(spark, table, stamped, unique_key)


def stream_events_into_store(
    spark: SparkSession,
    sf_dir: str,
    store: TableStore,
    table: str = "events_ingest",
    checkpoint_dir: str | None = None,
) -> None:
    """Drain the events source into ``table`` (availableNow trigger).

    Restarting with the same checkpoint directory ingests nothing new
    (source progress is checkpointed); replaying a batch ingests no
    duplicates (keyed upsert). Together: exactly-once table state.
    """
    import tempfile

    cp = checkpoint_dir or tempfile.mkdtemp(prefix="sg-ingest-cp-")
    stream = _events_stream(spark, sf_dir)
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: ingest_batch(spark, store, table, df, bid)
        )
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
