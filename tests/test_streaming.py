"""Structured Streaming wrapper: availableNow runs match batch results."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_omnata_push_spark.engine.catalog import load_table
from dbt_omnata_push_spark.streaming import (
    hourly_counts_stream,
    run_stream_once,
    sessionless_dedup_stream,
)


def test_hourly_stream_matches_batch(spark, sf_dir):
    out = run_stream_once(hourly_counts_stream(spark, sf_dir), "t_hourly")
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias("value_millis"),
        )
    )
    assert out.count() == batch.count()
    assert (
        out.join(batch, ["window_start", "event_type", "n_events", "value_millis"])
        .count()
        == batch.count()
    )


def test_dedup_stream(spark, sf_dir):
    out = run_stream_once(sessionless_dedup_stream(spark, sf_dir), "t_dedup")
    n_events = load_table(spark, sf_dir, "events").count()
    assert out.count() == n_events  # event_id already unique
    assert out.select("event_id").distinct().count() == n_events


def test_stream_ingest_exactly_once(spark, sf_dir, tmp_path):
    """Exactly-once table state: restart ingests nothing, batch replay
    deduplicates via keyed upsert."""
    from dbt_omnata_push_spark.engine.catalog import load_table
    from dbt_omnata_push_spark.engine.store import TableStore
    from dbt_omnata_push_spark.streaming.ingest import (
        ingest_batch,
        stream_events_into_store,
    )

    store = TableStore(str(tmp_path / "warehouse"))
    cp = str(tmp_path / "cp")
    stream_events_into_store(spark, sf_dir, store, "events_ingest", cp)

    n_src = load_table(spark, sf_dir, "events").count()
    ingested = store.read(spark, "events_ingest")
    assert ingested.count() == n_src
    assert ingested.select("event_id").distinct().count() == n_src
    assert "batch_id" in ingested.columns

    # restart with the same checkpoint: source is drained, no new rows
    stream_events_into_store(spark, sf_dir, store, "events_ingest", cp)
    assert store.read(spark, "events_ingest").count() == n_src

    # simulate a replayed micro-batch (task retry after partial failure)
    replay = load_table(spark, sf_dir, "events").limit(100)
    ingest_batch(spark, store, "events_ingest", replay, batch_id=0)
    assert store.read(spark, "events_ingest").count() == n_src
