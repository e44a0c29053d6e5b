"""Streaming query entries: real Structured Streaming plans executed
with Trigger.AvailableNow so the driver's batch-style check applies.

The windowed aggregation carries an exact DuckDB oracle (a 1-hour
tumbling window start == date_trunc hour); the dedup stream is
rows-only (stateful dropDuplicates has no single-statement SQL
equivalent)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming.events import (
    hourly_counts_stream,
    run_stream_once,
    sessionless_dedup_stream,
)
from . import query


@query(
    "stream_events_hourly",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS value_millis
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "window"),
)
def stream_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window streaming aggregation (watermark + availableNow)."""
    return run_stream_once(
        hourly_counts_stream(spark, sf_dir), name="stream_events_hourly_out"
    )


@query("stream_events_dedup", oracle=None, tags=("streaming", "dedup"))
def stream_events_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact-dedup on event_id (watermark-bounded state)."""
    return run_stream_once(
        sessionless_dedup_stream(spark, sf_dir), name="stream_events_dedup_out"
    )
