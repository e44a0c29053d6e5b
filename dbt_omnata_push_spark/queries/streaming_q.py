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
    sliding_counts_stream,
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


@query(
    "stream_events_sliding",
    oracle="""
    SELECT window_start, event_type, COUNT(*) AS n_events
    FROM (
      SELECT t.ws AS window_start, event_type, ts
      FROM (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type,
                   CAST(to_timestamp(CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 1800) AS BIGINT) * 1800) AS TIMESTAMP) AS w1
            FROM events),
           unnest([w1, w1 - INTERVAL 30 MINUTE]) AS t(ws)
      WHERE ts >= t.ws AND ts < t.ws + INTERVAL 60 MINUTE
    )
    GROUP BY 1, 2
    """,
    tags=("streaming", "window"),
)
def stream_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window streaming aggregation (1h window / 30min slide);
    the oracle expands each event into its two overlapping windows."""
    return run_stream_once(
        sliding_counts_stream(spark, sf_dir), name="stream_events_sliding_out"
    )


@query("stream_events_dedup", oracle=None, tags=("streaming", "dedup"))
def stream_events_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact-dedup on event_id (watermark-bounded state)."""
    return run_stream_once(
        sessionless_dedup_stream(spark, sf_dir), name="stream_events_dedup_out"
    )
