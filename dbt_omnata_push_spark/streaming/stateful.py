"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no streaming surface; this is the north-star
demonstration of arbitrary per-key state on an event stream: a running
per-user profile (event count, value sum, last-seen timestamp) updated
micro-batch by micro-batch, with watermark-driven state expiry.

At scale: state lives in the state store partitioned by user_id; the
watermark bounds state size for departed users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (callers compose)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("last_seen", TimestampType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("last_seen_us", LongType()),
    ]
)


def _update_profile(key, pdfs, state):
    import datetime

    import pandas as pd

    n, total, last_us = (
        state.get if state.exists else (0, 0.0, 0)
    )
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last_us = max(
            last_us, int(pdf["ts"].astype("int64").max() // 1000)
        )
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "value_sum": [total],
            "last_seen": [
                datetime.datetime.utcfromtimestamp(last_us / 1_000_000)
            ],
        }
    )


def user_profile_stream(events_stream: DataFrame) -> DataFrame:
    """Running per-user profile over a streaming events DataFrame."""
    return (
        events_stream.withWatermark("ts", "2 hours")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=PROFILE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


TYPE_CHANGES_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_type_changes", LongType()),
    ]
)

_TC_STATE_SCHEMA = StructType(
    [
        StructField("last_type", StringType()),
        StructField("n", LongType()),
    ]
)


def _update_type_changes(key, pdfs, state):
    import pandas as pd

    last_type, n = state.get if state.exists else (None, 0)
    pdf = pd.concat(list(pdfs))
    # Events inside a micro-batch arrive unordered; restore event-time
    # order (event_id tiebreak) before walking the sequence. Cross-batch
    # continuity comes from the carried last_type.
    pdf = pdf.sort_values(["ts", "event_id"])
    for t in pdf["event_type"]:
        if last_type is not None and t != last_type:
            n += 1
        last_type = t
    state.update((last_type, n))
    yield pd.DataFrame({"user_id": [key[0]], "n_type_changes": [n]})


def type_change_stream(events_stream: DataFrame) -> DataFrame:
    """Running per-user count of event-type CHANGES (prev != next) — the
    streaming form of the transition-matrix walk, with the last seen
    type carried as per-key state across micro-batches."""
    return (
        events_stream.withWatermark("ts", "2 hours")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_type_changes,
            outputStructType=TYPE_CHANGES_SCHEMA,
            stateStructType=_TC_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )
