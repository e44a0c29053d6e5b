"""Time-series rollup operators: time-weighted averages, gap filling,
and min/max downsampling.

These are the continuous-aggregate primitives a metrics/hypertable
engine offers over an event stream (TimescaleDB's ``time_weight`` /
``time_bucket_gapfill`` / ``lttb`` family re-expressed Spark-first).
Everything here is built from JVM expressions — windows only where
sequential semantics demand them, aggregations (map-side partial)
where they don't.

Determinism discipline (oracle hash-exactness): continuous doubles are
never summed as doubles. Values are fixed-point-scaled to bigint
(``floor(value*100)`` — testdata carries 2-decimal values) and
durations are integer microseconds, so every sum is an exact integer
in both engines; the final ratio is one IEEE double division, which is
deterministic given identical integer inputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Fixed-point scale for the testdata's 2-decimal `value` column.
VALUE_SCALE = 100


def _scaled(val_col: str) -> Column:
    return F.floor(F.col(val_col) * VALUE_SCALE).cast("long")


def time_weighted_avg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    val_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-key time-weighted average: each observation is weighted by
    how long it remained current (until the key's next observation).
    The key's last observation carries no weight — it has no successor
    interval (left-closed interpolation, TimescaleDB ``time_weight
    ('LOCF')`` semantics).

    Scale shape: ONE shuffle on the key for the lead() window; the
    weighted sums then reduce map-side. Skewed keys behave like any
    keyed window — salt upstream with ops/skew.py if one key dominates.

    Output: key cols, ``n_obs``, ``span_us`` (covered microseconds),
    ``tw_avg`` (double).
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col, tiebreak_col)
    # Testdata timestamps are TIMESTAMP_NTZ; the session tz is pinned
    # UTC (engine/session.py), so this cast is instant-preserving.
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    dt_us = F.lead(ts_us).over(w) - ts_us
    weighted = df.select(
        *key_cols,
        dt_us.alias("_dt_us"),
        (_scaled(val_col) * dt_us).alias("_wsum"),
    ).filter(F.col("_dt_us").isNotNull())
    agg = weighted.groupBy(*key_cols).agg(
        F.count("*").alias("n_obs"),
        F.sum("_dt_us").alias("span_us"),
        F.sum("_wsum").alias("_wsum_total"),
    )
    # span 0 (every observation at one instant) has no time-weighted
    # mean — NULL, not a divide-by-zero (ANSI mode raises; found by
    # hypothesis in tests/test_property_round6b.py).
    return agg.select(
        *key_cols,
        "n_obs",
        "span_us",
        F.when(
            F.col("span_us") > 0,
            F.col("_wsum_total").cast("double")
            / F.col("span_us").cast("double")
            / F.lit(float(VALUE_SCALE)),
        ).alias("tw_avg"),
    )


def hourly_gapfill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
) -> DataFrame:
    """Dense per-key hourly counts: every (key, hour) slot between the
    GLOBAL min and max hour appears exactly once, empty slots filled
    with zeros (``time_bucket_gapfill`` semantics).

    Scale shape: the fact table aggregates FIRST (map-side partial ->
    one shuffle on (key, hour)); the dense scaffold is keys x hours —
    dimension-sized, broadcast onto the aggregate as a left join. The
    raw events are never joined row-wise against the calendar.

    Output: key, ``hour`` (timestamp), ``n_events``, ``value_cents``
    (exact fixed-point sum; 0 for empty slots).
    """
    hour = F.date_trunc("hour", F.col(ts_col))
    agg = (
        df.select(
            F.col(key_col).alias("_k"),
            hour.alias("hour"),
            _scaled(val_col).alias("_v"),
        )
        .groupBy("_k", "hour")
        .agg(F.count("*").alias("n_events"), F.sum("_v").alias("value_cents"))
    )
    bounds = df.select(
        F.date_trunc("hour", F.min(ts_col)).alias("lo"),
        F.date_trunc("hour", F.max(ts_col)).alias("hi"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))
        ).alias("hour")
    )
    keys = df.select(F.col(key_col).alias("_k")).distinct()
    scaffold = keys.crossJoin(F.broadcast(hours))
    return (
        scaffold.join(agg, ["_k", "hour"], "left")
        .select(
            F.col("_k").alias(key_col),
            "hour",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("value_cents", F.lit(0)).alias("value_cents"),
        )
    )


def minmax_downsample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per (key, hour) keep exactly the extreme observations: the row
    with the minimum value and the row with the maximum value (the
    min/max decimation a plotting/downsampling pipeline uses — it
    preserves envelopes, unlike averaging).

    Deterministic argmin/argmax WITHOUT a window sort: ``F.min`` /
    ``F.max`` over a struct ordered (value, ts, tiebreak) is a
    lexicographic extreme -> ties break identically in both engines,
    and the aggregation is map-side partial (each partition reduces to
    2 structs per group before the shuffle) — strictly cheaper than a
    row_number window, which must shuffle every row.

    Output: key, hour, ``kind`` ('min'|'max'), ``value``, event ts/id.
    """
    hour = F.date_trunc("hour", F.col(ts_col))
    srt = F.struct(
        _scaled(val_col).alias("v"),
        F.col(ts_col).alias("ts"),
        F.col(tiebreak_col).alias("tb"),
    )
    agg = df.groupBy(F.col(key_col).alias("key"), hour.alias("hour")).agg(
        F.min(srt).alias("_lo"), F.max(srt).alias("_hi")
    )
    # Single-consumer plan: a union of two selects over `agg` would
    # compute the aggregation twice; exploding a 2-element array turns
    # it into one aggregation + a per-row expansion.
    pair = F.array(
        F.struct(F.lit("min").alias("kind"), F.col("_lo").alias("s")),
        F.struct(F.lit("max").alias("kind"), F.col("_hi").alias("s")),
    )
    return agg.select("key", "hour", F.explode(pair).alias("e")).select(
        "key",
        "hour",
        F.col("e.kind").alias("kind"),
        (F.col("e.s.v").cast("double") / VALUE_SCALE).alias("value"),
        F.col("e.s.ts").alias("ts"),
        F.col("e.s.tb").alias("event_id"),
    )


def hourly_gapfill_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
) -> DataFrame:
    """Gap-filled hourly series with last-observation-carried-forward
    interpolation (TimescaleDB ``time_bucket_gapfill`` + ``locf``):
    empty slots repeat the key's most recent hourly value instead of
    zero; slots before a key's first observation stay NULL.

    Built on hourly_gapfill's dense scaffold plus ONE extra keyed
    window (last_value IGNORE NULLS over the dense series). The window
    input is the scaffold — keys x hours, dimension-sized — never the
    raw events.

    Output: key, hour, n_events, value_cents (exact fixed-point),
    locf_cents (carried forward, NULL before first observation).
    """
    dense = hourly_gapfill(df, key_col, ts_col, val_col)
    w = (
        Window.partitionBy(key_col)
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    observed = F.when(F.col("n_events") > 0, F.col("value_cents"))
    return dense.withColumn(
        "locf_cents", F.last(observed, ignorenulls=True).over(w)
    )


def counter_rate(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    val_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-key monotonic-counter analytics with reset handling
    (Prometheus ``rate``/``increase``, TimescaleDB ``counter_agg``):
    a sample below its predecessor means the counter restarted at
    zero, so it contributes its own value to the increase instead of
    a negative delta.

    Scale shape: ONE shuffle on the key for the lag() window; the
    per-pair contributions then reduce map-side into one row per key.
    All sums are fixed-point integers (exact across engines); the
    rate is a single final double division.

    Output: key cols, ``n_samples``, ``resets``, ``increase_cents``
    (exact), ``rate_per_sec`` (double; NULL when the key's span is a
    single instant or a single sample).
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col, tiebreak_col)
    v = _scaled(val_col)
    prev = F.lag(v).over(w)
    contrib = F.when(prev.isNull(), F.lit(None).cast("long")).otherwise(
        F.when(v >= prev, v - prev).otherwise(v)
    )
    is_reset = F.when(prev.isNotNull() & (v < prev), 1).otherwise(0)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    marked = df.select(
        *key_cols,
        contrib.alias("_c"),
        is_reset.alias("_r"),
        ts_us.alias("_us"),
    )
    agg = marked.groupBy(*key_cols).agg(
        F.count("*").alias("n_samples"),
        F.sum("_r").alias("resets"),
        F.coalesce(F.sum("_c"), F.lit(0)).alias("increase_cents"),
        (F.max("_us") - F.min("_us")).alias("_span_us"),
    )
    return agg.select(
        *key_cols,
        "n_samples",
        "resets",
        "increase_cents",
        F.when(
            F.col("_span_us") > 0,
            F.col("increase_cents").cast("double")
            / F.lit(float(VALUE_SCALE))
            / (F.col("_span_us").cast("double") / F.lit(1_000_000.0)),
        ).alias("rate_per_sec"),
    )


def interval_coalesce(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merge overlapping/adjacent half-open intervals per key into
    maximal disjoint spans (gaps-and-islands): the temporal normalizer
    behind session stitching, maintenance-window dedup, and validity-
    interval compaction.

    Standard two-window formulation, both over the same key partition
    (ONE shuffle): a running maximum of end marks where a new island
    starts (current start > max end so far), a running sum of those
    markers numbers the islands, then one aggregation per island.
    Adjacent intervals (start == previous end) merge — half-open
    semantics.

    Output: key cols, island (0-based), start, end, n_intervals.
    """
    w_order = Window.partitionBy(*key_cols).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    numbered = df.withColumn("_new", is_new).withColumn(
        "island",
        F.sum("_new").over(
            w_order.rowsBetween(Window.unboundedPreceding, 0)
        )
        - 1,
    )
    return numbered.groupBy(*key_cols, "island").agg(
        F.min(start_col).alias("start"),
        F.max(end_col).alias("end"),
        F.count(F.lit(1)).alias("n_intervals"),
    )
