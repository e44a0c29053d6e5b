"""Time-series rollup queries: time-weighted averages, gap-filled
hourly buckets, min/max envelope downsampling (ops/timeseries.py).

Beyond-reference operators (the reference delegates all rollups to
Snowflake SQL); these are the continuous-aggregate primitives of a
hypertable engine, re-expressed as Spark aggregations. All three carry
EXACT DuckDB oracles — values are fixed-point bigints end-to-end, so
the only doubles are single deterministic divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.catalog import load_table
from ..ops.timeseries import hourly_gapfill, minmax_downsample, time_weighted_avg
from . import query


@query(
    "events_time_weighted_avg",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             CAST(FLOOR(value * 100) AS BIGINT) AS v,
             LEAD(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
               PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             ) AS nxt
      FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_obs,
           CAST(SUM(nxt - ts_us) AS BIGINT) AS span_us,
           CASE WHEN SUM(nxt - ts_us) > 0 THEN
             CAST(SUM(v * (nxt - ts_us)) AS DOUBLE)
               / CAST(SUM(nxt - ts_us) AS DOUBLE) / 100.0
           END AS tw_avg
    FROM seq
    WHERE nxt IS NOT NULL
    GROUP BY user_id
    """,
    tags=("timeseries", "window", "agg"),
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted mean of `value`: each observation weighted
    by microseconds until the user's next event (LOCF interpolation,
    TimescaleDB `time_weight`). One keyed window shuffle, then map-side
    partial sums; integer arithmetic until the final division."""
    ev = load_table(spark, sf_dir, "events")
    return time_weighted_avg(
        ev, ["user_id"], "ts", "value", tiebreak_col="event_id"
    )


@query(
    "events_hourly_gapfill",
    oracle="""
    WITH agg AS (
      SELECT event_type,
             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
               AS value_cents
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT date_trunc('hour', MIN(CAST(ts AS TIMESTAMP))) AS lo,
             date_trunc('hour', MAX(CAST(ts AS TIMESTAMP))) AS hi
      FROM events
    ),
    hours AS (
      SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
      FROM bounds
    ),
    keys AS (SELECT DISTINCT event_type FROM events)
    SELECT k.event_type, h.hour,
           COALESCE(a.n_events, 0) AS n_events,
           COALESCE(a.value_cents, 0) AS value_cents
    FROM keys k
    CROSS JOIN hours h
    LEFT JOIN agg a ON a.event_type = k.event_type AND a.hour = h.hour
    """,
    tags=("timeseries", "gapfill", "agg"),
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series per event type — every (type, hour) slot in
    the global range present, zeros where no events fell
    (`time_bucket_gapfill`). Facts aggregate before touching the
    calendar scaffold; the scaffold is dimension-sized and broadcast."""
    ev = load_table(spark, sf_dir, "events")
    return hourly_gapfill(ev, "event_type", "ts", "value")


@query(
    "events_minmax_downsample",
    oracle="""
    WITH ranked AS (
      SELECT event_type AS key,
             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
             CAST(ts AS TIMESTAMP) AS ts,
             event_id,
             CAST(FLOOR(value * 100) AS BIGINT) AS v
      FROM events
    ),
    lo AS (
      SELECT key, hour, 'min' AS kind, CAST(v AS DOUBLE) / 100 AS value,
             ts, event_id,
             ROW_NUMBER() OVER (
               PARTITION BY key, hour ORDER BY v, ts, event_id
             ) AS rn
      FROM ranked
    ),
    hi AS (
      SELECT key, hour, 'max' AS kind, CAST(v AS DOUBLE) / 100 AS value,
             ts, event_id,
             ROW_NUMBER() OVER (
               PARTITION BY key, hour ORDER BY v DESC, ts DESC, event_id DESC
             ) AS rn
      FROM ranked
    )
    SELECT key, hour, kind, value, ts, event_id FROM lo WHERE rn = 1
    UNION ALL
    SELECT key, hour, kind, value, ts, event_id FROM hi WHERE rn = 1
    """,
    tags=("timeseries", "downsample", "agg"),
)
def events_minmax_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Envelope downsampling: per (event_type, hour) keep exactly the
    min-value and max-value observations. Spark side is a struct
    min/max aggregation (map-side partial, no window sort) — the oracle
    proves it equals the row_number formulation."""
    ev = load_table(spark, sf_dir, "events")
    return minmax_downsample(ev, "event_type", "ts", "value", "event_id")


@query(
    "events_hourly_gapfill_locf",
    oracle="""
    WITH agg AS (
      SELECT event_type,
             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
               AS value_cents
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT date_trunc('hour', MIN(CAST(ts AS TIMESTAMP))) AS lo,
             date_trunc('hour', MAX(CAST(ts AS TIMESTAMP))) AS hi
      FROM events
    ),
    hours AS (
      SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
      FROM bounds
    ),
    keys AS (SELECT DISTINCT event_type FROM events),
    dense AS (
      SELECT k.event_type, h.hour,
             COALESCE(a.n_events, 0) AS n_events,
             COALESCE(a.value_cents, 0) AS value_cents
      FROM keys k
      CROSS JOIN hours h
      LEFT JOIN agg a ON a.event_type = k.event_type AND a.hour = h.hour
    )
    -- leading-edge slots (before a key's first observation) are NULL
    -- in the op; projected as -1 here because the driver compare can't
    -- ship NULL numerics (pandas NaN != None)
    SELECT event_type, hour, n_events, value_cents,
           COALESCE(
             LAST_VALUE(CASE WHEN n_events > 0 THEN value_cents END
                        IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY hour
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             -1) AS locf_cents
    FROM dense
    """,
    tags=("timeseries", "gapfill", "locf", "window"),
)
def events_hourly_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series with last-observation-carried-forward
    interpolation: empty slots repeat the type's most recent hourly
    total (NULL before its first observation). The LOCF window runs
    over the dimension-sized dense scaffold, never the raw events."""
    from ..ops.timeseries import hourly_gapfill_locf

    ev = load_table(spark, sf_dir, "events")
    out = hourly_gapfill_locf(ev, "event_type", "ts", "value")
    return out.withColumn(
        "locf_cents", F.coalesce("locf_cents", F.lit(-1))
    )


@query(
    "events_interval_coalesce",
    oracle="""
    WITH iv AS (
      SELECT user_id,
             CAST(ts AS TIMESTAMP) AS s,
             CAST(ts AS TIMESTAMP) + INTERVAL 10 MINUTE AS e
      FROM events
    ),
    marked AS (
      SELECT user_id, s, e,
             CASE WHEN MAX(e) OVER w IS NULL OR s > MAX(e) OVER w
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
      WINDOW w AS (PARTITION BY user_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    numbered AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
               AS island
      FROM marked
    )
    SELECT user_id, CAST(island AS BIGINT) AS island,
           MIN(s) AS start_ts, MAX(e) AS end_ts,
           COUNT(*) AS n_intervals
    FROM numbered GROUP BY 1, 2
    """,
    tags=("timeseries", "interval", "gaps-islands"),
)
def events_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge each user's overlapping 10-minute activity intervals into
    maximal disjoint spans (gaps-and-islands,
    ops/timeseries.py::interval_coalesce): running-max-end island
    detection + island numbering in ONE keyed shuffle, then one
    aggregation per island. The oracle is the identical two-window
    formulation in DuckDB."""
    from ..ops.timeseries import interval_coalesce

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("interval 10 minutes")).alias("e"),
    )
    out = interval_coalesce(ev, ["user_id"], "s", "e")
    return out.select(
        "user_id",
        F.col("island").cast("long").alias("island"),
        F.col("start").alias("start_ts"),
        F.col("end").alias("end_ts"),
        "n_intervals",
    )


@query(
    "events_counter_rate",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             CAST(FLOOR(value * 100) AS BIGINT) AS v,
             LAG(CAST(FLOOR(value * 100) AS BIGINT)) OVER w AS prev,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      FROM events
      WINDOW w AS (PARTITION BY event_type
                   ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ),
    agg AS (
      SELECT event_type,
             COUNT(*) AS n_samples,
             CAST(SUM(CASE WHEN prev IS NOT NULL AND v < prev
                           THEN 1 ELSE 0 END) AS BIGINT) AS resets,
             CAST(COALESCE(SUM(CASE WHEN prev IS NULL THEN NULL
                                    WHEN v >= prev THEN v - prev
                                    ELSE v END), 0) AS BIGINT)
               AS increase_cents,
             MAX(ts_us) - MIN(ts_us) AS span_us
      FROM seq GROUP BY 1
    )
    SELECT event_type, n_samples, resets, increase_cents,
           CASE WHEN span_us > 0 THEN
             CAST(increase_cents AS DOUBLE) / 100.0
               / (CAST(span_us AS DOUBLE) / 1000000.0)
           END AS rate_per_sec
    FROM agg
    """,
    tags=("timeseries", "counter", "rate", "window"),
)
def events_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter-reset-aware per-type rate (Prometheus ``rate`` /
    TimescaleDB ``counter_agg`` semantics,
    ops/timeseries.py::counter_rate): a sample below its predecessor
    counts as a restart-at-zero and contributes its own value. One
    keyed window shuffle, then a map-side-partial reduce; increases
    are exact fixed-point bigints."""
    from ..ops.timeseries import counter_rate

    ev = load_table(spark, sf_dir, "events")
    return counter_rate(ev, ["event_type"], "ts", "value", "event_id")


@query(
    "events_cascading_rollup",
    oracle="""
    SELECT event_type,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM events
    GROUP BY event_type, day
    """,
    tags=("timeseries", "rollup", "hypertable", "ivm", "cascade"),
)
def events_cascading_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYPERTABLE-style cascading rollup (TimescaleDB continuous
    aggregates): raw events -> maintained HOURLY aggregate -> DAILY
    aggregate derived FROM THE HOURLY LEVEL ALONE (ops/ivm.py::
    rollup_from_finer — counts sum, sums sum, per-measure non-null
    counts sum, so SUM-NULL semantics survive the cascade exactly).

    The maintenance path is exercised honestly: the hourly level is
    built from the first ~70% of the time range, then the remaining
    events fold in as an insert batch through apply_cdc — the daily
    output must equal a direct raw-data daily aggregate (the oracle),
    proving maintained-hourly -> derived-daily == full refresh. At
    100 TB the daily read costs 24 hourly rows per group-day, never
    the day's raw events, and each new batch folds at O(batch +
    touched hours)."""
    from ..ops.ivm import apply_cdc, build_agg, rollup_from_finer

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    cutoff = ev.agg(
        F.expr("percentile_approx(unix_timestamp(hour), 0.7)")
    ).collect()[0][0]
    base = ev.filter(F.unix_timestamp("hour") <= cutoff)
    batch = ev.filter(F.unix_timestamp("hour") > cutoff).withColumn(
        "change_type", F.lit("insert")
    )
    hourly = build_agg(base, ["event_type", "hour"], ["cents"])
    hourly = apply_cdc(hourly, batch, ["event_type", "hour"], ["cents"])
    daily = rollup_from_finer(
        hourly.withColumn("day", F.date_format("hour", "yyyy-MM-dd")),
        ["event_type", "day"],
        ["cents"],
    )
    return daily.select(
        "event_type",
        "day",
        "n_rows",
        F.col("sum_cents").cast("long").alias("sum_cents"),
    )


@query(
    "events_conditional_true_event",
    oracle="""
    SELECT user_id,
           event_id,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS errors_so_far,
           CAST(CAST(FLOOR(value * 100) AS BIGINT) AS DOUBLE)
               / SUM(CAST(FLOOR(value * 100) AS BIGINT))
                 OVER (PARTITION BY user_id) AS value_share
    FROM events
    """,
    tags=("engine", "sqlfront", "window"),
)
def events_conditional_true_event(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Snowflake CONDITIONAL_TRUE_EVENT + RATIO_TO_REPORT through the
    engine's SQL surface (r9): both are transpile rewrites
    (engine/sqlfront.py::_rewrite_window_funcs) — the running
    error-count becomes one framed SUM, the per-user value share one
    partition-total division. One shuffle on user_id serves both
    windows; integer cents make the share an exact IEEE division in
    both engines."""
    import tempfile

    from ..engine.dag import Engine
    from ..engine.store import TableStore

    engine = Engine(spark, TableStore(tempfile.mkdtemp(prefix="sg-cte-")))
    engine.seed(
        "ev_cte",
        load_table(spark, sf_dir, "events").select(
            "user_id",
            "event_id",
            "event_type",
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        ),
    )
    return engine.query(
        "select user_id, event_id, "
        "cast(conditional_true_event(event_type = 'error') "
        "  over (partition by user_id order by event_id) as bigint) "
        "  as errors_so_far, "
        "ratio_to_report(cents) over (partition by user_id) "
        "  as value_share "
        "from ev_cte"
    )


@query(
    "events_conditional_change_event",
    oracle="""
    SELECT user_id,
           event_id,
           CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS event
    FROM (
        SELECT user_id, event_id,
               CASE WHEN ROW_NUMBER() OVER w = 1 THEN 0
                    WHEN event_type IS DISTINCT FROM
                         LAG(event_type) OVER w THEN 1
                    ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    )
    """,
    tags=("ops", "window"),
)
def events_conditional_change_event(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Snowflake CONDITIONAL_CHANGE_EVENT as the two-pass DataFrame op
    (ops/condevents.py — LAG inside a running SUM is a nested window
    function, inexpressible in one SQL pass; the transpiler refuses it
    with a pointer here). Flag window and running-sum window share the
    (user_id, event_id) key: one exchange, two back-to-back Window
    operators. First row of each user = event 0; IS DISTINCT FROM
    change semantics, mirrored exactly in the oracle."""
    from ..ops.condevents import conditional_change_event

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type"
    )
    out = conditional_change_event(
        ev, F.col("event_type"), ["user_id"], ["event_id"], out="event"
    )
    return out.select(
        "user_id", "event_id", F.col("event").cast("long").alias("event")
    )
