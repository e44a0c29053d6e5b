"""Unit + edge coverage for the round-6 time-series rollups
(ops/timeseries.py) and windowed substring dedup (llmops/substr.py).
Hand-computed expectations on tiny frames; the sf-level oracles live in
test_oracle_parity.py."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dbt_omnata_push_spark.llmops.substr import duplicated_span_stats, span_hashes
from dbt_omnata_push_spark.ops.timeseries import (
    hourly_gapfill,
    minmax_downsample,
    time_weighted_avg,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, value double"
    )


# ---------------------------------------------------------------- tw-avg


def test_time_weighted_avg_hand_computed(spark):
    # user 1: value 1.00 held 10s, then 3.00 held 30s -> (1*10+3*30)/40 = 2.5
    rows = [
        (1, _ts("2024-01-01T00:00:00"), 1, 1.0),
        (2, _ts("2024-01-01T00:00:10"), 1, 3.0),
        (3, _ts("2024-01-01T00:00:40"), 1, 99.0),  # last obs: no weight
    ]
    out = time_weighted_avg(_events(spark, rows), ["user_id"], "ts", "value", "event_id").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_obs"] == 2
    assert r["span_us"] == 40_000_000
    assert abs(r["tw_avg"] - 2.5) < 1e-12


def test_time_weighted_avg_single_event_user_dropped(spark):
    rows = [(1, _ts("2024-01-01T00:00:00"), 7, 5.0)]
    assert time_weighted_avg(_events(spark, rows), ["user_id"], "ts", "value", "event_id").count() == 0


def test_time_weighted_avg_empty(spark):
    empty = _events(spark, []).limit(0)
    assert time_weighted_avg(empty, ["user_id"], "ts", "value", "event_id").count() == 0


def test_time_weighted_avg_tiebreak_on_equal_ts(spark):
    # Two obs at the same instant: lead order fixed by event_id, zero-
    # duration interval contributes nothing but stays deterministic.
    rows = [
        (1, _ts("2024-01-01T00:00:00"), 1, 2.0),
        (2, _ts("2024-01-01T00:00:00"), 1, 4.0),
        (3, _ts("2024-01-01T00:01:00"), 1, 0.0),
    ]
    r = time_weighted_avg(_events(spark, rows), ["user_id"], "ts", "value", "event_id").collect()[0]
    # event 1 holds 0us, event 2 holds 60s -> avg = 4.0
    assert abs(r["tw_avg"] - 4.0) < 1e-12


# --------------------------------------------------------------- gapfill


def test_hourly_gapfill_fills_interior_zeros(spark):
    rows = [
        (1, _ts("2024-01-01T00:10:00"), 1, 1.0),
        (2, _ts("2024-01-01T03:10:00"), 1, 2.0),
    ]
    ev = _events(spark, rows).withColumn("event_type", F.lit("click"))
    out = hourly_gapfill(ev, "event_type", "ts", "value")
    got = {r["hour"].hour: (r["n_events"], r["value_cents"]) for r in out.collect()}
    assert got == {0: (1, 100), 1: (0, 0), 2: (0, 0), 3: (1, 200)}


def test_hourly_gapfill_dense_across_keys(spark):
    # A key with events only in hour 0 still gets a row for hour 1
    # (dense over the GLOBAL range, per key).
    rows = [
        (1, _ts("2024-01-01T00:10:00"), 1, 1.0),
        (2, _ts("2024-01-01T01:10:00"), 2, 1.0),
    ]
    ev = _events(spark, rows).withColumn(
        "event_type", F.when(F.col("user_id") == 1, "a").otherwise("b")
    )
    out = hourly_gapfill(ev, "event_type", "ts", "value")
    assert out.count() == 4  # 2 keys x 2 hours
    assert out.filter((F.col("event_type") == "a") & (F.col("n_events") == 0)).count() == 1


def test_hourly_gapfill_empty(spark):
    ev = _events(spark, []).withColumn("event_type", F.lit("x")).limit(0)
    assert hourly_gapfill(ev, "event_type", "ts", "value").count() == 0


# ------------------------------------------------------------ downsample


def test_minmax_downsample_picks_extremes(spark):
    rows = [
        (1, _ts("2024-01-01T00:00:00"), 1, 5.0),
        (2, _ts("2024-01-01T00:10:00"), 1, 1.0),
        (3, _ts("2024-01-01T00:20:00"), 1, 9.0),
    ]
    ev = _events(spark, rows).withColumn("event_type", F.lit("t"))
    out = {r["kind"]: r for r in minmax_downsample(ev, "event_type", "ts", "value", "event_id").collect()}
    assert out["min"]["event_id"] == 2 and out["min"]["value"] == 1.0
    assert out["max"]["event_id"] == 3 and out["max"]["value"] == 9.0


def test_minmax_downsample_tie_determinism(spark):
    # Equal values: earliest (ts, id) wins min, latest wins max —
    # lexicographic struct ordering.
    rows = [
        (1, _ts("2024-01-01T00:00:00"), 1, 2.0),
        (2, _ts("2024-01-01T00:10:00"), 1, 2.0),
    ]
    ev = _events(spark, rows).withColumn("event_type", F.lit("t"))
    out = {r["kind"]: r["event_id"] for r in minmax_downsample(ev, "event_type", "ts", "value", "event_id").collect()}
    assert out == {"min": 1, "max": 2}


def test_minmax_downsample_plan_is_aggregation_not_window(spark):
    rows = [(1, _ts("2024-01-01T00:00:00"), 1, 2.0)]
    ev = _events(spark, rows).withColumn("event_type", F.lit("t"))
    df = minmax_downsample(ev, "event_type", "ts", "value", "event_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # argmin/argmax via struct agg, no sort


# ------------------------------------------------------------- substring


def test_span_hashes_short_docs_contribute_nothing(spark):
    docs = spark.createDataFrame([(1, "short")], "doc_id bigint, text string")
    assert span_hashes(docs, k=32, stride=8).count() == 0


def test_duplicated_span_stats_detects_planted_block(spark):
    block = "A" * 40 + "the quick brown fox jumps over it"  # shared block
    docs = spark.createDataFrame(
        [
            (1, block + " unique tail one " + "x" * 40),
            (2, "different head " + block + " other tail"),
            (3, "entirely unrelated text " + "z" * 60),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in duplicated_span_stats(docs, k=32, stride=8).collect()}
    # Stride-8 alignment: doc 2's copy of the block is offset by 15
    # chars, so aligned windows only match inside runs longer than
    # k + stride - 1; the A*40 run guarantees at least one.
    assert 1 in out and 2 in out and 3 not in out
    assert out[1]["max_span_docs"] == 2


def test_duplicated_span_stats_identical_docs_all_spans_dup(spark):
    t = "identical document body repeated verbatim across both rows!!"
    docs = spark.createDataFrame([(1, t), (2, t)], "doc_id bigint, text string")
    for r in duplicated_span_stats(docs, k=32, stride=8).collect():
        assert r["dup_spans"] == r["total_spans"]


def test_duplicated_span_stats_empty(spark):
    docs = spark.createDataFrame([], "doc_id bigint, text string")
    assert duplicated_span_stats(docs).count() == 0


def test_minmax_downsample_single_aggregation_plan(spark):
    """The min/max pair must come from ONE aggregation (explode of a
    2-struct array), not a self-union that scans and aggregates twice."""
    rows = [(1, _ts("2024-01-01T00:00:00"), 1, 2.0)]
    ev = _events(spark, rows).withColumn("event_type", F.lit("t"))
    df = minmax_downsample(ev, "event_type", "ts", "value", "event_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    assert plan.count("Scan ExistingRDD") <= 1


# ----------------------------------------------------- locf + intervals


def test_locf_carries_forward_and_leading_null(spark):
    from dbt_omnata_push_spark.ops.timeseries import hourly_gapfill_locf

    rows = [
        (1, _ts("2024-01-01T01:10:00"), 1, 2.0),   # hour 1 (hour 0 empty)
        (2, _ts("2024-01-01T03:10:00"), 1, 5.0),   # hour 3 (hour 2 gap)
    ]
    ev = _events(spark, rows).withColumn("event_type", F.lit("t"))
    # widen the global range so hour 0 exists: add another type at hour 0
    other = _events(
        spark, [(9, _ts("2024-01-01T00:05:00"), 2, 1.0)]
    ).withColumn("event_type", F.lit("u"))
    out = hourly_gapfill_locf(ev.unionByName(other), "event_type", "ts", "value")
    t = {r["hour"].hour: r["locf_cents"] for r in out.filter(F.col("event_type") == "t").collect()}
    assert t[0] is None          # before first observation
    assert t[1] == 200           # observed
    assert t[2] == 200           # carried forward across the gap
    assert t[3] == 500


def test_interval_coalesce_merges_overlaps_and_adjacent(spark):
    from dbt_omnata_push_spark.ops.timeseries import interval_coalesce

    rows = [
        # overlapping pair -> one island
        (1, _ts("2024-01-01T00:00:00"), _ts("2024-01-01T00:10:00")),
        (1, _ts("2024-01-01T00:05:00"), _ts("2024-01-01T00:20:00")),
        # adjacent (start == prev end) -> merges under half-open
        (1, _ts("2024-01-01T00:20:00"), _ts("2024-01-01T00:30:00")),
        # gap -> new island
        (1, _ts("2024-01-01T01:00:00"), _ts("2024-01-01T01:05:00")),
        # contained interval -> absorbed
        (2, _ts("2024-01-01T00:00:00"), _ts("2024-01-01T01:00:00")),
        (2, _ts("2024-01-01T00:10:00"), _ts("2024-01-01T00:20:00")),
    ]
    df = spark.createDataFrame(rows, "k long, s timestamp, e timestamp")
    out = {
        (r["k"], r["island"]): (r["start"], r["end"], r["n_intervals"])
        for r in interval_coalesce(df, ["k"], "s", "e").collect()
    }
    assert out[(1, 0)] == (
        _ts("2024-01-01T00:00:00"), _ts("2024-01-01T00:30:00"), 3
    )
    assert out[(1, 1)] == (
        _ts("2024-01-01T01:00:00"), _ts("2024-01-01T01:05:00"), 1
    )
    assert out[(2, 0)] == (
        _ts("2024-01-01T00:00:00"), _ts("2024-01-01T01:00:00"), 2
    )
    assert len(out) == 3


def test_interval_coalesce_empty(spark):
    from dbt_omnata_push_spark.ops.timeseries import interval_coalesce

    df = spark.createDataFrame([], "k long, s timestamp, e timestamp")
    assert interval_coalesce(df, ["k"], "s", "e").count() == 0


# ------------------------------------------------------------ counter rate


def test_counter_rate_reset_semantics(spark):
    from dbt_omnata_push_spark.ops.timeseries import counter_rate

    rows = [
        # key "a": 1.00 -> 3.00 (+200) -> 0.50 (reset, +50) -> 2.50 (+200)
        (1, _ts("2024-01-01T00:00:00"), 1, 1.0),
        (2, _ts("2024-01-01T00:00:10"), 1, 3.0),
        (3, _ts("2024-01-01T00:00:20"), 1, 0.5),
        (4, _ts("2024-01-01T00:00:30"), 1, 2.5),
    ]
    ev = _events(spark, rows).withColumn("event_type", F.lit("a"))
    out = counter_rate(ev, ["event_type"], "ts", "value", "event_id").collect()
    r = out[0]
    assert r["n_samples"] == 4
    assert r["resets"] == 1
    assert r["increase_cents"] == 200 + 50 + 200
    # 4.50 over 30 s
    assert abs(r["rate_per_sec"] - 4.50 / 30.0) < 1e-12


def test_counter_rate_single_sample_null_rate(spark):
    from dbt_omnata_push_spark.ops.timeseries import counter_rate

    ev = _events(spark, [(1, _ts("2024-01-01T00:00:00"), 1, 5.0)]).withColumn(
        "event_type", F.lit("solo")
    )
    r = counter_rate(ev, ["event_type"], "ts", "value", "event_id").collect()[0]
    assert r["n_samples"] == 1
    assert r["resets"] == 0
    assert r["increase_cents"] == 0
    assert r["rate_per_sec"] is None


def test_counter_rate_empty(spark):
    from dbt_omnata_push_spark.ops.timeseries import counter_rate

    df = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, value double"
    ).withColumn("event_type", F.lit("x"))
    assert counter_rate(df, ["event_type"], "ts", "value", "event_id").count() == 0
