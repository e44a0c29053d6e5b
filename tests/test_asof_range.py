"""Unit semantics for the as-of join and bucketized interval join
(the oracle queries cover the happy path; these pin the edges)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from dbt_omnata_push_spark.ops.asof import asof_join
from dbt_omnata_push_spark.ops.rangejoin import interval_join


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def _left(spark):
    return spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T10:00:00")),
            (2, "u1", _ts("2024-01-01T10:05:00")),
            (3, "u2", _ts("2024-01-01T09:00:00")),  # before any right row
            (4, "u3", _ts("2024-01-01T12:00:00")),  # key with no right rows
        ],
        "id long, user string, ts timestamp",
    )


def _right(spark):
    return spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T10:00:00"), 1.0),  # ties left id=1 exactly
            ("u1", _ts("2024-01-01T10:03:00"), None),  # NULL payload value
            ("u2", _ts("2024-01-01T11:00:00"), 3.0),
        ],
        "user string, ts timestamp, v double",
    )


def test_asof_inclusive_outer_and_null_payload(spark):
    out = asof_join(
        _left(spark), _right(spark), on=["user"], ts_col="ts", value_cols=["v"]
    )
    rows = {r["id"]: r for r in out.collect()}
    assert len(rows) == 4  # left-outer: every left row survives
    # equal timestamp matches (inclusive <=)
    assert rows[1]["matched_ts"] == _ts("2024-01-01T10:00:00")
    assert rows[1]["v"] == 1.0
    # latest prior row wins even when its payload value is NULL
    assert rows[2]["matched_ts"] == _ts("2024-01-01T10:03:00")
    assert rows[2]["v"] is None
    # right rows only in the future -> no match
    assert rows[3]["matched_ts"] is None
    # key absent from right -> no match
    assert rows[4]["matched_ts"] is None


def test_asof_strict_excludes_equal_ts(spark):
    out = asof_join(
        _left(spark),
        _right(spark),
        on=["user"],
        ts_col="ts",
        value_cols=["v"],
        strict=True,
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["matched_ts"] is None  # 10:00 == 10:00 no longer matches
    assert rows[2]["matched_ts"] == _ts("2024-01-01T10:03:00")


def test_asof_rejects_column_collision(spark):
    left = _left(spark).withColumnRenamed("id", "v")  # collides with value col
    try:
        asof_join(left, _right(spark), ["user"], "ts", ["v"])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "collide" in str(e)


def test_interval_join_half_open_and_bucket_spans(spark):
    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00")),  # == start: included
            (2, _ts("2024-01-01T10:09:59")),  # inside
            (3, _ts("2024-01-01T10:10:00")),  # == end: excluded (half-open)
            (4, _ts("2024-01-01T10:20:00")),  # outside all
        ],
        "pid long, ts timestamp",
    )
    # one interval spanning multiple small buckets, plus a boundary-aligned one
    intervals = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T10:10:00")),
            (11, _ts("2024-01-01T09:55:00"), _ts("2024-01-01T10:00:00")),
        ],
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    out = interval_join(
        points, intervals, "ts", "start_ts", "end_ts", bucket_width_s=60
    )
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    # point 1 at 10:00 is NOT in interval 11 (its end is exclusive)
    assert got == [(1, 10), (2, 10)]


def test_interval_join_extra_keys(spark):
    points = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01T10:05:00")), (2, "b", _ts("2024-01-01T10:05:00"))],
        "pid long, k string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(10, "a", _ts("2024-01-01T10:00:00"), _ts("2024-01-01T10:10:00"))],
        "iid long, k string, start_ts timestamp, end_ts timestamp",
    )
    out = interval_join(
        points, intervals, "ts", "start_ts", "end_ts",
        bucket_width_s=600, extra_on=["k"],
    )
    assert [(r["pid"], r["iid"]) for r in out.collect()] == [(1, 10)]


def test_interval_join_plans_hash_join_not_nested_loop(spark):
    points = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:05:00"))], "pid long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(10, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T10:10:00"))],
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    plan = interval_join(
        points, intervals, "ts", "start_ts", "end_ts"
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
