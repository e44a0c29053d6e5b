"""Range (interval) join: left points joined to right intervals they
fall into, without an equi-key.

A raw inequality join (``l.ts BETWEEN r.start AND r.end``) has no
equi-condition, so Spark plans BroadcastNestedLoopJoin — O(n*m) and a
driver OOM once neither side broadcasts. The scalable shape is *bucket
decomposition*: quantize time into fixed-width buckets, explode each
interval to every bucket it overlaps, bucket the points, equi-join on
the bucket id (hash shuffle, AQE-managed), then re-apply the exact
range predicate. Cost is O(n + m * avg_buckets_per_interval + matches);
with bucket_width >= typical interval length the explode factor is ~2.

This is the same strategy as Databricks' range-join bin optimization
and postgres' range-partitioned GiST lookups, expressed as plain
DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"


def _bucket_of(ts, width_s: int):
    return F.floor(F.unix_timestamp(ts) / width_s).cast("long")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_width_s: int = 60,
    extra_on: list[str] | None = None,
) -> DataFrame:
    """Inner-join points to the intervals containing them.

    Semantics: ``start <= ts < end`` (half-open, the streaming-window
    convention). ``extra_on`` adds equi-keys (e.g. user_id) to the
    bucket join. Output carries all columns of both inputs; qualify
    ambiguous names before calling.
    """
    extra_on = extra_on or []
    pt = points.withColumn(_BUCKET, _bucket_of(F.col(point_ts), bucket_width_s))
    iv = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                _bucket_of(F.col(start_col), bucket_width_s),
                # end is exclusive: a boundary-aligned end adds no bucket
                _bucket_of(
                    F.col(end_col) - F.expr("INTERVAL 1 MICROSECOND"),
                    bucket_width_s,
                ),
            )
        ),
    )
    joined = pt.join(iv, on=[_BUCKET, *extra_on], how="inner")
    return joined.filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
    ).drop(_BUCKET)
