"""MIN/MAX incremental view maintenance (r7, ops/ivm.py): algebraic
insert folding + targeted group recompute on endangered extremes —
maintained result must EQUAL a full rebuild under every CDC shape."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dbt_omnata_push_spark.ops.ivm import apply_cdc_minmax, build_minmax

SCHEMA = "k long, g string, v long"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA) if rows else spark.createDataFrame([], SCHEMA)


def _apply(spark, base_rows, deletes, inserts, updates):
    """Build CDC rows from (base, deletes, inserts, updates) and check
    maintained == rebuilt."""
    base = {r[0]: r for r in base_rows}
    changes = []
    for k in deletes:
        if k in base:
            changes.append((*base[k], "delete"))
            del base[k]
    for row in inserts:
        if row[0] not in base:
            base[row[0]] = row
            changes.append((*row, "insert"))
    for row in updates:
        if row[0] in base and base[row[0]] != row:
            changes.append((*base[row[0]], "update_preimage"))
            changes.append((*row, "update_postimage"))
            base[row[0]] = row
    agg0 = build_minmax(_df(spark, base_rows), ["g"], ["v"])
    ch = (
        spark.createDataFrame(changes, SCHEMA + ", change_type string")
        if changes
        else spark.createDataFrame([], SCHEMA + ", change_type string")
    )
    new_base = _df(spark, list(base.values()))
    got = apply_cdc_minmax(agg0, ch, new_base, ["g"], ["v"])
    want = build_minmax(new_base, ["g"], ["v"])
    as_set = lambda df: {  # noqa: E731
        (r["g"], r["n_rows"], r["min_v"], r["max_v"]) for r in df.collect()
    }
    assert as_set(got) == as_set(want)


def test_minmax_delete_of_extreme_recomputes(spark):
    base = [(1, "a", 10), (2, "a", 5), (3, "a", 7), (4, "b", 1)]
    _apply(spark, base, deletes=[2], inserts=[], updates=[])  # min of a
    _apply(spark, base, deletes=[1], inserts=[], updates=[])  # max of a
    _apply(spark, base, deletes=[4], inserts=[], updates=[])  # group death


def test_minmax_insert_folds_without_base(spark):
    base = [(1, "a", 10)]
    _apply(spark, base, deletes=[], inserts=[(2, "a", 3), (3, "c", 9)], updates=[])


def test_minmax_update_moving_extreme(spark):
    base = [(1, "a", 10), (2, "a", 5)]
    _apply(spark, base, deletes=[], inserts=[], updates=[(1, "a", 4)])
    _apply(spark, base, deletes=[], inserts=[], updates=[(2, "a", 50)])


def test_minmax_null_measures(spark):
    base = [(1, "a", None), (2, "a", 5)]
    _apply(spark, base, deletes=[2], inserts=[], updates=[])  # all-null group
    _apply(spark, base, deletes=[], inserts=[(3, "a", None)], updates=[])


_ROW = st.tuples(
    st.integers(0, 9),
    st.sampled_from(["a", "b"]),
    st.one_of(st.none(), st.integers(-5, 5)),
)


@given(
    st.lists(_ROW, min_size=0, max_size=6, unique_by=lambda r: r[0]),
    st.lists(st.integers(0, 9), max_size=4, unique=True),
    st.lists(_ROW, min_size=0, max_size=3, unique_by=lambda r: r[0]),
    st.lists(_ROW, min_size=0, max_size=3, unique_by=lambda r: r[0]),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_minmax_property_equals_rebuild(spark, base, deletes, inserts, updates):
    _apply(spark, base, deletes, inserts, updates)


# -- second moments (avg/var family) ----------------------------------------


def _apply_moments(spark, base_rows, deletes, inserts, updates):
    from dbt_omnata_push_spark.ops.ivm import apply_cdc_moments, build_agg2

    base = {r[0]: r for r in base_rows}
    changes = []
    for k in deletes:
        if k in base:
            changes.append((*base[k], "delete"))
            del base[k]
    for row in inserts:
        if row[0] not in base:
            base[row[0]] = row
            changes.append((*row, "insert"))
    for row in updates:
        if row[0] in base and base[row[0]] != row:
            changes.append((*base[row[0]], "update_preimage"))
            changes.append((*row, "update_postimage"))
            base[row[0]] = row
    agg0 = build_agg2(_df(spark, base_rows), ["g"], ["v"])
    ch = (
        spark.createDataFrame(changes, SCHEMA + ", change_type string")
        if changes
        else spark.createDataFrame([], SCHEMA + ", change_type string")
    )
    got = apply_cdc_moments(agg0, ch, ["g"], ["v"])
    want = build_agg2(_df(spark, list(base.values())), ["g"], ["v"])
    key = lambda df: {  # noqa: E731
        (r["g"], r["n_rows"], r["sum_v"], r["sumsq_v"], r["nn_v"])
        for r in df.collect()
    }
    assert key(got) == key(want)


def test_moments_delete_maintains_exactly(spark):
    base = [(1, "a", 10), (2, "a", -5), (3, "b", 7)]
    _apply_moments(spark, base, deletes=[1], inserts=[(4, "a", 2)], updates=[(2, "a", 6)])
    _apply_moments(spark, base, deletes=[3], inserts=[], updates=[])  # group death
    _apply_moments(spark, [(1, "a", None)], deletes=[], inserts=[(2, "a", 3)], updates=[])


@given(
    st.lists(_ROW, min_size=0, max_size=6, unique_by=lambda r: r[0]),
    st.lists(st.integers(0, 9), max_size=4, unique=True),
    st.lists(_ROW, min_size=0, max_size=3, unique_by=lambda r: r[0]),
    st.lists(_ROW, min_size=0, max_size=3, unique_by=lambda r: r[0]),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_moments_property_equals_rebuild(spark, base, deletes, inserts, updates):
    _apply_moments(spark, base, deletes, inserts, updates)


def test_rollup_from_finer_preserves_sum_null_semantics(spark):
    """Daily derived from hourly must equal daily built from raw —
    including the SUM-NULL edge (a day whose every measure is NULL)."""
    from dbt_omnata_push_spark.ops.ivm import build_agg, rollup_from_finer

    rows = [
        ("a", "d1h1", 5), ("a", "d1h2", None), ("a", "d1h2", 7),
        ("b", "d1h1", None), ("b", "d1h2", None),  # all-NULL day for b
        ("a", "d2h1", 3),
    ]
    df = spark.createDataFrame(rows, "g string, hour string, v long")
    df = df.withColumn("day", F.substring("hour", 1, 2))
    hourly = build_agg(df, ["g", "hour"], ["v"]).withColumn(
        "day", F.substring("hour", 1, 2)
    )
    daily = rollup_from_finer(hourly, ["g", "day"], ["v"])
    direct = build_agg(df, ["g", "day"], ["v"])
    got = sorted(
        (r["g"], r["day"], r["n_rows"], r["sum_v"], r["nn_v"])
        for r in daily.collect()
    )
    want = sorted(
        (r["g"], r["day"], r["n_rows"], r["sum_v"], r["nn_v"])
        for r in direct.collect()
    )
    assert got == want
    by = {(g, d): s for g, d, _, s, _ in got}
    assert by[("b", "d1")] is None  # all-NULL day stays NULL, not 0
    assert by[("a", "d1")] == 12


def test_same_batch_insert_then_null_update_recomputes(spark):
    """Regression (hypothesis-found): a group born in the batch whose
    only non-null value is inserted and immediately update-deleted in
    the SAME CDC window must recompute to NULL extremes, not keep the
    folded insert value."""
    from dbt_omnata_push_spark.ops.ivm import apply_cdc_minmax, build_minmax

    empty = spark.createDataFrame([], "k long, g string, v long")
    agg = build_minmax(empty, ["g"], ["v"])
    changes = spark.createDataFrame(
        [
            (0, "a", 0, "insert"),
            (0, "a", 0, "update_preimage"),
            (0, "a", None, "update_postimage"),
        ],
        "k long, g string, v long, change_type string",
    )
    base_new = spark.createDataFrame([(0, "a", None)], "k long, g string, v long")
    got = apply_cdc_minmax(agg, changes, base_new, ["g"], ["v"]).collect()
    assert [(r["g"], r["n_rows"], r["min_v"], r["max_v"]) for r in got] == [
        ("a", 1, None, None)
    ]
