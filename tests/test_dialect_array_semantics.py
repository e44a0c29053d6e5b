"""Randomized semantics check for the r12 Snowflake array signatures
(engine/sqlfront.py second wave): one batched Spark job evaluates the
transpiled expressions over 300 seeded-random rows, and a pure-Python
model of the SNOWFLAKE definitions checks every row — 0-based
NULL-miss ARRAY_POSITION, (element, array) ARRAY_CONTAINS, 0-based
from-inclusive/to-exclusive ARRAY_SLICE, end-exclusive
ARRAY_GENERATE_RANGE, NULL-dropping ARRAY_COMPACT, and the multiset
ARRAY_INTERSECTION."""
from __future__ import annotations

import random

from dbt_omnata_push_spark.engine.sqlfront import transpile


def _model_slice(arr, lo, hi):
    # Python slicing IS the Snowflake definition: 0-based, to-exclusive,
    # negative counts from the end, out-of-range bounds clamp.
    return arr[lo:hi]


def _model_position(elem, arr):
    try:
        return arr.index(elem)
    except ValueError:
        return None


def _model_intersection(a, b):
    from collections import Counter

    cb = Counter(b)
    out = []
    seen: dict = {}
    for x in a:
        seen[x] = seen.get(x, 0) + 1
        if seen[x] <= cb.get(x, 0):
            out.append(x)
    return out


def test_array_signatures_randomized(spark):
    rng = random.Random(20260816)
    rows = []
    for i in range(300):
        n = rng.randint(0, 8)
        arr = [rng.randint(0, 5) for _ in range(n)]
        brr = [rng.randint(0, 5) for _ in range(rng.randint(0, 8))]
        # r13: negative bounds included (Snowflake counts them from the
        # end; the r12 draw was >= 0 only and missed the mixed-sign bug)
        lo = rng.randint(-n - 2, max(n, 1))
        hi = rng.randint(-n - 2, max(n, 1))  # < lo: Snowflake -> []
        elem = rng.randint(0, 6)
        start = rng.randint(-3, 3)
        stop = start + rng.randint(-6, 6)  # may undershoot: -> []
        step = rng.choice([-3, -2, -1, 1, 2, 3])
        rows.append((i, arr, brr, lo, hi, elem, start, stop, step))
    df = spark.createDataFrame(
        rows,
        "id int, arr array<int>, brr array<int>, lo int, hi int, "
        "elem int, start int, stop int, step int",
    )
    df.createOrReplaceTempView("arr_prop_t")
    got = {
        r["id"]: r
        for r in spark.sql(
            transpile(
                "select id, "
                "array_slice(arr, lo, hi) as sl, "
                "array_position(elem, arr) as pos, "
                "array_contains(elem, arr) as has, "
                "array_generate_range(start, stop) as rg, "
                "array_generate_range(start, stop, step) as rgs, "
                "array_intersection(arr, brr) as ai "
                "from arr_prop_t"
            )
        ).collect()
    }
    for i, arr, brr, lo, hi, elem, start, stop, step in rows:
        r = got[i]
        assert r["sl"] == _model_slice(arr, lo, hi), (i, arr, lo, hi)
        assert r["pos"] == _model_position(elem, arr), (i, arr, elem)
        assert r["has"] == (elem in arr)
        assert r["rg"] == list(range(start, stop)), (i, start, stop)
        assert r["rgs"] == list(range(start, stop, step)), (
            i,
            start,
            stop,
            step,
        )
        assert sorted(r["ai"]) == sorted(
            _model_intersection(arr, brr)
        ), (i, arr, brr)
