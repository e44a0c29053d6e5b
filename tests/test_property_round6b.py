"""Property-based tests (hypothesis): round-6b operators against
independent pure-Python references on randomized inputs.

Covers the time-weighted average (vs a direct interval-sum reference),
windowed substring-span dedup (vs a set-based span scan), and both
histograms (vs sorted-slice / direct binning references) — the
oracle suites prove fixed-testdata behavior; these prove the algorithms
under adversarial ties, duplicates, and degenerate ranges.
"""

from __future__ import annotations

import datetime as dt
import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_BASE = dt.datetime(2024, 1, 1)


# --------------------------------------------------------------- tw-avg

# (user, offset_seconds, value-in-cents) — ties in ts deliberate
_EVENT = st.tuples(
    st.integers(0, 2),
    st.integers(0, 500),
    st.integers(0, 10_000),
)


def _ref_tw(rows):
    """Reference: per user, order by (ts, event_id); weight each value
    by micros until the next observation. Mirrors the op's fixed-point
    step float-faithfully: floor(value * 100) in IEEE doubles, because
    cents/100.0*100 can land just below the integer (e.g. 42.43*100 =
    4242.999...) — both engines floor identically, the reference must
    too."""
    import math

    out = {}
    by_user = {}
    for eid, (u, off, cents) in enumerate(rows):
        scaled = math.floor((cents / 100.0) * 100)
        by_user.setdefault(u, []).append((off, eid, scaled))
    for u, obs in by_user.items():
        obs.sort()
        wsum = dsum = 0
        for (o1, _e1, c1), (o2, _e2, _c2) in zip(obs, obs[1:]):
            d_us = (o2 - o1) * 1_000_000
            wsum += c1 * d_us
            dsum += d_us
        if len(obs) >= 2:
            out[u] = (len(obs) - 1, dsum, wsum)
    return out


class TestTimeWeightedAvgProperty:
    @settings(**_SETTINGS)
    @given(st.lists(_EVENT, min_size=0, max_size=30))
    def test_matches_reference(self, spark, rows):
        from pyspark.sql import functions as F

        from dbt_omnata_push_spark.ops.timeseries import time_weighted_avg

        df = spark.createDataFrame(
            [
                (eid, _BASE + dt.timedelta(seconds=off), u, cents / 100.0)
                for eid, (u, off, cents) in enumerate(rows)
            ],
            "event_id bigint, ts timestamp, user_id bigint, value double",
        )
        got = {
            r["user_id"]: (r["n_obs"], r["span_us"])
            for r in time_weighted_avg(
                df, ["user_id"], "ts", "value", "event_id"
            ).collect()
        }
        ref = _ref_tw(rows)
        assert got == {u: (n, d) for u, (n, d, _w) in ref.items()}
        # exact integer identity on the weighted numerator too
        got_num = {
            r["user_id"]: round(r["tw_avg"] * r["span_us"] * 100)
            for r in time_weighted_avg(
                df, ["user_id"], "ts", "value", "event_id"
            ).collect()
            if r["span_us"] > 0
        }
        for u, (_n, d, w) in ref.items():
            if d > 0:
                assert got_num[u] == w, (u, got_num[u], w)


# ------------------------------------------------------------ substring

_TEXT = st.text(alphabet="abXY ", min_size=0, max_size=80)


def _ref_spans(texts, k, stride):
    spans = {}  # doc -> list of gram
    for i, t in enumerate(texts):
        if len(t) < k:
            continue
        spans[i] = [t[p : p + k] for p in range(0, len(t) - k + 1, stride)]
    freq = {}
    for i, gs in spans.items():
        for g in set(gs):
            freq.setdefault(g, set()).add(i)
    out = {}
    for i, gs in spans.items():
        dup = sum(1 for g in gs if len(freq[g]) >= 2)
        if dup:
            out[i] = (len(gs), dup, max(len(freq[g]) for g in gs))
    return out


class TestSubstringSpanProperty:
    @settings(**_SETTINGS)
    @given(st.lists(_TEXT, min_size=0, max_size=8))
    def test_matches_reference(self, spark, texts):
        from dbt_omnata_push_spark.llmops.substr import duplicated_span_stats

        k, stride = 8, 3
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )
        got = {
            r["doc_id"]: (r["total_spans"], r["dup_spans"], r["max_span_docs"])
            for r in duplicated_span_stats(df, k=k, stride=stride).collect()
        }
        assert got == _ref_spans(texts, k, stride)


# ------------------------------------------------------------ histograms


class TestHistogramProperties:
    @settings(**_SETTINGS)
    @given(
        st.lists(
            st.integers(-1000, 1000).map(lambda v: v / 10.0),
            min_size=1,
            max_size=60,
        ),
        st.integers(2, 9),
    )
    def test_value_histogram_matches_reference(self, spark, vals, n_bins):
        from dbt_omnata_push_spark.ops.profile import value_histogram

        df = spark.createDataFrame([(v,) for v in vals], "v double")
        rows = value_histogram(df, "v", n_bins).collect()
        lo, hi = min(vals), max(vals)
        import math

        ref = [0] * n_bins
        for v in vals:
            if hi == lo:
                ref[0] += 1  # degenerate range: everything in bin 0
                continue
            w = (hi - lo) / n_bins
            # the op's float formula exactly: floor((v-lo)/w), clamped
            b = min(max(math.floor((v - lo) / w), 0), n_bins - 1)
            ref[b] += 1
        got = {r["bin"]: r["n"] for r in rows}
        assert len(rows) == n_bins  # dense
        assert sum(got.values()) == len(vals)
        assert [got[i] for i in range(n_bins)] == ref

    @settings(**_SETTINGS)
    @given(
        st.lists(
            st.integers(-50, 50).map(float), min_size=1, max_size=60
        ),
        st.integers(2, 8),
    )
    def test_equidepth_matches_sorted_slices(self, spark, vals, n_buckets):
        from dbt_omnata_push_spark.ops.profile import equidepth_histogram

        df = spark.createDataFrame(
            [(v, i) for i, v in enumerate(vals)], "v double, k long"
        )
        rows = equidepth_histogram(df, "v", n_buckets, "k").collect()
        # reference: sort by (v, k), bucket = ((rn-1)*n) // total
        order = sorted((v, i) for i, v in enumerate(vals))
        total = len(order)
        ref = {}
        for rn0, (v, _i) in enumerate(order):
            b = (rn0 * n_buckets) // total
            lo, hi, n = ref.get(b, (v, v, 0))
            ref[b] = (min(lo, v), max(hi, v), n + 1)
        got = {r["bucket"]: (r["lo"], r["hi"], r["n"]) for r in rows}
        assert got == ref
