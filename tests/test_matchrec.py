"""MATCH_RECOGNIZE-lite (round 9, ops/matchrec.py): row-pattern
matching as a distributed applyInPandas operator. Snowflake semantics
for the supported subset: ONE ROW PER MATCH, AFTER MATCH SKIP PAST LAST
ROW (non-overlapping leftmost-greedy), mutually-exclusive DEFINE
symbols, measures first/last/count/count(SYM)/match_number."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_omnata_push_spark.ops.matchrec import match_recognize


def _df(spark):
    return spark.createDataFrame(
        [
            (1, 1, 10.0, "a"),
            (1, 2, 8.0, "b"),
            (1, 3, 6.0, "a"),
            (1, 4, 9.0, "b"),
            (1, 5, 12.0, "a"),
            (1, 6, 11.0, "a"),
            (1, 7, 13.0, "b"),
            (2, 1, 5.0, "a"),
            (2, 2, 4.0, "a"),
            (2, 3, 6.0, "b"),
        ],
        "g int, seq int, price double, tag string",
    )


class TestMatchRecognize:
    def test_vshape_matches(self, spark):
        out = match_recognize(
            _df(spark),
            ["g"],
            ["seq"],
            defines={"D": "price < prev_price", "U": "price > prev_price"},
            pattern="D+ U+",
            measures={
                "s": "first(seq)",
                "e": "last(seq)",
                "n": "count()",
                "nd": "count(D)",
                "mn": "match_number()",
            },
        )
        got = sorted(
            (r["g"], r["s"], r["e"], r["n"], r["nd"], r["mn"])
            for r in out.collect()
        )
        assert got == [
            (1, 2, 5, 4, 2, 1),
            (1, 6, 7, 2, 1, 2),
            (2, 2, 3, 2, 1, 1),
        ]

    def test_single_symbol_runs(self, spark):
        out = match_recognize(
            _df(spark),
            ["g"],
            ["seq"],
            defines={"A": "tag == 'a'"},
            pattern="A+",
            measures={"s": "first(seq)", "n": "count()"},
        )
        got = sorted((r["g"], r["s"], r["n"]) for r in out.collect())
        assert got == [(1, 1, 1), (1, 3, 1), (1, 5, 2), (2, 1, 2)]

    def test_alternation_and_optional(self, spark):
        # H = run head (no prior row or rising); pattern H U? finds a
        # head optionally followed by one rising row
        out = match_recognize(
            _df(spark),
            ["g"],
            ["seq"],
            defines={
                "H": "prev_price.isnull()",
                "U": "price > prev_price",
            },
            pattern="H U?",
            measures={"n": "count()"},
        )
        got = sorted((r["g"], r["n"]) for r in out.collect())
        assert got == [(1, 1), (2, 1)]  # both heads followed by a fall

    def test_next_columns_available(self, spark):
        out = match_recognize(
            _df(spark),
            ["g"],
            ["seq"],
            defines={"P": "next_price > price"},
            pattern="P",
            measures={"s": "first(seq)"},
        )
        # rows whose NEXT value rises (peaks-to-be): per group
        got = sorted((r["g"], r["s"]) for r in out.collect())
        assert got == [(1, 3), (1, 4), (1, 6), (2, 2)]

    def test_overlapping_defines_match_like_snowflake(self, spark):
        """r10: DEFINEs may overlap — the pattern automaton decides the
        per-row symbol, not a mutual-exclusivity precondition. A = any
        row, B = a-tagged row: 'A B' is any row followed by an a-row,
        leftmost non-overlapping."""
        out = match_recognize(
            _df(spark),
            ["g"],
            ["seq"],
            defines={"A": "price > 0", "B": "tag == 'a'"},
            pattern="A B",
            measures={"s": "first(seq)", "e": "last(seq)"},
        )
        got = sorted((r["g"], r["s"], r["e"]) for r in out.collect())
        assert got == [(1, 2, 3), (1, 4, 5), (2, 1, 2)]

    def test_classifier_and_symbol_counts_with_overlap(self, spark):
        """B anchors on an a-row, greedy A* (any row) consumes the rest;
        CLASSIFIER() under ONE ROW PER MATCH is the last row's symbol."""
        out = match_recognize(
            _df(spark),
            ["g"],
            ["seq"],
            defines={"A": "price > 0", "B": "tag == 'a'"},
            pattern="B A*",
            measures={
                "s": "first(seq)",
                "e": "last(seq)",
                "na": "count(A)",
                "nb": "count(B)",
                "cls": "classifier()",
            },
        )
        got = sorted(
            (r["g"], r["s"], r["e"], r["na"], r["nb"], r["cls"])
            for r in out.collect()
        )
        assert got == [(1, 1, 7, 6, 1, "A"), (2, 1, 3, 2, 1, "A")]

    def test_all_rows_per_match_with_classifier(self, spark):
        out = match_recognize(
            _df(spark),
            ["g"],
            ["seq"],
            defines={"D": "price < prev_price", "U": "price > prev_price"},
            pattern="D+ U+",
            measures={"mn": "match_number()", "cls": "classifier()"},
            rows_per_match="all",
        )
        got = sorted(
            (r["g"], r["seq"], r["mn"], r["cls"]) for r in out.collect()
        )
        assert got == [
            (1, 2, 1, "D"),
            (1, 3, 1, "D"),
            (1, 4, 1, "U"),
            (1, 5, 1, "U"),
            (1, 6, 2, "D"),
            (1, 7, 2, "U"),
            (2, 2, 1, "D"),
            (2, 3, 1, "U"),
        ]
        # original columns survive in all-rows mode
        cols = out.columns
        assert {"g", "seq", "price", "tag"} <= set(cols)

    def test_bounded_quantifier(self, spark):
        out = match_recognize(
            _df(spark),
            ["g"],
            ["seq"],
            defines={"D": "price < prev_price", "U": "price > prev_price"},
            pattern="D{2} U+",
            measures={"s": "first(seq)", "e": "last(seq)"},
        )
        got = sorted((r["g"], r["s"], r["e"]) for r in out.collect())
        assert got == [(1, 2, 5)]

    def test_at_least_quantifier(self, spark):
        out = match_recognize(
            _df(spark),
            ["g"],
            ["seq"],
            defines={"D": "price < prev_price", "U": "price > prev_price"},
            pattern="D{1,} U{1,1}",
            measures={"s": "first(seq)", "e": "last(seq)", "n": "count()"},
        )
        got = sorted((r["g"], r["s"], r["e"], r["n"]) for r in out.collect())
        assert got == [(1, 2, 4, 3), (1, 6, 7, 2), (2, 2, 3, 2)]

    def test_undefined_symbol_raises(self, spark):
        with pytest.raises(ValueError, match="undefined symbol"):
            match_recognize(
                _df(spark),
                ["g"],
                ["seq"],
                defines={"A": "price > 0"},
                pattern="A X",
                measures={"n": "count()"},
            )

    def test_unsupported_measure_raises(self, spark):
        # sum/avg/min/max became supported in r11; stddev stays out
        with pytest.raises(ValueError, match="MEASURE"):
            match_recognize(
                _df(spark),
                ["g"],
                ["seq"],
                defines={"A": "price > 0"},
                pattern="A",
                measures={"n": "stddev(price)"},
            )

    def test_no_matches_yields_empty_frame(self, spark):
        out = match_recognize(
            _df(spark),
            ["g"],
            ["seq"],
            defines={"Z": "price > 1000"},
            pattern="Z+",
            measures={"n": "count()"},
        )
        assert out.count() == 0
        assert out.columns == ["g", "n"]


class TestRunningFinalSemantics:
    """r11 (VERDICT r10 #4): under ALL ROWS PER MATCH, measures default
    to Snowflake's RUNNING semantics; an explicit final prefix opts
    out. Under ONE ROW PER MATCH both coincide."""

    def test_all_rows_running_defaults(self, spark):
        out = match_recognize(
            _df(spark),
            ["g"],
            ["seq"],
            defines={"D": "price < prev_price", "U": "price > prev_price"},
            pattern="D+ U+",
            measures={
                "rc": "count()",           # running by default
                "rl": "last(price)",       # running last = current row
                "fc": "final count()",
                "fl": "final last(price)",
                "nd": "count(D)",          # running count(D)
            },
            rows_per_match="all",
        )
        rows = sorted(
            (r["g"], r["seq"], r["rc"], r["rl"], r["fc"], r["fl"], r["nd"])
            for r in out.collect()
        )
        # g=1 first V (greedy): prices 10>8>6<9<12 -> D on seq 2,3 and
        # U on seq 4,5 -> span seq 2..5
        g1 = [r for r in rows if r[0] == 1 and r[1] in (2, 3, 4, 5)]
        assert g1 == [
            (1, 2, 1, 8.0, 4, 12.0, 1),
            (1, 3, 2, 6.0, 4, 12.0, 2),
            (1, 4, 3, 9.0, 4, 12.0, 2),
            (1, 5, 4, 12.0, 4, 12.0, 2),
        ]

    def test_one_row_running_equals_final(self, spark):
        out = match_recognize(
            _df(spark),
            ["g"],
            ["seq"],
            defines={"D": "price < prev_price", "U": "price > prev_price"},
            pattern="D+ U+",
            measures={"rc": "running count()", "fc": "final count()"},
        )
        for r in out.collect():
            assert r["rc"] == r["fc"]


class TestAfterMatchSkip:
    def _runs_df(self, spark):
        # prices: 9 8 7 6 10 -> one long D-run then U
        return spark.createDataFrame(
            [(1, i + 1, p) for i, p in enumerate(
                [9.0, 8.0, 7.0, 6.0, 10.0]
            )],
            "g int, seq int, price double",
        )

    def test_skip_next_row_overlapping(self, spark):
        # D{2} with skip-to-next-row: D-runs at rows 2,3,4 give
        # matches (2,3) and (3,4) — overlapping.
        out = match_recognize(
            self._runs_df(spark),
            ["g"],
            ["seq"],
            defines={"D": "price < prev_price"},
            pattern="D{2}",
            measures={"s": "first(seq)", "e": "last(seq)"},
            skip="next_row",
        )
        got = sorted((r["s"], r["e"]) for r in out.collect())
        assert got == [(2, 3), (3, 4)]

    def test_skip_past_last_non_overlapping(self, spark):
        out = match_recognize(
            self._runs_df(spark),
            ["g"],
            ["seq"],
            defines={"D": "price < prev_price"},
            pattern="D{2}",
            measures={"s": "first(seq)", "e": "last(seq)"},
            skip="past_last",
        )
        assert sorted((r["s"], r["e"]) for r in out.collect()) == [(2, 3)]

    def test_skip_to_last_symbol(self, spark):
        # W-shape: D+ U+ then D+ U+ again; skip to LAST U lets the
        # second V start AT the first V's peak.
        df = spark.createDataFrame(
            [(1, i + 1, p) for i, p in enumerate(
                [10.0, 7.0, 11.0, 8.0, 12.0]
            )],
            "g int, seq int, price double",
        )
        out = match_recognize(
            df,
            ["g"],
            ["seq"],
            defines={"D": "price < prev_price", "U": "price > prev_price"},
            pattern="D+ U+",
            measures={"s": "first(seq)", "e": "last(seq)"},
            skip=("last", "U"),
        )
        # With past_last the second V (4,5) is unreachable: row 4 (D)
        # needs prev row 3. With skip-to-last-U the scan resumes AT
        # row 3... the V starting there is D(4) U(5).
        got = sorted((r["s"], r["e"]) for r in out.collect())
        assert got == [(2, 3), (4, 5)]

    def test_skip_to_first_row_raises(self, spark):
        df = spark.createDataFrame(
            [(1, 1, 5.0), (1, 2, 4.0)], "g int, seq int, price double"
        )
        out = match_recognize(
            df,
            ["g"],
            ["seq"],
            defines={"D": "price < prev_price"},
            pattern="D",
            measures={"s": "first(seq)"},
            skip=("first", "D"),
        )
        with pytest.raises(Exception, match="first row"):
            out.collect()

    def test_skip_symbol_not_defined_rejected(self, spark):
        with pytest.raises(ValueError, match="skip"):
            match_recognize(
                _df(spark),
                ["g"],
                ["seq"],
                defines={"D": "price < prev_price"},
                pattern="D",
                measures={"s": "first(seq)"},
                skip=("last", "Z"),
            )


class TestAggregateMeasures:
    """r11: SUM/AVG/MIN/MAX over the matched rows, final and running,
    NULL-skipping like SQL aggregates."""

    def test_final_aggregates_one_row(self, spark):
        out = match_recognize(
            _df(spark),
            ["g"],
            ["seq"],
            defines={"D": "price < prev_price", "U": "price > prev_price"},
            pattern="D+ U+",
            measures={
                "tot": "sum(price)",
                "mean": "avg(price)",
                "lo": "min(price)",
                "hi": "max(price)",
            },
        )
        rows = {r["g"]: r for r in out.collect() if r["g"] == 2}
        # g=2 match: prices 4.0 (D), 6.0 (U)
        r = rows[2]
        assert r["tot"] == 10.0 and r["mean"] == 5.0
        assert r["lo"] == 4.0 and r["hi"] == 6.0

    def test_running_aggregates_all_rows(self, spark):
        df = spark.createDataFrame(
            [(1, 1, 10.0), (1, 2, 7.0), (1, 3, 5.0), (1, 4, 9.0)],
            "g int, seq int, price double",
        )
        out = match_recognize(
            df,
            ["g"],
            ["seq"],
            defines={"D": "price < prev_price", "U": "price > prev_price"},
            pattern="D+ U+",
            measures={
                "rs": "sum(price)",
                "ra": "avg(price)",
                "rlo": "min(price)",
                "rhi": "max(price)",
                "fs": "final sum(price)",
            },
            rows_per_match="all",
        )
        got = sorted(
            (r["seq"], r["rs"], r["ra"], r["rlo"], r["rhi"], r["fs"])
            for r in out.collect()
        )
        # match spans seq 2..4 (D,D,U): prices 7, 5, 9
        assert got == [
            (2, 7.0, 7.0, 7.0, 7.0, 21.0),
            (3, 12.0, 6.0, 5.0, 7.0, 21.0),
            (4, 21.0, 7.0, 5.0, 9.0, 21.0),
        ]

    def test_running_skips_nulls(self, spark):
        df = spark.createDataFrame(
            [(1, 1, 1.0, 2.0), (1, 2, 1.0, None), (1, 3, 1.0, 4.0)],
            "g int, seq int, flag double, x double",
        )
        out = match_recognize(
            df,
            ["g"],
            ["seq"],
            defines={"A": "flag == 1.0"},
            pattern="A+",
            measures={"rs": "sum(x)", "rlo": "min(x)"},
            rows_per_match="all",
        )
        got = sorted((r["seq"], r["rs"], r["rlo"]) for r in out.collect())
        # null x at seq 2 leaves the running values unchanged
        assert got == [(1, 2.0, 2.0), (2, 2.0, 2.0), (3, 6.0, 2.0)]

    def test_integral_sum_is_long(self, spark):
        df = spark.createDataFrame(
            [(1, 1, 5), (1, 2, 3)], "g int, seq int, qty int"
        )
        out = match_recognize(
            df,
            ["g"],
            ["seq"],
            defines={"A": "qty > 0"},
            pattern="A+",
            measures={"tot": "sum(qty)"},
        )
        assert dict(out.dtypes)["tot"] == "bigint"
        assert out.collect()[0]["tot"] == 8

    def test_aggregate_unknown_column_rejected(self, spark):
        with pytest.raises(ValueError, match="unknown column"):
            match_recognize(
                _df(spark),
                ["g"],
                ["seq"],
                defines={"D": "price < prev_price"},
                pattern="D",
                measures={"s": "sum(nope)"},
            )


class TestOffsetPrevNext:
    def test_prev_n_offsets(self, spark):
        # D2 = fell vs TWO rows back
        df = spark.createDataFrame(
            [(1, i + 1, p) for i, p in enumerate(
                [10.0, 9.0, 8.0, 11.0, 7.0]
            )],
            "g int, seq int, price double",
        )
        out = match_recognize(
            df,
            ["g"],
            ["seq"],
            defines={"D2": "price < prev2_price"},
            pattern="D2",
            measures={"s": "first(seq)"},
        )
        # price[i] < price[i-2]: seq3 (8<10), seq5 (7<8)
        assert sorted(r["s"] for r in out.collect()) == [3, 5]

    def test_next_n_offsets(self, spark):
        df = spark.createDataFrame(
            [(1, i + 1, p) for i, p in enumerate(
                [1.0, 5.0, 2.0, 9.0]
            )],
            "g int, seq int, price double",
        )
        out = match_recognize(
            df,
            ["g"],
            ["seq"],
            defines={"R2": "next2_price > price"},
            pattern="R2",
            measures={"s": "first(seq)"},
        )
        # price[i+2] > price[i]: seq1 (2>1), seq2 (9>5)
        assert sorted(r["s"] for r in out.collect()) == [1, 2]
