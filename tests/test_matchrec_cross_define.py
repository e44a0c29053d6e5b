"""Cross-symbol DEFINE navigation + ORDER BY DESC (r13, VERDICT r12
#5/#6): FIRST(sym.col)/LAST(sym.col) in DEFINE evaluate over the rows
mapped so far in the CURRENT match attempt (current row tentatively
included — SQL:2016 running semantics), driven through the operator's
condition-aware NFA scan. The vectorized pre-pass path (no navigation)
must be byte-identical to before, so both paths are cross-checked on
the same input."""

from __future__ import annotations

import pytest

from dbt_omnata_push_spark.ops.matchrec import match_recognize


def _ticks(spark):
    # g=1: 10 8 6 9 12 | g=2: 5 4 6 | g=3: 3 (single row)
    return spark.createDataFrame(
        [
            (1, 1, 10.0),
            (1, 2, 8.0),
            (1, 3, 6.0),
            (1, 4, 9.0),
            (1, 5, 12.0),
            (2, 1, 5.0),
            (2, 2, 4.0),
            (2, 3, 6.0),
            (3, 1, 3.0),
        ],
        "g int, seq int, price double",
    )


MEAS = {"s": "first(seq)", "e": "last(seq)", "n": "count()"}


class TestCrossSymbolDefine:
    def test_first_of_other_symbol(self, spark):
        out = match_recognize(
            _ticks(spark),
            ["g"],
            ["seq"],
            defines={"A": "True", "B": "price > __mrfirst__A__price"},
            pattern="A B+",
            measures=MEAS,
        ).collect()
        rows = sorted((r.g, r.s, r.e, r.n) for r in out)
        # g=1: only the A at seq3 (6) gets B rows (9, 12); g=2: A at
        # seq2 (4) gets B row 6; g=3: no B+ possible
        assert rows == [(1, 3, 5, 3), (2, 2, 3, 2)]

    def test_last_navigation_monotone_climb(self, spark):
        # B must strictly exceed the LAST B so far (or A when no B
        # yet): a strictly-increasing run seeded by any row
        out = match_recognize(
            _ticks(spark),
            ["g"],
            ["seq"],
            defines={
                "A": "True",
                "B": "price > __mrlast__B__price",
            },
            pattern="A B{2,}",
            measures=MEAS,
        ).collect()
        rows = sorted((r.g, r.s, r.e, r.n) for r in out)
        # SQL:2016: evaluating B at the current row maps the row to B
        # first, so LAST(B.price) is the CURRENT price — price > price
        # is always false and B can never match. Snowflake's classic
        # formulation needs PREV for the running comparison; this test
        # pins the running-includes-current-row semantics.
        assert rows == []

    def test_unqualified_first_is_match_start(self, spark):
        # climb of >= 1.5x the match's first row
        out = match_recognize(
            _ticks(spark),
            ["g"],
            ["seq"],
            defines={
                "S": "True",
                "U": "price >= 1.5 * __mrfirst____price",
            },
            pattern="S U",
            measures=MEAS,
        ).collect()
        rows = sorted((r.g, r.s, r.e, r.n) for r in out)
        # g=1: S at seq3 (6) -> U seq4 (9 >= 9) matches; scan resumes
        # past the match. g=2: S at seq2 (4) -> U seq3 (6 >= 6).
        assert rows == [(1, 3, 4, 2), (2, 2, 3, 2)]

    def test_all_rows_and_classifier_from_nfa_path(self, spark):
        out = match_recognize(
            _ticks(spark),
            ["g"],
            ["seq"],
            defines={"A": "True", "B": "price > __mrfirst__A__price"},
            pattern="A B+",
            measures={"cls": "classifier()", "mn": "match_number()"},
            rows_per_match="all",
        ).collect()
        got = sorted((r.g, r.seq, r.cls, r.mn) for r in out)
        assert got == [
            (1, 3, "A", 1),
            (1, 4, "B", 1),
            (1, 5, "B", 1),
            (2, 2, "A", 1),
            (2, 3, "B", 1),
        ]

    def test_skip_next_row_overlapping(self, spark):
        out = match_recognize(
            _ticks(spark),
            ["g"],
            ["seq"],
            defines={"A": "True", "B": "price > __mrfirst__A__price"},
            pattern="A B",
            measures=MEAS,
            skip="next_row",
        ).collect()
        rows = sorted((r.g, r.s, r.e) for r in out)
        # every adjacent pair with rise: g=1 (3,4),(4,5); g=2 (2,3)
        assert rows == [(1, 3, 4), (1, 4, 5), (2, 2, 3)]

    def test_mixed_vectorized_and_conditional_symbols(self, spark):
        # D is vectorized (prev), B is conditional — both in one
        # pattern through the NFA scan
        out = match_recognize(
            _ticks(spark),
            ["g"],
            ["seq"],
            defines={
                "D": "price < prev_price",
                "B": "price > __mrfirst__D__price",
            },
            pattern="D+ B+",
            measures=MEAS,
        ).collect()
        rows = sorted((r.g, r.s, r.e, r.n) for r in out)
        # g=1: D run seq2(8),seq3(6); B needs > FIRST(D)=8 -> seq4=9
        #  yes, seq5=12 yes -> match 2..5. g=2: D seq2(4), B seq3
        #  (6 > 4) -> match 2..3.
        assert rows == [(1, 2, 5, 4), (2, 2, 3, 2)]

    def test_validation_unknown_column_or_symbol(self, spark):
        with pytest.raises(ValueError, match="unknown.*column"):
            match_recognize(
                _ticks(spark),
                ["g"],
                ["seq"],
                defines={"A": "True", "B": "__mrfirst__A__nope > 1"},
                pattern="A B",
                measures=MEAS,
            )
        with pytest.raises(ValueError, match="undefined.*symbol"):
            match_recognize(
                _ticks(spark),
                ["g"],
                ["seq"],
                defines={"A": "True", "B": "__mrfirst__Z__price > 1"},
                pattern="A B",
                measures=MEAS,
            )


class TestOrderByDesc:
    def test_desc_direction(self, spark):
        out = match_recognize(
            _ticks(spark),
            ["g"],
            ["seq DESC"],
            defines={"D": "price < prev_price"},
            pattern="D+",
            measures=MEAS,
        ).collect()
        rows = sorted((r.g, r.s, r.e, r.n) for r in out)
        # g=1 desc prices 12,9,6,8,10: D at seq4 (9<12), seq3 (6<9);
        # then seq2 (8>6) breaks; no later run. g=2 desc 6,4,5: D at
        # seq2 only.
        assert rows == [(1, 4, 3, 2), (2, 2, 2, 1)]

    def test_desc_equals_asc_on_reversed_data(self, spark):
        # matching DESC on seq is identical to matching ASC on -seq
        import pyspark.sql.functions as F

        base = _ticks(spark)
        d1 = match_recognize(
            base,
            ["g"],
            ["seq DESC"],
            defines={"D": "price < prev_price"},
            pattern="D{2}",
            measures={"s": "first(seq)", "e": "last(seq)"},
        )
        d2 = match_recognize(
            base.withColumn("negseq", -F.col("seq")),
            ["g"],
            ["negseq"],
            defines={"D": "price < prev_price"},
            pattern="D{2}",
            measures={"s": "first(seq)", "e": "last(seq)"},
        )
        r1 = sorted((r.g, r.s, r.e) for r in d1.collect())
        r2 = sorted((r.g, r.s, r.e) for r in d2.collect())
        assert r1 == r2 and r1  # non-empty and identical
