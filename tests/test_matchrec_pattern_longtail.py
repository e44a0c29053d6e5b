"""MATCH_RECOGNIZE pattern long-tail (r12, VERDICT r11 missing #3):
``^`` / ``$`` partition anchors, ``PERMUTE(...)`` orderings, and
``{- ... -}`` output exclusion — on the regex-compiled matcher with
classification replay (ops/matchrec.py)."""
from __future__ import annotations

import pytest

from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.store import TableStore
from dbt_omnata_push_spark.ops.matchrec import match_recognize


def _df(spark):
    # g=1: prices 10 8 6 9 12 11 13 (D at 2,3,6; U at 4,5,7)
    # g=2: prices 5 4 6            (D at 2; U at 3)
    return spark.createDataFrame(
        [
            (1, 1, 10.0),
            (1, 2, 8.0),
            (1, 3, 6.0),
            (1, 4, 9.0),
            (1, 5, 12.0),
            (1, 6, 11.0),
            (1, 7, 13.0),
            (2, 1, 5.0),
            (2, 2, 4.0),
            (2, 3, 6.0),
        ],
        "g int, seq int, price double",
    )


DEFINES = {
    "A": "price >= 0",  # any row
    "D": "price < prev_price",
    "U": "price > prev_price",
}


class TestAnchors:
    def test_start_anchor_restricts_to_partition_head(self, spark):
        # A{2} matches any two rows; anchored, only the first two
        out = match_recognize(
            _df(spark),
            ["g"],
            ["seq"],
            defines=DEFINES,
            pattern="^ A{2}",
            measures={"s": "first(seq)", "e": "last(seq)"},
        )
        got = sorted((r["g"], r["s"], r["e"]) for r in out.collect())
        assert got == [(1, 1, 2), (2, 1, 2)]

    def test_end_anchor_restricts_to_partition_tail(self, spark):
        out = match_recognize(
            _df(spark),
            ["g"],
            ["seq"],
            defines=DEFINES,
            pattern="A{2} $",
            measures={"s": "first(seq)", "e": "last(seq)"},
        )
        got = sorted((r["g"], r["s"], r["e"]) for r in out.collect())
        assert got == [(1, 6, 7), (2, 2, 3)]

    def test_both_anchors_whole_partition(self, spark):
        out = match_recognize(
            _df(spark),
            ["g"],
            ["seq"],
            defines=DEFINES,
            pattern="^ A+ $",
            measures={"n": "count()"},
        )
        got = sorted((r["g"], r["n"]) for r in out.collect())
        assert got == [(1, 7), (2, 3)]

    def test_quantified_anchor_raises(self, spark):
        with pytest.raises(ValueError, match="anchor"):
            match_recognize(
                _df(spark),
                ["g"],
                ["seq"],
                defines=DEFINES,
                pattern="^+ A",
                measures={"n": "count()"},
            )


class TestPermute:
    def test_permute_two(self, spark):
        # D U in either order; g=1 seq 3..4 is D then U; seq 5..6 is
        # U then D — PERMUTE finds both shapes
        out = match_recognize(
            _df(spark),
            ["g"],
            ["seq"],
            defines={"D": "price < prev_price", "U": "price > prev_price"},
            pattern="PERMUTE(D, U)",
            measures={
                "s": "first(seq)",
                "c1": "classifier()",
            },
        )
        got = sorted((r["g"], r["s"]) for r in out.collect())
        # g=1: (2,3)=DD no, matches: 3..4 D,U; 5..6 U,D; g=2: 2..3 D,U
        assert got == [(1, 3), (1, 5), (2, 2)]

    def test_permute_preference_order(self, spark):
        # both orderings possible on an ambiguous row-pair: the listed
        # (lexicographic) order wins — X before Y
        df = spark.createDataFrame(
            [(1, 1, 5.0), (1, 2, 5.0)], "g int, seq int, price double"
        )
        out = match_recognize(
            df,
            ["g"],
            ["seq"],
            defines={"X": "price >= 0", "Y": "price >= 0"},
            pattern="PERMUTE(X, Y)",
            measures={"last_sym": "classifier()"},
        )
        assert [r["last_sym"] for r in out.collect()] == ["Y"]

    def test_permute_arity_cap(self, spark):
        with pytest.raises(ValueError, match="at most 5"):
            match_recognize(
                _df(spark),
                ["g"],
                ["seq"],
                defines={f"S{i}": "price >= 0" for i in range(6)},
                pattern="PERMUTE(S0, S1, S2, S3, S4, S5)",
                measures={"n": "count()"},
            )


class TestExclusion:
    def test_excluded_rows_leave_all_rows_output(self, spark):
        # V-shape, down leg excluded from output; measures still see it
        out = match_recognize(
            _df(spark),
            ["g"],
            ["seq"],
            defines={"D": "price < prev_price", "U": "price > prev_price"},
            pattern="{- D+ -} U+",
            rows_per_match="all",
            measures={"nd": "final count(D)", "n": "final count()"},
        )
        rows = sorted(
            (r["g"], r["seq"], r["nd"], r["n"]) for r in out.collect()
        )
        # g=1 match 1 spans seq 2..5 (D D U U): output only 4,5 but
        # count(D)=2 and count()=4; match 2 spans 6..7: output 7
        assert rows == [
            (1, 4, 2, 4),
            (1, 5, 2, 4),
            (1, 7, 1, 2),
            (2, 3, 1, 2),
        ]

    def test_exclusion_does_not_change_one_row_output(self, spark):
        base = dict(
            partition_by=["g"],
            order_by=["seq"],
            defines={"D": "price < prev_price", "U": "price > prev_price"},
            measures={"s": "first(seq)", "e": "last(seq)"},
        )
        plain = match_recognize(_df(spark), pattern="D+ U+", **base)
        excl = match_recognize(_df(spark), pattern="{- D+ -} U+", **base)
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, excl.collect())
        )

    def test_exclusion_through_sql_surface(self, spark, tmp_path):
        engine = Engine(spark, TableStore(str(tmp_path / "store")))
        engine.query(
            "create table ticks as "
            "select 1 as g, 1 as seq, 10.0 as price "
            "union all select 1, 2, 8.0 "
            "union all select 1, 3, 9.0 "
            "union all select 1, 4, 12.0"
        )
        df = engine.query(
            """
            select g, seq, n from ticks match_recognize (
                partition by g
                order by seq
                measures final count(*) as n
                all rows per match
                pattern ({- D -} U+)
                define D as price < prev(price),
                       U as price > prev(price)
            )
            """
        )
        got = sorted((r["g"], r["seq"], r["n"]) for r in df.collect())
        assert got == [(1, 3, 3), (1, 4, 3)]
