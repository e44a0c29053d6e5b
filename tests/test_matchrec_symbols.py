"""Symbol-qualified measure references in MATCH_RECOGNIZE (r12,
VERDICT r11 #4): ``first(A.price)`` / ``last`` / ``sum`` / ``avg`` /
``min`` / ``max`` / ``count`` evaluate over only the rows the match
classified as the symbol — Snowflake's per-symbol row mask — with NULL
(count: 0) for a match that mapped no row to the symbol, and RUNNING
variants NULL before the symbol's first row. DEFINE conditions may
navigate other symbols' rows with FIRST/LAST (r13); other qualified
forms still raise."""
from __future__ import annotations

import math

import pytest

from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.store import TableStore
from dbt_omnata_push_spark.ops.matchrec import match_recognize


def _df(spark):
    # g=1: D(8) D(6) U(9) U(12) | D(11) U(13); g=2: D(4) U(6)
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


DEFINES = {"D": "price < prev_price", "U": "price > prev_price"}


class TestQualifiedFinal:
    def test_first_last_per_symbol(self, spark):
        out = match_recognize(
            _df(spark),
            ["g"],
            ["seq"],
            defines=DEFINES,
            pattern="D+ U+",
            measures={
                "s": "first(seq)",
                "fd": "first(D.price)",
                "ld": "last(D.price)",
                "fu": "first(U.price)",
                "lu": "last(U.price)",
            },
        )
        got = sorted(
            (r["g"], r["s"], r["fd"], r["ld"], r["fu"], r["lu"])
            for r in out.collect()
        )
        assert got == [
            (1, 2, 8.0, 6.0, 9.0, 12.0),
            (1, 6, 11.0, 11.0, 13.0, 13.0),
            (2, 2, 4.0, 4.0, 6.0, 6.0),
        ]

    def test_aggregates_per_symbol(self, spark):
        out = match_recognize(
            _df(spark),
            ["g"],
            ["seq"],
            defines=DEFINES,
            pattern="D+ U+",
            measures={
                "s": "first(seq)",
                "sd": "sum(D.price)",
                "ad": "avg(D.price)",
                "mu": "min(U.price)",
                "xu": "max(U.price)",
                "cd": "count(D.price)",
            },
        )
        got = sorted(
            (r["g"], r["s"], r["sd"], r["ad"], r["mu"], r["xu"], r["cd"])
            for r in out.collect()
        )
        assert got == [
            (1, 2, 14.0, 7.0, 9.0, 12.0, 2),
            (1, 6, 11.0, 11.0, 13.0, 13.0, 1),
            (2, 2, 4.0, 4.0, 6.0, 6.0, 1),
        ]

    def test_symbol_with_no_rows_yields_null(self, spark):
        # pattern only uses D; U is defined but never mapped
        out = match_recognize(
            _df(spark),
            ["g"],
            ["seq"],
            defines=DEFINES,
            pattern="D{2}",
            measures={
                "s": "first(seq)",
                "fu": "first(U.price)",
                "su": "sum(U.price)",
                "cu": "count(U.price)",
            },
        )
        rows = out.collect()
        assert rows, "g=1 has a D D run (8, 6)"
        for r in rows:
            assert r["fu"] is None
            assert r["su"] is None
            assert r["cu"] == 0

    def test_case_insensitive_symbol(self, spark):
        out = match_recognize(
            _df(spark),
            ["g"],
            ["seq"],
            defines=DEFINES,
            pattern="D+ U+",
            measures={"fd": "first(d.price)"},
        )
        assert {r["fd"] for r in out.collect()} == {8.0, 11.0, 4.0}

    def test_unknown_symbol_raises(self, spark):
        with pytest.raises(ValueError, match="unknown symbol"):
            match_recognize(
                _df(spark),
                ["g"],
                ["seq"],
                defines=DEFINES,
                pattern="D+ U+",
                measures={"x": "first(Z.price)"},
            )


class TestQualifiedRunning:
    def test_running_per_symbol(self, spark):
        out = match_recognize(
            _df(spark),
            ["g"],
            ["seq"],
            defines=DEFINES,
            pattern="D+ U+",
            rows_per_match="all",
            measures={
                "rl": "last(D.price)",
                "rs": "sum(U.price)",
                "rf": "first(U.price)",
                "rc": "count(U.price)",
            },
        )
        rows = {
            (r["g"], r["seq"]): (r["rl"], r["rs"], r["rf"], r["rc"])
            for r in out.collect()
        }
        # g=1 match 1 spans seq 2..5: D D U U
        assert rows[(1, 2)] == (8.0, None, None, 0)
        assert rows[(1, 3)] == (6.0, None, None, 0)
        assert rows[(1, 4)] == (6.0, 9.0, 9.0, 1)
        assert rows[(1, 5)] == (6.0, 21.0, 9.0, 2)
        # g=1 match 2 spans seq 6..7: D U
        assert rows[(1, 6)] == (11.0, None, None, 0)
        assert rows[(1, 7)] == (11.0, 13.0, 13.0, 1)

    def test_final_prefix_overrides_running(self, spark):
        out = match_recognize(
            _df(spark),
            ["g"],
            ["seq"],
            defines=DEFINES,
            pattern="D+ U+",
            rows_per_match="all",
            measures={"fs": "final sum(D.price)"},
        )
        rows = {(r["g"], r["seq"]): r["fs"] for r in out.collect()}
        assert rows[(1, 2)] == 14.0 and rows[(1, 5)] == 14.0


class TestSqlSurface:
    @pytest.fixture()
    def engine(self, spark, tmp_path):
        eng = Engine(spark, TableStore(str(tmp_path / "store")))
        eng.query(
            "create table ticks as "
            "select 1 as g, 1 as seq, 10.0 as price "
            "union all select 1, 2, 8.0 "
            "union all select 1, 3, 6.0 "
            "union all select 1, 4, 9.0 "
            "union all select 1, 5, 12.0"
        )
        return eng

    def test_qualified_measures_in_sql(self, spark, engine):
        df = engine.query(
            """
            select * from ticks match_recognize (
                partition by g
                order by seq
                measures first(D.price) as fd,
                         last(U . price) as lu,
                         sum(D.price) as sd
                pattern (D+ U+)
                define D as price < prev(price),
                       U as price > prev(price)
            )
            """
        )
        r = df.collect()[0]
        assert (r["fd"], r["lu"], r["sd"]) == (8.0, 12.0, 14.0)

    def test_cross_symbol_define(self, spark, engine):
        """r13 (VERDICT r12 #5): DEFINE may navigate another symbol's
        mapped rows with FIRST/LAST (running over the current match
        attempt). B anchors on the match's A row: the fixture's g=1
        (prices 10,8,6,9,12) only matches from the A at seq 3
        (price 6), with B rows 9 and 12 above it."""
        out = engine.query(
            """
            select g, s, e, n from ticks match_recognize (
                partition by g
                order by seq
                measures first(seq) as s, last(seq) as e,
                         count(*) as n
                pattern (A B+)
                define A as true,
                       B as price > first(A.price)
            )
            """
        )
        rows = sorted(
            (r["g"], r["s"], r["e"], r["n"]) for r in out.collect()
        )
        assert rows == [(1, 3, 5, 3)]

    def test_qualified_define_bare_ref_reads_running_last(
        self, spark, engine
    ):
        """r14: a bare symbol-qualified reference in DEFINE reads
        SQL:2016's running LAST of that symbol — ``U AS price >
        D.price`` must behave exactly like ``LAST(D.price)``; a
        qualifier that is NOT a defined symbol still raises."""
        q = """
            select * from ticks match_recognize (
                partition by g
                order by seq
                measures count(*) as n
                pattern (D U)
                define D as price < prev(price),
                       U as price > {ref}
            )
        """
        bare = sorted(map(tuple, engine.query(q.format(ref="D.price")).collect()))
        nav = sorted(
            map(tuple, engine.query(q.format(ref="last(D.price)")).collect())
        )
        assert bare == nav
        with pytest.raises(ValueError, match="defined pattern symbol"):
            engine.query(q.format(ref="zzz.price"))
