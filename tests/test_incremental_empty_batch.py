"""Empty incremental delta commits NOTHING (r12): a 0-row append or
merge would still cut a new table version, waking every downstream
stream (SYSTEM$STREAM_HAS_DATA compares version pointers) and making
CDC consumers walk a vacuous commit — in Snowflake a 0-row DML leaves
streams silent. The materialization probes isEmpty and skips the
commit; the first (CTAS) run is unaffected."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.model import Model
from dbt_omnata_push_spark.engine.store import TableStore
from dbt_omnata_push_spark.materializations.core import (
    high_watermark_incremental,
)


def _builder(ctx):
    return high_watermark_incremental(ctx, ctx.ref("src"), "d")


@pytest.fixture()
def engine(spark, tmp_path):
    eng = Engine(spark, TableStore(str(tmp_path / "store")))
    eng.seed(
        "src",
        spark.createDataFrame([(1, 1), (2, 2)], "id int, d int"),
    )
    eng.register(
        Model(
            "inc",
            builder=_builder,
            config={"materialized": "incremental"},
            depends_on=["src"],
        )
    )
    return eng


class TestEmptyIncrementalBatch:
    def test_no_new_version_on_empty_delta(self, spark, engine):
        res = engine.run()
        assert res["inc"].status == "success"
        v0 = engine.store.current_version("inc")
        res = engine.run()  # nothing new: watermark filters everything
        assert res["inc"].status == "success"
        assert "no commit" in res["inc"].message
        assert engine.store.current_version("inc") == v0
        assert engine.store.read(spark, "inc").count() == 2

    def test_stream_stays_silent_on_empty_delta(self, spark, engine):
        engine.run()
        engine.query("alter table inc add primary key (id)")
        engine.query("create stream s on table inc")
        engine.run(select=["inc"])  # empty delta
        st = engine.store.streams()["s"]
        assert st["offset"] == engine.store.current_version("inc")

    def test_nonempty_delta_still_commits(self, spark, engine):
        engine.run()
        v0 = engine.store.current_version("inc")
        engine.seed(
            "src",
            spark.createDataFrame(
                [(1, 1), (2, 2), (3, 9)], "id int, d int"
            ),
        )
        res = engine.run(select=["inc"])
        assert res["inc"].status == "success"
        assert engine.store.current_version("inc") == v0 + 1
        assert engine.store.read(spark, "inc").count() == 3

    def test_reseed_is_visible_to_next_run(self, spark, engine):
        """The r12 ref-staleness fix: a re-seed between runs must reach
        the next build (the view cache previously pinned the old
        frame)."""
        engine.run()
        engine.seed(
            "src",
            spark.createDataFrame(
                [(1, 1), (2, 2), (4, 8), (5, 9)], "id int, d int"
            ),
        )
        engine.run(select=["inc"])
        got = {
            r["id"] for r in engine.store.read(spark, "inc").collect()
        }
        assert got == {1, 2, 4, 5}
