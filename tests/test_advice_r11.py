"""ADVICE r11 follow-ups (r12):

1. Historical CLONE AT(VERSION => v) gets point-in-time metadata —
   attachments (masking, constraints, PK, change tracking) and schema
   evolution (ADD/DROP/RENAME COLUMN) recorded AFTER v are pruned from
   the clone, matching Snowflake where a clone takes the object as it
   existed at the cloned time. Previously the clone copied the source's
   CURRENT _META wholesale.
2. Dropped tables expire: vacuum() purges _trash entries older than a
   retention window (Snowflake's time-travel expiry for dropped
   tables); without a window trash is kept forever, and UNDROP works
   until the purge.
3. MATCH_RECOGNIZE SQL temp views use a monotonic counter and are
   dropped after the statement builds (no catalog leak / collisions).
"""
from __future__ import annotations

import os
import time

import pytest

from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.store import TableStore


@pytest.fixture()
def engine(spark, tmp_path):
    eng = Engine(spark, TableStore(str(tmp_path / "store")))
    eng.query(
        "create table t as select id as k, id * 10 as v from range(50)"
    )
    return eng


class TestHistoricalCloneMetadata:
    def test_pre_masking_clone_is_unmasked(self, spark, engine):
        engine.query("update t set v = v + 1 where k = 0")  # v1
        engine.query(
            "create masking policy hide_v as (val bigint) returns bigint"
            " -> -1"
        )
        engine.query(
            "alter table t modify column v set masking policy hide_v"
        )
        engine.query("create table old clone t at (version => 0)")
        engine.query("create table cur clone t")
        assert engine.store.meta("old").get("masking") in (None, {})
        assert "v" in engine.store.meta("cur").get("masking", {})
        # the unmasked clone serves raw values
        raw = engine.query("select v from old where k = 1").collect()[0][0]
        assert raw == 10
        masked = engine.query("select v from cur where k = 1").collect()[0][0]
        assert masked == -1

    def test_masking_set_before_clone_version_survives(self, spark, engine):
        engine.query(
            "create masking policy hide_v2 as (val bigint) returns bigint"
            " -> -1"
        )
        engine.query(
            "alter table t modify column v set masking policy hide_v2"
        )
        engine.query("update t set v = v + 1 where k = 0")  # v1
        engine.query("update t set v = v + 1 where k = 1")  # v2
        engine.query("create table old clone t at (version => 1)")
        assert "v" in engine.store.meta("old").get("masking", {})

    def test_pre_add_column_clone_has_no_phantom_column(
        self, spark, engine
    ):
        engine.query("alter table t add column extra string")  # v1
        engine.query("create table old clone t at (version => 0)")
        assert engine.query("select * from old").columns == ["k", "v"]
        engine.query("create table at1 clone t at (version => 1)")
        assert "extra" in engine.query("select * from at1").columns

    def test_pre_drop_column_clone_keeps_column_and_data(
        self, spark, engine
    ):
        engine.query("alter table t drop column v")  # v1
        engine.query("create table old clone t at (version => 0)")
        df = engine.query("select * from old where k = 3")
        assert df.columns == ["k", "v"]
        assert df.collect()[0]["v"] == 30
        engine.query("create table new clone t")
        assert engine.query("select * from new").columns == ["k"]

    def test_pre_rename_column_clone_keeps_old_name(self, spark, engine):
        engine.query("alter table t rename column v to val")  # v1
        engine.query("create table old clone t at (version => 0)")
        assert engine.query("select * from old").columns == ["k", "v"]
        engine.query("create table new clone t")
        assert engine.query("select * from new").columns == ["k", "val"]

    def test_pre_constraint_and_pk_clone_unconstrained(self, spark, engine):
        engine.query("update t set v = v + 1 where k = 0")  # v1
        engine.query("alter table t add constraint pos check (v >= 0)")
        engine.query("alter table t add primary key (k)")
        engine.query("alter table t set change_tracking = true")
        engine.query("create table old clone t at (version => 0)")
        m = engine.store.meta("old")
        assert not m.get("constraints")
        assert not m.get("primary_key")
        assert not m.get("change_tracking")
        cur = engine.store.meta("t")
        assert cur.get("constraints") and cur.get("primary_key")

    def test_current_clone_keeps_attachments(self, spark, engine):
        engine.query("alter table t add constraint pos check (v >= 0)")
        engine.query("create table dst clone t")
        assert "pos" in engine.store.meta("dst").get("constraints", {})

    def test_clone_stamps_normalize_to_clone_space(self, spark, engine):
        # attachments on the source existed at the clone's v=0, so a
        # clone-of-the-clone AT(VERSION => 0) must keep them
        engine.query("update t set v = v + 1 where k = 0")  # v1
        engine.query("alter table t add constraint pos check (v >= 0)")
        engine.query("create table c1 clone t")  # current clone, v=0
        engine.query("update c1 set v = v + 1 where k = 1")  # c1 v1
        engine.query("create table c2 clone c1 at (version => 0)")
        assert "pos" in engine.store.meta("c2").get("constraints", {})

    def test_unstamped_legacy_attachment_is_kept(self, spark, engine):
        # pre-r12 metadata has no meta_at stamps: the clone keeps the
        # attachment (over-protecting is the safe direction)
        engine.query("update t set v = v + 1 where k = 0")  # v1
        engine.query("alter table t add constraint pos check (v >= 0)")
        meta = engine.store.meta("t")
        meta.pop("meta_at", None)
        engine.store._put_meta("t", meta)
        engine.query("create table old clone t at (version => 0)")
        assert "pos" in engine.store.meta("old").get("constraints", {})


class TestTrashRetention:
    def test_trash_kept_without_window(self, spark, engine):
        engine.query("drop table t")
        engine.store.vacuum()
        engine.query("undrop table t")
        assert engine.query("select * from t").count() == 50

    def test_trash_purged_after_window(self, spark, engine):
        engine.query("drop table t")
        trash = engine.store._trash_path("t")
        stamp = os.path.join(trash, "_DROPPED_AT")
        assert os.path.isfile(stamp)
        with open(stamp, "w") as f:
            f.write(str(time.time() - 48 * 3600))
        engine.store.vacuum(trash_retain_hours=24.0)
        assert not os.path.isdir(trash)
        with pytest.raises(Exception, match="undrop|not"):
            engine.query("undrop table t")

    def test_trash_inside_window_survives_vacuum(self, spark, engine):
        engine.query("drop table t")
        engine.store.vacuum(trash_retain_hours=24.0)
        engine.query("undrop table t")
        assert engine.query("select * from t").count() == 50

    def test_retain_hours_doubles_as_trash_window(self, spark, engine):
        engine.query("drop table t")
        trash = engine.store._trash_path("t")
        with open(os.path.join(trash, "_DROPPED_AT"), "w") as f:
            f.write(str(time.time() - 48 * 3600))
        engine.store.vacuum(retain_hours=24.0)
        assert not os.path.isdir(trash)

    def test_scoped_vacuum_never_touches_trash(self, spark, engine):
        engine.query("create table keepme as select 1 as x")
        engine.query("drop table t")
        trash = engine.store._trash_path("t")
        with open(os.path.join(trash, "_DROPPED_AT"), "w") as f:
            f.write(str(time.time() - 48 * 3600))
        engine.store.vacuum(name="keepme", trash_retain_hours=24.0)
        assert os.path.isdir(trash)

    def test_undrop_clears_drop_stamp(self, spark, engine):
        engine.query("drop table t")
        engine.query("undrop table t")
        assert not os.path.isfile(
            os.path.join(engine.store._dir("t"), "_DROPPED_AT")
        )


class TestMatchRecognizeViewHygiene:
    def test_mr_temp_views_are_dropped(self, spark, engine):
        engine.query(
            "create table ticks as select 1 as g, id as k, "
            "case when id % 3 = 1 then 5 else 10 end as price, "
            "id as ts from range(9)"
        )
        before = {
            v.name for v in spark.catalog.listTables() if v.isTemporary
        }
        df = engine.query(
            "select * from ticks match_recognize ("
            " partition by g"
            " order by ts"
            " measures first(price) as p0"
            " one row per match"
            " pattern (L H)"
            " define L as price < 8, H as price >= 8"
            ")"
        )
        assert df.count() >= 1  # plan survives the view drop
        after = {
            v.name for v in spark.catalog.listTables() if v.isTemporary
        }
        assert not {n for n in after - before if n.startswith("__mr_")}

    def test_mr_view_names_are_unique_per_statement(self, spark, engine):
        from dbt_omnata_push_spark.engine import mrsql

        a = next(mrsql._MR_VIEW_SEQ)
        b = next(mrsql._MR_VIEW_SEQ)
        assert a != b
