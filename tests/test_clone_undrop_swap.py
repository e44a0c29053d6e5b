"""Zero-copy CLONE, UNDROP TABLE, and ALTER TABLE SWAP WITH (r11):
Snowflake's metadata-level table operations, mapped onto the version
store's hard-linked layout — a clone shares every data file with its
source (O(#files) metadata, no bytes copied), a dropped table parks in
a trash area until vacuumed, and a swap is two directory renames.
"""
from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.store import TableStore


@pytest.fixture()
def engine(spark, tmp_path):
    eng = Engine(spark, TableStore(str(tmp_path / "store")))
    eng.query(
        "create table src as select id as k, id * 10 as v from range(100)"
    )
    return eng


def _inode_set(d):
    out = set()
    for root, _dirs, files in os.walk(d):
        for fn in files:
            if fn.endswith(".parquet"):
                out.add(os.stat(os.path.join(root, fn)).st_ino)
    return out


class TestClone:
    def test_clone_rows_and_independence(self, spark, engine):
        engine.query("create table dst clone src")
        assert engine.query("select * from dst").count() == 100
        # diverge: writes to the clone never touch the source
        engine.query("update dst set v = -1 where k < 50")
        assert (
            engine.query("select * from src where v = -1").count() == 0
        )
        assert (
            engine.query("select * from dst where v = -1").count() == 50
        )

    def test_clone_is_zero_copy(self, spark, engine):
        engine.query("create table dst clone src")
        src_inodes = _inode_set(engine.store._dir("src"))
        dst_inodes = _inode_set(engine.store._dir("dst"))
        assert dst_inodes and dst_inodes <= src_inodes, (
            "clone must hard-link the source's data files, not copy"
        )

    def test_clone_at_version(self, spark, engine):
        engine.query("update src set v = v + 1 where k = 0")  # v1
        engine.query("create table old clone src at (version => 0)")
        assert (
            engine.query("select v from old where k = 0").collect()[0][0]
            == 0
        )

    def test_clone_carries_constraints_not_streams(self, spark, engine):
        engine.query("alter table src add primary key (k)")
        engine.query("create stream s_src on table src")
        engine.query("create table dst clone src")
        assert engine.store.primary_key("dst") is not None
        # streams stay on the source (Snowflake: streams are not cloned
        # by table clones)
        assert all(
            meta["table"] != "dst"
            for meta in engine.store.streams().values()
        )

    def test_clone_existing_requires_replace(self, spark, engine):
        engine.query("create table dst as select 1 as x")
        with pytest.raises(ValueError, match="exists"):
            engine.query("create table dst clone src")
        engine.query("create or replace table dst clone src")
        assert engine.query("select * from dst").count() == 100

    def test_clone_missing_source_raises(self, spark, engine):
        with pytest.raises(Exception, match="not found|not exist"):
            engine.query("create table dst clone nope")

    def test_clone_deletion_vectors_carried(self, spark, engine):
        engine.store.delete_where(spark, "src", F.col("k") < 10)
        engine.query("create table dst clone src")
        assert engine.query("select * from dst").count() == 90


class TestUndrop:
    def test_drop_then_undrop_restores(self, spark, engine):
        engine.query("drop table src")
        assert not engine.store.exists("src")
        engine.query("undrop table src")
        assert engine.query("select * from src").count() == 100

    def test_undrop_conflicts_with_live_table(self, spark, engine):
        engine.query("drop table src")
        engine.query("create table src as select 1 as x")
        with pytest.raises(ValueError, match="exists"):
            engine.query("undrop table src")

    def test_undrop_nothing_dropped_raises(self, spark, engine):
        with pytest.raises(ValueError, match="no dropped"):
            engine.query("undrop table ghost")

    def test_redrop_keeps_latest_copy(self, spark, engine):
        engine.query("drop table src")
        engine.query("create table src as select 1 as x")
        engine.query("drop table src")  # newer copy replaces the old
        engine.query("undrop table src")
        assert engine.query("select * from src").count() == 1

    def test_trash_is_not_a_table(self, spark, engine):
        engine.query("drop table src")
        shown = [r["name"] for r in engine.query("show tables").collect()]
        assert all("trash" not in n.lower() for n in shown)
        assert not engine.store.exists("_trash")


class TestSwap:
    def test_swap_exchanges_contents(self, spark, engine):
        engine.query("create table other as select 1 as k, 2 as v")
        engine.query("alter table src swap with other")
        assert engine.query("select * from src").count() == 1
        assert engine.query("select * from other").count() == 100

    def test_swap_missing_raises(self, spark, engine):
        with pytest.raises(Exception, match="not found|not exist"):
            engine.query("alter table src swap with ghost")

    def test_swap_preserves_history(self, spark, engine):
        engine.query("create table other as select 1 as k, 2 as v")
        engine.query("update other set v = 3 where k = 1")  # other v1
        engine.query("alter table src swap with other")
        # src is now the old `other`, with its versions intact
        assert engine.store.current_version("src") == 1
        old = engine.store.read_version(spark, "src", 0)
        assert old.collect()[0]["v"] == 2


class TestStreamsFollowObject:
    """Snowflake binds streams to the table OBJECT: renames and swaps
    retarget the stream; its offset stays valid because version
    counters travel with the table directory."""

    def test_stream_follows_rename(self, spark, engine):
        engine.store.set_primary_key("src", "pk", ["k"])
        engine.query("create stream st on table src")
        engine.query("insert into src select 500, 1")
        engine.query("alter table src rename to moved")
        assert engine.store.streams()["st"]["table"] == "moved"
        df, _v = engine.stream_frame("st")
        assert df.count() == 1  # the pre-rename insert's delta

    def test_stream_follows_swap(self, spark, engine):
        engine.store.set_primary_key("src", "pk", ["k"])
        engine.query("create stream st on table src")
        engine.query("insert into src select 500, 1")  # delta on object
        engine.query("create table other as select 1 as k, 2 as v")
        engine.query("alter table src swap with other")
        # the object the stream watched is now named `other`
        assert engine.store.streams()["st"]["table"] == "other"
        df, _v = engine.stream_frame("st")
        assert df.count() == 1


class TestCloneAtTimestamp:
    def test_clone_at_timestamp_resolves_version(self, spark, engine):
        import time

        engine.query("update src set v = -5 where k = 1")  # v1
        time.sleep(0.05)
        import datetime as dt

        mid = dt.datetime.now(dt.timezone.utc).isoformat()
        time.sleep(0.05)
        engine.query("update src set v = -9 where k = 1")  # v2
        engine.query(
            f"create table snap clone src at (timestamp => '{mid}')"
        )
        got = engine.query("select v from snap where k = 1").collect()
        assert got[0][0] == -5  # the v1 state, not v0 or v2

    def test_clone_before_first_commit_raises(self, spark, engine):
        with pytest.raises(ValueError, match="no committed version"):
            engine.query(
                "create table snap clone src "
                "at (timestamp => '2000-01-01T00:00:00+00:00')"
            )
