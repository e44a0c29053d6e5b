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


class TestSwapCrashSafety:
    """r12: the swap dance is journaled — kill it between every pair of
    renames (and after all renames but before the stream retarget),
    reopen the store, and prove no window loses bytes, leaves a table
    missing, or strands a stream on the wrong object (the r11 `weak`:
    a crashed swap's directory in _swap_tmp was silently rmtree'd by
    the NEXT swap)."""

    def _setup(self, spark, tmp_path, tag):
        store = TableStore(str(tmp_path / f"crash_{tag}"))
        eng = Engine(spark, store)
        eng.query("create table ta as select id as k, id * 10 as v from range(100)")
        eng.query("create table tb as select id as k, -id as v from range(7)")
        eng.store.set_primary_key("ta", "pk_a", ["k"])
        eng.store.set_primary_key("tb", "pk_b", ["k"])
        eng.query("create stream st_a on table ta")
        eng.query("create stream st_b on table tb")
        return eng, store

    def _assert_consistent(self, spark, store, swapped):
        """Both tables fully present with the expected contents, and
        streams bound consistently with whether the swap completed."""
        eng = Engine(spark, store)
        a_rows = eng.query("select count(*) as c from ta").collect()[0][0]
        b_rows = eng.query("select count(*) as c from tb").collect()[0][0]
        if swapped:
            assert (a_rows, b_rows) == (7, 100)
            assert store.streams()["st_a"]["table"] == "tb"
            assert store.streams()["st_b"]["table"] == "ta"
        else:
            assert (a_rows, b_rows) == (100, 7)
            assert store.streams()["st_a"]["table"] == "ta"
            assert store.streams()["st_b"]["table"] == "tb"
        # no debris that the next swap could destroy
        assert not os.path.isfile(
            os.path.join(store._swap_tmp(), "_VERSION")
        )
        assert not os.path.isfile(store._swap_journal_file())
        # and the next swap works end-to-end
        store.swap_tables("ta", "tb")
        a2 = eng.query("select count(*) as c from ta").collect()[0][0]
        assert a2 == (100 if swapped else 7)

    @pytest.mark.parametrize("fail_at", [0, 1, 2])
    def test_kill_between_renames(self, spark, tmp_path, fail_at, monkeypatch):
        eng, store = self._setup(spark, tmp_path, f"r{fail_at}")
        calls = {"n": 0}
        real_rename = os.rename

        def dying_rename(src, dst):
            if calls["n"] == fail_at:
                raise OSError("simulated crash mid-swap")
            calls["n"] += 1
            return real_rename(src, dst)

        monkeypatch.setattr(os, "rename", dying_rename)
        with pytest.raises(OSError, match="simulated crash"):
            store.swap_tables("ta", "tb")
        monkeypatch.setattr(os, "rename", real_rename)
        # reopen the store (a new process): __init__ recovers
        reopened = TableStore(store.root)
        # crashes before rename 2 roll BACK (swap never visible);
        # crashes after rename 2 roll FORWARD (swap completed)
        self._assert_consistent(spark, reopened, swapped=fail_at >= 2)

    def test_kill_before_stream_retarget(self, spark, tmp_path, monkeypatch):
        eng, store = self._setup(spark, tmp_path, "retarget")
        real_apply = TableStore._apply_stream_targets

        def dying_apply(self, targets):
            raise OSError("simulated crash before retarget")

        monkeypatch.setattr(TableStore, "_apply_stream_targets", dying_apply)
        with pytest.raises(OSError, match="simulated crash"):
            store.swap_tables("ta", "tb")
        monkeypatch.setattr(TableStore, "_apply_stream_targets", real_apply)
        reopened = TableStore(store.root)
        self._assert_consistent(spark, reopened, swapped=True)

    def test_recovery_on_same_store_next_swap(self, spark, tmp_path, monkeypatch):
        """The crashed store object itself (no reopen) also recovers at
        the next swap attempt instead of rmtree-ing the stranded dir."""
        eng, store = self._setup(spark, tmp_path, "inline")
        calls = {"n": 0}
        real_rename = os.rename

        def dying_rename(src, dst):
            if calls["n"] == 1:
                raise OSError("simulated crash mid-swap")
            calls["n"] += 1
            return real_rename(src, dst)

        monkeypatch.setattr(os, "rename", dying_rename)
        with pytest.raises(OSError, match="simulated crash"):
            store.swap_tables("ta", "tb")
        monkeypatch.setattr(os, "rename", real_rename)
        # ta's whole directory currently sits in _swap_tmp; the next
        # swap must recover it, not delete it
        store.swap_tables("ta", "tb")
        self._assert_consistent(spark, store, swapped=True)

    def test_orphan_swap_tmp_refused(self, spark, tmp_path):
        """An unattributable _swap_tmp holding a _VERSION (no journal)
        must make swap refuse, never rmtree table bytes."""
        eng, store = self._setup(spark, tmp_path, "orphan")
        os.makedirs(store._swap_tmp(), exist_ok=True)
        with open(os.path.join(store._swap_tmp(), "_VERSION"), "w") as f:
            f.write("1")
        with pytest.raises(RuntimeError, match="refusing"):
            store.swap_tables("ta", "tb")
        assert os.path.isfile(os.path.join(store._swap_tmp(), "_VERSION"))
