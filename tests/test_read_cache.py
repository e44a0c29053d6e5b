"""The r15 read/registration caches: a cached frame must be reused only
while every input it derives from is unchanged (version pointer, _META,
policies, role, stream offsets, history files)."""

import pytest
from pyspark.sql import functions as F

from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.store import TableStore


@pytest.fixture()
def store(tmp_path):
    return TableStore(str(tmp_path / "warehouse"))


def test_read_cached_until_version_bump(spark, store):
    df = spark.range(5).withColumn("x", F.col("id") * 2)
    store.create(spark, "t", df)
    a = store.read(spark, "t")
    b = store.read(spark, "t")
    assert a is b, "same version + meta must return the cached frame"
    store.append(spark, "t", spark.range(5, 7).withColumn("x", F.col("id")))
    c = store.read(spark, "t")
    assert c is not a, "a committed version bump must invalidate"
    assert c.count() == 7


def test_read_cache_invalidates_on_meta_change(spark, store):
    store.create(spark, "t", spark.range(3))
    a = store.read(spark, "t")
    store.add_column(spark, "t", "extra", "string")
    b = store.read(spark, "t")
    assert b is not a
    assert "extra" in b.columns and "extra" not in a.columns


def test_read_cache_keyed_on_recreate(spark, store):
    store.create(spark, "t", spark.range(3))
    a = store.read(spark, "t")
    store.drop("t")
    store.create(spark, "t", spark.range(9))
    b = store.read(spark, "t")
    assert b is not a, "drop+recreate at the same version must not hit"
    assert b.count() == 9


def test_read_version_cached_and_immutable(spark, store):
    store.create(spark, "t", spark.range(4).withColumn("x", F.col("id")))
    store.append(spark, "t", spark.range(4, 6).withColumn("x", F.col("id")))
    a = store.read_version(spark, "t", 0)
    b = store.read_version(spark, "t", 0)
    assert a is b, "immutable version dir must return the cached frame"
    # a later delete mints a NEW version; the cached v=1 frame (pre-DV)
    # must stay byte-identical while v=2 reads through the new DV
    c1 = store.read_version(spark, "t", 1)
    store.delete_where(spark, "t", F.col("id") >= 4)
    assert store.read_version(spark, "t", 1) is c1
    assert store.read_version(spark, "t", 1).count() == 6
    assert store.read_version(spark, "t", 2).count() == 4


def test_read_version_cache_keyed_on_recreate(spark, store):
    store.create(spark, "t", spark.range(3))
    a = store.read_version(spark, "t", 0)
    assert a.count() == 3
    store.drop("t")
    store.create(spark, "t", spark.range(9))
    b = store.read_version(spark, "t", 0)
    assert b is not a, "drop+recreate at the same version must not hit"
    assert b.count() == 9


def test_read_version_raises_after_vacuum(spark, store):
    store.create(spark, "t", spark.range(3))
    store.append(spark, "t", spark.range(3, 5))
    store.read_version(spark, "t", 0)  # populate the cache
    store.vacuum("t", keep=1)
    with pytest.raises(ValueError, match="does not exist"):
        store.read_version(spark, "t", 0)


def test_registration_sees_dml_and_role_changes(spark, store):
    eng = Engine(spark, store)
    eng.query("create table src as select 1 as id, 'alice' as name")
    assert eng.query("select count(*) as n from src").collect()[0].n == 1
    eng.query("insert into src select 2, 'bob'")
    assert eng.query("select count(*) as n from src").collect()[0].n == 2
    # masking must re-key on role without any table version change
    eng.query(
        "create masking policy hide_name as (val string) returns string ->"
        " case when current_role() = 'ADMIN' then val else '***' end"
    )
    eng.query("alter table src modify column name set masking policy hide_name")
    got = {r.name for r in eng.query("select name from src").collect()}
    assert got == {"***"}
    eng.vars["role"] = "ADMIN"
    got = {r.name for r in eng.query("select name from src").collect()}
    assert got == {"alice", "bob"}
    eng.vars["role"] = "PUBLIC"
    got = {r.name for r in eng.query("select name from src").collect()}
    assert got == {"***"}


def test_registration_heals_alias_shadowing(spark, store):
    """AT-resolution registers a frame under the table's own name; the
    next statement's registration pass must restore the current view."""
    eng = Engine(spark, store)
    eng.query("create table t as select 1 as v")
    eng.query("insert into t select 2")
    v0 = store.versions("t")[0]
    hist = eng.query(f"select * from t at(version => {v0})")
    assert hist.count() == 1
    assert eng.query("select count(*) as n from t").collect()[0].n == 2


def test_stream_view_tracks_offset_and_base(spark, store):
    eng = Engine(spark, store)
    eng.query("create table base as select 1 as id, 'a' as s")
    eng.query("alter table base add primary key (id)")
    eng.query("create stream st on table base")
    assert eng.query("select count(*) as n from st").collect()[0].n == 0
    eng.query("insert into base select 2, 'b'")
    rows = eng.query("select id from st").collect()
    assert {r.id for r in rows} == {2}
    # consuming DML advances the offset -> stream view must empty
    eng.query("create table sink as select id from st")
    assert eng.query("select count(*) as n from st").collect()[0].n == 0


def test_registration_pass_skips_when_state_unchanged(spark, store):
    """r15: when no frame changed and nothing shadowed an owned name,
    _register_views leaves the catalog untouched (zero
    createOrReplaceTempView calls) — and a flush still happens the
    moment an out-of-band registration is marked or a commit lands."""
    from pyspark.sql.classic.dataframe import DataFrame

    eng = Engine(spark, store)
    eng.query("create table t_skip as select 1 as v")
    eng.query("select * from t_skip")  # settles caches + catalog

    calls = []
    orig = DataFrame.createOrReplaceTempView

    def counting(self, name):
        calls.append(name)
        return orig(self, name)

    DataFrame.createOrReplaceTempView = counting
    try:
        eng._register_views()
        assert calls == [], f"clean pass must skip, registered: {calls}"
        # an out-of-band shadow of an owned name forces a heal
        spark.range(1).select(F.lit(9).alias("v")).createOrReplaceTempView(
            "t_skip"
        )
        eng._mark_shadowed("t_skip")
        eng._register_views()
        assert "t_skip" in calls, "shadowed owned name must re-register"
        assert (
            eng.query("select max(v) as m from t_skip").collect()[0].m == 1
        ), "healed view must read the committed table, not the shadow"
    finally:
        DataFrame.createOrReplaceTempView = orig


def test_registration_pass_flushes_after_commit(spark, store):
    from pyspark.sql.classic.dataframe import DataFrame

    eng = Engine(spark, store)
    eng.query("create table t_flush as select 1 as v")
    eng.query("select * from t_flush")
    eng.query("insert into t_flush select 2")

    calls = []
    orig = DataFrame.createOrReplaceTempView

    def counting(self, name):
        calls.append(name)
        return orig(self, name)

    DataFrame.createOrReplaceTempView = counting
    try:
        # the insert bumped the version: the next pass must flush the
        # new frame into the catalog...
        eng._register_views()
        assert "t_flush" in calls
        # ...and the pass after that (nothing changed) skips again
        calls.clear()
        eng._register_views()
        assert calls == []
    finally:
        DataFrame.createOrReplaceTempView = orig


def test_stream_rebuild_gated_on_statement_reference(spark, store):
    """r15: a statement that cannot read a stream must not pay for
    rebuilding its CDC frame — and the skipped stream's stale view is
    dropped, so a reference the gate missed errors instead of reading
    a stale window. Referencing statements (directly or through a
    stored view) still rebuild and read the exact delta."""
    eng = Engine(spark, store)
    eng.query("create table sbase as select 1 as id, 10 as v")
    eng.query("alter table sbase add primary key (id)")
    eng.query("create stream st_gate on table sbase")

    builds = []
    orig = Engine.stream_frame

    def counting(self, name):
        builds.append(name)
        return orig(self, name)

    Engine.stream_frame = counting
    try:
        # commit on the base invalidates the stream frame, but the
        # next statements never mention st_gate: no rebuild
        eng.query("insert into sbase select 2, 20")
        builds.clear()
        eng.query("select count(*) as n from sbase")
        eng.query("create table unrelated as select 1 as x")
        assert builds == [], f"unreferenced stream rebuilt: {builds}"
        # a statement that reads the stream rebuilds it and sees the
        # full delta since the offset (both inserts above)
        rows = eng.query("select id from st_gate").collect()
        assert builds == ["st_gate"]
        assert {r.id for r in rows} == {2}
        # a stored view over the stream also forces the rebuild even
        # when the statement only names the view
        eng.query("create view v_over_stream as select id from st_gate")
        eng.query("insert into sbase select 3, 30")
        builds.clear()
        rows = eng.query("select id from v_over_stream").collect()
        assert builds == ["st_gate"], "view reference must rebuild"
        assert {r.id for r in rows} == {2, 3}
    finally:
        Engine.stream_frame = orig
