"""Empty/degenerate-input behavior for round-7c operators: empty frames
must yield empty (or exact-zero) results with correct schema, never
raise; statements over empty tables commit cleanly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_omnata_push_spark.engine.dag import Engine
from dbt_omnata_push_spark.engine.store import TableStore


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, TableStore(str(tmp_path / "s")))


def test_theta_set_ops_empty_and_one_sided(spark):
    from dbt_omnata_push_spark.ops.sketches import kmv_sketch, theta_set_ops

    empty = spark.createDataFrame([], "g string, user_id long")
    sk = kmv_sketch(empty, "g", F.col("user_id"), k=16)
    out = theta_set_ops(sk, "a", "b", k=16)
    assert out.columns == ["op", "n", "est"]
    # SQL's global agg emits one row even on empty input; the ops read
    # as exact zeros, never NULLs
    assert {(r["op"], r["n"], r["est"]) for r in out.collect()} == {
        ("union", 0, 0.0),
        ("intersect", 0, 0.0),
        ("a_minus_b", 0, 0.0),
        ("b_minus_a", 0, 0.0),
    }

    one = spark.createDataFrame([("a", 1), ("a", 2)], "g string, user_id long")
    got = {
        r["op"]: r["n"]
        for r in theta_set_ops(
            kmv_sketch(one, "g", F.col("user_id"), k=16), "a", "b", k=16
        ).collect()
    }
    assert got == {"union": 2, "intersect": 0, "a_minus_b": 2, "b_minus_a": 0}


def test_proximity_search_no_hits(spark, tmp_path):
    from dbt_omnata_push_spark.ops.invindex import (
        build_postings_index,
        proximity_search_indexed,
    )

    store = TableStore(str(tmp_path / "ix"))
    docs = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    build_postings_index(spark, store, "p", docs)
    out = proximity_search_indexed(spark, store, "p", "nope", "nada", window=4)
    assert out.count() == 0
    assert out.columns == ["doc_id", "n_pairs", "min_dist"]


def test_dml_statements_on_empty_tables(spark, engine):
    engine.query("create table e as select 1 as k, 'x' as s where 1=0")
    assert engine.query("update e set s = 'y'").collect()[0]["rows_updated"] == 0
    assert engine.query("delete from e where k = 1").collect()[0][
        "rows_deleted"
    ] == 0
    assert engine.query(
        "merge into e using (select 5 as k, 'n' as s) s2 on e.k = s2.k "
        "when matched then update set s = s2.s "
        "when not matched then insert (k, s) values (s2.k, s2.s)"
    ).collect()[0]["rows_inserted"] == 1
    assert engine.query("truncate table e").collect()[0]["rows_deleted"] == 1


def test_insert_overwrite_empty_source_touches_nothing(spark, tmp_path):
    store = TableStore(str(tmp_path / "io"))
    store.create(
        spark,
        "t",
        spark.createDataFrame([("p1", 1), ("p2", 2)], "part string, v long"),
        partition_by="part",
    )
    empty = spark.createDataFrame([], "part string, v long")
    store.insert_overwrite(spark, "t", empty)
    assert store.read(spark, "t").count() == 2  # no partitions touched


def test_streaming_kmv_empty_batch_is_committed(spark, tmp_path):
    from dbt_omnata_push_spark.streaming.ivm_stream import fold_batch_kmv

    store = TableStore(str(tmp_path / "kv"))
    rows = spark.createDataFrame([("a", 1)], "g string, user_id long")
    fold_batch_kmv(spark, store, "t", rows, 0, "g", F.col("user_id"), k=8)
    empty = spark.createDataFrame([], "g string, user_id long")
    status = fold_batch_kmv(
        spark, store, "t", empty, 1, "g", F.col("user_id"), k=8
    )
    assert status == "applied"  # progress advances even on empty batches
    sk = store.read(spark, "t")
    assert sk.select(F.max("_last_batch")).collect()[0][0] == 1
    assert sk.count() == 1  # sketch content unchanged


def test_copy_into_empty_directory_and_empty_table(spark, engine, tmp_path):
    engine.query("create table c as select 1::bigint as k where 1=0")
    out_dir = tmp_path / "u"
    n = engine.query(
        f"copy into '{out_dir}' from c file_format = (type = 'parquet')"
    ).collect()[0]["rows_unloaded"]
    assert n == 0
    loaded = engine.query(
        f"copy into c from '{out_dir}' file_format = (type = 'parquet')"
    ).collect()[0]["rows_loaded"]
    assert loaded == 0


def test_dml_lifecycle_on_empty_orders_slice(spark, engine):
    """The whole statement sequence over an empty CTAS stays coherent."""
    engine.execute_script(
        """
        create table lo as select 1 as k, 'x' as s where 1=0;
        update lo set s = 'y' where k = 1;
        delete from lo where k = 2;
        insert into lo (k, s) select 9, 'z';
        """
    )
    assert engine.query("select * from lo").collect()[0]["k"] == 9
