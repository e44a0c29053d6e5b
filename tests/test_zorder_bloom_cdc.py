"""Round-5 engine-surface tests: Z-order clustering (file-stat
tightness), Bloom filter guarantees, and store change-data-feed."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_omnata_push_spark.engine.store import TableStore
from dbt_omnata_push_spark.ops.sketches import bloom_build, bloom_probe
from dbt_omnata_push_spark.ops.zorder import (
    bucket16,
    bucket16_sql,
    zorder_write,
    zvalue,
    zvalue_sql,
)


class TestZOrder:
    def test_zvalue_interleaves_bits(self, spark):
        # z(0b101, 0b011) with 2 cols: bits of col0 at even positions,
        # col1 at odd -> 0b0_1_11_01 reading pairs = 0b011011 = 27
        df = spark.createDataFrame([(5, 3)], "a long, b long")
        got = df.select(
            zvalue([F.col("a"), F.col("b")], bits=4).alias("z")
        ).collect()[0]["z"]
        assert got == 0b011011

    def test_zvalue_sql_matches_spark(self, spark):
        import duckdb

        rows = [(i * 37 % 1000, i * 91 % 1000) for i in range(200)]
        df = spark.createDataFrame(rows, "a long, b long")
        spark_z = [
            r["z"]
            for r in df.select(
                zvalue([bucket16(F.col("a")), bucket16(F.col("b"))]).alias("z")
            )
            .orderBy("z")
            .collect()
        ]
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " +
                    ",".join(f"({a},{b})" for a, b in rows) + ") v(a,b)")
        zsql = zvalue_sql([bucket16_sql("a"), bucket16_sql("b")])
        duck_z = [r[0] for r in con.execute(
            f"SELECT {zsql} AS z FROM t ORDER BY z").fetchall()]
        assert spark_z == duck_z

    def test_zorder_write_tightens_file_stats(self, spark, tmp_path):
        # Two independent uniform keys: after z-order clustering, each
        # file's span on EACH dimension must shrink vs a random layout.
        n, files = 20_000, 16
        df = (
            spark.range(n)
            .select(
                (F.xxhash64("id") % 1000 + 1000) % 1000,
                (F.xxhash64("id", F.lit(1)) % 1000 + 1000) % 1000,
            )
            .toDF("x", "y")
            .withColumn("x", F.col("x").cast("long"))
            .withColumn("y", F.col("y").cast("long"))
        )
        zpath = str(tmp_path / "z")
        rpath = str(tmp_path / "r")
        zorder_write(df, zpath, ["x", "y"], num_files=files)
        df.repartition(files).write.mode("overwrite").parquet(rpath)

        def mean_span(path, col):
            back = spark.read.parquet(path).withColumn(
                "_f", F.input_file_name()
            )
            spans = back.groupBy("_f").agg(
                (F.max(col) - F.min(col)).alias("span")
            )
            return spans.agg(F.avg("span")).collect()[0][0]

        # Random layout: every file spans ~the full [0, 1000) range on
        # both dims. Z-order: both dims' per-file spans shrink.
        for col in ("x", "y"):
            assert mean_span(zpath, col) < 0.55 * mean_span(rpath, col), col


class TestBloom:
    def test_no_false_negatives_and_bounded_fpr(self, spark):
        present = spark.range(0, 2000).select(F.col("id").alias("k"))
        bloom = bloom_build(present, "k", m_bits=1 << 16, k_hashes=4)
        probes = spark.range(0, 4000).select(F.col("id").alias("k"))
        got = {r["k"]: r["maybe_present"] for r in
               bloom_probe(bloom, probes, "k", m_bits=1 << 16, k_hashes=4).collect()}
        # every present key must test positive
        assert all(got[k] for k in range(2000))
        # absent keys: fpr ~ (1 - e^(-4*2000/65536))^4 ~ 0.02%; allow 1%
        fp = sum(1 for k in range(2000, 4000) if got[k])
        assert fp <= 20, f"false positive rate too high: {fp}/2000"

    def test_merge_equals_rebuild(self, spark):
        a = spark.range(0, 500).select(F.col("id").alias("k"))
        b = spark.range(500, 1000).select(F.col("id").alias("k"))
        merged = (
            bloom_build(a, "k")
            .unionByName(bloom_build(b, "k"))
            .groupBy("word_idx")
            .agg(F.bit_or("word_bits").alias("word_bits"))
        )
        direct = bloom_build(a.unionByName(b), "k")
        assert (
            merged.exceptAll(direct).count() == 0
            and direct.exceptAll(merged).count() == 0
        )


class TestCdc:
    def _store(self, spark, tmp_path, rows_v0, rows_v1, schema="k long, v string"):
        store = TableStore(str(tmp_path / "cdc"))
        store.create(spark, "t", spark.createDataFrame(rows_v0, schema))
        store.overwrite(spark, "t", spark.createDataFrame(rows_v1, schema))
        return store

    def test_insert_update_delete_classified(self, spark, tmp_path):
        store = self._store(
            spark,
            tmp_path,
            [(1, "a"), (2, "b"), (3, "c")],
            [(2, "B"), (3, "c"), (4, "d")],
        )
        got = {
            (r["k"], r["v"], r["change_type"])
            for r in store.read_changes(spark, "t", 0, 1, "k").collect()
        }
        assert got == {
            (1, "a", "delete"),
            (2, "b", "update_preimage"),
            (2, "B", "update_postimage"),
            (4, "d", "insert"),
        }

    def test_identical_rewrite_is_silent(self, spark, tmp_path):
        rows = [(1, "a"), (2, "b")]
        store = self._store(spark, tmp_path, rows, rows)
        assert store.read_changes(spark, "t", 0, 1, "k").count() == 0

    def test_widened_schema_renders_old_rows(self, spark, tmp_path):
        store = TableStore(str(tmp_path / "w"))
        store.create(spark, "t", spark.createDataFrame([(1, "a")], "k long, v string"))
        store.overwrite(
            spark,
            "t",
            spark.createDataFrame([(1, "a", 9)], "k long, v string, extra long"),
        )
        got = {
            (r["k"], r["v"], r["extra"], r["change_type"])
            for r in store.read_changes(spark, "t", 0, 1, "k").collect()
        }
        # old row renders with extra=null -> digest differs -> update pair
        assert got == {
            (1, "a", None, "update_preimage"),
            (1, "a", 9, "update_postimage"),
        }

    def test_null_vs_value_detected(self, spark, tmp_path):
        store = self._store(spark, tmp_path, [(1, None)], [(1, "x")])
        kinds = {r["change_type"] for r in store.read_changes(spark, "t", 0, 1, "k").collect()}
        assert kinds == {"update_preimage", "update_postimage"}


class TestZOrderCompact:
    def test_compact_zorder_clusters_files(self, spark, tmp_path):
        from dbt_omnata_push_spark.ops.compact import compact

        store = TableStore(str(tmp_path / "zc"))
        df = (
            spark.range(20_000)
            .select(
                F.col("id"),
                ((F.xxhash64("id") % 500 + 500) % 500).alias("x"),
                ((F.xxhash64("id", F.lit(7)) % 500 + 500) % 500).alias("y"),
            )
            .repartition(32)  # many small files, random layout
        )
        store.create(spark, "t", df)
        got_files = compact(
            spark, store, "t", target_file_bytes=16 * 1024, zorder_by=["x", "y"]
        )
        assert got_files > 4  # enough files for spans to mean something

        back = spark.read.parquet(store.data_path("t")).withColumn(
            "_f", F.input_file_name()
        )

        def mean_span(col):
            return (
                back.groupBy("_f")
                .agg((F.max(col) - F.min(col)).alias("s"))
                .agg(F.avg("s"))
                .collect()[0][0]
            )

        # clustered on BOTH dims: average per-file span well under the
        # full 500-wide domain a random layout would show
        assert mean_span("x") < 275
        assert mean_span("y") < 275

    def test_compact_zorder_preserves_rows(self, spark, tmp_path):
        from dbt_omnata_push_spark.ops.compact import compact

        store = TableStore(str(tmp_path / "zp"))
        df = spark.range(1000).select(
            F.col("id"), (F.col("id") % 97).alias("x"), (F.col("id") % 89).alias("y")
        )
        store.create(spark, "t", df)
        compact(spark, store, "t", target_file_bytes=8 * 1024, zorder_by=["x", "y"])
        back = store.read(spark, "t")
        assert back.count() == 1000
        assert back.agg(F.sum("id")).collect()[0][0] == 999 * 1000 // 2


class TestIvm:
    def test_maintained_equals_rebuilt(self, spark, tmp_path):
        from dbt_omnata_push_spark.ops.ivm import apply_cdc, build_agg

        store = TableStore(str(tmp_path / "ivm"))
        v0 = spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 5)],
            "k long, grp string, v long",
        )
        # v1: update 2 (a->b move), delete 3, insert 5, drop group c
        v1 = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 21), (5, "a", 7)],
            "k long, grp string, v long",
        )
        store.create(spark, "t", v0)
        store.overwrite(spark, "t", v1)
        agg0 = build_agg(store.read_version(spark, "t", 0), ["grp"], ["v"])
        changes = store.read_changes(spark, "t", 0, 1, "k")
        maintained = {
            (r["grp"], r["n_rows"], r["sum_v"])
            for r in apply_cdc(agg0, changes, ["grp"], ["v"]).collect()
        }
        rebuilt = {
            (r["grp"], r["n_rows"], r["sum_v"])
            for r in build_agg(v1, ["grp"], ["v"]).collect()
        }
        assert maintained == rebuilt
        # group 'c' vanished: maintained must not carry an n_rows=0 husk
        assert not any(g == "c" for g, _, _ in maintained)

    def test_noop_cdc_leaves_agg_unchanged(self, spark, tmp_path):
        from dbt_omnata_push_spark.ops.ivm import apply_cdc, build_agg

        store = TableStore(str(tmp_path / "ivm2"))
        rows = [(1, "a", 10), (2, "b", 20)]
        df = spark.createDataFrame(rows, "k long, grp string, v long")
        store.create(spark, "t", df)
        store.overwrite(spark, "t", df)
        agg0 = build_agg(store.read_version(spark, "t", 0), ["grp"], ["v"])
        changes = store.read_changes(spark, "t", 0, 1, "k")
        assert changes.count() == 0
        out = {
            (r["grp"], r["n_rows"], r["sum_v"])
            for r in apply_cdc(agg0, changes, ["grp"], ["v"]).collect()
        }
        assert out == {("a", 1, 10), ("b", 1, 20)}


class TestAdviceR5Fixes:
    """Regression tests for the round-5 ADVICE findings."""

    def test_cdc_null_key_unchanged_row_is_silent(self, spark, tmp_path):
        # A NULL-key row present identically in both versions must emit
        # nothing (null-safe key join), not a spurious insert+delete.
        store = TableStore(str(tmp_path / "nk"))
        rows = [(None, "a"), (2, "b")]
        store.create(spark, "t", spark.createDataFrame(rows, "k long, v string"))
        store.overwrite(
            spark, "t", spark.createDataFrame(rows, "k long, v string")
        )
        assert store.read_changes(spark, "t", 0, 1, "k").count() == 0

    def test_cdc_null_key_change_is_update(self, spark, tmp_path):
        store = TableStore(str(tmp_path / "nk2"))
        store.create(
            spark, "t", spark.createDataFrame([(None, "a")], "k long, v string")
        )
        store.overwrite(
            spark, "t", spark.createDataFrame([(None, "A")], "k long, v string")
        )
        kinds = {
            r["change_type"]
            for r in store.read_changes(spark, "t", 0, 1, "k").collect()
        }
        assert kinds == {"update_preimage", "update_postimage"}

    def test_ivm_all_null_measure_group_sums_to_null(self, spark, tmp_path):
        # Deleting the only non-null measure row must flip the
        # maintained SUM back to NULL (exact full-refresh equality).
        from dbt_omnata_push_spark.ops.ivm import apply_cdc, build_agg

        store = TableStore(str(tmp_path / "ivmnull"))
        v0 = spark.createDataFrame(
            [(1, "a", 5), (2, "a", None), (3, "b", None)],
            "k long, grp string, v long",
        )
        # v1: delete the only non-null 'a' row; insert a null-measure row
        v1 = spark.createDataFrame(
            [(2, "a", None), (3, "b", None), (4, "b", None)],
            "k long, grp string, v long",
        )
        store.create(spark, "t", v0)
        store.overwrite(spark, "t", v1)
        agg0 = build_agg(store.read_version(spark, "t", 0), ["grp"], ["v"])
        changes = store.read_changes(spark, "t", 0, 1, "k")
        maintained = {
            (r["grp"], r["n_rows"], r["sum_v"], r["nn_v"])
            for r in apply_cdc(agg0, changes, ["grp"], ["v"]).collect()
        }
        rebuilt = {
            (r["grp"], r["n_rows"], r["sum_v"], r["nn_v"])
            for r in build_agg(v1, ["grp"], ["v"]).collect()
        }
        assert maintained == rebuilt
        assert ("a", 1, None, 0) in maintained

    def test_compact_single_column_zorder(self, spark, tmp_path):
        from dbt_omnata_push_spark.ops.compact import compact

        store = TableStore(str(tmp_path / "z1"))
        df = spark.range(2000).select(
            F.col("id"), (F.col("id") * 37 % 500).alias("x")
        )
        store.create(spark, "t", df)
        got_files = compact(
            spark, store, "t", target_file_bytes=8 * 1024, zorder_by=["x"]
        )
        assert got_files > 2
        back = spark.read.parquet(store.data_path("t")).withColumn(
            "_f", F.input_file_name()
        )
        span = (
            back.groupBy("_f")
            .agg((F.max("x") - F.min("x")).alias("s"))
            .agg(F.avg("s"))
            .collect()[0][0]
        )
        assert span < 275  # clustered, not random over the 500 domain
        assert store.read(spark, "t").count() == 2000

    def test_compact_zorder_rejects_non_integral(self, spark, tmp_path):
        import pytest

        from dbt_omnata_push_spark.ops.compact import compact

        store = TableStore(str(tmp_path / "zbad"))
        df = spark.range(10).select(
            F.col("id"), F.col("id").cast("string").alias("s")
        )
        store.create(spark, "t", df)
        with pytest.raises(ValueError, match="non-integral"):
            compact(spark, store, "t", zorder_by=["id", "s"])
        with pytest.raises(ValueError, match="not in table"):
            compact(spark, store, "t", zorder_by=["nope"])
