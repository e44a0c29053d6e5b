"""File-statistics manifest + data-skipping reads (r6): pruning must be
real (fewer files scheduled) and lossless (equals the unpruned scan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_omnata_push_spark.engine.store import TableStore
from dbt_omnata_push_spark.ops.compact import compact
from dbt_omnata_push_spark.ops.filestats import (
    collect_file_stats,
    read_skipping,
)


def _clustered_store(spark, tmp_path, n=4000):
    store = TableStore(str(tmp_path / "fs"))
    df = spark.range(n).select(
        F.col("id"), (F.col("id") * 37 % 1000).alias("x")
    )
    store.create(spark, "t", df)
    # cluster on x so per-file [min, max] is tight -> skipping bites
    compact(spark, store, "t", target_file_bytes=8 * 1024, zorder_by=["x"])
    return store


def test_skipping_is_lossless_and_prunes_files(spark, tmp_path):
    store = _clustered_store(spark, tmp_path)
    manifest = collect_file_stats(spark, store, "t", ["x"])
    assert len(manifest) > 4  # enough files for skipping to mean anything

    lo, hi = 100, 150
    pruned = read_skipping(spark, store, "t", "x", lo, hi)
    # files actually scheduled: count distinct input files in the scan
    n_files = (
        pruned.select(F.input_file_name().alias("f")).distinct().count()
    )
    assert n_files < len(manifest), (n_files, len(manifest))

    full = (
        spark.read.parquet(store.data_path("t"))
        .filter(F.col("x").between(lo, hi))
    )
    assert sorted(r["id"] for r in pruned.collect()) == sorted(
        r["id"] for r in full.collect()
    )
    assert pruned.count() > 0  # non-vacuous


def test_disjoint_range_reads_nothing(spark, tmp_path):
    store = _clustered_store(spark, tmp_path)
    collect_file_stats(spark, store, "t", ["x"])
    out = read_skipping(spark, store, "t", "x", 5000, 6000)
    assert out.count() == 0


def test_all_null_files_skipped_but_results_exact(spark, tmp_path):
    store = TableStore(str(tmp_path / "nulls"))
    some = spark.createDataFrame(
        [(1, 10), (2, 20), (3, None), (4, None)], "id long, x int"
    )
    # two files: one with values, one all-null (repartition by nullness)
    store.create(
        spark,
        "t",
        some.repartition(2, F.col("x").isNull().cast("int")),
    )
    collect_file_stats(spark, store, "t", ["x"])
    got = {r["id"] for r in read_skipping(spark, store, "t", "x", 0, 15).collect()}
    assert got == {1}


def test_manifest_survives_version_immutability(spark, tmp_path):
    """A manifest belongs to ONE immutable version dir; after a rewrite
    the new version has no manifest until collected again (stale stats
    can never be consulted against new data)."""
    import os

    from dbt_omnata_push_spark.ops.filestats import MANIFEST_NAME

    store = _clustered_store(spark, tmp_path)
    collect_file_stats(spark, store, "t", ["x"])
    v_old = store.data_path("t")
    assert os.path.exists(os.path.join(v_old, MANIFEST_NAME))
    store.overwrite(
        spark, "t", spark.range(10).select(F.col("id"), F.lit(1).alias("x"))
    )
    v_new = store.data_path("t")
    assert v_new != v_old
    assert not os.path.exists(os.path.join(v_new, MANIFEST_NAME))


# ------------------------------------------------------- bloom skipping


def _bloomed_store(spark, tmp_path, n=4000):
    """Cluster on x; collect blooms on y — a column min/max CAN'T prune
    (y is uniform across every file by construction)."""
    from dbt_omnata_push_spark.ops.filestats import collect_file_blooms

    store = TableStore(str(tmp_path / "bl"))
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") * 37 % 1000).alias("x"),
        # sparse point-lookup column: few distinct values, each rare,
        # scattered across the x-clustered layout
        F.when(F.col("id") % 997 == 0, F.concat(F.lit("needle-"), F.col("id")))
        .otherwise(F.concat(F.lit("hay-"), F.col("id") % 7))
        .alias("y"),
    )
    store.create(spark, "t", df)
    compact(spark, store, "t", target_file_bytes=8 * 1024, zorder_by=["x"])
    collect_file_blooms(spark, store, "t", ["y"])
    return store


def test_bloom_skipping_prunes_and_is_lossless(spark, tmp_path):
    from dbt_omnata_push_spark.ops.filestats import read_skipping_eq

    store = _bloomed_store(spark, tmp_path)
    listed = (
        spark.read.parquet(store.data_path("t"))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    assert listed > 4
    pruned = read_skipping_eq(spark, store, "t", "y", "needle-997")
    n_files = pruned.select(F.input_file_name().alias("f")).distinct().count()
    assert n_files < listed, (n_files, listed)
    full = spark.read.parquet(store.data_path("t")).filter(
        F.col("y") == "needle-997"
    )
    assert sorted(r["id"] for r in pruned.collect()) == sorted(
        r["id"] for r in full.collect()
    )
    assert pruned.count() == 1


def test_bloom_no_false_negatives_every_value(spark, tmp_path):
    """Losslessness over ALL present needle values — the Bloom contract
    (false positives allowed, false negatives never)."""
    from dbt_omnata_push_spark.ops.filestats import read_skipping_eq

    store = _bloomed_store(spark, tmp_path)
    needles = [
        r["y"]
        for r in spark.read.parquet(store.data_path("t"))
        .filter(F.col("y").startswith("needle-"))
        .collect()
    ]
    assert needles
    for v in needles:
        assert read_skipping_eq(spark, store, "t", "y", v).count() == 1, v


def test_bloom_absent_value_reads_few_or_no_files(spark, tmp_path):
    from dbt_omnata_push_spark.ops.filestats import read_skipping_eq

    store = _bloomed_store(spark, tmp_path)
    out = read_skipping_eq(spark, store, "t", "y", "never-existed-xyz")
    assert out.count() == 0


def test_bloom_nulls_set_no_bits(spark, tmp_path):
    from dbt_omnata_push_spark.ops.filestats import (
        collect_file_blooms,
        read_skipping_eq,
    )

    store = TableStore(str(tmp_path / "blnull"))
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "id long, y string"
    )
    store.create(spark, "t", df)
    collect_file_blooms(spark, store, "t", ["y"])
    assert {r["id"] for r in read_skipping_eq(spark, store, "t", "y", "a").collect()} == {1}


def test_bloom_probe_rendering_matches_jvm_for_tricky_types(spark, tmp_path):
    """ADVICE r6: Python str(value) diverges from the JVM's
    CAST(col AS STRING) for booleans ('True' vs 'true'), large doubles
    ('1e+16' vs '1.0E16') and timestamps — the probe must render
    through the same cast so pruning stays lossless for EVERY type."""
    import datetime

    from dbt_omnata_push_spark.ops.filestats import (
        collect_file_blooms,
        read_skipping_eq,
    )

    store = TableStore(str(tmp_path / "bltypes"))
    df = spark.createDataFrame(
        [
            (1, True, 1e16, datetime.datetime(2024, 5, 1, 12, 30, 0)),
            (2, False, 0.5, datetime.datetime(2024, 5, 2, 0, 0, 0)),
            (3, True, -3.25, datetime.datetime(2024, 5, 3, 23, 59, 59)),
        ],
        "id long, b boolean, d double, ts timestamp",
    )
    store.create(spark, "t", df)
    collect_file_blooms(spark, store, "t", ["b", "d", "ts"])
    # booleans: Python would render 'True'; JVM renders 'true'
    assert {r["id"] for r in read_skipping_eq(spark, store, "t", "b", True).collect()} == {1, 3}
    # large double: Python '1e+16' vs JVM '1.0E16'
    assert {r["id"] for r in read_skipping_eq(spark, store, "t", "d", 1e16).collect()} == {1}
    assert {r["id"] for r in read_skipping_eq(spark, store, "t", "d", -3.25).collect()} == {3}
    # timestamp: Python isoformat has 'T'; JVM uses a space
    assert {
        r["id"]
        for r in read_skipping_eq(
            spark, store, "t", "ts", datetime.datetime(2024, 5, 2)
        ).collect()
    } == {2}
