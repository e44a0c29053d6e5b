"""Store-to-store CDC relay (r7, ops/cdcrelay.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_omnata_push_spark.engine.store import TableStore
from dbt_omnata_push_spark.ops.cdcrelay import (
    PROGRESS_COL,
    relay_changes,
    relay_state,
)


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


def test_relay_converges_and_is_idempotent(spark, tmp_path):
    src = TableStore(str(tmp_path / "src"))
    dst = TableStore(str(tmp_path / "dst"))
    src.create(
        spark, "t", spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    )
    assert relay_changes(spark, src, "t", dst, "f", "k") == 1  # bootstrap
    assert _rows(relay_state(spark, dst, "f")) == [(1, "a"), (2, "b")]
    # three more commits: update, insert, delete
    src.merge_upsert(
        spark, "t", spark.createDataFrame([(1, "A"), (3, "c")], "k long, v string"), "k"
    )
    src.merge_upsert(
        spark, "t", spark.createDataFrame([(4, "d")], "k long, v string"), "k"
    )
    src.delete_where(spark, "t", F.col("k") == 2)
    assert relay_changes(spark, src, "t", dst, "f", "k") == 3
    want = _rows(src.read(spark, "t"))
    assert _rows(relay_state(spark, dst, "f")) == want == [
        (1, "A"), (3, "c"), (4, "d"),
    ]
    # idempotent: caught up -> 0 versions applied, state unchanged
    assert relay_changes(spark, src, "t", dst, "f", "k") == 0
    assert _rows(relay_state(spark, dst, "f")) == want


def test_relay_progress_rides_in_destination(spark, tmp_path):
    src = TableStore(str(tmp_path / "src"))
    dst = TableStore(str(tmp_path / "dst"))
    src.create(spark, "t", spark.createDataFrame([(1, "a")], "k long, v string"))
    relay_changes(spark, src, "t", dst, "f", "k")
    assert PROGRESS_COL in dst.read(spark, "f").columns
    v = dst.current_version("f")
    # no source changes -> no destination commit (version unchanged)
    relay_changes(spark, src, "t", dst, "f", "k")
    assert dst.current_version("f") == v


def test_relay_resumes_mid_stream(spark, tmp_path):
    """Relay after SOME versions were already applied picks up exactly
    the remaining ones (crash-resume semantics)."""
    src = TableStore(str(tmp_path / "src"))
    dst = TableStore(str(tmp_path / "dst"))
    src.create(spark, "t", spark.createDataFrame([(1, "a")], "k long, v string"))
    relay_changes(spark, src, "t", dst, "f", "k")
    src.merge_upsert(spark, "t", spark.createDataFrame([(2, "b")], "k long, v string"), "k")
    relay_changes(spark, src, "t", dst, "f", "k")  # applied v1
    src.merge_upsert(spark, "t", spark.createDataFrame([(3, "c")], "k long, v string"), "k")
    src.merge_upsert(spark, "t", spark.createDataFrame([(4, "d")], "k long, v string"), "k")
    assert relay_changes(spark, src, "t", dst, "f", "k") == 2  # v2+v3 only
    assert _rows(relay_state(spark, dst, "f")) == _rows(src.read(spark, "t"))


def test_batched_span_equals_per_version_walk(spark, tmp_path):
    """Default batch mode (one net diff + one commit for the whole
    pending span) converges to the same state as step_versions=True,
    with exactly ONE destination commit for N pending versions."""
    def build_src(root):
        src = TableStore(str(root))
        src.create(
            spark, "t",
            spark.createDataFrame([(1, "a"), (2, "b"), (5, "e")], "k long, v string"),
        )
        return src

    src = build_src(tmp_path / "src")
    batch_dst = TableStore(str(tmp_path / "b"))
    step_dst = TableStore(str(tmp_path / "s"))
    relay_changes(spark, src, "t", batch_dst, "f", "k")
    relay_changes(spark, src, "t", step_dst, "f", "k")
    # three pending commits: update+insert, delete, another insert
    src.merge_upsert(
        spark, "t",
        spark.createDataFrame([(1, "A"), (3, "c")], "k long, v string"), "k",
    )
    src.delete_where(spark, "t", F.col("k") == 5)
    src.merge_upsert(
        spark, "t", spark.createDataFrame([(9, "z")], "k long, v string"), "k"
    )
    v_before = batch_dst.current_version("f")
    assert relay_changes(spark, src, "t", batch_dst, "f", "k") == 3
    assert relay_changes(
        spark, src, "t", step_dst, "f", "k", step_versions=True
    ) == 3
    assert batch_dst.current_version("f") == v_before + 1  # one commit
    assert step_dst.current_version("f") == v_before + 3  # three commits
    assert _rows(relay_state(spark, batch_dst, "f")) == _rows(
        relay_state(spark, step_dst, "f")
    ) == _rows(src.read(spark, "t"))


def test_track_source_registers_tracking_and_manifests(spark, tmp_path):
    """track_source=True (r11): the relay enables CHANGE_TRACKING on
    the source, so commits AFTER registration persist row manifests
    and the next relay read composes them (no two-version join)."""
    import os

    from pyspark.sql import functions as F

    from dbt_omnata_push_spark.engine.store import TableStore
    from dbt_omnata_push_spark.ops.cdcrelay import relay_changes, relay_state

    src = TableStore(str(tmp_path / "src"))
    dst = TableStore(str(tmp_path / "dst"))
    base = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    src.create(spark, "t", base)
    assert not src.change_tracking("t")
    relay_changes(spark, src, "t", dst, "f", "k", track_source=True)
    assert src.change_tracking("t")
    patch = spark.range(3).select(
        F.col("id").alias("k"), F.lit(-1).alias("v")
    )
    src.merge_upsert(spark, "t", patch, "k")
    v = src.current_version("t")
    assert os.path.isdir(src._cdc_rows_dir("t", v))
    relay_changes(spark, src, "t", dst, "f", "k")
    got = sorted(
        (r["k"], r["v"]) for r in relay_state(spark, dst, "f").collect()
    )
    assert got == sorted(
        [(k, -1 if k < 3 else 2 * k) for k in range(20)]
    )
