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
