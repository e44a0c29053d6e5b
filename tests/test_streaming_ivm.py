"""Streaming IVM (streaming/ivm_stream.py): the continuously-maintained
rollup must equal the batch recompute, stay exact under replay, and
never rescan the base."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_omnata_push_spark.engine.catalog import load_table
from dbt_omnata_push_spark.engine.store import TableStore
from dbt_omnata_push_spark.streaming.ivm_stream import (
    BATCH_COL,
    fold_batch,
    ivm_maintained_stream,
)

from .conftest import SF_SMOKE


def _batch_expected(spark):
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    return {
        r["event_type"]: (r["n_rows"], r["sum_value_cents"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("value_cents").alias("sum_value_cents"),
        )
        .collect()
    }


def test_stream_equals_batch(spark, tmp_path):
    store = TableStore(str(tmp_path / "ivm"))
    ivm_maintained_stream(
        spark, SF_SMOKE, store, checkpoint_dir=str(tmp_path / "ckpt")
    )
    got = {
        r["event_type"]: (r["n_rows"], r["sum_value_cents"])
        for r in store.read(spark, "events_type_rollup").collect()
    }
    assert got == _batch_expected(spark)


def test_replayed_batch_is_skipped(spark, tmp_path):
    store = TableStore(str(tmp_path / "rp"))
    b0 = spark.createDataFrame(
        [("click", 100), ("click", 50), ("error", 10)],
        "event_type string, value_cents long",
    )
    assert fold_batch(spark, store, "t", b0, 0, ["event_type"], ["value_cents"]) == "created"
    b1 = spark.createDataFrame(
        [("click", 7)], "event_type string, value_cents long"
    )
    assert fold_batch(spark, store, "t", b1, 1, ["event_type"], ["value_cents"]) == "applied"
    # at-least-once delivery replays batch 1: must be a no-op
    assert fold_batch(spark, store, "t", b1, 1, ["event_type"], ["value_cents"]) == "replayed"
    assert fold_batch(spark, store, "t", b0, 0, ["event_type"], ["value_cents"]) == "replayed"
    got = {
        r["event_type"]: (r["n_rows"], r["sum_value_cents"])
        for r in store.read(spark, "t").collect()
    }
    assert got == {"click": (3, 157), "error": (1, 10)}


def test_restart_with_same_checkpoint_is_noop(spark, tmp_path):
    store = TableStore(str(tmp_path / "rs"))
    ckpt = str(tmp_path / "ckpt2")
    ivm_maintained_stream(spark, SF_SMOKE, store, checkpoint_dir=ckpt)
    v1 = store.current_version("events_type_rollup")
    ivm_maintained_stream(spark, SF_SMOKE, store, checkpoint_dir=ckpt)
    # source progress is checkpointed: nothing new to fold
    assert store.current_version("events_type_rollup") == v1
    got = {
        r["event_type"]: (r["n_rows"], r["sum_value_cents"])
        for r in store.read(spark, "events_type_rollup").collect()
    }
    assert got == _batch_expected(spark)


def test_progress_rides_in_the_same_table(spark, tmp_path):
    store = TableStore(str(tmp_path / "pg"))
    b0 = spark.createDataFrame(
        [("a", 1)], "event_type string, value_cents long"
    )
    fold_batch(spark, store, "t", b0, 5, ["event_type"], ["value_cents"])
    cols = store.read(spark, "t").columns
    assert BATCH_COL in cols  # one atomic swap covers data + progress


def test_fresh_checkpoint_restart_is_not_mistaken_for_replay(spark, tmp_path):
    """ADVICE r6: batch ids restart at 0 under a fresh checkpoint dir.
    Without a run identity the guard would skip every new batch as
    'replayed' and freeze the view; with it, a new run's batch 0
    applies even though the stored watermark is higher."""
    from dbt_omnata_push_spark.engine.store import TableStore
    from dbt_omnata_push_spark.streaming.ivm_stream import checkpoint_run_id

    store = TableStore(str(tmp_path / "store"))
    b0 = spark.createDataFrame(
        [("a", 100), ("b", 50)], "event_type string, value_cents long"
    )
    b1 = spark.createDataFrame([("a", 25)], "event_type string, value_cents long")
    run1 = checkpoint_run_id(str(tmp_path / "ckpt1"))
    args = (["event_type"], ["value_cents"])
    assert fold_batch(spark, store, "t", b0, 0, *args, run_id=run1) == "created"
    assert fold_batch(spark, store, "t", b1, 1, *args, run_id=run1) == "applied"
    # same run, same id -> replay (unchanged semantics)
    assert fold_batch(spark, store, "t", b1, 1, *args, run_id=run1) == "replayed"
    # NEW checkpoint: ids restart at 0 but must still apply
    run2 = checkpoint_run_id(str(tmp_path / "ckpt2"))
    assert run2 != run1
    assert fold_batch(spark, store, "t", b1, 0, *args, run_id=run2) == "applied"
    got = {
        r["event_type"]: r["sum_value_cents"]
        for r in store.read(spark, "t").collect()
    }
    assert got["a"] == 150  # 100 + 25 + 25 (second run's batch applied)


def test_checkpoint_run_id_stable_across_restarts(tmp_path):
    from dbt_omnata_push_spark.streaming.ivm_stream import checkpoint_run_id

    p = str(tmp_path / "ck")
    assert checkpoint_run_id(p) == checkpoint_run_id(p)


def test_minmax_stream_equals_batch_and_replay_safe(spark, tmp_path):
    from dbt_omnata_push_spark.streaming.ivm_stream import (
        checkpoint_run_id,
        fold_batch_minmax,
        ivm_minmax_stream,
    )

    store = TableStore(str(tmp_path / "mm"))
    ivm_minmax_stream(
        spark, SF_SMOKE, store, checkpoint_dir=str(tmp_path / "ckpt")
    )
    got = {
        r["event_type"]: (r["n_rows"], r["min_value_cents"], r["max_value_cents"])
        for r in store.read(spark, "events_type_minmax").collect()
    }
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    want = {
        r["event_type"]: (r["n"], r["mn"], r["mx"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value_cents").alias("mn"),
            F.max("value_cents").alias("mx"),
        )
        .collect()
    }
    assert got == want

    # replay guard: same run + same batch id -> skipped
    run = checkpoint_run_id(str(tmp_path / "ckpt"))
    b = spark.createDataFrame(
        [("click", 1)], "event_type string, value_cents long"
    )
    assert (
        fold_batch_minmax(
            spark, store, "events_type_minmax", b, 0,
            ["event_type"], ["value_cents"], run_id=run,
        )
        == "replayed"
    )


def test_kmv_stream_equals_batch_and_replay_safe(spark, tmp_path):
    """Maintained KMV sketch == from-scratch batch sketch (exact, not
    just within error), replays skip, and state is bounded at k rows
    per group no matter how many batches fold in."""
    from dbt_omnata_push_spark.ops.sketches import kmv_estimate, kmv_sketch
    from dbt_omnata_push_spark.streaming.ivm_stream import (
        RUN_COL,
        fold_batch_kmv,
    )

    store = TableStore(str(tmp_path / "s"))
    k = 16
    rows = [(f"g{i % 3}", i % 40) for i in range(400)]
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    # three micro-batches by slicing
    thirds = [
        spark.createDataFrame(rows[i::3], "event_type string, user_id long")
        for i in range(3)
    ]
    for bid, batch in enumerate(thirds):
        status = fold_batch_kmv(
            spark, store, "t", batch, bid, "event_type", F.col("user_id"), k=k
        )
        assert status in ("created", "applied")
    # replay of batch 1 must be skipped
    assert (
        fold_batch_kmv(
            spark, store, "t", thirds[1], 1, "event_type", F.col("user_id"), k=k
        )
        == "replayed"
    )
    maintained = store.read(spark, "t").drop(BATCH_COL, RUN_COL)
    direct = kmv_sketch(df, "event_type", F.col("user_id"), k=k)
    got = sorted((r["g"], r["h"]) for r in maintained.collect())
    want = sorted((r["g"], r["h"]) for r in direct.select("g", "h").collect())
    assert got == want  # maintained sketch == batch rebuild, exactly
    # state bound: never more than k rows per group
    per_group = maintained.groupBy("g").count().collect()
    assert all(r["count"] <= k for r in per_group)
    # estimator agrees too
    est_m = {r["g"]: r["kmv_est"] for r in kmv_estimate(maintained, k=k).collect()}
    est_d = {r["g"]: r["kmv_est"] for r in kmv_estimate(direct, k=k).collect()}
    assert est_m == est_d
