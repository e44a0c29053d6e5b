"""Streaming incremental view maintenance: a foreachBatch loop that
folds each micro-batch's rows into a STORED aggregate via the IVM
machinery (ops/ivm.py) — a continuously-maintained materialized view.

This composes two existing guarantees into the shape a 100 TB rollup
pipeline actually runs:
- per-batch cost is O(batch + touched groups), never a rescan of the
  base table (ops/ivm.apply_cdc);
- exactly-once under micro-batch REPLAY: unlike a keyed upsert
  (streaming/ingest.py), delta folding is not naturally idempotent —
  re-applying a batch double-counts. The maintained table therefore
  carries the last applied batch id IN the same table (one atomic
  version swap covers data + progress), and a replayed batch id is
  skipped. A separate progress table would reintroduce the
  torn-write window between two non-atomic commits.
- the replay guard is scoped to a RUN IDENTITY, not the bare batch
  id (ADVICE r6): Structured Streaming batch ids restart at 0 under
  a fresh checkpoint directory, so "batch_id <= last" alone would
  silently skip every batch of a restarted pipeline and leave the
  view permanently stale. The maintained table stores the checkpoint
  run id next to the batch id; a lower batch id only counts as a
  replay when it arrives from the SAME run.

Verification: stream result == batch groupBy over the same source
(tests/test_streaming_ivm.py), plus a forced-replay test.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.store import TableStore
from ..ops.ivm import apply_cdc, build_agg
from .events import _events_stream

BATCH_COL = "_last_batch"
RUN_COL = "_run_id"


def checkpoint_run_id(checkpoint_dir: str) -> str:
    """Stable identity for one checkpoint lifetime.

    A uuid marker file inside the checkpoint directory: restarts from
    the same checkpoint read the same id (batch ids continue, replays
    are detectable); wiping/recreating the checkpoint dir mints a new
    id (batch ids restart at 0 and must NOT look like replays)."""
    import os
    import uuid

    os.makedirs(checkpoint_dir, exist_ok=True)
    marker = os.path.join(checkpoint_dir, "_sg_run_id")
    try:
        with open(marker) as f:
            return f.read().strip()
    except OSError:
        run_id = uuid.uuid4().hex
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write(run_id)
        os.replace(tmp, marker)
        return run_id


def fold_batch(
    spark: SparkSession,
    store: TableStore,
    table: str,
    batch_df: DataFrame,
    batch_id: int,
    keys: list[str],
    sum_cols: list[str],
    run_id: str = "default",
) -> str:
    """Fold one micro-batch of INSERT rows into the maintained
    aggregate. Returns 'applied' | 'replayed' | 'created'.

    A batch is a replay ONLY if its id is <= the stored watermark AND
    it comes from the same checkpoint run (ADVICE r6: a fresh
    checkpoint restarts batch ids at 0; without the run check every
    new batch would be mis-skipped and the view frozen)."""
    changes = batch_df.withColumn("change_type", F.lit("insert"))
    if store.exists(table):
        cur = store.read(spark, table)
        head = cur.select(F.max(BATCH_COL), F.any_value(RUN_COL)).collect()[0]
        last, stored_run = head[0], head[1]
        if last is not None and stored_run == run_id and batch_id <= last:
            return "replayed"  # at-least-once delivery; effect once
        new = apply_cdc(
            cur.drop(BATCH_COL, RUN_COL), changes, keys, sum_cols
        )
        status = "applied"
    else:
        new = build_agg(batch_df, keys, sum_cols)
        status = "created"
    store.overwrite(
        spark,
        table,
        new.withColumn(BATCH_COL, F.lit(batch_id)).withColumn(
            RUN_COL, F.lit(run_id)
        ),
    )
    return status


def ivm_maintained_stream(
    spark: SparkSession,
    sf_dir: str,
    store: TableStore,
    table: str = "events_type_rollup",
    checkpoint_dir: str | None = None,
) -> None:
    """Maintain a per-event-type (count, exact cents sum) rollup from
    the events stream (availableNow trigger: drains the source, then
    stops). Values are fixed-point longs so the maintained sums are
    integer-exact against the batch oracle."""
    stream = _events_stream(spark, sf_dir).select(
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
    )

    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="sg_ivm_stream_")
    run_id = checkpoint_run_id(ckpt)

    def _fold(bdf: DataFrame, bid: int) -> None:
        fold_batch(
            spark,
            store,
            table,
            bdf,
            bid,
            ["event_type"],
            ["value_cents"],
            run_id=run_id,
        )

    (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def fold_batch_minmax(
    spark: SparkSession,
    store: TableStore,
    table: str,
    batch_df: DataFrame,
    batch_id: int,
    keys: list[str],
    mm_cols: list[str],
    run_id: str = "default",
) -> str:
    """MIN/MAX companion to fold_batch (r7): an INSERT-ONLY stream
    makes min/max algebraically self-maintainable (least/greatest fold
    — the targeted-recompute tier in ops/ivm.apply_cdc_minmax exists
    only for deletes, which a micro-batch append feed never emits).
    Same run-scoped replay guard, same atomic data+progress commit."""
    from ..ops.ivm import apply_cdc_minmax, build_minmax

    changes = batch_df.withColumn("change_type", F.lit("insert"))
    if store.exists(table):
        cur = store.read(spark, table)
        head = cur.select(F.max(BATCH_COL), F.any_value(RUN_COL)).collect()[0]
        last, stored_run = head[0], head[1]
        if last is not None and stored_run == run_id and batch_id <= last:
            return "replayed"
        # insert-only: the recompute tier never fires, so base_new is
        # only consulted for groups a DELETE endangered — pass an empty
        # frame shaped like the batch to make that invariant explicit
        # (a delete appearing here would recompute against nothing and
        # fail loudly rather than silently corrupt).
        new = apply_cdc_minmax(
            cur.drop(BATCH_COL, RUN_COL),
            changes,
            batch_df.limit(0),
            keys,
            mm_cols,
        )
        status = "applied"
    else:
        new = build_minmax(batch_df, keys, mm_cols)
        status = "created"
    store.overwrite(
        spark,
        table,
        new.withColumn(BATCH_COL, F.lit(batch_id)).withColumn(
            RUN_COL, F.lit(run_id)
        ),
    )
    return status


def ivm_minmax_stream(
    spark: SparkSession,
    sf_dir: str,
    store: TableStore,
    table: str = "events_type_minmax",
    checkpoint_dir: str | None = None,
) -> None:
    """Continuously-maintained per-event-type (count, min, max) of the
    fixed-point cents value over the events stream."""
    stream = _events_stream(spark, sf_dir).select(
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="sg_ivm_mm_stream_")
    run_id = checkpoint_run_id(ckpt)

    def _fold(bdf: DataFrame, bid: int) -> None:
        fold_batch_minmax(
            spark,
            store,
            table,
            bdf,
            bid,
            ["event_type"],
            ["value_cents"],
            run_id=run_id,
        )

    (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def fold_batch_kmv(
    spark: SparkSession,
    store: TableStore,
    table: str,
    batch_df: DataFrame,
    batch_id: int,
    key_col: str,
    col,
    k: int = 256,
    run_id: str = "default",
) -> str:
    """Streaming DISTINCT-COUNT maintenance via mergeable KMV sketches
    (r7c): each micro-batch's distinct (group, md5) hashes union into
    the stored k-row-per-group sketch — re-rank, cut at k — so the
    per-commit cost is O(batch + k x groups), never a rescan, and the
    stored state is bounded at k rows/group regardless of how many
    distinct values streamed past. Because the sketch and its
    estimator are deterministic md5 arithmetic (ops/sketches.py), the
    MAINTAINED estimate equals a from-scratch batch rebuild exactly —
    the property HLL streaming counters can only claim within error
    bounds. Same run-scoped replay guard and atomic data+progress
    commit as fold_batch."""
    from pyspark.sql import Window

    from ..ops.sketches import kmv_sketch

    batch_sketch = kmv_sketch(batch_df, key_col, col, k).select("g", "h")
    if store.exists(table):
        cur = store.read(spark, table)
        head = cur.select(F.max(BATCH_COL), F.any_value(RUN_COL)).collect()[0]
        last, stored_run = head[0], head[1]
        if last is not None and stored_run == run_id and batch_id <= last:
            return "replayed"
        pool = cur.select("g", "h").unionByName(batch_sketch).distinct()
        status = "applied"
    else:
        pool = batch_sketch
        status = "created"
    w = Window.partitionBy("g").orderBy("h")
    merged = (
        pool.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    )
    store.overwrite(
        spark,
        table,
        merged.withColumn(BATCH_COL, F.lit(batch_id)).withColumn(
            RUN_COL, F.lit(run_id)
        ),
    )
    return status


def ivm_kmv_stream(
    spark: SparkSession,
    sf_dir: str,
    store: TableStore,
    table: str = "events_type_kmv",
    k: int = 256,
    checkpoint_dir: str | None = None,
) -> None:
    """Continuously-maintained per-event-type distinct-user KMV sketch
    over the events stream."""
    stream = _events_stream(spark, sf_dir).select("event_type", "user_id")
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="sg_ivm_kmv_stream_")
    run_id = checkpoint_run_id(ckpt)

    def _fold(bdf: DataFrame, bid: int) -> None:
        fold_batch_kmv(
            spark,
            store,
            table,
            bdf,
            bid,
            "event_type",
            F.col("user_id"),
            k=k,
            run_id=run_id,
        )

    (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
