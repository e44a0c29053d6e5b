"""Structured Streaming wrapper: availableNow runs match batch results."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_omnata_push_spark.engine.catalog import load_table
from dbt_omnata_push_spark.streaming import (
    hourly_counts_stream,
    run_stream_once,
    sessionless_dedup_stream,
)


def test_hourly_stream_matches_batch(spark, sf_dir):
    out = run_stream_once(hourly_counts_stream(spark, sf_dir), "t_hourly")
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias("value_millis"),
        )
    )
    assert out.count() == batch.count()
    assert (
        out.join(batch, ["window_start", "event_type", "n_events", "value_millis"])
        .count()
        == batch.count()
    )


def test_dedup_stream(spark, sf_dir):
    out = run_stream_once(sessionless_dedup_stream(spark, sf_dir), "t_dedup")
    n_events = load_table(spark, sf_dir, "events").count()
    assert out.count() == n_events  # event_id already unique
    assert out.select("event_id").distinct().count() == n_events


def test_stream_ingest_exactly_once(spark, sf_dir, tmp_path):
    """Exactly-once table state: restart ingests nothing, batch replay
    deduplicates via keyed upsert."""
    from dbt_omnata_push_spark.engine.catalog import load_table
    from dbt_omnata_push_spark.engine.store import TableStore
    from dbt_omnata_push_spark.streaming.ingest import (
        ingest_batch,
        stream_events_into_store,
    )

    store = TableStore(str(tmp_path / "warehouse"))
    cp = str(tmp_path / "cp")
    stream_events_into_store(spark, sf_dir, store, "events_ingest", cp)

    n_src = load_table(spark, sf_dir, "events").count()
    ingested = store.read(spark, "events_ingest")
    assert ingested.count() == n_src
    assert ingested.select("event_id").distinct().count() == n_src
    assert "batch_id" in ingested.columns

    # restart with the same checkpoint: source is drained, no new rows
    stream_events_into_store(spark, sf_dir, store, "events_ingest", cp)
    assert store.read(spark, "events_ingest").count() == n_src

    # simulate a replayed micro-batch (task retry after partial failure)
    replay = load_table(spark, sf_dir, "events").limit(100)
    ingest_batch(spark, store, "events_ingest", replay, batch_id=0)
    assert store.read(spark, "events_ingest").count() == n_src


def _multi_file_events(spark, sf_dir, tmp_path, n_files=4):
    """Copy events into n time-ordered files so maxFilesPerTrigger=1
    yields n micro-batches arriving in event-time order. The file source
    picks up files oldest-mtime-first, so mtimes are pinned in range
    order (part-00000 = earliest ts range) — otherwise arrival order is
    arbitrary and older batches would be dropped as late data."""
    import glob
    import os
    import time

    ev = spark.read.option("mergeSchema", "true").parquet(f"{sf_dir}/events.parquet")
    out = str(tmp_path / "events_stream")
    ev.repartitionByRange(n_files, "ts").write.mode("overwrite").parquet(out)
    base = time.time() - 3600
    for i, path in enumerate(sorted(glob.glob(f"{out}/part-*.parquet"))):
        os.utime(path, (base + i * 60, base + i * 60))
    return out


def test_session_stream_multibatch_state_merge(spark, sf_dir, tmp_path):
    """Session aggregation across 4 micro-batches (append mode): every
    session the watermark has closed must be emitted exactly as the
    single-pass result computes it — sessions spanning batch boundaries
    merge in the state store before emission. Sessions still open at the
    final watermark are legitimately withheld (the watermark never jumps
    to infinity), so the comparison is on the closed prefix."""
    import datetime

    from dbt_omnata_push_spark.streaming.events import (
        run_stream_once,
        session_window_stream,
    )

    src = _multi_file_events(spark, sf_dir, tmp_path)
    multi = run_stream_once(
        session_window_stream(
            spark, src, glob="*.parquet", max_files_per_trigger=1
        ),
        name="sess_multi",
        mode="append",
    )
    single = run_stream_once(
        session_window_stream(spark, sf_dir), name="sess_single"
    )
    key = lambda df: {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in df.collect()
    }
    multi_k, single_k = key(multi), key(single)
    # append output is a subset: nothing fabricated, nothing double-emitted
    assert multi_k <= single_k
    assert multi.count() == len(multi_k)
    # and it is exactly the closed prefix: every single-pass session that
    # ended before the final watermark (max ts - 2h delay) was emitted
    max_ts = max(r["session_end"] for r in single.collect())
    watermark = max_ts - datetime.timedelta(hours=2, minutes=30)
    closed = {k for k in single_k if k[2] < watermark}
    assert closed <= multi_k
    assert len(multi_k) >= len(closed)


def test_dedup_stream_multibatch_state(spark, sf_dir, tmp_path):
    """dropDuplicates state persists across micro-batches: total output
    equals the batch-side distinct count."""
    from dbt_omnata_push_spark.streaming.events import (
        run_stream_once,
        sessionless_dedup_stream,
    )

    src = _multi_file_events(spark, sf_dir, tmp_path)
    out = run_stream_once(
        sessionless_dedup_stream(
            spark, src, glob="*.parquet", max_files_per_trigger=1
        ),
        name="dedup_multi",
    )
    batch = load_table(spark, sf_dir, "events")
    assert out.count() == batch.select("event_id").distinct().count()


def test_stream_construction_on_empty_landing_dir(spark, tmp_path):
    # The normal state of a streaming landing dir at query start: no
    # files yet. The ts-precision sniff must fall back to the ns schema
    # instead of failing stream construction (ADVICE r3).
    from dbt_omnata_push_spark.streaming.events import (
        _sniff_ts_precision,
        hourly_counts_stream,
        run_stream_once,
    )

    empty = tmp_path / "landing"
    empty.mkdir()
    assert _sniff_ts_precision(spark, str(empty)) == "ns"
    out = run_stream_once(
        hourly_counts_stream(spark, str(empty)), name="empty_landing"
    )
    assert out.count() == 0


def test_type_change_stream_multibatch_state_continuity(spark, sf_dir, tmp_path):
    """The per-user last-type state must carry across micro-batch
    boundaries: 4 time-ordered batches through applyInPandasWithState
    end at exactly the single-batch (and batch-SQL) counts."""
    from dbt_omnata_push_spark.streaming.events import _events_stream, run_stream_once
    from dbt_omnata_push_spark.streaming.stateful import type_change_stream

    src = _multi_file_events(spark, sf_dir, tmp_path)
    multi = run_stream_once(
        type_change_stream(
            _events_stream(spark, src, glob="*.parquet", max_files_per_trigger=1)
        ),
        name="tc_multi",
        mode="update",
    )
    # update mode re-emits a row per key per batch; the FINAL row per
    # user (max count — counts are monotone) is the answer.
    final_multi = {
        r["user_id"]: r["n_type_changes"]
        for r in multi.groupBy("user_id")
        .agg(F.max("n_type_changes").alias("n_type_changes"))
        .collect()
    }
    single = run_stream_once(
        type_change_stream(_events_stream(spark, sf_dir)), name="tc_single"
    )
    final_single = {r["user_id"]: r["n_type_changes"] for r in single.collect()}
    assert final_multi == final_single


def test_sniff_reraises_non_schema_errors(spark, tmp_path):
    # Only the empty-dir UNABLE_TO_INFER_SCHEMA case may fall back to
    # 'ns' (ADVICE r4): a corrupt parquet footer must surface, not
    # silently build the wrong stream schema.
    import pytest as _pytest

    from dbt_omnata_push_spark.streaming.events import _sniff_ts_precision

    bad = tmp_path / "landing_bad"
    bad.mkdir()
    (bad / "events.parquet").write_bytes(b"PAR1 this is not a parquet file")
    with _pytest.raises(Exception) as ei:
        _sniff_ts_precision(spark, str(bad))
    assert "UNABLE_TO_INFER_SCHEMA" not in str(ei.value)


def test_category_rollup_keeps_unknown_event_types(spark, tmp_path):
    # LEFT join + 'other' fallback (ADVICE r4): an event_type missing
    # from the static dim groups under 'other' instead of dropping.
    import datetime

    from dbt_omnata_push_spark.streaming.events import (
        category_rollup_stream,
        run_stream_once,
    )

    landing = tmp_path / "landing_unknown"
    landing.mkdir()
    t0 = datetime.datetime(2026, 1, 1, 10, 30)
    rows = [
        (1, t0, 7, "click", 1.5, "{}"),
        (2, t0, 8, "mystery_type", 2.5, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(landing / "staged"))
    out = run_stream_once(
        category_rollup_stream(spark, str(landing / "staged"), glob="*.parquet"),
        name="rollup_unknown",
    )
    cats = {r["category"]: r["n_events"] for r in out.collect()}
    assert cats == {"interaction": 1, "other": 1}


def test_left_outer_join_stream_multibatch_matches_batch(spark, sf_dir, tmp_path):
    """LEFT OUTER stream-stream join across 4 micro-batches: eviction
    happens incrementally as the watermark advances batch-over-batch,
    and the union of matched + NULL-flushed rows must equal the batch
    LEFT JOIN (same cutoff) exactly."""
    from pyspark.sql import functions as F

    from dbt_omnata_push_spark.streaming.events import (
        error_click_left_join_stream,
        run_stream_once,
    )

    src = _multi_file_events(spark, sf_dir, tmp_path)
    pairs = run_stream_once(
        error_click_left_join_stream(
            spark, src, glob="*.parquet", max_files_per_trigger=1
        ),
        name="lo_multi",
        mode="append",
    )
    got = {
        (r["e_id"], r["n"])
        for r in pairs.groupBy("e_id")
        .agg(F.count("c_ts").alias("n"))
        .collect()
    }

    ev = spark.read.option("mergeSchema", "true").parquet(src)
    mx = (
        ev.filter(F.col("event_type").isin("error", "click"))
        .groupBy("event_type")
        .agg(F.max("ts").alias("m"))
        .agg(F.min("m").alias("m"))
        .collect()[0]["m"]
    )
    if isinstance(mx, int):
        cutoff = (mx // 1_000_000_000 - 12600) * 1_000_000_000
        ts_col = F.col("ts")
    else:
        import calendar
        import datetime

        cutoff = datetime.datetime.utcfromtimestamp(
            calendar.timegm(mx.timetuple()) - 12600
        )
        ts_col = F.col("ts")
    e = ev.filter((F.col("event_type") == "error") & (ts_col <= F.lit(cutoff))).select(
        F.col("event_id").alias("e_id"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("e_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"), F.col("ts").alias("c_ts")
    )
    want = {
        (r["e_id"], r["n"])
        for r in e.join(
            c,
            (e["u"] == c["u"])
            & (c["c_ts"] >= F.expr("e_ts - INTERVAL 30 MINUTE"))
            & (c["c_ts"] < F.col("e_ts")),
            "left_outer",
        )
        .groupBy("e_id")
        .agg(F.count("c_ts").alias("n"))
        .collect()
    }
    assert got == want
    assert any(n == 0 for _, n in got)  # the outer path actually fired


def test_lsh_dedup_stream_cross_batch_state(spark, tmp_path):
    """A near-duplicate arriving in a LATER micro-batch than its
    original is dropped by the maintained index (cross-batch state),
    and the survivor set equals the closed-form batch computation."""
    import os

    from pyspark.sql import functions as F

    from dbt_omnata_push_spark.llmops.dedup import near_duplicate_pairs
    from dbt_omnata_push_spark.streaming.dedup_stream import (
        run_docs_lsh_dedup_stream,
        stage_ordered_batches,
    )

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    rows = [
        # batch 1 (ids 1-2): original + an unrelated doc
        (1, base * 3),
        (2, "completely different content " + "unique tokens here " * 5),
        # batch 2 (ids 3-4): near-dup of doc 1 (later batch!) + novel
        (3, base * 3 + "tiny tail change"),
        (4, "another novel document " + "with its own words " * 5),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    landing = str(tmp_path / "landing")
    stage_ordered_batches(docs, landing, n_batches=2)
    out_dir, idx_dir = str(tmp_path / "out"), str(tmp_path / "index")
    run_docs_lsh_dedup_stream(
        spark, landing, idx_dir, out_dir, docs.schema,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    got = sorted(
        r["doc_id"] for r in spark.read.parquet(out_dir).collect()
    )
    # closed form: drop doc_b of every verified pair
    dropped = {
        r["doc_b"]
        for r in near_duplicate_pairs(docs, threshold=0.3).collect()
    }
    assert 3 in dropped  # the cross-batch near-dup was really dropped
    assert got == sorted({1, 2, 3, 4} - dropped)
    # the index holds ALL seen docs (rejects too — they block later dups)
    assert spark.read.parquet(idx_dir).count() == 4
    # two micro-batches actually ran (one file per trigger)
    assert len([e for e in os.listdir(landing) if e.endswith(".parquet")]) == 2
