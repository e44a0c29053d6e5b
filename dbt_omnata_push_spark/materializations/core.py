"""Core materializations: view, table, incremental, tracking_table."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..engine.dag import RunResult
from ..engine.model import Context


def materialize_view(engine, model) -> RunResult:
    df = engine.build_df(model)
    engine._publish(model.name, df, nonstore=True)
    return RunResult(model.name, "success", message="view published")


def materialize_table(engine, model) -> RunResult:
    df = engine.build_df(model)
    engine.store.overwrite(engine.spark, model.name, df)
    n = engine.store.read(engine.spark, model.name).count()
    engine._publish(
        model.name,
        engine.store.read(engine.spark, model.name),
        nonstore=False,
    )
    return RunResult(model.name, "success", rows_affected=n)


def materialize_incremental(engine, model) -> RunResult:
    """Stock dbt incremental (transactions_daily.sql:1-3):
    first run CTAS; later runs apply the configured
    ``incremental_strategy`` to rows passing the model's own
    is_incremental() filter —

    - ``merge`` (default with unique_key): keyed upsert; on this store
      merge IS delete+insert (anti-join on keys + union), so dbt's
      delete+insert strategy is the same commit;
    - ``append`` (default without unique_key);
    - ``insert_overwrite``: dynamic-partition replacement — partitions
      present in the batch swap wholesale, untouched partitions
      hard-link (the large time-partitioned-table strategy).
    """
    ctx = Context(engine, model)
    df = engine.build_df(model)
    strategy = model.config.get("incremental_strategy")
    if not ctx.is_incremental():
        engine.store.overwrite(
            engine.spark, model.name, df,
            partition_by=model.config.get("partition_by"),
        )
    elif df.isEmpty():
        # Empty incremental delta: commit NOTHING (r12). A 0-row
        # append/merge would still cut a new table version, so every
        # downstream stream would report has-data and every CDC
        # consumer would walk a vacuous commit — in Snowflake a 0-row
        # DML leaves streams silent. isEmpty, not count: one task on
        # one partition suffices to prove emptiness.
        out = engine.store.read(engine.spark, model.name)
        engine._publish(model.name, out, nonstore=False)
        return RunResult(
            model.name,
            "success",
            rows_affected=out.count(),
            message="empty incremental batch — no commit",
        )
    elif strategy == "insert_overwrite":
        engine.store.insert_overwrite(engine.spark, model.name, df)
    else:
        key = model.config.get("unique_key")
        if strategy not in (None, "merge", "delete+insert", "append"):
            raise ValueError(f"unknown incremental_strategy: {strategy}")
        if key and strategy != "append":
            engine.store.merge_upsert(engine.spark, model.name, df, key)
        else:
            engine.store.append(engine.spark, model.name, df)
    out = engine.store.read(engine.spark, model.name)
    engine._publish(model.name, out, nonstore=False)
    return RunResult(model.name, "success", rows_affected=out.count())


def materialize_tracking_table(engine, model) -> RunResult:
    """tracking_table (macros/tracking_table_materialization.sql:17-35).

    Branches:
    (a) not exists            -> CTAS                       (line 18)
    (b) forced refresh        -> rebuild; the reference's rename-to-
        backup/CTAS/drop-backup dance (lines 19-27) collapses into the
        store's version-pointer swap
    (c) else                  -> upsert on unique_key with schema
        widening (lines 28-35)
    Full refresh obeys var 'drop-omnata-task-tables', NOT --full-refresh
    (line 5) — the tables must survive a normal full refresh.
    """
    drop_var = bool(engine.vars.get("drop-omnata-task-tables", False))
    df = engine.build_df(model)
    if not engine.store.exists(model.name) or drop_var:
        from . import tracking as _tracking

        engine.store.overwrite(
            engine.spark,
            model.name,
            df,
            partition_by=model.config.get(
                "partition_by", _tracking.PARTITION_BY.get(model.name)
            ),
        )
    else:
        key = model.config.get("unique_key")
        if not key:
            raise ValueError(f"tracking_table {model.name} requires unique_key")
        engine.store.merge_upsert(engine.spark, model.name, df, key)
    out = engine.store.read(engine.spark, model.name)
    engine._publish(model.name, out, nonstore=False)
    return RunResult(model.name, "success", rows_affected=out.count())


def high_watermark_incremental(ctx: Context, df, watermark_col: str):
    """Helper for model builders: apply the reference's scalar-subquery
    watermark filter (transactions_daily.sql:19) on incremental runs."""
    if not ctx.is_incremental():
        return df
    existing = ctx.this_df()
    if existing is None:
        return df
    wm = existing.agg(F.max(watermark_col).alias("wm")).collect()[0]["wm"]
    if wm is None:
        return df
    return df.filter(F.col(watermark_col) > F.lit(wm))
