"""SCD2 ``snapshot`` materialization (dbt's fourth standard class).

The reference scaffolds ``snapshots/`` but never implements it
(snapshots/.gitkeep; SURVEY.md §2 notes the gap) — a reverse-ETL user
tracking dimension changes hits this early, so the engine supplies the
standard dbt semantics on top of the versioned store:

- every source row becomes a history row with ``dbt_valid_from`` /
  ``dbt_valid_to`` / ``dbt_is_current`` / ``dbt_scd_id``;
- strategy ``check``: a row "changed" when any of ``check_cols``
  (or every non-key column for ``check_cols='all'``) differs,
  null-safely; changed keys close the open row at the snapshot
  timestamp and insert a fresh open row;
- strategy ``timestamp``: a row "changed" when the source's
  ``updated_at`` is strictly newer than the open row's; intervals are
  bounded by the source's own timestamps instead of the run time;
- ``invalidate_hard_deletes``: keys absent from the source close their
  open row (off by default, like dbt).

Scale: one key-equi shuffle between the OPEN rows and the source per
run. Closed history — the part that grows without bound — is never
read or shuffled: ``TableStore.scd2_commit`` hard-links the previous
closed partition and appends only the newly-closed rows, so a snapshot
run is O(open + changed), not O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.dag import RunResult
from ..engine.store import TableStore

META_COLS = ("dbt_scd_id", "dbt_valid_from", "dbt_valid_to", "dbt_is_current")


def _with_meta(src: DataFrame, unique_key: str, valid_from) -> DataFrame:
    """Stamp a source frame as freshly-opened history rows."""
    vf = valid_from if not isinstance(valid_from, str) else F.lit(valid_from).cast(
        "timestamp"
    )
    return src.select(
        "*",
        F.md5(
            F.concat_ws(
                "|", F.col(unique_key).cast("string"), vf.cast("string")
            )
        ).alias("dbt_scd_id"),
        vf.alias("dbt_valid_from"),
        F.lit(None).cast("timestamp").alias("dbt_valid_to"),
        F.lit(True).alias("dbt_is_current"),
    )


def snapshot_apply(
    spark: SparkSession,
    store: TableStore,
    name: str,
    src: DataFrame,
    unique_key: str,
    *,
    strategy: str = "check",
    check_cols: list[str] | str = "all",
    updated_at: str | None = None,
    snapshot_ts: str | None = None,
    invalidate_hard_deletes: bool = False,
) -> None:
    """Run one snapshot round of ``src`` into history table ``name``."""
    if strategy not in ("check", "timestamp"):
        raise ValueError(f"unknown snapshot strategy: {strategy}")
    if strategy == "timestamp":
        if not updated_at:
            raise ValueError("timestamp strategy requires updated_at")
        valid_from_expr = F.col(updated_at)
    else:
        if snapshot_ts is None:
            raise ValueError("check strategy requires snapshot_ts")
        valid_from_expr = F.lit(snapshot_ts).cast("timestamp")

    if not store.exists(name):
        store.create(
            spark,
            name,
            _with_meta(src, unique_key, valid_from_expr),
            partition_by="dbt_is_current",
        )
        return

    target = store.read(spark, name)
    open_rows = target.filter(F.col("dbt_is_current"))
    data_cols = [c for c in src.columns]

    if strategy == "timestamp":
        change_pred = F.col(f"s.{updated_at}") > F.col(f"t.{updated_at}")
        close_ts = F.col(f"s.{updated_at}")
    else:
        cols = (
            [c for c in data_cols if c != unique_key]
            if check_cols == "all"
            else list(check_cols)
        )
        # Null-safe struct comparison: a NULL<->value flip counts as a
        # change, NULL<->NULL does not (dbt check-strategy semantics).
        change_pred = ~F.struct(*[F.col(f"s.{c}") for c in cols]).eqNullSafe(
            F.struct(*[F.col(f"t.{c}") for c in cols])
        )
        close_ts = F.lit(snapshot_ts).cast("timestamp")

    s, t = src.alias("s"), open_rows.alias("t")
    key_eq = F.col(f"s.{unique_key}") == F.col(f"t.{unique_key}")

    changed_keys = (
        s.join(t, key_eq)
        .filter(change_pred)
        .select(F.col(f"s.{unique_key}").alias("_ck"), close_ts.alias("_close_ts"))
    )
    new_keys = s.join(t, key_eq, "left_anti")

    # Open rows for changed keys -> closed at the per-key close ts.
    closed_now = (
        open_rows.join(
            changed_keys, open_rows[unique_key] == changed_keys["_ck"]
        )
        .select(
            *[F.col(c) for c in target.columns if c not in ("dbt_valid_to", "dbt_is_current")],
            F.col("_close_ts").alias("dbt_valid_to"),
            F.lit(False).alias("dbt_is_current"),
        )
        .select(*target.columns)
    )
    if invalidate_hard_deletes:
        deleted = (
            open_rows.join(src, open_rows[unique_key] == src[unique_key], "left_anti")
            .select(
                *[F.col(c) for c in target.columns if c not in ("dbt_valid_to", "dbt_is_current")],
                (F.lit(snapshot_ts).cast("timestamp")
                 if snapshot_ts is not None else F.current_timestamp()).alias("dbt_valid_to"),
                F.lit(False).alias("dbt_is_current"),
            )
            .select(*target.columns)
        )
        closed_now = closed_now.unionByName(deleted)
    # Open rows whose key did NOT change survive untouched (minus
    # hard-deleted ones when invalidation is on).
    unchanged_open = open_rows.join(
        changed_keys, open_rows[unique_key] == changed_keys["_ck"], "left_anti"
    )
    if invalidate_hard_deletes:
        unchanged_open = unchanged_open.join(
            src.select(F.col(unique_key).alias("_sk")).distinct(),
            unchanged_open[unique_key] == F.col("_sk"),
            "left_semi",
        )

    # Fresh open rows: changed keys take their new source values; new
    # keys enter history for the first time.
    reopened = _with_meta(
        s.join(changed_keys, F.col(f"s.{unique_key}") == F.col("_ck")).select(
            *[F.col(f"s.{c}") for c in data_cols], F.col("_close_ts")
        ),
        unique_key,
        F.col("_close_ts"),
    ).drop("_close_ts")
    fresh = _with_meta(new_keys.select(*data_cols), unique_key, valid_from_expr)

    open_df = (
        unchanged_open.select(*target.columns)
        .unionByName(reopened.select(*target.columns))
        .unionByName(fresh.select(*target.columns))
    )
    store.scd2_commit(spark, name, open_df, closed_now)


def materialize_snapshot(engine, model) -> RunResult:
    """``materialized='snapshot'`` dispatch: config mirrors dbt's
    snapshot block (unique_key, strategy, check_cols, updated_at,
    invalidate_hard_deletes); ``snapshot_ts`` comes from run vars so
    tests and oracles are deterministic, defaulting to the wall clock
    like dbt's run_started_at."""
    import datetime

    cfg = model.config
    key = cfg.get("unique_key")
    if not key:
        raise ValueError(f"snapshot {model.name} requires unique_key")
    ts = engine.vars.get("snapshot_ts") or datetime.datetime.now(
        datetime.timezone.utc
    ).strftime("%Y-%m-%d %H:%M:%S")
    src = engine.build_df(model)
    snapshot_apply(
        engine.spark,
        engine.store,
        model.name,
        src,
        key,
        strategy=cfg.get("strategy", "check"),
        check_cols=cfg.get("check_cols", "all"),
        updated_at=cfg.get("updated_at"),
        snapshot_ts=None if cfg.get("strategy") == "timestamp" else ts,
        invalidate_hard_deletes=bool(cfg.get("invalidate_hard_deletes", False)),
    )
    out = engine.store.read(engine.spark, model.name)
    engine._publish(model.name, out, nonstore=False)
    return RunResult(model.name, "success", rows_affected=out.count())


def snapshot_at(history: DataFrame, ts) -> DataFrame:
    """Reconstruct the dimension as it existed at time ``ts`` — SCD2
    time travel. A row is visible when ``dbt_valid_from <= ts`` and its
    interval had not closed (``dbt_valid_to`` NULL or ``> ts``:
    intervals are half-open [from, to)).

    One filter over history, no shuffle. At scale the store lays closed
    history out by valid_to, so a recent ``ts`` prunes most closed
    partitions before the scan.
    """
    t = F.lit(ts).cast("timestamp") if isinstance(ts, str) else ts
    return history.filter(
        (F.col("dbt_valid_from") <= t)
        & (F.col("dbt_valid_to").isNull() | (F.col("dbt_valid_to") > t))
    )


def scd2_temporal_join(
    facts: DataFrame,
    history: DataFrame,
    unique_key: str,
    fact_ts_col: str,
    how: str = "inner",
) -> DataFrame:
    """Point-in-time dimension join: each fact row joins the history
    version that was valid AT ITS OWN timestamp (the correctness rule
    for joining facts to an SCD2 dimension — joining the current row
    backdates later attribute changes onto old facts).

    Plan shape: one equi-join shuffle on the key; the interval
    predicate [valid_from, valid_to) is a residual filter on the
    matched pairs, so no range/theta join materializes. Each fact
    matches at most one version (SCD2 intervals per key are disjoint
    by construction — snapshot_apply closes a row at exactly the
    instant its successor opens).
    """
    t = F.col(fact_ts_col)
    cond = (
        (facts[unique_key] == history[unique_key])
        & (history["dbt_valid_from"] <= t)
        & (history["dbt_valid_to"].isNull() | (history["dbt_valid_to"] > t))
    )
    return facts.join(history, cond, how).drop(history[unique_key])
