"""Store-to-store CDC relay: the Snowflake STREAM-consumer / Delta CDF
pipeline shape (r7).

A downstream table follows an upstream store table by consuming its
change-data-feed version-by-version — the pattern behind "dbt
incremental on a stream": the consumer tracks the last version it
applied (IN the destination table, so one atomic version swap covers
data + progress, same discipline as streaming/ivm_stream.py) and each
relay run applies only the versions committed since. Cost per run is
O(changed rows x versions behind), never a rescan of the source.

Deletes relay as deletes, updates as postimage upserts — the
destination converges to the source's current state from changes
alone (equality pytest), which is exactly what a Snowflake
`INSERT ... FROM stream` consumer guarantees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.store import TableStore

PROGRESS_COL = "_src_version"


def relay_changes(
    spark: SparkSession,
    src: TableStore,
    src_table: str,
    dst: TableStore,
    dst_table: str,
    unique_key: str,
    step_versions: bool = False,
    track_source: bool = False,
) -> int:
    """Apply all source versions not yet applied to the destination.
    Returns the number of versions covered (0 = already caught up).

    By default the whole pending span is consumed as ONE net change set
    (``read_changes(applied, current)``) and committed with one state
    rewrite — the Delta CDF ``startingVersion -> endingVersion`` batch
    consumer: N pending versions cost one diff + one write instead of
    N. ``step_versions=True`` walks version-by-version instead (the
    strict stream-consumer shape, one commit per source version —
    useful when the destination must expose every intermediate state).

    ``track_source=True`` enables CHANGE_TRACKING on the source (r11):
    the relay is exactly the consumer the store's gated row manifests
    exist for, and source commits made after registration persist
    O(delta) manifests so later relay reads never pay the two-version
    join. It is an explicit OPT-IN because the trade depends on the
    delta/table ratio the relay can't know: with small per-commit
    deltas (the production CDC shape) manifests win outright; when a
    commit rewrites a large fraction of the table, O(delta) ~= O(table)
    and the manifest write cost buys nothing — measured at sf0.1 with
    ~50% deltas, the tracked relay ran 6.2s vs 4.6s untracked, while
    the cdc_rehearsal 1%-delta shape read 3.2x FASTER tracked. The
    default (off) reads through the identical-results fallback.

    Idempotent either way: rerunning applies nothing; progress rides in
    the destination table so a crash mid-relay resumes exactly (in
    batch mode nothing commits until the single version swap)."""
    cur_src = src.current_version(src_table)
    if cur_src is None:
        raise FileNotFoundError(f"source table not found: {src_table}")
    if track_source and not src.change_tracking(src_table):
        src.set_change_tracking(src_table, True)
    if PROGRESS_COL in src.read(spark, src_table).columns:
        raise ValueError(
            f"source table carries reserved column {PROGRESS_COL!r}; "
            "relay progress could not be distinguished from data"
        )

    if dst.exists(dst_table):
        applied = (
            dst.read(spark, dst_table).agg(F.max(PROGRESS_COL)).collect()[0][0]
        )
    else:
        applied = None

    if applied is None:
        # bootstrap: full copy of the source's current state
        snap = src.read(spark, src_table).withColumn(
            PROGRESS_COL, F.lit(cur_src)
        )
        dst.overwrite(spark, dst_table, snap)
        return cur_src + 1

    if int(applied) >= cur_src:
        return 0
    if not step_versions:
        spans = [(int(applied), cur_src)]
    else:
        spans = [(v - 1, v) for v in range(int(applied) + 1, cur_src + 1)]

    n_applied = 0
    for lo, v in spans:
        changes = src.read_changes(spark, src_table, lo, v, unique_key)
        upserts = changes.filter(
            F.col("change_type").isin("insert", "update_postimage")
        ).drop("change_type")
        # Every touched key leaves the old state — a delete removes the
        # row, an upsert replaces it — so ONE anti-join on the union of
        # delete- and upsert-keys replaces the former two sequential
        # anti-joins over the full state (r16, guide §2.4: one scan +
        # one join of the state instead of two; identical set algebra:
        # state \ dels \ upsert_keys == state \ (dels ∪ upsert_keys)).
        # Keys apply as a keyed anti-join (never a collected key list —
        # O(changed) but fully distributed).
        touched = (
            changes.filter(
                F.col("change_type").isin(
                    "insert", "update_postimage", "delete"
                )
            )
            .select(F.col(unique_key).alias("_tk"))
            .distinct()
        )
        state = dst.read(spark, dst_table).drop(PROGRESS_COL)
        kept = state.join(
            touched, state[unique_key].eqNullSafe(touched["_tk"]), "left_anti"
        )
        new_state = kept.unionByName(upserts, allowMissingColumns=True)
        dst.overwrite(
            spark, dst_table, new_state.withColumn(PROGRESS_COL, F.lit(v))
        )
        n_applied += v - lo
    return n_applied


def relay_state(spark: SparkSession, dst: TableStore, dst_table: str) -> DataFrame:
    """The relayed table without the progress column."""
    return dst.read(spark, dst_table).drop(PROGRESS_COL)
