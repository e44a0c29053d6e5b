"""Incremental view maintenance (IVM): apply a change-data-feed to a
stored aggregate instead of rescanning the base table.

The scale story for materialized rollups over 100 TB facts: a full
refresh rescans everything; IVM folds the CDC rows (engine/store.py::
read_changes) into the existing aggregate — cost O(changed keys), not
O(table). Supported aggregate shape: per-key COUNT(*) plus SUM of
numeric measures, the self-maintainable family (no MIN/MAX, which
need a rescan on delete of the extreme).

Delta semantics per change_type:
  insert            -> +1 count, +measure
  delete            -> -1 count, -measure
  update_preimage   -> -1 count, -measure
  update_postimage  -> +1 count, +measure
Groups whose maintained count reaches 0 are dropped (the group
disappeared from the base table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_agg(
    df: DataFrame, keys: list[str], sum_cols: list[str]
) -> DataFrame:
    """The maintained shape: per-key COUNT(*) + SUMs + per-measure
    non-null counts.

    The ``nn_<c>`` columns make SUM exactly self-maintainable under
    NULL measures: SQL's SUM is NULL iff zero non-null inputs remain,
    which a maintained sum alone cannot distinguish from a sum of 0
    (deleting the only non-null row must flip the sum back to NULL).
    """
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
        *[F.count(c).cast("long").alias(f"nn_{c}") for c in sum_cols],
    )


def apply_cdc(
    agg: DataFrame,
    changes: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    change_col: str = "change_type",
) -> DataFrame:
    """Fold CDC rows into the aggregate; returns the maintained
    aggregate (equal to rebuilding from the new base state).

    One map-side sign projection + one groupBy on the (bounded) change
    set + one outer join against the aggregate on the group keys: the
    stored aggregate is never rescanned beyond that join, and the base
    table is never touched.
    """
    sign = F.when(
        F.col(change_col).isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    deltas = (
        changes.withColumn("_sign", sign)
        .groupBy(*keys)
        .agg(
            F.sum("_sign").cast("long").alias("_d_n"),
            *[
                F.sum(F.col(c) * F.col("_sign")).alias(f"_d_{c}")
                for c in sum_cols
            ],
            *[
                F.sum(
                    F.when(F.col(c).isNotNull(), F.col("_sign")).otherwise(
                        F.lit(0)
                    )
                )
                .cast("long")
                .alias(f"_dnn_{c}")
                for c in sum_cols
            ],
        )
    )
    # Null-safe key equality: a list-of-names join matches NULL keys to
    # nothing, which would split a NULL-key group into two output rows
    # and break the full-refresh equality contract.
    a, d = agg.alias("a"), deltas.alias("d")
    cond = None
    for k in keys:
        c = F.col(f"a.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = c if cond is None else cond & c
    joined = a.join(d, cond, "full_outer")
    key_cols = [
        F.coalesce(F.col(f"a.{k}"), F.col(f"d.{k}")).alias(k) for k in keys
    ]
    def _nn(c: str):
        return F.coalesce(F.col(f"nn_{c}"), F.lit(0)) + F.coalesce(
            F.col(f"_dnn_{c}"), F.lit(0)
        )

    maintained = joined.select(
        *key_cols,
        (
            F.coalesce(F.col("n_rows"), F.lit(0))
            + F.coalesce(F.col("_d_n"), F.lit(0))
        ).alias("n_rows"),
        # SUM over zero non-null inputs is NULL in SQL; the maintained
        # non-null count tells us when we're in that state (full-refresh
        # equality for groups whose measure went all-NULL).
        *[
            F.when(_nn(c) == 0, F.lit(None))
            .otherwise(
                F.coalesce(F.col(f"sum_{c}"), F.lit(0))
                + F.coalesce(F.col(f"_d_{c}"), F.lit(0))
            )
            .alias(f"sum_{c}")
            for c in sum_cols
        ],
        *[_nn(c).alias(f"nn_{c}") for c in sum_cols],
    )
    return maintained.filter(F.col("n_rows") > 0)


def build_minmax(
    df: DataFrame, keys: list[str], mm_cols: list[str]
) -> DataFrame:
    """Maintained MIN/MAX shape: per-key COUNT(*) + MIN/MAX per
    measure (NULLs ignored, as in SQL)."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        *[F.min(c).alias(f"min_{c}") for c in mm_cols],
        *[F.max(c).alias(f"max_{c}") for c in mm_cols],
    )


def apply_cdc_minmax(
    agg: DataFrame,
    changes: DataFrame,
    base_new: DataFrame,
    keys: list[str],
    mm_cols: list[str],
    change_col: str = "change_type",
) -> DataFrame:
    """Maintain per-key MIN/MAX under a CDC feed (r7).

    MIN/MAX are NOT self-maintainable: deleting a group's current
    extreme needs the remaining rows to find the next one. The
    production algorithm is therefore two-tier, and this implements it:

    - inserts/postimages fold ALGEBRAICALLY (least/greatest against
      the stored extreme) — no base access;
    - ONLY groups where a deleted/preimage value TIES OR PASSES the
      stored extreme are recomputed, via a keyed semi-join against the
      post-change base — O(affected groups' rows), and the base scan
      prunes by partition/bucket layout when the table is laid out on
      the group key. Every other group never touches the base.

    Equality with a full rebuild is the contract (pytest + hypothesis:
    extreme deletes, ties, NULL measures, group births/deaths).
    ``base_new`` is the base table AFTER the changes (what
    read_version(to_version) returns).
    """
    sign = F.when(
        F.col(change_col).isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    ch = changes.withColumn("_sign", sign)
    deltas = ch.groupBy(*keys).agg(
        F.sum("_sign").cast("long").alias("_d_n"),
        *[
            F.min(F.when(F.col("_sign") == 1, F.col(c))).alias(f"_ins_min_{c}")
            for c in mm_cols
        ],
        *[
            F.max(F.when(F.col("_sign") == 1, F.col(c))).alias(f"_ins_max_{c}")
            for c in mm_cols
        ],
        *[
            F.min(F.when(F.col("_sign") == -1, F.col(c))).alias(f"_del_min_{c}")
            for c in mm_cols
        ],
        *[
            F.max(F.when(F.col("_sign") == -1, F.col(c))).alias(f"_del_max_{c}")
            for c in mm_cols
        ],
    )
    a, d = agg.alias("a"), deltas.alias("d")
    cond = None
    for k in keys:
        c = F.col(f"a.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = c if cond is None else cond & c
    joined = a.join(d, cond, "full_outer")
    key_cols = [
        F.coalesce(F.col(f"a.{k}"), F.col(f"d.{k}")).alias(k) for k in keys
    ]
    n_new = (
        F.coalesce(F.col("n_rows"), F.lit(0)) + F.coalesce(F.col("_d_n"), F.lit(0))
    ).alias("n_rows")

    # A delete only endangers an extreme when it ties or passes the
    # POST-FOLD extreme (stored value folded with this batch's
    # inserts): comparing against the stored extreme alone misses a
    # same-batch insert+delete pair — e.g. a group born this batch
    # whose only non-null value is inserted and then update-deleted in
    # the same CDC window folds min=0 from the insert and never
    # recomputes, leaving a stale extreme (hypothesis-found, r7c). A
    # delete with NO post-fold extreme to compare against (all-NULL
    # fold) recomputes too. Insert-only batches still never touch base.
    touched = F.lit(False)
    for c in mm_cols:
        folded_min = F.least(F.col(f"min_{c}"), F.col(f"_ins_min_{c}"))
        folded_max = F.greatest(F.col(f"max_{c}"), F.col(f"_ins_max_{c}"))
        touched = touched | (
            F.col(f"_del_min_{c}").isNotNull()
            & (folded_min.isNull() | (F.col(f"_del_min_{c}") <= folded_min))
        ) | (
            F.col(f"_del_max_{c}").isNotNull()
            & (folded_max.isNull() | (F.col(f"_del_max_{c}") >= folded_max))
        )
    staged = joined.select(
        *key_cols,
        n_new,
        touched.alias("_touched"),
        *[
            F.least(F.col(f"min_{c}"), F.col(f"_ins_min_{c}")).alias(f"min_{c}")
            for c in mm_cols
        ],
        *[
            F.greatest(F.col(f"max_{c}"), F.col(f"_ins_max_{c}")).alias(
                f"max_{c}"
            )
            for c in mm_cols
        ],
    ).filter(F.col("n_rows") > 0)

    untouched = staged.filter(~F.col("_touched")).drop("_touched")
    affected_keys = staged.filter(F.col("_touched")).select(*keys)
    b, k2 = base_new.alias("b"), affected_keys.alias("k2")
    sj = None
    for k in keys:
        c = F.col(f"b.{k}").eqNullSafe(F.col(f"k2.{k}"))
        sj = c if sj is None else sj & c
    recomputed = build_minmax(
        b.join(k2, sj, "left_semi"), keys, mm_cols
    )
    return untouched.unionByName(recomputed)


def build_agg2(
    df: DataFrame, keys: list[str], cols: list[str]
) -> DataFrame:
    """Second-moment maintained shape (r7): per-key COUNT(*) plus, per
    measure, SUM and SUM-of-squares as DECIMAL(38,0) — integer-exact
    and overflow-safe far past BIGINT (cents^2 ~ 1e14/row; 1e12 rows
    still fit 1e38 with 12 digits to spare). AVG / VAR_POP / STDDEV
    derive at read time from (n, sum, sumsq): the whole moments family
    is self-maintainable under inserts AND deletes, unlike MIN/MAX."""
    dec = "decimal(38,0)"
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        *[
            F.sum(F.col(c).cast(dec)).alias(f"sum_{c}")
            for c in cols
        ],
        *[
            F.sum((F.col(c).cast(dec) * F.col(c).cast(dec))).alias(
                f"sumsq_{c}"
            )
            for c in cols
        ],
        *[F.count(c).cast("long").alias(f"nn_{c}") for c in cols],
    )


def apply_cdc_moments(
    agg: DataFrame,
    changes: DataFrame,
    keys: list[str],
    cols: list[str],
    change_col: str = "change_type",
) -> DataFrame:
    """Fold CDC into the second-moment aggregate (count/sum/sumsq/nn):
    same delta algebra as apply_cdc — sumsq deltas are +-value^2 — so
    deletes maintain exactly, no base access ever."""
    dec = "decimal(38,0)"
    sign = F.when(
        F.col(change_col).isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    deltas = (
        changes.withColumn("_sign", sign)
        .groupBy(*keys)
        .agg(
            F.sum("_sign").cast("long").alias("_d_n"),
            *[
                F.sum(F.col(c).cast(dec) * F.col("_sign")).alias(f"_d_{c}")
                for c in cols
            ],
            *[
                F.sum(
                    F.col(c).cast(dec) * F.col(c).cast(dec) * F.col("_sign")
                ).alias(f"_dsq_{c}")
                for c in cols
            ],
            *[
                F.sum(
                    F.when(F.col(c).isNotNull(), F.col("_sign")).otherwise(
                        F.lit(0)
                    )
                )
                .cast("long")
                .alias(f"_dnn_{c}")
                for c in cols
            ],
        )
    )
    a, d = agg.alias("a"), deltas.alias("d")
    cond = None
    for k in keys:
        c = F.col(f"a.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = c if cond is None else cond & c
    joined = a.join(d, cond, "full_outer")
    key_cols = [
        F.coalesce(F.col(f"a.{k}"), F.col(f"d.{k}")).alias(k) for k in keys
    ]
    zero = F.lit(0).cast(dec)

    def _nn(c):
        return F.coalesce(F.col(f"nn_{c}"), F.lit(0)) + F.coalesce(
            F.col(f"_dnn_{c}"), F.lit(0)
        )

    out = joined.select(
        *key_cols,
        (
            F.coalesce(F.col("n_rows"), F.lit(0))
            + F.coalesce(F.col("_d_n"), F.lit(0))
        ).alias("n_rows"),
        *[
            F.when(_nn(c) == 0, F.lit(None))
            .otherwise(
                F.coalesce(F.col(f"sum_{c}"), zero)
                + F.coalesce(F.col(f"_d_{c}"), zero)
            )
            .alias(f"sum_{c}")
            for c in cols
        ],
        *[
            F.when(_nn(c) == 0, F.lit(None))
            .otherwise(
                F.coalesce(F.col(f"sumsq_{c}"), zero)
                + F.coalesce(F.col(f"_dsq_{c}"), zero)
            )
            .alias(f"sumsq_{c}")
            for c in cols
        ],
        *[_nn(c).alias(f"nn_{c}") for c in cols],
    )
    return out.filter(F.col("n_rows") > 0)


def rollup_from_finer(
    fine: DataFrame,
    coarse_keys: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Derive a coarser maintained aggregate FROM A FINER ONE — the
    hypertable / continuous-aggregate cascade (raw -> hourly -> daily):
    counts sum, sums sum, and the per-measure non-null counts sum, so
    the coarse level preserves exact SUM-NULL semantics without ever
    touching raw data. At 100 TB the daily rollup reads 24 hourly rows
    per group-day instead of the day's raw events; a maintenance pass
    that folded a batch into the hourly level makes every coarser level
    rebuildable from it at hourly-row cost."""
    return fine.groupBy(*coarse_keys).agg(
        F.sum("n_rows").cast("long").alias("n_rows"),
        *[
            F.when(F.sum(f"nn_{c}") > 0, F.sum(f"sum_{c}"))
            .otherwise(F.lit(None))
            .alias(f"sum_{c}")
            for c in sum_cols
        ],
        *[F.sum(f"nn_{c}").cast("long").alias(f"nn_{c}") for c in sum_cols],
    )
