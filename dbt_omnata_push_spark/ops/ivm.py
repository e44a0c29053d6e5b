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
