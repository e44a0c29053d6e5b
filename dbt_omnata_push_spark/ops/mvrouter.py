"""Materialized-view routing (the "aggregate navigator"): answer an
aggregate query from a stored rollup instead of the base table when the
rollup subsumes it.

Snowflake/BigQuery/Oracle rewrite matching aggregates to materialized
views transparently; this module is that feature for the versioned
store, closing the loop with ops/ivm.py — the MV is BUILT as the
IVM-maintainable shape (per-key COUNT(*) + SUMs + non-null counts), so
the same stored table is kept fresh by apply_cdc and served by the
router. Subsumption rule (classic rollup lattice): a query grouping by
G with aggregates over measures M routes to MV (G_mv, M_mv) iff
G ⊆ G_mv and M ⊆ M_mv — COUNT(*) re-aggregates as SUM(n_rows), SUM(c)
as SUM(sum_c) with the NULL-iff-no-non-null rule restored from nn_c.
AVG derives as the two re-aggregated parts. MIN/MAX are deliberately
NOT routable (not self-maintainable, same exclusion as IVM).

Scale shape: the routed scan reads the MV — |distinct(G_mv)| rows —
instead of the fact table; at 100 TB facts with a million-row rollup
that's the whole win, and `route` refuses (returns None) rather than
silently rescanning when no MV subsumes the request.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.store import TableStore
from .ivm import build_agg


@dataclass
class MaterializedView:
    """A registered rollup: ``table`` in the store, grouped by
    ``group_cols``, carrying COUNT(*) + SUM/non-null-count pairs for
    every column in ``sum_cols`` (the build_agg shape)."""

    table: str
    source: str
    group_cols: list[str] = field(default_factory=list)
    sum_cols: list[str] = field(default_factory=list)


def create_mv(
    spark: SparkSession,
    store: TableStore,
    mv: MaterializedView,
    source_df: DataFrame,
) -> None:
    """Materialize the rollup in the store (IVM-maintainable shape —
    refresh it with ops/ivm.apply_cdc over the store's CDF)."""
    store.create(spark, mv.table, build_agg(source_df, mv.group_cols, mv.sum_cols))


def route(
    spark: SparkSession,
    store: TableStore,
    mvs: list[MaterializedView],
    source: str,
    group_cols: list[str],
    sums: list[str],
    with_count: bool = True,
) -> DataFrame | None:
    """Answer ``SELECT group_cols, COUNT(*), SUM(sums...) FROM source
    GROUP BY group_cols`` from the first subsuming MV, or None when no
    registered MV subsumes the request (caller decides whether to fall
    back to the fact table — the router never rescans silently).

    Output columns: group_cols, ``n_rows`` (if with_count), and
    ``sum_<c>`` per requested measure, with exact SQL NULL semantics:
    the re-aggregated SUM is NULL iff the group's maintained non-null
    count is zero.
    """
    for mv in mvs:
        if mv.source != source:
            continue
        if not set(group_cols) <= set(mv.group_cols):
            continue
        if not set(sums) <= set(mv.sum_cols):
            continue
        agg = store.read(spark, mv.table)
        exprs = []
        if with_count:
            exprs.append(F.sum("n_rows").cast("long").alias("n_rows"))
        for c in sums:
            exprs.append(
                F.when(
                    F.sum(f"nn_{c}") > 0, F.sum(f"sum_{c}")
                ).alias(f"sum_{c}")
            )
        if not group_cols:
            return agg.groupBy().agg(*exprs)
        return agg.groupBy(*group_cols).agg(*exprs)
    return None
