"""Approximate aggregation sketches for 100 TB-scale rollups.

At full scale, exact COUNT(DISTINCT) over billions of users is a giant
shuffle of every distinct value; the sketch path shuffles fixed-size
(~KB) binary summaries instead and is *mergeable*: per-partition /
per-day sketch tables can be rolled up later without touching raw data
— the standard pattern for incremental distinct-user dashboards.

Built on Spark's Apache DataSketches bindings (hll_sketch_agg /
hll_union_agg / hll_sketch_estimate, Spark 3.5+). Approximate results
can't hash-match a DuckDB oracle, so these ship with accuracy-bound
unit tests (tests/test_sketches.py) and rows-only query entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LG_K = 12  # ~2.5% relative standard error, 4KB max sketch


def distinct_sketches(
    df: DataFrame, keys: list[str], col: str, lg_k: int = DEFAULT_LG_K
) -> DataFrame:
    """Per-group HLL sketches of ``col`` (column ``sketch``, binary).

    This is the *build* stage: materialize one row per group with a
    mergeable summary. Persist it as a table and future rollups never
    rescan the raw events.
    """
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias("sketch")
    )


def merge_sketches(
    sketch_df: DataFrame, keys: list[str], estimate_col: str = "approx_distinct"
) -> DataFrame:
    """Roll sketches up to coarser ``keys`` and estimate cardinality.

    Union-merging sketches is associative: merging daily sketches to
    weeks equals sketching the raw week (same HLL state).
    """
    return sketch_df.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias(estimate_col)
    )


def approx_distinct_rollup(
    df: DataFrame,
    fine_keys: list[str],
    coarse_keys: list[str],
    col: str,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Two-level rollup: build at ``fine_keys``, merge to ``coarse_keys``."""
    return merge_sketches(distinct_sketches(df, fine_keys, col, lg_k), coarse_keys)


def approx_quantiles(
    df: DataFrame,
    col: str,
    probs: list[float],
    accuracy: int = 10000,
) -> DataFrame:
    """Approximate quantiles (Greenwald-Khanna): one row per prob.

    Error bound: rank error <= 1/accuracy * N. Unlike exact
    percentile(), the GK summary is bounded-memory per partition and
    merge-combined — no global sort, no giant state.
    """
    qs = F.percentile_approx(
        F.col(col), F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
    )
    agg = df.agg(qs.alias("qs"))
    pairs = F.arrays_zip(
        F.array(*[F.lit(p) for p in probs]).alias("prob"), F.col("qs").alias("value")
    )
    return agg.select(F.explode(pairs).alias("pv")).select(
        F.col("pv.prob").alias("prob"), F.col("pv.value").alias("value")
    )
