"""Table profiling: per-column stats in ONE scan (the ANALYZE TABLE /
dbt-docs surface).

For each requested column: row count, null count, exact distinct
count, and min/max rendered as strings (bigint/string columns only in
the exact-oracle path — float rendering differs across engines; route
continuous columns through the HLL/GK sketches in ops/sketches.py at
scale, where exact ndv is the wrong tool anyway).

Plan shape: one aggregation computes every column's stats as struct
expressions (single scan, map-side partial for all but the exact
distincts), then the struct array explodes into one row per column.
Exact COUNT(DISTINCT) over k columns expands to k shuffles in Spark's
expand-based plan — the documented trade for exact numbers; the
sketch path keeps it one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rownum import with_ordered_global_index


def table_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)
    for each of ``cols``, exact, in one logical pass."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("_n").cast("long").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{c}")).cast("long").alias("n_nulls"),
                F.col(f"_nd_{c}").cast("long").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


def profile_oracle_sql(table: str, cols: list[str]) -> str:
    """The exact DuckDB equivalent, generated per column list."""
    selects = [
        f"""SELECT '{c}' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_value,
       CAST(MAX({c}) AS VARCHAR) AS max_value
FROM {table}"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(selects)


def value_histogram(df: DataFrame, col: str, n_bins: int) -> DataFrame:
    """Exact equi-width histogram (the ANALYZE companion a cost-based
    optimizer feeds on): one aggregation for [min, max], then a
    map-side bin assignment and one shuffle on the bin id. The bounds
    ride along as a broadcast 1-row frame — no driver collect, so the
    op composes lazily inside larger plans.

    Bin math is plain IEEE double arithmetic (identical in any engine
    given identical inputs): width = (max-min)/n, bin = clamp(floor(
    (v-min)/width), 0, n-1); the max value lands in the last bin.
    Empty bins are emitted with n=0 via a bin scaffold (histograms
    with holes silently misread as dense are how estimators go wrong).

    Output: bin (int), lo_edge, hi_edge (double), n (long).
    """
    bounds = df.agg(
        F.min(F.col(col).cast("double")).alias("_lo"),
        F.max(F.col(col).cast("double")).alias("_hi"),
    )
    with_b = df.select(F.col(col).cast("double").alias("_v")).filter(
        F.col("_v").isNotNull()
    ).crossJoin(F.broadcast(bounds))
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    # Degenerate range (all values equal): width 0 would divide by
    # zero under ANSI mode — every value belongs in bin 0 (found by
    # hypothesis in tests/test_property_round6b.py).
    bin_id = F.when(
        F.col("_hi") > F.col("_lo"),
        F.least(
            F.greatest(
                F.floor((F.col("_v") - F.col("_lo")) / width).cast("int"),
                F.lit(0),
            ),
            F.lit(n_bins - 1),
        ),
    ).otherwise(F.lit(0))
    counts = (
        with_b.select(bin_id.alias("bin"), "_lo", "_hi")
        .groupBy("bin", "_lo", "_hi")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    scaffold = (
        bounds.select(
            F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"),
            "_lo",
            "_hi",
        )
    )
    w2 = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    return (
        scaffold.join(counts, ["bin", "_lo", "_hi"], "left")
        .select(
            "bin",
            (F.col("_lo") + F.col("bin") * w2).alias("lo_edge"),
            (F.col("_lo") + (F.col("bin") + 1) * w2).alias("hi_edge"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )


def equidepth_histogram(
    df: DataFrame, col: str, n_buckets: int, tiebreak: str
) -> DataFrame:
    """Exact equi-depth (quantile-bucket) histogram: every bucket holds
    the same row count +-1 — the histogram shape CBOs prefer for skewed
    columns, where equi-width piles everything into two bins.

    Built on the scale-safe total ordering (ops/rownum.py: range
    repartition + per-partition sort + count-offset pass, no
    single-partition window): bucket = ((rank-1) * n) div total, pure
    integer arithmetic, so the assignment is engine-exact against a
    ROW_NUMBER oracle. The 1-row total rides as a broadcast.

    Output: bucket (int), n (long), lo, hi (the bucket's value range).
    """
    ordered = df.select(
        F.col(col).alias("_v"), F.col(tiebreak).alias("_t")
    )
    idx = with_ordered_global_index(ordered, ["_v", "_t"])
    total = ordered.agg(F.count(F.lit(1)).alias("_total"))
    return (
        idx.crossJoin(F.broadcast(total))
        .select(
            F.expr(f"int(((row_idx - 1) * {n_buckets}) div _total)").alias(
                "bucket"
            ),
            "_v",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("_v").alias("lo"),
            F.max("_v").alias("hi"),
        )
    )
