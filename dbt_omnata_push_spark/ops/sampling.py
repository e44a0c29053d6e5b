"""Sampling operators for corpus curation.

Two shapes:
- deterministic stratified top-n: reproducible across engines and runs
  (hash-ordered, no RNG state), the right default for dataset curation
  where a sample must be re-derivable from the data alone;
- proportional random sample: Spark-native Bernoulli sampling per
  stratum (sampleBy) for quick statistical work where exact
  reproducibility across engines doesn't matter.

At scale the stratified top-n is a per-stratum window (WindowGroupLimit
pushes the rank filter below the sort), so no stratum ever needs more
than its own partition's memory; skewed strata are handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample_deterministic(
    df: DataFrame, strata: list[str], n_per_stratum: int, id_col: str
) -> DataFrame:
    """First ``n_per_stratum`` rows per stratum ordered by md5(id).

    The hash order is a fixed pseudo-random permutation of each
    stratum, so the sample is unbiased w.r.t. any natural ordering of
    the data while being bit-reproducible anywhere md5 exists.
    """
    order_key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(*strata).orderBy(order_key, F.col(id_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def proportional_sample(
    df: DataFrame, stratum_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sample (Spark-native sampleBy)."""
    return df.sampleBy(stratum_col, fractions, seed)


def deterministic_mixture(
    df: DataFrame,
    stratum_col: str,
    weights: dict,
    key_col: str,
) -> DataFrame:
    """Weighted corpus mixing (training-data mixture weights per source).

    Keep a row iff the md5 hash-permutation of its key falls below the
    stratum's weight: ``substr(md5(key), 1, 8) < hex(weight * 16^8)``.
    Lowercase-hex string comparison == numeric comparison, so the same
    predicate runs bit-identically on any engine with md5 — reproducible
    mixtures with no RNG state, resumable across reruns, and at scale a
    pure map-side filter (no shuffle, no sample() nondeterminism).
    Strata absent from ``weights`` are dropped.
    """
    mapping = F.create_map(
        *[
            F.lit(x)
            for s, w in weights.items()
            for x in (s, format(min(int(w * 16**8), 16**8 - 1), "08x"))
        ]
    )
    bucket = F.substring(F.md5(F.col(key_col).cast("string")), 1, 8)
    thr = mapping[F.col(stratum_col)]
    return df.filter(thr.isNotNull() & (bucket < thr))


def temperature_mixture(
    df: DataFrame,
    stratum_col: str,
    budget_docs: int,
    key_col: str,
    seed: str = "tmix",
) -> DataFrame:
    """Temperature-reweighted mixture sampling (alpha = 0.5): source s
    gets a document allocation proportional to sqrt(n_s) — the standard
    'flatten the source distribution' reweighting (multilingual /
    DoReMi-style pipelines), here with temperature T = 2.

    Exactness discipline: sqrt is IEEE-754 correctly rounded in every
    engine, so floor(sqrt(n) * 1e6) is a portable integer weight; all
    later arithmetic (allocation split, md5-threshold) is BIGINT, so the
    kept set is bit-reproducible. Plan shape: one tiny per-source agg, a
    1-row total, a source-keyed join back (AQE broadcasts the stats
    frame), then a pure map-side threshold filter — the corpus itself
    never shuffles.
    """
    wq = F.floor(F.sqrt(F.count(F.lit(1)).cast("double")) * 1_000_000).cast("long")
    stats = df.groupBy(stratum_col).agg(
        F.count(F.lit(1)).alias("n"), wq.alias("wq")
    )
    total = stats.agg(F.sum("wq").cast("long").alias("total_wq"))
    alloc = stats.crossJoin(total).select(
        stratum_col,
        "n",
        F.expr(f"({budget_docs}L * wq) div total_wq").alias("target"),
    )
    bucket = F.substring(
        F.md5(F.concat(F.lit(seed + ":"), F.col(key_col).cast("string"))), 1, 8
    )
    thr = F.lpad(F.lower(F.hex(F.expr("(target * 4294967296L) div n"))), 8, "0")
    return (
        df.join(alloc, stratum_col)
        .withColumn("__bucket", bucket)
        .filter((F.col("target") >= F.col("n")) | (F.col("__bucket") < thr))
        .drop("__bucket")
    )
