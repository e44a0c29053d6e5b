"""DSIR-style importance weighting for training-data selection.

Data Selection via Importance Resampling (Xie et al., 2023,
arXiv:2302.03169) scores each candidate document by how much more
likely its hashed n-gram features are under a small trusted TARGET
corpus than under the big raw SOURCE pool, then keeps the top-weighted
slice. This module re-expresses the estimator Spark-first:

- features are hashed word-unigram buckets; the bucket function is the
  repo's md5-prefix mod (ops/invindex.py) which computes bit-identically
  in PySpark, Python, and ANSI SQL, so the oracle replays the exact
  same collisions;
- both distribution estimates reduce to ONE dimension-sized frame each
  (<= n_buckets rows) regardless of corpus size, broadcast back onto
  the per-document feature counts;
- the oracle-checkable score is the smoothed likelihood-RATIO mean in
  exact parts-per-million integers (``sum(cnt * ((tgt_b+1)*1e6 div
  (src_b+1)))``) — the same log-free integer-rational discipline as
  llmops/text.py::rarity_score, because summing ieee doubles is
  order-dependent and ln() differs by ULPs across libm implementations;
- the paper's actual log-importance weight ships alongside as a double
  column (``log_weight``) for production ranking; queries that need a
  cross-engine hash simply don't project it.

Scale shape: one tokenize+explode pass over the corpus (localCheckpointed
— it feeds three aggregations), two bucket-keyed map-side-partial
groupBys that collapse to <= n_buckets rows, one broadcast join, one
doc-keyed groupBy. Nothing is all-pairs; nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_DSIR_BUCKETS = 4096
RATIO_SCALE = 1_000_000


def token_bucket_col(word: Column, n_buckets: int = N_DSIR_BUCKETS) -> Column:
    """md5-prefix feature bucket — 15 hex digits fit a long exactly, so
    conv() is lossless and the id matches ``CAST('0x'||substr(md5(w),1,15)
    AS BIGINT) % n`` in ANSI SQL bit-for-bit."""
    return (
        F.conv(F.substring(F.md5(word.cast("binary")), 1, 15), 16, 10)
        .cast("long")
        % n_buckets
    )


def dsir_scores(
    df: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_DSIR_BUCKETS,
) -> DataFrame:
    """Score every non-target document against the target distribution.

    ``is_target`` marks the trusted-domain rows (held out from scoring;
    they only parameterize the target estimate). Laplace +1 smoothing
    on both sides keeps unseen buckets finite.

    Output (one row per non-target doc): ``doc_id``, ``n_tokens``,
    ``score_ppm`` (exact bigint: sum over token occurrences of the
    smoothed target/source bucket-count ratio in ppm),
    ``mean_ratio_ppm`` (exact bigint: score_ppm div n_tokens, the
    length-normalized rank key), ``log_weight`` (double: the paper's
    sum of log-ratios incl. the total-count normalizer — production
    rank key, NOT cross-engine hashable).
    """
    spark = df.sparkSession
    tokens = (
        df.select(
            F.col(id_col),
            is_target.alias("_tgt"),
            F.explode(F.split(F.col(text_col), " ")).alias("_w"),
        )
        .select(
            id_col,
            "_tgt",
            token_bucket_col(F.col("_w"), n_buckets).alias("_b"),
        )
        .localCheckpoint(eager=False)
    )
    tgt_counts = (
        tokens.filter(F.col("_tgt"))
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_ct"))
    )
    src_counts = (
        tokens.filter(~F.col("_tgt"))
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_cs"))
    )
    ratio = (
        tgt_counts.join(src_counts, "_b", "full_outer")
        .select(
            "_b",
            F.coalesce("_ct", F.lit(0)).alias("_ct"),
            F.coalesce("_cs", F.lit(0)).alias("_cs"),
        )
        .select(
            "_b",
            F.expr(f"(_ct + 1) * {RATIO_SCALE} div (_cs + 1)").alias("_rppm"),
            (F.log(F.col("_ct") + 1) - F.log(F.col("_cs") + 1)).alias("_lr"),
        )
    )
    doc_feats = (
        tokens.filter(~F.col("_tgt"))
        .groupBy(id_col, "_b")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    # Totals normalizer for the true log weight: constant across docs,
    # so it only shifts log_weight (per token) — kept for paper parity.
    totals = tokens.groupBy().agg(
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("_nt"),
        F.sum(F.when(F.col("_tgt"), 0).otherwise(1)).alias("_ns"),
    )
    scored = (
        doc_feats.join(F.broadcast(ratio), "_b")
        .groupBy(id_col)
        .agg(
            F.sum("_cnt").alias("n_tokens"),
            F.sum(F.col("_cnt") * F.col("_rppm")).alias("score_ppm"),
            F.sum(F.col("_cnt").cast("double") * F.col("_lr")).alias("_lw"),
        )
    )
    norm = F.log(F.col("_ns") + n_buckets) - F.log(F.col("_nt") + n_buckets)
    return scored.crossJoin(F.broadcast(totals)).select(
        id_col,
        "n_tokens",
        "score_ppm",
        F.expr("score_ppm div n_tokens").alias("mean_ratio_ppm"),
        (F.col("_lw") + F.col("n_tokens") * norm).alias("log_weight"),
    )


def dsir_select_topk(
    scores: DataFrame, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic top-k selection by the exact integer rank key
    (mean ratio desc, id asc tiebreak). orderBy+limit compiles to
    TakeOrderedAndProject — per-partition partial top-k, no global
    sort materialization."""
    return scores.orderBy(
        F.col("mean_ratio_ppm").desc(), F.col(id_col).asc()
    ).limit(k)
