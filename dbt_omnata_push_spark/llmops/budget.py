"""Corpus budgeting operators: per-source token budgets and rate caps.

The mixture-weights question ("how much of each source goes into the
training set") shows up as two primitives:

- ``token_budget_cap``: keep each source's documents, in a seeded
  deterministic order, until a token budget fills — the exact form of
  'take 50B tokens of web, 5B of code'.
- ``source_rate_cap``: keep at most N documents per key — the domain /
  source frequency cap used against boilerplate-heavy hosts.

Both ride ops.packing.with_keyed_prefix_sum, which stays parallel even
when one key dominates the corpus (range partitioning on (key, order);
no per-key single-task window, no driver-side state). The ordering key
is md5(seed:doc_id), so runs are reproducible and engine-portable, and
re-runs with a bigger budget are supersets (stable order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ops.packing import with_keyed_prefix_sum


def _seeded_order(id_col: str, seed: str):
    return F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))


def token_budget_cap(
    df: DataFrame,
    budget: int,
    key_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "cap",
) -> DataFrame:
    """Per-``key_col`` token budget: keep documents in seeded-hash order
    while the running (inclusive) whitespace-token total stays within
    ``budget``.

    Returns the kept rows with ``n_tokens`` and the inclusive running
    total ``cum_tokens`` (== the budget consumed through this doc).
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    toks = df.select(
        F.col(id_col),
        F.col(key_col),
        _seeded_order(id_col, seed).alias("_ord"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )
    cum = with_keyed_prefix_sum(
        toks, key_col, ["_ord", id_col], "n_tokens", out="cum_tokens", exclusive=False
    )
    return cum.filter(F.col("cum_tokens") <= budget).drop("_ord")


def source_rate_cap(
    df: DataFrame,
    max_per_key: int,
    key_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "cap",
) -> DataFrame:
    """Keep at most ``max_per_key`` rows per key, chosen by seeded hash
    order (deterministic subsample, not head-of-file bias).

    Implemented as a keyed prefix COUNT through the same two-pass
    machinery — rank = exclusive prefix of 1s — so a single key with
    10^9 rows still ranks in parallel across partitions.
    """
    if max_per_key < 1:
        raise ValueError("max_per_key must be >= 1")
    keyed = df.withColumn("_ord", _seeded_order(id_col, seed)).withColumn(
        "_one", F.lit(1).cast("long")
    )
    ranked = with_keyed_prefix_sum(
        keyed, key_col, ["_ord", id_col], "_one", out="_rank", exclusive=True
    )
    return ranked.filter(F.col("_rank") < max_per_key).drop("_ord", "_one", "_rank")


def quality_percentile_filter(
    df: DataFrame,
    keep_frac_num: int = 2,
    keep_frac_den: int = 5,
    key_col: str = "source",
    id_col: str = "doc_id",
    score_col: str = "quality_score",
) -> DataFrame:
    """Keep the top keep_frac (default 2/5 = 40%) of rows per key by
    ``score_col`` — the per-source quality gate.

    Rank within key comes from the keyed prefix COUNT (descending score
    via a negated order column), so a dominant source still ranks in
    parallel; the percentile predicate is pure integer arithmetic
    (rank * den < n * num), no double division to drift.
    """
    neg = df.withColumn("_neg_score", -F.col(score_col))
    ranked = with_keyed_prefix_sum(
        neg.withColumn("_one", F.lit(1).cast("long")),
        key_col,
        ["_neg_score", id_col],
        "_one",
        out="_rank",
        exclusive=True,
    )
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.join(counts, key_col)
        .filter(F.col("_rank") * keep_frac_den < F.col("_n") * keep_frac_num)
        .withColumn("rank_in_key", F.col("_rank"))
        .drop("_neg_score", "_one", "_rank", "_n")
    )
