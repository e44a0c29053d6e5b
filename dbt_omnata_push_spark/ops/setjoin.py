"""Exact set-similarity self-join via prefix filtering (PPJoin family,
Chaudhuri et al. SSJoin / Xiao et al. PPJoin).

MinHash-LSH (llmops/dedup.py) is the probabilistic path: tunable
recall, banded candidates. This is the EXACT path: every pair with
Jaccard >= tau is returned, none missed, still without an all-pairs
join. The prefix-filter theorem does the work: order every set by one
GLOBAL token order (rarest-first), keep only the first
|s| - ceil(tau*|s|) + 1 tokens as the "prefix"; any pair with
J >= tau MUST collide on at least one prefix token, so an equi-join on
prefix tokens is a complete candidate generator. Rarest-first ordering
makes those prefixes the least-shared tokens, collapsing candidate
fan-out (joining on the 'the'-like tokens would regenerate the cross
join the filter exists to avoid).

Scale shape: one token-frequency aggregation (map-side partial), one
rank join + per-doc sort (keyed shuffle), one equi-join on prefix
tokens carrying (id, size) only, a length filter (tau*|a| <= |b|)
inside the join condition, then ONE verify join back to the full sets
for the exact intersection. Nothing is quadratic except the true
result set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokenize_sets(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, tokens) with tokens = DISTINCT whitespace tokens (set
    semantics — Jaccard is over sets)."""
    return df.select(
        F.col(id_col).alias("sid"),
        F.array_distinct(F.split(F.col(text_col), " ")).alias("tokens"),
    )


def jaccard_join_exact(
    sets: DataFrame, tau: float
) -> DataFrame:
    """All pairs (id_a < id_b) with exact Jaccard >= tau over the
    ``(sid, tokens)`` frame, by prefix-filtered candidate generation +
    exact verification. Returns (id_a, id_b, jaccard)."""
    spark = sets.sparkSession

    toks = sets.select("sid", F.explode("tokens").alias("tok"))
    # Global rarest-first token order; ties broken lexicographically so
    # the order (and therefore the candidate set) is deterministic. The
    # token dimension can be vocabulary-sized, so the global ranking
    # uses the two-pass range-partitioned index (ops/rownum.py), never
    # a single-partition window.
    from .rownum import with_ordered_global_index

    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    rank = with_ordered_global_index(
        freq, ["n", "tok"], col_name="trank"
    ).select("tok", "trank")

    ordered = (
        toks.join(rank, "tok")
        .groupBy("sid")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("trank", "tok"))
            ).alias("_ranked")
        )
        .select(
            "sid",
            F.col("_ranked.tok").alias("sorted_tokens"),
            F.size("_ranked").alias("sz"),
        )
    )
    # prefix length |s| - ceil(tau*|s|) + 1
    prefix_len = F.col("sz") - F.ceil(F.lit(tau) * F.col("sz")).cast("int") + 1
    prefixes = ordered.select(
        "sid",
        "sz",
        F.explode(F.slice("sorted_tokens", 1, prefix_len)).alias("ptok"),
    )
    a, b = prefixes.alias("a"), prefixes.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.ptok") == F.col("b.ptok"))
            & (F.col("a.sid") < F.col("b.sid"))
            # length filter: J >= tau forces tau*|a| <= |b| <= |a|/tau
            & (F.col("b.sz") * F.lit(tau) <= F.col("a.sz"))
            & (F.col("a.sz") * F.lit(tau) <= F.col("b.sz")),
        )
        .select(
            F.col("a.sid").alias("id_a"), F.col("b.sid").alias("id_b")
        )
        .distinct()
    )
    fa = ordered.select(
        F.col("sid").alias("id_a"), F.col("sorted_tokens").alias("ta")
    )
    fb = ordered.select(
        F.col("sid").alias("id_b"), F.col("sorted_tokens").alias("tb")
    )
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.size("ta") + F.size("tb") - inter
    return (
        cands.join(fa, "id_a")
        .join(fb, "id_b")
        .select(
            "id_a",
            "id_b",
            (inter.cast("double") / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= tau)
    )
