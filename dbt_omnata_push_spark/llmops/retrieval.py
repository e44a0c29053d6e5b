"""Ranked text retrieval for training-data pipelines: BM25 scoring and
hybrid rank fusion (beyond-reference, SURVEY.md §2 north-star family —
the retrieval side of a RAG/data-curation stack).

Determinism discipline: the textbook BM25 IDF uses ln(), whose last-ulp
behaviour differs across math libraries, so cross-engine hash equality
would be luck. We use the LOG-FREE rarity-ratio IDF

    idf(t) = (N - df_t + 0.5) / (df_t + 0.5)

(the same monotone transform the corpus rarity score in llmops/text.py
uses — ln is monotone, so per-term ranking is unchanged; only the
inter-term mixing weights differ from textbook BM25). Every remaining
operation is IEEE +,-,*,/ on values derived from integers, and the
per-term contributions are summed in FIXED term order — bit-identical
in any IEEE-754 engine, so the score itself participates in the value
hash (like the cosine similarity columns, COVERAGE.md).

Scale shape: one map-side pass computes per-doc term frequencies and
length (array expressions, whole-stage codegen), ONE 1-row global
aggregate (N, total length, per-term document frequencies) broadcasts
back, scoring is map-side, and the top-k is a TakeOrderedAndProject —
no shuffle proportional to the corpus beyond the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by (log-free) BM25 for a fixed term list.

    Returns (doc_id, score, rank); only documents matching >= 1 term
    are ranked. ``terms`` must be non-empty and duplicate-free.
    """
    if not terms or len(set(terms)) != len(terms):
        raise ValueError("terms must be a non-empty, duplicate-free list")
    tokens = F.split(F.col(text_col), " ")

    def tf_of(term: str):
        # single-arg lambda: a 2-arg lambda would bind the second
        # parameter to the ARRAY INDEX, not the captured term
        return F.size(F.filter(tokens, lambda x: x == F.lit(term)))

    per_doc = docs.select(
        id_col,
        F.size(tokens).alias("_dl"),
        *[tf_of(t).alias(f"_tf_{i}") for i, t in enumerate(terms)],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_dl").alias("_sumdl"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("long")).alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    avgdl = F.col("_sumdl").cast("double") / F.col("_n")

    def contrib(i: int):
        tf = F.col(f"_tf_{i}").cast("double")
        df = F.col(f"_df_{i}").cast("double")
        idf = (F.col("_n") - df + F.lit(0.5)) / (df + F.lit(0.5))
        denom = tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / avgdl)
        return F.when(tf > 0, idf * (tf * F.lit(k1 + 1.0)) / denom).otherwise(
            F.lit(0.0)
        )

    # fixed left-to-right term order => reproducible float sum
    score = contrib(0)
    for i in range(1, len(terms)):
        score = score + contrib(i)
    ranked = (
        scored.select(id_col, score.alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score"), F.col(id_col))
    return ranked.withColumn("rank", F.row_number().over(w))


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k: int = 10,
    c: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked lists (Cormack et al.):
    score(d) = 1/(c + rank_a(d)) + 1/(c + rank_b(d)), with a missing
    list contributing 0. Rank arithmetic is integer, the two
    reciprocals are exact IEEE divisions summed in fixed order —
    cross-engine hash-exact. Output: (id, rrf_score, rank)."""
    a = ranked_a.select(F.col(id_col), F.col(rank_col).alias("_ra"))
    bdf = ranked_b.select(F.col(id_col), F.col(rank_col).alias("_rb"))
    fused = a.join(bdf, id_col, "full_outer").select(
        id_col,
        (
            F.coalesce(1.0 / (F.lit(c) + F.col("_ra")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(c) + F.col("_rb")), F.lit(0.0))
        ).alias("rrf_score"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("rrf_score"), F.col(id_col))
    return (
        fused.orderBy(F.desc("rrf_score"), F.col(id_col))
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
    )


def hashed_tf_embedding(
    docs: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple = (),
) -> DataFrame:
    """Feature-hashed term-frequency vectors (r7): text -> a dense
    ``dim``-component INTEGER count vector via the portable md5-prefix
    bucket hash (the ops/filestats.py / ops/invindex.py family) — the
    deterministic text->vector bridge that makes a full
    text -> embed -> similarity-search pipeline exactly oracle-able
    (hashing-trick of Weinberger et al.; integer counts, so downstream
    cosine is a ratio of integer-derived doubles, bit-stable across
    engines).

    Scale shape: entirely map-side — one md5 per token
    (F.transform), then ``dim`` array-count passes per row; no explode,
    no shuffle. Output: (id, vec array<int>).

    The bucket array is materialized through a SEPARATE projection
    before the ``dim`` count expressions reference it: inlining it into
    each count (one select) re-evaluates the md5 transform ``dim``
    times per row — measured 16s vs ~2s at sf0.1/dim=64. Catalyst's
    CollapseProject keeps the barrier because the column is referenced
    ``dim`` times by non-trivial expressions."""
    bucket = lambda x: (  # noqa: E731
        F.conv(F.substring(F.md5(x.cast("binary")), 1, 15), 16, 10).cast(
            "long"
        )
        % dim
    )
    # NULL text hashes as the empty document (zero counts), not as a
    # NULL vector poisoning downstream cosines.
    tokens = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    staged = docs.select(
        id_col, *keep_cols, F.transform(tokens, bucket).alias("_bk")
    )

    def count_of(i: int):
        # single-arg lambda: a 2-arg lambda would bind the second
        # parameter to the ARRAY INDEX, not the captured bucket id
        return F.size(F.filter(F.col("_bk"), lambda b: b == F.lit(i)))

    vec = F.array(*[count_of(i) for i in range(dim)])
    return staged.select(id_col, *keep_cols, vec.alias("vec"))
