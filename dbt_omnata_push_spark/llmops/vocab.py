"""Corpus vocabulary analytics: growth curves and cross-source overlap.

Two standard corpus-health diagnostics for training-data pipelines:

- VOCABULARY GROWTH (the empirical Heaps-law curve): how many distinct
  tokens the corpus has after ingesting documents 1..d, computed from
  each token's FIRST document.  A flattening curve signals saturation /
  duplication; a superlinear one signals noise or tokenization drift.
- SOURCE VOCABULARY OVERLAP: pairwise Jaccard between per-source
  vocabularies — the quick detector for near-duplicate crawls or a
  source that is lexically disjoint from the rest of the mix.

Scale shape: both reduce to token-keyed aggregates (explode -> groupBy
token), so shuffles carry (token, id) pairs, never document text.  The
growth curve's running total uses the two-pass distributed prefix sum
(ops/prefix.py) — no single-partition window anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ops.prefix import with_running_sum


def vocab_growth(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, new_terms, vocab_size): documents that introduced at
    least one first-seen token, with the cumulative distinct-vocabulary
    size after that document (ingest order = id order)."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    first = toks.groupBy("tok").agg(F.min(id_col).alias(id_col))
    hist = first.groupBy(id_col).agg(F.count(F.lit(1)).alias("new_terms"))
    return with_running_sum(hist, [id_col], "new_terms", "vocab_size").select(
        id_col, F.col("new_terms").cast("long").alias("new_terms"), "vocab_size"
    )


def source_vocab_overlap(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source_a, source_b, n_common, n_a, n_b, jaccard) for every
    source pair (a < b): vocabulary intersection via a token-keyed
    self-join of the distinct (source, token) table, sizes joined back,
    Jaccard as the exact int/int double division."""
    vocab = df.select(
        F.col(source_col).alias("src"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).distinct()
    sizes = vocab.groupBy("src").agg(F.count(F.lit(1)).alias("n"))
    common = (
        vocab.select(F.col("src").alias("source_a"), "tok")
        .join(
            vocab.select(F.col("src").alias("source_b"), "tok"),
            "tok",
        )
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(
            F.broadcast(
                sizes.select(F.col("src").alias("source_a"), F.col("n").alias("n_a"))
            ),
            "source_a",
        )
        .join(
            F.broadcast(
                sizes.select(F.col("src").alias("source_b"), F.col("n").alias("n_b"))
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            F.col("n_common").cast("long").alias("n_common"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
