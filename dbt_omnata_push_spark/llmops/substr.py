"""Exact substring-span deduplication (suffix-array style, windowed).

"Deduplicating Training Data Makes Language Models Better" (Lee et al.,
2022) removes EXACT repeated substrings across documents — a different
failure mode than near-duplicate whole documents (MinHash/SimHash in
llmops/dedup.py): boilerplate headers, license blocks, and templated
sentences repeat verbatim inside otherwise-distinct documents.

The paper builds a corpus-wide suffix array; that is inherently
sequential and memory-resident. The distributed re-expression used
here is the standard windowed approximation: slide a k-character
window with stride s over every document, hash each window, and a
window hash seen in >= 2 distinct documents marks a duplicated span.
With s <= k/2 any repeated substring of length >= k + s - 1 is
guaranteed to contain at least one aligned window on both sides after
at most s alignments — stride trades recall granularity for a
len/s explosion factor instead of len (the suffix array's effective
factor).

Scale shape:
- the explode is map-side (sequence + substring, JVM expressions);
- only (doc_id, 64-hex md5) pairs enter the shuffle — never the gram
  text, so shuffle width is constant per span;
- frequency counting is one hash aggregation on the span hash; the
  flag-back join reuses that hash partitioning.

md5 is the span key because it computes bit-identically in Spark
(md5(cast binary)), DuckDB, and Python — the oracle is EXACT, not
rows-only (same trick as ops/invindex.py's term buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def span_hashes(
    docs: DataFrame,
    k: int = 32,
    stride: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Explode each document into (doc_id, pos, h) windowed span hashes.

    Documents shorter than ``k`` contribute nothing (they are whole-doc
    dedup's problem, not span dedup's).
    """
    n_spans_from = F.length(text_col) - F.lit(k - 1)
    return (
        docs.filter(F.length(text_col) >= k)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.sequence(F.lit(1), n_spans_from, F.lit(stride))
            ).alias("pos"),
            F.col(text_col).alias("_t"),
        )
        .select(
            "doc_id",
            "pos",
            F.md5(
                F.expr(f"substring(_t, pos, {k})").cast("binary")
            ).alias("h"),
        )
    )


def duplicated_span_stats(
    docs: DataFrame,
    k: int = 32,
    stride: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document duplicated-span profile.

    Returns one row per document that shares at least one k-char span
    with >= ``min_docs``-1 other documents: ``doc_id``, ``total_spans``
    (windows examined), ``dup_spans`` (windows whose hash occurs in
    >= min_docs distinct docs), ``max_span_docs`` (how widely the
    worst span is shared). Downstream curation can drop or trim on
    ``dup_spans / total_spans``.
    """
    spans = span_hashes(docs, k=k, stride=stride, id_col=id_col, text_col=text_col)
    freq = spans.groupBy("h").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    flagged = spans.join(freq, "h")
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("total_spans"),
            F.sum(
                F.when(F.col("nd") >= min_docs, 1).otherwise(0)
            ).alias("dup_spans"),
            F.max("nd").alias("max_span_docs"),
        )
        .filter(F.col("dup_spans") > 0)
    )
