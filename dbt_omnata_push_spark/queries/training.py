"""Training-batch assembly queries: sequence packing, seeded corpus
shuffle/split, and n-gram LM coverage scoring.

These cover the "assemble the final training feed" stage downstream of
dedup/quality filtering — the reference's analog is its batched staging
loop (marketing_cloud_data_extension_upload.sql:56-99: global row
number -> fixed-size batch key -> per-batch push); here batches are
token-budget bins and the batch key derives from a scalable prefix sum
instead of a single-partition row_number window.

Determinism: token counts are exact integers in both engines (same
whitespace split), the shuffle key is md5 (bit-identical), bin ids are
floor-division of integer sums (< 2^53, exact in double), and coverage
is a single int/int division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.catalog import load_table
from ..llmops import dedup as D
from ..ops.packing import pack_sequences, shuffle_split
from ..ops.rownum import with_ordered_global_index
from . import query

_SEED = "seed42"
_BUDGET = 1024


# ---------------------------------------------------------------------------
# Sequence packing: order the corpus by a seeded hash, lay documents
# end-to-end, cut every _BUDGET tokens. The prefix sum behind bin_id is
# the two-pass ops/packing.with_prefix_sum — per-partition windows plus
# broadcast offsets, never a global single-partition window.
# ---------------------------------------------------------------------------
@query(
    "corpus_sequence_packing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             md5('{_SEED}:' || CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ), pref AS (
      SELECT doc_id, n_tok,
             CAST(COALESCE(SUM(n_tok) OVER (
               ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS tok_before
      FROM toks
    )
    SELECT CAST(floor(tok_before / {_BUDGET}) AS BIGINT) AS bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
    FROM pref
    GROUP BY 1
    ORDER BY bin_id
    """,
    tags=("llm", "training", "packing"),
)
def corpus_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing of the shuffled corpus into 1024-token
    bins; per-bin document and token counts."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = shuffle_split(docs, "doc_id", seed=_SEED).select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
        F.col("shuffle_key").alias("h"),
    )
    packed = pack_sequences(
        toks, token_col="n_tok", budget=_BUDGET, order_cols=["h", "doc_id"]
    )
    return (
        packed.groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("bin_tokens"),
        )
        .orderBy("bin_id")
    )


# ---------------------------------------------------------------------------
# Seeded shuffle + split: the assignment is a pure map stage (md5 bucket
# thresholds); the global shuffle RANK uses the scale-safe ordered index
# (range partition + per-partition numbering), not a global window.
# ---------------------------------------------------------------------------
@query(
    "corpus_shuffle_split",
    oracle=f"""
    SELECT doc_id, split,
           CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) AS BIGINT) AS shuffle_rank
    FROM (
      SELECT doc_id, h,
             CASE WHEN substr(h, 1, 2) < 'cc' THEN 'train'
                  WHEN substr(h, 1, 2) < 'e6' THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT doc_id,
                   md5('{_SEED}:' || CAST(doc_id AS VARCHAR)) AS h
            FROM documents)
    )
    """,
    tags=("llm", "training", "sampling"),
)
def corpus_shuffle_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic seeded corpus shuffle (md5 order) with ~80/10/10
    train/val/test assignment and a scale-safe global shuffle rank."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    assigned = shuffle_split(docs, "doc_id", seed=_SEED)
    ranked = with_ordered_global_index(
        assigned, ["shuffle_key", "doc_id"], col_name="shuffle_rank"
    )
    return ranked.select("doc_id", "split", "shuffle_rank")


# ---------------------------------------------------------------------------
# N-gram LM coverage: document-frequency-weighted "commonness" of each
# document's bigrams — a cheap LM-style fluency proxy (documents made of
# corpus-frequent bigrams score high; OOV-heavy ones score low). The
# gram->df table shuffles on the gram key (the correct 100 TB shape:
# cost ~ corpus vocabulary, partial-aggregated map-side).
# ---------------------------------------------------------------------------
@query(
    "ngram_lm_coverage",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             CASE WHEN len(words) >= 2
                  THEN list_distinct(list_transform(
                         generate_series(1, len(words) - 1),
                         i -> words[i] || ' ' || words[i+1]))
                  ELSE [text] END AS shingles
      FROM (SELECT doc_id, text, string_split(text, ' ') AS words FROM documents)
    ), grams AS (
      SELECT doc_id, unnest(shingles) AS g FROM sh
    ), dfreq AS (
      SELECT g, COUNT(DISTINCT doc_id) AS df FROM grams GROUP BY g
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN df >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS common_grams,
           CAST(SUM(CASE WHEN df >= 3 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             AS coverage
    FROM grams JOIN dfreq USING (g)
    GROUP BY doc_id
    """,
    tags=("llm", "training", "text"),
)
def ngram_lm_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram document-frequency coverage per document: the fraction of
    its distinct bigrams that occur in >= 3 documents corpus-wide."""
    # Spread the expression-heavy shingle stage across cores (one small
    # parquet file arrives as a single partition), and materialize the
    # exploded gram frame once with localCheckpoint — it feeds BOTH the
    # df aggregation and the join side (measured 13.2s -> 1.5s at
    # sf0.1). Grams are distinct per doc (with_shingles dedups), so df
    # is a plain count.
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    grams = (
        D.with_shingles(docs, n=2)
        .select("doc_id", F.explode("shingles").alias("g"))
        .localCheckpoint(eager=False)
    )
    dfreq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    common = F.sum(F.when(F.col("df") >= 3, 1).otherwise(0))
    return (
        grams.join(dfreq, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            common.alias("common_grams"),
            (common.cast("double") / F.count(F.lit(1))).alias("coverage"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR importance selection (llmops/dsir.py): hashed-ngram likelihood
# ratios against a trusted target domain, exact integer scoring.
# ---------------------------------------------------------------------------
@query(
    "corpus_dsir_selection",
    oracle="""
    WITH toks AS (
      SELECT doc_id, tgt,
             CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % 4096 AS b
      FROM (SELECT doc_id, source = 'src0' AS tgt,
                   UNNEST(string_split(text, ' ')) AS w
            FROM documents)
    ),
    tc AS (SELECT b, COUNT(*) AS ct FROM toks WHERE tgt GROUP BY 1),
    sc AS (SELECT b, COUNT(*) AS cs FROM toks WHERE NOT tgt GROUP BY 1),
    ratio AS (
      SELECT COALESCE(tc.b, sc.b) AS b,
             (COALESCE(ct, 0) + 1) * 1000000 // (COALESCE(cs, 0) + 1)
               AS rppm
      FROM tc FULL OUTER JOIN sc ON tc.b = sc.b
    ),
    feats AS (
      SELECT doc_id, b, COUNT(*) AS cnt FROM toks
      WHERE NOT tgt GROUP BY 1, 2
    ),
    scored AS (
      SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS n_tokens,
             CAST(SUM(cnt * rppm) AS BIGINT) AS score_ppm
      FROM feats JOIN ratio USING (b) GROUP BY 1
    )
    SELECT doc_id, n_tokens, score_ppm,
           score_ppm // n_tokens AS mean_ratio_ppm
    FROM scored
    ORDER BY mean_ratio_ppm DESC, doc_id ASC
    LIMIT 50
    """,
    tags=("llm", "dsir", "selection", "importance"),
)
def corpus_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (arXiv:2302.03169) over the documents table:
    src0 plays the trusted target domain, every other source is the raw
    pool; each pool document is scored by the smoothed target/source
    hashed-unigram likelihood ratio (exact ppm integers — the log
    variant ships as dsir_scores' log_weight column) and the top 50 by
    length-normalized ratio are kept. Two dimension-sized distribution
    frames broadcast onto per-doc counts; TakeOrderedAndProject top-k."""
    from ..llmops.dsir import dsir_scores, dsir_select_topk

    docs = load_table(spark, sf_dir, "documents")
    scores = dsir_scores(docs, F.col("source") == "src0")
    return dsir_select_topk(scores, 50).select(
        "doc_id", "n_tokens", "score_ppm", "mean_ratio_ppm"
    )


# ---------------------------------------------------------------------------
# Systematic weighted resampling (ops/sampling.py): the exact-integer
# resampling stage downstream of importance scoring (DSIR's "R").
# ---------------------------------------------------------------------------
@query(
    "corpus_weighted_resample",
    oracle="""
    WITH base AS (
      SELECT doc_id, n_chars AS w,
             md5('sysres:' || CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ),
    pref AS (
      SELECT doc_id, w,
             CAST(COALESCE(SUM(w) OVER (
               ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS lo
      FROM base
    ),
    tot AS (SELECT CAST(SUM(w) AS BIGINT) AS wt FROM base),
    counted AS (
      SELECT doc_id, w,
             (CASE WHEN 2 * 200 * (lo + w) > wt
                   THEN (2 * 200 * (lo + w) - wt - 1) // (2 * wt) + 1
                   ELSE 0 END)
             - (CASE WHEN 2 * 200 * lo > wt
                     THEN (2 * 200 * lo - wt - 1) // (2 * wt) + 1
                     ELSE 0 END) AS n_copies
      FROM pref, tot
      WHERE wt > 0
    )
    SELECT doc_id, w AS weight, CAST(n_copies AS BIGINT) AS n_copies
    FROM counted WHERE n_copies > 0
    """,
    tags=("llm", "sampling", "resample", "importance"),
)
def corpus_weighted_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic weighted resampling of the corpus, 200 draws with
    multiplicity proportional to n_chars
    (ops/sampling.py::systematic_weighted_resample). Deterministic
    seeded-md5 ordering, two-pass scalable prefix sum, and pure-BIGINT
    tick counting — sum(n_copies) == 200 exactly, verified by the
    oracle and pinned by unit test. Composes downstream of
    corpus_dsir_selection: feed mean_ratio_ppm as the weight to get
    the paper's full select-then-resample pipeline."""
    from ..ops.sampling import systematic_weighted_resample

    docs = load_table(spark, sf_dir, "documents")
    return systematic_weighted_resample(docs, 200, "n_chars", "doc_id")


# ---------------------------------------------------------------------------
# A-ES weighted reservoir selection (ops/sampling.py): distinct-row
# weighted subset selection, the without-replacement counterpart of
# corpus_weighted_resample.
# ---------------------------------------------------------------------------
@query(
    "corpus_weighted_reservoir",
    oracle="""
    WITH base AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
             (CAST(('0x' || substr(md5('res:' || CAST(doc_id AS VARCHAR)), 1, 15))
                AS BIGINT) + 1) / 1152921504606846976.0 AS u
      FROM documents WHERE n_chars > 0
    ),
    ranked AS (
      SELECT doc_id, weight,
             row_number() OVER (ORDER BY ln(u) / weight DESC, doc_id)
               AS sel_rank
      FROM base
    )
    SELECT doc_id, weight, CAST(sel_rank AS BIGINT) AS sel_rank
    FROM ranked WHERE sel_rank <= 100
    """,
    tags=("llm", "sampling", "reservoir"),
)
def corpus_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100-doc A-ES weighted reservoir sample of the corpus, inclusion
    probability scaling with n_chars
    (ops/sampling.py::weighted_reservoir_topk). Deterministic seeded-md5
    uniforms, log-domain A-ES keys, ONE global top-k
    (TakeOrderedAndProject — per-partition heaps, no corpus shuffle);
    the without-replacement counterpart of corpus_weighted_resample.
    Reference analogue: the push package samples nothing — this is part
    of the training-data curation extension surface."""
    from ..ops.sampling import weighted_reservoir_topk

    docs = load_table(spark, sf_dir, "documents")
    return weighted_reservoir_topk(docs, 100, "n_chars", "doc_id")


@query(
    "corpus_reservoir_per_source",
    oracle="""
    WITH base AS (
      SELECT source, doc_id, CAST(n_chars AS BIGINT) AS weight,
             (CAST(('0x' || substr(md5('gres:' || CAST(doc_id AS VARCHAR)), 1, 15))
                AS BIGINT) + 1) / 1152921504606846976.0 AS u
      FROM documents WHERE n_chars > 0
    ),
    ranked AS (
      SELECT source, doc_id, weight,
             row_number() OVER (PARTITION BY source
                                ORDER BY ln(u) / weight DESC, doc_id)
               AS sel_rank
      FROM base
    )
    SELECT source, doc_id, weight, CAST(sel_rank AS BIGINT) AS sel_rank
    FROM ranked WHERE sel_rank <= 20
    """,
    tags=("llm", "sampling", "reservoir"),
)
def corpus_reservoir_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-doc A-ES weighted reservoir PER SOURCE
    (ops/sampling.py::weighted_reservoir_per_group): per-source quota
    selection where winners are weight-sampled (n_chars), not
    top-scored — each group ranks inside its own partition
    (WindowGroupLimit), the grouped counterpart of
    corpus_weighted_reservoir."""
    from ..ops.sampling import weighted_reservoir_per_group

    docs = load_table(spark, sf_dir, "documents")
    return weighted_reservoir_per_group(
        docs, ["source"], 20, "n_chars", "doc_id"
    )


@query(
    "corpus_vocab_growth",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    first AS (SELECT tok, MIN(doc_id) AS doc_id FROM toks GROUP BY tok),
    hist AS (SELECT doc_id, COUNT(*) AS new_terms FROM first GROUP BY doc_id)
    SELECT doc_id, CAST(new_terms AS BIGINT) AS new_terms,
           CAST(SUM(new_terms) OVER (ORDER BY doc_id) AS BIGINT) AS vocab_size
    FROM hist
    """,
    tags=("llm", "analytics", "vocab"),
)
def corpus_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical Heaps-law curve (llmops/vocab.py::vocab_growth):
    distinct-vocabulary size after each document, from each token's
    first-seen document. Token-keyed shuffles only; the running total
    is the two-pass distributed prefix sum (ops/prefix.py), not a
    single-partition window."""
    from ..llmops.vocab import vocab_growth

    return vocab_growth(load_table(spark, sf_dir, "documents"))


@query(
    "corpus_source_vocab_overlap",
    oracle="""
    WITH vocab AS (
      SELECT DISTINCT source AS src, tok FROM (
        SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
      )
    ),
    sizes AS (SELECT src, COUNT(*) AS n FROM vocab GROUP BY src),
    common AS (
      SELECT a.src AS source_a, b.src AS source_b, COUNT(*) AS n_common
      FROM vocab a JOIN vocab b ON a.tok = b.tok AND a.src < b.src
      GROUP BY 1, 2
    )
    SELECT source_a, source_b, CAST(n_common AS BIGINT) AS n_common,
           CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
           CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
    FROM common
    JOIN sizes sa ON sa.src = source_a
    JOIN sizes sb ON sb.src = source_b
    """,
    tags=("llm", "analytics", "vocab"),
)
def corpus_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources
    (llmops/vocab.py::source_vocab_overlap): token-keyed self-join of
    the distinct (source, token) table — detects near-duplicate crawls
    and lexically disjoint sources; sizes broadcast back."""
    from ..llmops.vocab import source_vocab_overlap

    return source_vocab_overlap(load_table(spark, sf_dir, "documents"))
