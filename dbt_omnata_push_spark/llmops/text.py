"""Text analysis operators over a documents table.

All operators are pure pyspark.sql.functions expressions (JVM-side,
whole-stage codegen) — no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Stopword markers per language for the n-gram/stopword language-ID
# heuristic. Deterministic, tiny, broadcast as literals.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pas"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "no"],
}


def with_words(df: DataFrame, text_col: str = "text", out: str = "words") -> DataFrame:
    """Tokenize on single spaces (the normalized-document contract)."""
    return df.withColumn(out, F.split(F.col(text_col), " "))


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality/statistics features.

    Length, word counts, vocabulary richness, punctuation/digit ratios and
    a composite quality score — the standard pre-training corpus filters.
    """
    words = F.split(F.col(text_col), " ")
    n_chars = F.length(F.col(text_col))
    n_words = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    n_punct = F.length(F.regexp_replace(F.col(text_col), "[a-zA-Z0-9 ]", ""))
    n_digits = F.length(F.regexp_replace(F.col(text_col), "[^0-9]", ""))
    # n_words >= 1 always (split('') -> ['']), but n_chars is 0 for the
    # empty document — and Spark 4 runs ANSI mode by default, so a bare
    # x / n_chars aborts the whole job on one empty row. Guard char-
    # denominated ratios (0.0 for empty text, matching the oracle CASE).
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct_words"),
        (n_distinct.cast("double") / n_words).alias("vocab_ratio"),
        (n_chars.cast("double") / n_words).alias("avg_word_len"),
        _ratio(n_punct, n_chars).alias("punct_ratio"),
        _ratio(n_digits, n_chars).alias("digit_ratio"),
    )


def _ratio(num: Column, denom: Column) -> Column:
    """num/denom as double, 0.0 when denom == 0 (ANSI-safe)."""
    return F.when(denom > 0, num.cast("double") / denom).otherwise(F.lit(0.0))


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-overlap language-ID heuristic.

    Counts marker-stopword occurrences per language (with multiplicity)
    and picks the argmax, ties broken by language-code order; 'und'
    (undetermined) when nothing matches.
    """
    words = F.split(F.lower(F.col(text_col)), " ")
    hits = {
        lang: F.size(
            F.filter(words, lambda w: w.isin(markers))  # noqa: B023
        )
        for lang, markers in LANG_MARKERS.items()
    }
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[hits[lang] for lang in langs])
    pred = F.lit("und")
    # Reverse order so earlier languages win ties via later overwrite.
    for lang in reversed(langs):
        pred = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(pred)
    out = df.select(
        F.col(id_col), *[hits[lang].alias(f"hits_{lang}") for lang in langs]
    )
    return out.withColumn(
        "predicted_lang",
        _argmax_expr([(f"hits_{lang}", lang) for lang in langs]),
    )


def _argmax_expr(pairs: list[tuple[str, str]]) -> Column:
    best = F.greatest(*[F.col(c) for c, _ in pairs])
    expr = F.lit("und")
    for col, lang in reversed(pairs):
        expr = F.when((F.col(col) > 0) & (F.col(col) == best), F.lit(lang)).otherwise(expr)
    return expr


# BPE-ish pre-tokenization: letter runs, digit runs, single punctuation.
BPEISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per document."""
    ws = F.size(F.split(F.col(text_col), " "))
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPEISH_PATTERN), 0))
    return df.select(
        F.col(id_col),
        ws.alias("ws_tokens"),
        bpe.alias("bpeish_tokens"),
    )


def char_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", gram: int = 8
) -> DataFrame:
    """Winnowing-lite document fingerprint.

    min(md5(char-8-gram)) over a rolling character window — a bottom-1
    sketch of the rolling-hash set; equal fingerprints => near-identical
    content prefix sets. Pure expressions, codegen-friendly.
    """
    t = F.col(text_col)
    n = F.length(t)
    grams = F.when(
        n >= gram,
        F.transform(
            F.sequence(F.lit(1), n - (gram - 1)),
            lambda i: t.substr(i, F.lit(gram)),
        ),
    ).otherwise(F.array(t))
    return df.select(
        F.col(id_col),
        F.array_min(F.transform(grams, F.md5)).alias("fingerprint"),
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-document repetition signal: duplicated word-bigram fraction.

    Boilerplate / template / spam text repeats n-grams; high
    rep_ratio (1 - distinct/total bigrams) is a standard pretraining
    quality filter. Pure expressions (no shuffle — per-row arrays), one
    int/int division so the oracle matches bit-for-bit.
    """
    from .dedup import word_ngrams

    sz = F.size(F.split(F.col(text_col), " "))
    bigrams = word_ngrams(text_col, 2)
    n_total = F.size(bigrams)
    n_distinct = F.size(F.array_distinct(bigrams))
    return (
        df.filter(sz >= 2)
        .select(
            F.col(id_col),
            n_total.cast("long").alias("n_bigrams"),
            n_distinct.cast("long").alias("n_distinct_bigrams"),
            (F.lit(1.0) - n_distinct.cast("double") / n_total).alias("rep_ratio"),
        )
    )


def regex_scan(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Pattern-count scan (the PII/boilerplate-detector shape).

    Counts per document for a battery of regexes via regexp_extract_all
    (JVM-side, codegen). Swap the battery for email/phone/SSN patterns
    in a real PII pass — the plan shape is identical; the shipped
    patterns are chosen to actually hit the synthetic corpus.
    """
    t = F.col(text_col)

    def n(pattern: str):
        return F.size(F.regexp_extract_all(t, F.lit(pattern), 0)).cast("long")

    n_words = F.size(F.split(t, " "))
    n_long = n("[a-z]{6,}")
    return df.select(
        F.col(id_col),
        n_long.alias("n_long_words"),
        n("[aeiou]{2}").alias("n_double_vowels"),
        (n_long.cast("double") / n_words).alias("frac_long_words"),
    )


# PII patterns shared by the scan and redaction passes. Written in the
# common subset of Java regex (Spark) and RE2 (DuckDB oracle): character
# classes, bounded repetition, ASCII word boundaries — no lookarounds,
# no backreferences.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}

# Redaction order: the one that matters is email BEFORE ipv4 (a mail
# domain containing a dotted quad, e.g. user@10.1.2.3.example.com, must
# become [EMAIL], not keep a partial [IPV4] inside the address).
# SSN-before-phone is NOT load-bearing:
# \b\d{3}-\d{4}\b can never match inside or at the tail of an SSN
# (no boundary-preceded 3-digit run there is followed by exactly 4
# digits), it is kept first purely for readability.
PII_REDACTION_ORDER = ("email", "ssn", "phone", "ipv4")


def pii_scan(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII hit counts (email / SSN / phone / IPv4).

    The standard pre-training privacy filter. Pure regexp_extract_all
    expressions — map-side, whole-stage codegen, zero shuffle; at 100 TB
    this is a scan-rate pass.
    """
    t = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(t, F.lit(pat), 0)).cast("long").alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]
    # n_pii_total is the sum of per-type counts: a span matching two
    # patterns (a dotted-quad mail hostname is both email and ipv4)
    # counts once per type. Documented over-count — the redaction pass
    # resolves overlaps via PII_REDACTION_ORDER instead.
    total = sum(
        F.size(F.regexp_extract_all(t, F.lit(pat), 0)).cast("long")
        for pat in PII_PATTERNS.values()
    )
    return df.select(F.col(id_col), *counts, total.alias("n_pii_total"))


def pii_redact(
    df: DataFrame, text_col: str = "text", out: str = "redacted"
) -> DataFrame:
    """Replace every PII match with a typed placeholder ('[EMAIL]', ...).

    Chained regexp_replace in PII_REDACTION_ORDER so overlapping
    patterns resolve deterministically. Map-side only — no shuffle.
    """
    c: Column = F.col(text_col)
    for name in PII_REDACTION_ORDER:
        c = F.regexp_replace(c, PII_PATTERNS[name], f"[{name.upper()}]")
    return df.withColumn(out, c)


def chunk_documents(
    df: DataFrame,
    chunk_words: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping fixed-width word-window chunks (the RAG/context-window
    splitter): chunk i covers words [1 + i*stride, 1 + i*stride + chunk_words).

    Chunk starts come from sequence(1, n_words, stride); with
    stride <= chunk_words (validated) every word is covered and trailing
    partial chunks are kept. Entirely per-row array expressions followed
    by posexplode — map-side, no shuffle; chunking 100 TB is a scan-rate
    pass that parallelizes per input split.
    """
    if stride < 1 or chunk_words < 1:
        raise ValueError("chunk_words and stride must be >= 1")
    if stride > chunk_words:
        raise ValueError(
            f"stride ({stride}) > chunk_words ({chunk_words}) would leave "
            "uncovered word gaps between consecutive chunks"
        )
    words = F.split(F.col(text_col), " ")
    starts = F.sequence(F.lit(1), F.size(words), F.lit(stride))
    exploded = (
        df.withColumn("__words", words)
        .select(F.col(id_col), "__words", F.posexplode(starts).alias("chunk_id", "__start"))
    )
    piece = F.slice(F.col("__words"), F.col("__start"), chunk_words)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.col("__start").alias("start_word"),
        F.size(piece).cast("long").alias("n_words"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def quality_score_expr(text_col: str = "text"):
    """The quality score as a bare Column (shared by quality_score and
    single-consumer pipeline filters — see corpus_curation_v2)."""
    words = F.split(F.col(text_col), " ")
    n_chars = F.length(F.col(text_col))
    n_words = F.size(words)
    vocab_ratio = F.size(F.array_distinct(words)).cast("double") / n_words
    avg_word_len = n_chars.cast("double") / n_words
    # _ratio guards n_chars == 0 (empty doc) — ANSI mode would otherwise
    # abort the job with DIVIDE_BY_ZERO on a single empty row.
    digit_ratio = _ratio(
        F.length(F.regexp_replace(F.col(text_col), "[^0-9]", "")), n_chars
    )
    return (
        F.lit(0.5)
        + F.lit(0.4) * vocab_ratio
        - F.lit(0.3) * digit_ratio
        - F.lit(0.02) * (avg_word_len - F.lit(5.0))
        + F.when((n_words >= 20) & (n_words <= 1000), F.lit(0.1)).otherwise(F.lit(-0.1))
    )


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Composite linear quality score + keep/drop gate.

    A fixed-weight linear model over the text_stats features (the shape
    of a fasttext-style quality classifier's decision function, with
    hand-set weights since no model ships in this container). All
    ratios are int/int double divisions, so the score is bit-identical
    across engines. Map-side only.
    """
    words = F.split(F.col(text_col), " ")
    n_words = F.size(words)
    vocab_ratio = F.size(F.array_distinct(words)).cast("double") / n_words
    score = quality_score_expr(text_col)
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        vocab_ratio.alias("vocab_ratio"),
        score.alias("quality_score"),
        (score >= 0.7).alias("keep"),
    )


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing word n-grams with a
    held-out evaluation set (the filter every serious pretraining corpus
    runs before training).

    Plan shape for 100 TB: the benchmark side (test suites, eval
    prompts) is tiny relative to the corpus, so its distinct shingles
    BROADCAST; the corpus side explodes shingles map-side and the join
    never shuffles corpus data. Returns (doc_id, n_shared_ngrams) for
    contaminated docs only — anti-join against it to decontaminate.
    """
    from .dedup import with_shingles

    bench_sh = (
        with_shingles(benchmark, n=n)
        .select(F.explode("shingles").alias("sh"))
        .distinct()
    )
    corpus_sh = with_shingles(corpus, n=n).select(
        F.col(id_col), F.explode("shingles").alias("sh")
    )
    return (
        corpus_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared_ngrams"))
    )


def rarity_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-relative bigram rarity score — the log-free stand-in for a
    CCNet-style LM-perplexity quality bucket (no LM ships in this
    container; corpus bigram statistics play the model).

    Per document: mean inverse corpus frequency of its word bigrams,
    integer-ized as sum(10^9 div cnt) so cross-row totals are exact
    BIGINT arithmetic in every engine (ln/exp would differ by ULPs
    between libm implementations and break the oracle hash). High
    mean_rarity = mostly corpus-unique text; low = boilerplate.

    Plan shape: one gram-keyed groupBy (map-side partial agg), one
    co-keyed join back, one doc-keyed groupBy. Identical to
    duplicated_ngram_coverage — nothing all-pairs, nothing collects;
    the exploded gram frame is spread across cores and localCheckpointed
    once because it feeds both the count agg and the join side.
    """
    from .dedup import word_ngrams

    spark = df.sparkSession
    grams = (
        df.select(F.col(id_col), F.col(text_col))
        .repartition(spark.sparkContext.defaultParallelism, id_col)
        .select(
            F.col(id_col),
            F.explode(word_ngrams(text_col, 2, hashed=True)).alias("g"),
        )
        .localCheckpoint(eager=False)
    )
    counts = grams.groupBy("g").agg(F.count(F.lit(1)).alias("cnt"))
    scored = grams.join(counts, "g").select(
        id_col, F.expr("1000000000 div cnt").alias("inv")
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("inv").alias("rarity_sum"),
    )
    mean_rarity = F.col("rarity_sum").cast("double") / F.col("n_bigrams")
    return (
        df.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce(F.col("rarity_sum"), F.lit(0)).cast("long").alias("rarity_sum"),
            F.coalesce(mean_rarity, F.lit(0.0)).alias("mean_rarity"),
            F.when(F.coalesce(mean_rarity, F.lit(0.0)) >= 500_000_000.0, F.lit("high"))
            .when(F.coalesce(mean_rarity, F.lit(0.0)) >= 100_000_000.0, F.lit("medium"))
            .otherwise(F.lit("low"))
            .alias("rarity_bucket"),
        )
    )


def redact_terms(
    df: DataFrame,
    denylist: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dictionary-based redaction with STABLE pseudonyms: every token
    on the denylist becomes ``X_<md5-prefix>`` — the same surface form
    always maps to the same pseudonym, so downstream co-occurrence /
    dedup statistics survive scrubbing (the PII/watchlist-scrub stage
    of a curation pipeline, expressed entirely in JVM HOFs: split once,
    transform with a literal-map lookup, re-join; zero Python in the
    row path and zero shuffles — the denylist is dimension-sized by
    definition and ships as a literal map).

    Output: id, ``redacted_text``, ``n_redactions``.
    """
    import hashlib

    pairs = []
    for w in denylist:
        pairs.append(F.lit(w))
        pairs.append(
            F.lit("X_" + hashlib.md5(w.encode("utf-8")).hexdigest()[:8])
        )
    # an argless create_map() is VOID-typed and fails lambda lookups;
    # type the empty denylist explicitly
    mapping = (
        F.create_map(*pairs)
        if pairs
        else F.expr("CAST(map() AS MAP<STRING, STRING>)")
    )
    words = F.split(F.col(text_col), " ")

    def replaced(wv):
        return F.transform(
            wv, lambda t: F.coalesce(mapping[t], t)
        )

    def hits(wv):
        return F.size(F.filter(wv, lambda t: mapping[t].isNotNull()))

    # bind the token array once as a lambda variable (the word_ngrams
    # trick) so tokenization isn't re-run per element by CollapseProject
    inner_text = F.transform(F.array(words), lambda wv: F.array_join(replaced(wv), " "))
    inner_hits = F.transform(F.array(words), lambda wv: hits(wv))
    return df.select(
        F.col(id_col),
        F.element_at(inner_text, 1).alias("redacted_text"),
        F.element_at(inner_hits, 1).cast("long").alias("n_redactions"),
    )


def top_terms(
    df: DataFrame, k: int, text_col: str = "text"
) -> list[str]:
    """The k most frequent tokens (count desc, token asc tiebreak) —
    a deterministic, dimension-sized denylist source. One explode +
    map-side-partial count + TakeOrdered; the k-row collect is the
    denylist itself, bounded by design."""
    rows = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(k)
        .collect()
    )
    return [r["w"] for r in rows]
