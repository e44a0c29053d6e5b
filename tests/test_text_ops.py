"""Edge-case tests for the PII / chunking / quality / substring-dup
operators (llmops.text, llmops.dedup.duplicated_ngram_coverage).

Oracle bit-parity for the happy path is covered by
tests/test_oracle_parity.py (text_pii_scan, text_pii_redact,
text_chunks, text_quality_score, dedup_ngram_coverage); these tests pin
the corners the corpus doesn't exercise: empty/null text under Spark 4's
default ANSI mode, stride validation, and overlapping PII matches.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_omnata_push_spark.llmops import dedup as D
from dbt_omnata_push_spark.llmops import text as T


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# ---------------------------------------------------------------------------
# Empty-document safety (ANSI mode divides)
# ---------------------------------------------------------------------------


def test_text_stats_empty_doc_no_ansi_abort(spark):
    # Spark 4 defaults to ANSI mode; x / length('') must not abort the job.
    out = T.text_stats(_docs(spark, [(1, ""), (2, "a b")])).orderBy("doc_id").collect()
    empty = out[0]
    assert empty["n_chars"] == 0
    assert empty["punct_ratio"] == 0.0
    assert empty["digit_ratio"] == 0.0
    # split('') -> [''] so word-denominated ratios stay well-defined.
    assert empty["n_words"] == 1


def test_quality_score_empty_doc_no_ansi_abort(spark):
    out = (
        T.quality_score(_docs(spark, [(1, ""), (2, "w " * 30 + "end")]))
        .orderBy("doc_id")
        .collect()
    )
    assert out[0]["quality_score"] is not None
    assert out[1]["keep"] in (True, False)


# ---------------------------------------------------------------------------
# Chunking
# ---------------------------------------------------------------------------


def test_chunk_documents_rejects_gapping_stride(spark):
    docs = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="stride"):
        T.chunk_documents(docs, chunk_words=4, stride=5)
    with pytest.raises(ValueError):
        T.chunk_documents(docs, chunk_words=0, stride=1)


def test_chunk_documents_covers_every_word(spark):
    text = " ".join(f"w{i}" for i in range(11))
    rows = T.chunk_documents(
        _docs(spark, [(1, text)]), chunk_words=4, stride=3
    ).collect()
    covered = set()
    for r in rows:
        assert 1 <= r["n_words"] <= 4
        covered.update(range(r["start_word"], r["start_word"] + r["n_words"]))
        assert r["chunk_text"].split(" ") == [
            f"w{i - 1}" for i in range(r["start_word"], r["start_word"] + r["n_words"])
        ]
    assert covered == set(range(1, 12))
    # chunk_id is the dense 0-based index of the start position.
    assert sorted(r["chunk_id"] for r in rows) == list(range(len(rows)))


def test_chunk_documents_empty_doc_single_empty_chunk(spark):
    # Documented: split('') tokenizes to [''], so an empty doc emits one
    # chunk whose text is '' (n_words=1) rather than disappearing.
    rows = T.chunk_documents(_docs(spark, [(1, "")])).collect()
    assert len(rows) == 1
    assert rows[0]["chunk_text"] == ""
    assert rows[0]["n_words"] == 1


# ---------------------------------------------------------------------------
# PII scan / redaction
# ---------------------------------------------------------------------------


def test_pii_scan_counts_and_overlap_overcount(spark):
    docs = _docs(
        spark,
        [
            (1, "mail bob@example.com ssn 123-45-6789 call 555-1234 ip 10.0.0.1"),
            # dotted quad inside a mail domain: the span is an email AND
            # contains an ipv4 match.
            (2, "user@10.1.2.3.example.com says hi"),
            (3, "clean text only"),
        ],
    )
    rows = {r["doc_id"]: r for r in T.pii_scan(docs).collect()}
    assert (
        rows[1]["n_email"],
        rows[1]["n_ssn"],
        rows[1]["n_phone"],
        rows[1]["n_ipv4"],
    ) == (1, 1, 1, 1)
    # SSN-tail is NOT double-counted as phone (\b\d{3}-\d{4}\b can't match
    # inside 123-45-6789), so the total is exactly 4.
    assert rows[1]["n_pii_total"] == 4
    # The overlapping span counts once per matching type (documented
    # over-count): email and ipv4 both hit.
    assert rows[2]["n_email"] == 1 and rows[2]["n_ipv4"] == 1
    assert rows[2]["n_pii_total"] == 2
    assert rows[3]["n_pii_total"] == 0


def test_pii_redact_order_resolves_overlaps(spark):
    docs = _docs(
        spark,
        [
            (1, "reach user@10.1.2.3.example.com or 123-45-6789 or 555-1234 at 192.168.0.1"),
            (2, ""),
        ],
    )
    out = {r["doc_id"]: r["redacted"] for r in T.pii_redact(docs).collect()}
    # email wins over ipv4 on the mail-host overlap; the SSN is redacted
    # whole (no [PHONE] carved out of its tail); the bare ip still hits.
    assert out[1] == "reach [EMAIL] or [SSN] or [PHONE] at [IPV4]"
    assert out[2] == ""


def test_pii_redact_null_text_passthrough(spark):
    docs = spark.createDataFrame([(1, None)], "doc_id bigint, text string")
    assert T.pii_redact(docs).collect()[0]["redacted"] is None


# ---------------------------------------------------------------------------
# Duplicated n-gram coverage
# ---------------------------------------------------------------------------


def test_duplicated_ngram_coverage_finds_shared_span(spark):
    shared = "the quick brown fox jumps"
    docs = _docs(
        spark,
        [
            (1, shared + " over one lazy dog"),
            (2, shared + " across another fence"),
            (3, "completely unrelated words here now"),
            (4, "tiny doc"),  # < n words -> zero gram positions
        ],
    )
    rows = {r["doc_id"]: r for r in D.duplicated_ngram_coverage(docs, n=4).collect()}
    # The shared 5-word span contributes 2 duplicated 4-gram positions
    # to each of docs 1 and 2 (L - n + 1 = 2).
    assert rows[1]["n_dup_positions"] == 2
    assert rows[2]["n_dup_positions"] == 2
    assert rows[1]["n_gram_positions"] == 6
    assert rows[1]["dup_frac"] == pytest.approx(2 / 6)
    assert rows[3]["n_dup_positions"] == 0
    assert rows[4]["n_gram_positions"] == 0 and rows[4]["dup_frac"] == 0.0
    # Every doc appears exactly once (left join back to the doc frame).
    assert set(rows) == {1, 2, 3, 4}


# ---------------------------------------------------------------------------
# Tokenize-once guarantee (the O(words^2) re-split regression guard)
# ---------------------------------------------------------------------------


def test_word_ngrams_never_resplits_per_element(spark):
    """element_at(split(text), i) inside a HOF lambda re-tokenizes the
    document per gram position (O(words^2) per doc — measured 10x whole-
    query cost). word_ngrams must bind tokens as a lambda variable, so
    the optimized plan never feeds split() into element_at directly."""
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id bigint, text string")
    for fn in (
        lambda: df.select(D.word_ngrams("text", 3).alias("g")),
        lambda: D.with_shingles(df, n=3).select("shingles"),
        lambda: T.repetition_stats(df).select("n_bigrams"),
    ):
        plan = fn()._jdf.queryExecution().optimizedPlan().toString()
        assert "element_at(split(" not in plan, plan[:400]


def test_word_ngrams_values(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "x y"), (3, "")], "doc_id bigint, text string"
    )
    rows = {
        r["doc_id"]: r["g"]
        for r in df.select("doc_id", D.word_ngrams("text", 3).alias("g")).collect()
    }
    assert rows[1] == ["a b c", "b c d"]
    assert rows[2] == [] and rows[3] == []
    hashed = df.select("doc_id", D.word_ngrams("text", 3, hashed=True).alias("g"))
    import hashlib

    got = {r["doc_id"]: r["g"] for r in hashed.collect()}
    assert got[1] == [hashlib.md5(s.encode()).hexdigest() for s in ["a b c", "b c d"]]


# ---------------------------------------------------------------------------
# Property-based invariants (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_WORDS = ["alpha", "beta", "gamma", "delta", "x1", "y2", "zz", "the", "of"]


@given(
    st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=6, deadline=None)
def test_word_ngrams_matches_python_reference(spark, doc_words):
    n = 3
    rows = [(i, " ".join(ws)) for i, ws in enumerate(doc_words)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["g"]
        for r in df.select("doc_id", D.word_ngrams("text", n).alias("g")).collect()
    }
    for i, (_, text) in enumerate(rows):
        toks = text.split(" ")  # matches split('', ' ') -> [''] semantics
        expect = (
            [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
            if len(toks) >= n
            else []
        )
        assert got[i] == expect


@given(
    st.lists(
        st.sampled_from(
            [
                "plain words",
                "a@b.co",
                "123-45-6789",
                "555-1234",
                "10.0.0.1",
                "u@10.1.2.3.example.com",
                "",
            ]
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=6, deadline=None)
def test_pii_redact_idempotent(spark, pieces):
    # Redaction placeholders contain no digits or '@', so a second pass
    # must be a no-op — redaction is idempotent.
    df = spark.createDataFrame([(1, " ".join(pieces))], "doc_id bigint, text string")
    once = T.pii_redact(df).select(F.col("redacted").alias("text"), "doc_id")
    twice = T.pii_redact(once).collect()[0]
    assert twice["redacted"] == twice["text"]


# ------------------------------------------------------------ redaction


def test_redact_terms_stable_pseudonyms_and_counts(spark):
    import hashlib

    from dbt_omnata_push_spark.llmops.text import redact_terms

    df = spark.createDataFrame(
        [(1, "alice met bob and alice left"), (2, "charlie met nobody")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_terms(df, ["alice", "bob"]).collect()}
    pa = "X_" + hashlib.md5(b"alice").hexdigest()[:8]
    pb = "X_" + hashlib.md5(b"bob").hexdigest()[:8]
    assert out[1]["redacted_text"] == f"{pa} met {pb} and {pa} left"
    assert out[1]["n_redactions"] == 3
    assert out[2]["redacted_text"] == "charlie met nobody"
    assert out[2]["n_redactions"] == 0


def test_redact_terms_empty_denylist_is_identity(spark):
    from dbt_omnata_push_spark.llmops.text import redact_terms

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    r = redact_terms(df, []).collect()[0]
    assert r["redacted_text"] == "a b c" and r["n_redactions"] == 0


def test_top_terms_deterministic_tiebreak(spark):
    from dbt_omnata_push_spark.llmops.text import top_terms

    df = spark.createDataFrame(
        [(1, "b a"), (2, "a b"), (3, "c")], "doc_id long, text string"
    )
    assert top_terms(df, 2) == ["a", "b"]  # equal counts -> lexicographic


# ------------------------------------------------- CDC chunking


def test_cdc_chunks_reassemble_to_document(spark):
    """Chunks partition the document: concatenating them in
    chunk_start order reproduces the text exactly."""
    from pyspark.sql import functions as F

    from dbt_omnata_push_spark.llmops.dedup import cdc_chunk_spans

    rows = [(1, "the quick brown fox jumps over the lazy dog " * 5),
            (2, "short"), (3, "x" * 200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        cdc_chunk_spans(df)
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("chunk_start", "chunk")))
                .getField("chunk")
            ).alias("rebuilt")
        )
        .collect()
    )
    want = dict(rows)
    assert {r["doc_id"]: r["rebuilt"] for r in got} == want


def test_cdc_offset_invariance(spark):
    """The CDC property: a shared run chunks identically regardless of
    its byte offset in the container — interior chunks of the shared
    run are byte-equal across both documents."""
    from dbt_omnata_push_spark.llmops.dedup import cdc_chunk_spans

    # phrase pre-checked to contain interior cut positions (a given
    # phrase has no cuts with prob (1-1/64)^len — pick one that does)
    shared = 'kilo echo mike uniform bravo charlie 12345 romeo delta lima sierra bravo quebec golf bravo charlie november november charlie hotel charlie romeo november bravo 12345 sierra delta hotel uniform uniform sierra bravo sierra sierra mike bravo hotel bravo romeo 9876 echo juliet november echo romeo delta sierra juliet romeo 12345 victor foxtrot delta sierra sierra uniform golf lima delta romeo'
    rows = [(1, "AAAA " + shared + " tail one"),
            (2, "a completely different and longer prefix!! " + shared + " other tail")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = cdc_chunk_spans(df).collect()
    by_doc = {1: set(), 2: set()}
    for r in out:
        by_doc[r["doc_id"]].add(r["chunk"])
    common = by_doc[1] & by_doc[2]
    # interior chunks of `shared` must coincide despite different offsets
    assert sum(len(c) for c in common) > len(shared) // 2


def test_cdc_non_ascii_matches_duckdb(spark):
    """ADVICE r7 #5: ascii() returns the full Unicode codepoint for
    non-ASCII chars, which overflowed the high-power rolling-hash
    terms (Spark wrapped silently; DuckDB raised). With codes clamped
    mod 256, both engines produce the SAME boundaries on non-ASCII
    text, overflow-free."""
    import duckdb
    import pandas as pd

    from dbt_omnata_push_spark.llmops.dedup import cdc_chunk_spans

    rows = [
        ("d1", "héllo wörld — über naïve façade; 日本語のテキストです。" * 6),
        ("d2", "ASCII prefix then ελληνικά and кириллица mixed in " * 4),
        ("d3", "😀😀 emoji αβγδε ζηθικ λμνξο " * 8),
    ]
    sdf = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        (r["doc_id"], r["chunk_start"], r["chunk"])
        for r in cdc_chunk_spans(sdf).collect()
    }
    term = " + ".join(
        f"((CAST(ascii(substr(text, i - {k}, 1)) AS BIGINT) % 256) "
        f"* {131 ** k})"
        for k in range(8)
    )
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])  # noqa: F841
    want = {
        tuple(r)
        for r in duckdb.sql(
            f"""
            WITH d AS (SELECT doc_id, text, length(text) AS n FROM pdf),
            pos AS (
              SELECT doc_id, unnest(list_prepend(0,
                list_filter(range(8, n + 1), i -> ({term}) % 64 = 0))) AS p
              FROM d
            ),
            spans AS (
              SELECT doc_id, p AS s,
                     lead(p) OVER (PARTITION BY doc_id ORDER BY p) AS e
              FROM pos
            )
            SELECT spans.doc_id, s AS chunk_start,
                   substr(d.text, s + 1, COALESCE(e, d.n) - s) AS chunk
            FROM spans JOIN d ON d.doc_id = spans.doc_id
            WHERE COALESCE(e, d.n) > s
            """
        ).fetchall()
    }
    assert got == want and len(got) > 3


def test_cdc_short_doc_single_chunk(spark):
    from dbt_omnata_push_spark.llmops.dedup import cdc_chunk_spans

    df = spark.createDataFrame([(1, "tiny")], "doc_id long, text string")
    out = cdc_chunk_spans(df).collect()
    assert [(r["chunk_start"], r["chunk"]) for r in out] == [(0, "tiny")]


def test_cdc_duplicate_chunks_counts(spark):
    from dbt_omnata_push_spark.llmops.dedup import cdc_duplicate_chunks

    base = "one two three four five six seven eight nine ten " * 4
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, "nothing in common here at all")],
        "doc_id long, text string",
    )
    out = cdc_duplicate_chunks(df).collect()
    assert out and all(r["n_occur"] >= 2 and r["n_docs"] == 2 for r in out)


def test_chunk_containment_detects_embedded_doc(spark):
    """A document embedded verbatim inside a larger one scores >= 80%
    containment (a in b), while the reverse direction does not."""
    from dbt_omnata_push_spark.llmops.dedup import cdc_chunk_containment

    # varied (non-repeating) tokens so distinct chunks scale with
    # length; pure-Python CDC replay of this fixture: inner 22 distinct
    # chunks, 20 shared with outer -> 90% forward / 48% reverse
    inner = " ".join(
        f"tok{i:03d} item{(i * 7) % 13} val{i * i % 97}" for i in range(60)
    ) + " "
    outer = (
        " ".join(f"pre{i:03d} head{(i * 5) % 11}" for i in range(40)) + " "
        + inner
        + " ".join(f"post{i:03d} tail{(i * 3) % 17}" for i in range(40)) + " "
    )
    df = spark.createDataFrame(
        [(1, inner), (2, outer), (3, "unrelated text with nothing shared")],
        "doc_id long, text string",
    )
    out = {(r["a"], r["b"]): r["containment_pct"]
           for r in cdc_chunk_containment(df).collect()}
    assert any(k == (1, 2) for k in out), out
    assert out[(1, 2)] >= 80
    assert (2, 1) not in out  # outer is NOT contained in inner
    assert not any(3 in k for k in out)
