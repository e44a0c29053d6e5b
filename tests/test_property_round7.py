"""Property-based tests (hypothesis): round-7 operators against
independent pure-Python references on randomized inputs.

BM25 and the hashed tf embedding claim CROSS-ENGINE float exactness
(IEEE op-sequence fidelity) — so the references here compare with
EXACT equality, not tolerances: Python floats are the same IEEE
doubles, and the references repeat the documented op order.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_WORDS = ["alpha", "beta", "gamma", "delta", "vector", "scan"]
_DOC = st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12)


def _ref_bm25(docs, terms, k1=1.2, b=0.75):
    """Pure-Python BM25 mirroring llmops/retrieval.py op-for-op."""
    per = []
    for doc_id, words in docs:
        tfs = [sum(1 for w in words if w == t) for t in terms]
        per.append((doc_id, len(words), tfs))
    n = len(per)
    avgdl = float(sum(p[1] for p in per)) / n
    dfs = [
        float(sum(1 for p in per if p[2][i] > 0)) for i in range(len(terms))
    ]
    out = {}
    for doc_id, dl, tfs in per:
        score = 0.0
        first = True
        for i in range(len(terms)):
            tf = float(tfs[i])
            if tf > 0:
                idf = (n - dfs[i] + 0.5) / (dfs[i] + 0.5)
                denom = tf + k1 * ((1.0 - b) + b * dl / avgdl)
                c = idf * (tf * (k1 + 1.0)) / denom
            else:
                c = 0.0
            score = c if first else score + c
            first = False
        if score > 0:
            out[doc_id] = score
    return out


@given(st.lists(_DOC, min_size=2, max_size=10))
@settings(**_SETTINGS)
def test_bm25_matches_python_reference_exactly(spark, docs_words):
    from dbt_omnata_push_spark.llmops.retrieval import bm25_topk

    docs = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    terms = ["vector", "scan"]
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(df, terms, k=100).collect()
    }
    want = _ref_bm25([(i, ws) for i, ws in enumerate(docs_words)], terms)
    assert got == want  # EXACT float equality — the determinism claim


@given(st.lists(_DOC, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_hashed_tf_matches_python_md5_reference(spark, docs_words):
    from dbt_omnata_push_spark.llmops.retrieval import hashed_tf_embedding

    dim = 16
    docs = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: list(r["vec"])
        for r in hashed_tf_embedding(df, dim=dim).collect()
    }
    for i, ws in enumerate(docs_words):
        vec = [0] * dim
        for w in ws:
            h = int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % dim
            vec[h] += 1
        assert got[i] == vec, (i, ws)


@given(
    st.lists(st.integers(1, 30), min_size=0, max_size=6, unique=True),
    st.lists(st.integers(1, 30), min_size=0, max_size=6, unique=True),
)
@settings(**_SETTINGS)
def test_rrf_matches_python_reference(spark, ids_a, ids_b):
    from dbt_omnata_push_spark.llmops.retrieval import rrf_fuse

    a = [(d, r + 1) for r, d in enumerate(ids_a)]
    b = [(d, r + 1) for r, d in enumerate(ids_b)]
    schema = "doc_id long, rank int"
    got = {
        r["doc_id"]: r["rrf_score"]
        for r in rrf_fuse(
            spark.createDataFrame(a, schema) if a else spark.createDataFrame([], schema),
            spark.createDataFrame(b, schema) if b else spark.createDataFrame([], schema),
            k=100,
        ).collect()
    }
    want = {}
    ra, rb = dict(a), dict(b)
    for d in set(ra) | set(rb):
        want[d] = (1.0 / (60 + ra[d]) if d in ra else 0.0) + (
            1.0 / (60 + rb[d]) if d in rb else 0.0
        )
    assert got == want


def test_lsh_multiprobe_candidates_superset(spark, sf_dir):
    """probes>1 only ADDS probed buckets, so the candidate set must be
    a superset of the single-probe set (determinism of the signature
    machinery under the fixed seed)."""
    from dbt_omnata_push_spark.engine.catalog import load_table
    from dbt_omnata_push_spark.llmops.similarity import lsh_candidates
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    c1 = {(r["q_id"], r["vec_id"]) for r in lsh_candidates(emb, queries, n_probes=1).collect()}
    c3 = {(r["q_id"], r["vec_id"]) for r in lsh_candidates(emb, queries, n_probes=3).collect()}
    assert c1 <= c3


def test_knn_join_matches_python_reference(spark):
    import math

    from dbt_omnata_push_spark.llmops.similarity import knn_join_blocked

    rows = [
        (i, i % 2, [float((i * 7 + j * 3) % 11 - 5) for j in range(4)])
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    got = {
        (r["src"], r["rank"]): r["dst"]
        for r in knn_join_blocked(df, k=2, block_col="label").collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    for i, lab, va in rows:
        peers = sorted(
            ((-cos(va, vb), j) for j, lb, vb in rows if lb == lab and j != i),
        )[:2]
        for rank, (_, j) in enumerate(peers, start=1):
            assert got[(i, rank)] == j, (i, rank)
