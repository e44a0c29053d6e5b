"""Maximal Marginal Relevance (MMR) diversified selection.

Carbonell & Goldstein 1998: greedily pick the candidate maximizing
``lam * rel(q, c) - (1 - lam) * max_{s in S} sim(c, s)`` — relevance
traded against redundancy with what's already selected. In a
training-data pipeline this is the diversity-aware variant of top-k
retrieval: the selected exemplars cover the neighborhood of the query
instead of k near-copies of the single best match (the same failure
mode SemDeDup removes corpus-side, attacked selection-side).

Reference analogue: none — the push package retrieves nothing; this
extends the similarity surface (llmops/similarity.py) the way
pq_refined extends ANN: a bounded re-rank stage on top of retrieval.

Scale shape: the greedy loop is inherently sequential in k but
embarrassingly parallel ACROSS queries, and it only ever touches the
bounded per-query candidate pool (p rows + p^2 pairwise sims), never
the corpus. Stages:

1. pool: any retrieval (ANN at scale; exact top-p here for the oracle)
   keyed by query — O(retrieval);
2. pairwise sims: a self-join WITHIN each query's pool — O(Q * p^2)
   rows, shuffled by query id only;
3. greedy: ``cogroup(pool, sims).applyInPandas`` — one Arrow batch per
   query holds p rels + p^2 sims (p=100 -> ~10k floats), k iterations
   of argmax over <= p scalars in plain Python.

Float discipline (so the unrolled-SQL oracle hash-matches exactly):
every rel and sim is ROUND(cosine, 6) — both engines then hold the
SAME double, 0.5 * x is exact halving, and IEEE subtraction of equal
inputs yields equal outputs, so the argmax (with id tiebreak) is
bit-deterministic cross-engine. The greedy consumes only these
pre-rounded scalars; no fresh float math enters in Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import similarity as S


def pairwise_pool_sims(
    pool: DataFrame,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All ordered pairs (a, b), a != b, within each query's pool:
    (query, a_id, b_id, sim) with sim = round(cosine, 6)."""
    a = pool.select(
        F.col(query_col).alias("_qa"),
        F.col(id_col).alias("a_id"),
        F.col(vec_col).alias("_va"),
    )
    b = pool.select(
        F.col(query_col).alias("_qb"),
        F.col(id_col).alias("b_id"),
        F.col(vec_col).alias("_vb"),
    )
    return (
        a.join(b, F.col("_qa") == F.col("_qb"))
        .filter(F.col("a_id") != F.col("b_id"))
        .select(
            F.col("_qa").alias(query_col),
            "a_id",
            "b_id",
            F.round(S.cosine(F.col("_va"), F.col("_vb")), 6).alias("sim"),
        )
    )


def mmr_select(
    pool: DataFrame,
    k: int,
    lam: float = 0.5,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rel_col: str = "rel",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy MMR over per-query candidate pools.

    ``pool``: (query, id, rel, vec) — rel already rounded to 6dp.
    Returns (query, id, mmr_rank 1..k, rel); ties broken by smaller id
    at every step, so the selection is total-order deterministic.
    """
    import pandas as pd

    sims = pairwise_pool_sims(pool, query_col, id_col, vec_col)
    rels = pool.select(query_col, id_col, rel_col)

    def greedy(rel_pdf: pd.DataFrame, sim_pdf: pd.DataFrame) -> pd.DataFrame:
        if rel_pdf.empty:
            return pd.DataFrame(
                columns=[query_col, id_col, "mmr_rank", rel_col]
            )
        qid = rel_pdf[query_col].iloc[0]
        rel = dict(zip(rel_pdf[id_col], rel_pdf[rel_col]))
        sim: dict = {}
        for a_id, b_id, s in zip(
            sim_pdf["a_id"], sim_pdf["b_id"], sim_pdf["sim"]
        ):
            sim[(a_id, b_id)] = s
        selected: list = []
        remaining = set(rel)
        out = []
        while remaining and len(selected) < k:
            if not selected:
                # step 1: pure relevance
                best = max(remaining, key=lambda c: (rel[c], -c))
            else:
                def score(c):
                    red = max(sim[(c, s)] for s in selected)
                    return lam * rel[c] - (1.0 - lam) * red

                best = max(remaining, key=lambda c: (score(c), -c))
            selected.append(best)
            remaining.discard(best)
            out.append((qid, best, len(selected), rel[best]))
        return pd.DataFrame(out, columns=[query_col, id_col, "mmr_rank", rel_col])

    schema = (
        f"{query_col} long, {id_col} long, mmr_rank long, {rel_col} double"
    )
    return (
        rels.groupBy(query_col)
        .cogroup(sims.groupBy(query_col))
        .applyInPandas(lambda r, s: greedy(r, s), schema=schema)
    )
