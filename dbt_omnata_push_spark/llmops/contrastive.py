"""Contrastive training-pair construction over an embedding table.

Embedding-model training (SimCSE/CLIP-style InfoNCE) consumes
(anchor, positive, negatives) tuples.  At corpus scale the two halves
have different safe shapes:

- HARD POSITIVES are a per-anchor top-k cosine within a blocking key
  (here the label column; at 100 TB a trained k-means cell — the same
  posture as knn_join_blocked): O(sum block^2), never O(n^2).
- SHARED RANDOM NEGATIVES come from a bounded seeded pool: rank the
  corpus by a seeded md5 of the id, keep the top ``pool_size``, and
  BROADCAST it — each anchor crossjoins only the pool (the standard
  shared/batch-negatives trick), so negative mining is O(n * pool),
  linear in the corpus with a constant pool factor, instead of the
  O(n^2) a per-anchor uniform draw over the whole corpus would cost.

Everything is engine-portable arithmetic: seeded md5 ranking and
6dp-rounded cosines with id tiebreaks, so the output is bit-exact
reproducible (and exactly SQL-oracle-able).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import cosine


def contrastive_pairs(
    emb: DataFrame,
    k_pos: int = 2,
    k_neg: int = 3,
    pool_size: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    seed: str = "cneg",
) -> DataFrame:
    """(anchor, cand, role, sim, rank): per anchor, ``k_pos`` hardest
    same-label positives by cosine and ``k_neg`` seeded pseudo-random
    different-label negatives drawn from a shared ``pool_size`` pool.

    Positive rank orders by rounded cosine desc (id tiebreak); negative
    rank orders by md5(seed:anchor:cand) — a deterministic uniform draw
    without replacement from the pool.  ``sim`` is carried for both
    roles (negatives' sim feeds hard-negative curricula downstream).
    """
    a = emb.select(
        F.col(id_col).alias("anchor"),
        F.col(label_col).alias("_al"),
        F.col(vec_col).alias("_av"),
    )
    b = emb.select(
        F.col(id_col).alias("cand"),
        F.col(label_col).alias("_bl"),
        F.col(vec_col).alias("_bv"),
    )
    sim = F.round(cosine(F.col("_av"), F.col("_bv")), 6)
    pos = (
        a.join(b, (F.col("_al") == F.col("_bl")) & (F.col("anchor") != F.col("cand")))
        .select("anchor", "cand", sim.alias("sim"))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("anchor").orderBy(
                    F.col("sim").desc(), F.col("cand")
                )
            ),
        )
        .filter(F.col("rank") <= k_pos)
        .withColumn("role", F.lit("pos"))
    )
    pool = (
        emb.select(
            F.col(id_col).alias("cand"),
            F.col(label_col).alias("_bl"),
            F.col(vec_col).alias("_bv"),
            F.md5(
                F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))
            ).alias("_pk"),
        )
        .orderBy("_pk", "cand")
        .limit(pool_size)  # TakeOrdered: per-partition top-k, no sort shuffle
        .drop("_pk")
    )
    draw = F.md5(
        F.concat(
            F.lit(seed + ":"),
            F.col("anchor").cast("string"),
            F.lit(":"),
            F.col("cand").cast("string"),
        )
    )
    neg = (
        a.crossJoin(F.broadcast(pool))
        .filter(F.col("_al") != F.col("_bl"))
        .select("anchor", "cand", sim.alias("sim"), draw.alias("_d"))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("anchor").orderBy("_d", "cand")
            ),
        )
        .filter(F.col("rank") <= k_neg)
        .drop("_d")
        .withColumn("role", F.lit("neg"))
    )
    cols = ["anchor", "cand", "role", "sim", "rank"]
    return pos.select(*cols).unionByName(neg.select(*cols)).withColumn(
        "rank", F.col("rank").cast("long")
    )
