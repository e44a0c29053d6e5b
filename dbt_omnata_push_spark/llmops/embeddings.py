"""Embedding-column operators beyond similarity search: quantization
and per-label centroid aggregation.

Everything here is exact-arithmetic-by-construction so the DuckDB
oracle hash-matches: float32 inputs widen to double before any math,
and cross-row aggregation only ever sums integer-ized values (floor to
a fixed scale, BIGINT) — never raw doubles, whose summation order
differs between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Fixed-point scale for cross-row sums of embedding components.
_Q = 1_000_000


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-vector symmetric int8 quantization (the standard ANN-index /
    KV-cache compression step): q_i = round(x_i * 127 / max|x|), clipped
    to [-127, 127]; all-zero vectors quantize to zeros.

    Pure per-row array expressions — map-side, scan-rate at 100 TB. The
    returned columns are order-independent summaries of the quantized
    vector (sum/min/max of q, max reconstruction error), so results are
    engine-exact; the full int8 array is one F.transform away for a
    writer stage.
    """
    # amax must NOT be referenced as a free expression inside the
    # per-element lambdas: HOF lambda bodies re-evaluate free
    # expressions per element, so an inline array_max turns the row
    # cost O(dims^2) (the word_ngrams pitfall — see dedup.word_ngrams).
    # Bind (x, amax) ONCE per row as lambda-variable struct fields, and
    # expand the result through an explode of a 1-element array so
    # CollapseProject cannot re-inline the summary struct into six
    # copies of itself.
    x0 = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    bound = F.array(
        F.struct(x0.alias("x"), F.array_max(F.transform(x0, F.abs)).alias("m"))
    )

    def summarize(s):
        x, amax = s["x"], s["m"]
        # round-half-up via floor(v + 0.5): identical in Spark and
        # DuckDB (both floor toward -inf; negatives round toward +inf
        # on ties, consistently on both sides).
        q = F.transform(
            x,
            lambda v: F.greatest(
                F.lit(-127),
                F.least(F.lit(127), F.floor(v * 127.0 / amax + 0.5).cast("int")),
            ),
        )
        q = F.when(amax > 0.0, q).otherwise(F.transform(x, lambda v: F.lit(0)))
        dq_err = F.when(
            amax > 0.0,
            F.array_max(
                F.zip_with(
                    x, q, lambda v, b: F.abs(v - b.cast("double") * amax / 127.0)
                )
            ),
        ).otherwise(F.lit(0.0))
        return F.struct(
            F.size(x).alias("n_dims"),
            amax.alias("max_abs"),
            F.aggregate(q, F.lit(0).cast("long"), lambda acc, b: acc + b).alias(
                "sum_q"
            ),
            F.array_min(q).alias("min_q"),
            F.array_max(q).alias("max_q"),
            dq_err.alias("max_abs_err"),
        )

    return df.select(
        F.col(id_col), F.explode(F.transform(bound, summarize)).alias("_s")
    ).select(
        id_col,
        "_s.n_dims",
        "_s.max_abs",
        "_s.sum_q",
        "_s.min_q",
        "_s.max_q",
        "_s.max_abs_err",
    )


def label_centroids(
    df: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Element-wise per-label centroid, as (label, pos) rows.

    posexplode -> groupBy (label, pos) is the scalable shape: the
    shuffle key space is #labels x dim (uniform, no skew), map-side
    partial aggregation compresses each partition to at most that many
    rows, and no executor ever materializes a per-label vector list.
    Components are summed as floor(x * 1e6) BIGINTs (exact, order-
    independent); mean_q = sum_q / n_vecs as one final double division.
    """
    e = df.select(
        F.col(label_col), F.posexplode(F.col(vec_col)).alias("pos", "x")
    ).select(
        label_col,
        "pos",
        F.floor(F.col("x").cast("double") * _Q).cast("long").alias("xq"),
    )
    return e.groupBy(label_col, "pos").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("xq").alias("sum_q"),
        (F.sum("xq").cast("double") / F.count(F.lit(1))).alias("mean_q"),
    )


def label_outliers(
    df: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k outliers per label: vectors farthest from their label
    centroid — the embedding-space mislabel/poison detector.

    Exact-arithmetic trick: comparing ||x - mean||^2 across vectors of
    one label is equivalent to comparing sum_pos (xq*n - sum_q)^2 (both
    scale by n^2), so the whole score stays in integer/decimal space —
    no float accumulation, engine-exact ordering. Each factor is cast to
    DECIMAL(18,0) BEFORE the multiply, so no intermediate ever runs in
    BIGINT where ANSI mode would raise on overflow; the deviation is
    then narrowed to DECIMAL(19,0) and its square accumulates in
    DECIMAL(38,0). Overflow-safe while |xq*n - sum_q| < 1e19, i.e.
    n_vecs up to ~1e12 for unit-range embeddings at the 1e6 fixed-point
    scale; beyond that both engines raise loudly rather than wrapping
    (the oracle carries the identical per-factor casts).

    Plan shape: explode -> (label, pos) centroid agg -> co-keyed join
    back -> (id, label) agg -> per-label top-k (labels are a bounded
    catalog, so the final window is over bounded groups).
    """
    from pyspark.sql import Window

    e = df.select(
        F.col(id_col), F.col(label_col), F.posexplode(F.col(vec_col)).alias("pos", "x")
    ).select(
        id_col,
        label_col,
        "pos",
        F.floor(F.col("x").cast("double") * _Q).cast("long").alias("xq"),
    )
    cent = e.groupBy(label_col, "pos").agg(
        F.count(F.lit(1)).alias("n_vecs"), F.sum("xq").alias("sum_q")
    )
    dev = (
        F.col("xq").cast("decimal(18,0)") * F.col("n_vecs").cast("decimal(18,0)")
        - F.col("sum_q").cast("decimal(18,0)")
    ).cast("decimal(19,0)")
    dist = (
        e.join(cent, [label_col, "pos"])
        .select(id_col, label_col, (dev * dev).alias("contrib"))
        .groupBy(id_col, label_col)
        .agg(F.sum("contrib").alias("dist2"))
    )
    w = Window.partitionBy(label_col).orderBy(F.col("dist2").desc(), F.col(id_col))
    return (
        dist.withColumn("outlier_rank", F.row_number().over(w))
        .filter(F.col("outlier_rank") <= k)
        .select(
            label_col,
            F.col(id_col),
            F.col("dist2").cast("double").alias("dist2_scaled"),
            "outlier_rank",
        )
    )
