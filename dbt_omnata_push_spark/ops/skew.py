"""Skew mitigation: salted two-stage aggregation.

AQE's skew-join handling covers joins; heavily skewed AGGREGATION keys
(a handful of event types over billions of rows) still funnel each hot
key through one reducer in the final stage. Classic fix: salt the key,
pre-aggregate per (key, salt), then re-aggregate per key — the hot key's
work spreads over `n_salts` reducers and the final stage sees only
n_keys * n_salts rows.

Exactly equivalent to the direct aggregation for decomposable aggregates
(count/sum/min/max) — verified by the `events_type_counts_salted` oracle
entry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGEABLE = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    aggs: output column -> (merge_fn_name, partial-stage expression),
    e.g. {"n": ("count", F.count(F.lit(1))), "total": ("sum", F.sum("x"))}.
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(f"_p_{out}") for out, (_, expr) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGEABLE[merge](F.col(f"_p_{out}")).alias(out)
            for out, (merge, _) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    For a hot key holding a large fraction of ``big``, a plain shuffle
    join sends the whole key to one task. Salting splits it over
    ``n_salts`` tasks: big rows get a random salt, small rows are
    exploded once per salt value, and the join key becomes (key, salt).
    Row multiplicity is unchanged (each big row matches exactly its own
    salt's copy). Cost: small side inflates n_salts-fold — use for
    big x small joins where AQE's skew split can't help (e.g. the small
    side is too large to broadcast but the big side is hot-keyed).
    Supports inner and left joins (the left/big side is preserved).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    salted_big = big.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(salted_small, [on, "_salt"], how).drop("_salt")
