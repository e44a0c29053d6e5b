"""As-of (point-in-time) join: for each left row, the latest right row
with right.ts <= left.ts, per key.

Spark has no built-in ASOF JOIN (DuckDB/Pandas do). The naive
formulations both fail at scale: an inequality theta-join degenerates to
broadcast-nested-loop, and a per-left-row subquery is O(n*m). The
scalable shape is a *union-merge*: tag both sides, union them, and run
one window over (key) ordered by (ts, side) — a single hash shuffle on
the key, no cross product, no single-partition stage. This is the same
sorted-merge strategy native engines use for ASOF, expressed with
DataFrame ops so Catalyst/AQE still handle partitioning and skew.

Null-safety: the right-side payload is carried as ONE struct column, so
``last(payload, ignorenulls=True)`` distinguishes "no match yet" from a
legitimately NULL right-side value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_is_right"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    value_cols: list[str],
    right_ts_alias: str = "matched_ts",
    strict: bool = False,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: latest right row with right.ts <= left.ts per key.

    ``strict=True`` switches the bound to right.ts < left.ts (exclusive).
    ``direction="forward"`` (r14, VERDICT r13 #1) flips the lookup to
    the EARLIEST right row with right.ts >= left.ts (or > when strict)
    — "next quote after the trade". The plan is symmetric: the same
    union-merge, with the keyed window ordered descending, so the last
    right payload seen walking down from the top is the minimal
    right.ts at-or-after the left row. Still one hash shuffle on the
    key, no cross product, no single-partition stage.
    Right-side ``value_cols`` appear on the output, plus the matched
    right timestamp as ``right_ts_alias``; unmatched left rows keep all
    of those NULL (left-outer semantics, same as DuckDB ASOF LEFT JOIN).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward', got {direction!r}"
        )
    clashes = set([right_ts_alias, *value_cols]) & set(left.columns)
    if clashes:
        raise ValueError(
            f"right-side output columns {sorted(clashes)} collide with left "
            "columns; rename them on the right DataFrame before the join"
        )
    payload = F.struct(
        F.col(ts_col).alias(right_ts_alias), *[F.col(c) for c in value_cols]
    )
    r = right.select(
        *[F.col(c) for c in on],
        F.col(ts_col),
        F.lit(1).alias(_SIDE),
        payload.alias(_PAYLOAD),
    )
    l = left.select(
        "*", F.lit(0).alias(_SIDE), F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD)
    )
    merged = l.unionByName(r, allowMissingColumns=True)

    # At equal ts the right row must sort before the left row for
    # inclusive semantics, after it for strict — in BOTH directions
    # (the walk order flips, the tie rule doesn't).
    side_order = F.col(_SIDE).desc() if not strict else F.col(_SIDE).asc()
    ts_order = (
        F.col(ts_col).asc()
        if direction == "backward"
        else F.col(ts_col).desc()
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = merged.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    )
    out = matched.filter(F.col(_SIDE) == 0).drop(_SIDE)
    for name in [right_ts_alias, *value_cols]:
        out = out.withColumn(name, F.col(f"{_PAYLOAD}.{name}"))
    return out.drop(_PAYLOAD)
