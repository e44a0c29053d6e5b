"""Z-order (Morton) multi-column clustering for data-skipping writes.

The Delta/Iceberg OPTIMIZE ZORDER BY analogue: interleave the bits of k
bucketed key columns into one Morton code, range-partition + sort the
write on it, and every file's min/max footer stats become tight on ALL
k dimensions at once — so filters on ANY keyed column skip most files,
not just filters on the first sort key (the lexicographic-sort
weakness).

The bit interleave is generated twice from one spec: a PySpark Column
(shiftleft/bitwiseOR chains — whole-stage-codegen'd JVM expressions)
and the equivalent ANSI-SQL string for the DuckDB oracle, so the code
is exactly checkable cross-engine.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def bucket16(c: Column, modulus: int = 1 << DEFAULT_BITS) -> Column:
    """Non-negative bucket id from any integer column (double-mod keeps
    negative inputs in [0, modulus) identically in Spark and DuckDB,
    whose ``%`` both follow the dividend's sign)."""
    return ((c % modulus) + modulus) % modulus


def bucket16_sql(expr: str, modulus: int = 1 << DEFAULT_BITS) -> str:
    return f"((({expr}) % {modulus}) + {modulus}) % {modulus}"


def zvalue(cols: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton code of k non-negative ints (< 2^bits each): bit i of
    column j lands at position i*k + j. Pure shift/and/or expression —
    one codegen'd projection, no UDF, no shuffle."""
    k = len(cols)
    if k < 2:
        raise ValueError("zvalue needs >= 2 columns")
    if k * bits > 64:
        # JVM long shifts use only the low 6 bits of the shift amount,
        # so positions >= 64 would silently wrap and corrupt the code.
        raise ValueError(f"k*bits = {k * bits} exceeds the 64-bit Morton code")
    terms = [
        F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j)
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms).cast("long")


def zvalue_sql(exprs: list[str], bits: int = DEFAULT_BITS) -> str:
    """The identical Morton code as an unrolled ANSI-SQL expression."""
    k = len(exprs)
    if k < 2:
        raise ValueError("zvalue needs >= 2 columns")
    if k * bits > 64:
        raise ValueError(f"k*bits = {k * bits} exceeds the 64-bit Morton code")
    terms = [
        f"((({e}) >> {i}) & 1) << {i * k + j}"
        for j, e in enumerate(exprs)
        for i in range(bits)
    ]
    return "CAST((" + " | ".join(f"({t})" for t in terms) + ") AS BIGINT)"


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    num_files: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the Morton code of ``cols``
    (each already a non-negative int < 2^bits — use bucket16 upstream).

    repartitionByRange on the z-value makes each output file own a
    contiguous Morton range; sortWithinPartitions tightens row-group
    stats inside the file. At 100 TB this is the layout pass that makes
    selective multi-dimension scans skip at FILE granularity before any
    task launches — the same mechanism as the hive-partition pruning in
    ops/partitioning.py, without the small-partition explosion when
    keys are high-cardinality.
    """
    z = zvalue([F.col(c) for c in cols], bits=bits)
    clustered = df.withColumn("_z", z)
    if num_files:
        clustered = clustered.repartitionByRange(num_files, "_z")
    else:
        clustered = clustered.repartitionByRange("_z")
    clustered.sortWithinPartitions("_z").drop("_z").write.mode(
        "overwrite"
    ).parquet(path)
