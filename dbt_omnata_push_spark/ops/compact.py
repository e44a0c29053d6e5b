"""Small-file compaction for store tables.

Append-heavy tracking tables accumulate one file per write at minimum;
at 100TB-scale ingest cadence that means millions of small files and
metadata-bound scans. ``compact`` rewrites a table into
ceil(bytes / target_file_bytes) files via a new store version — the
version-pointer swap makes it safe next to concurrent readers, exactly
like Delta OPTIMIZE. With ``zorder_by``, the rewrite also clusters
rows on a Morton code of the given columns (OPTIMIZE ... ZORDER BY):
same file count, but every file's min/max stats go tight on ALL the
named dimensions, so selective scans skip files on any of them."""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..engine.store import TableStore
from .zorder import bucket16, zvalue

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def table_bytes(store: TableStore, name: str) -> int:
    path = store.data_path(name)
    return sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )


def n_files(store: TableStore, name: str) -> int:
    path = store.data_path(name)
    return sum(1 for f in os.listdir(path) if f.endswith(".parquet"))


def compact(
    spark: SparkSession,
    store: TableStore,
    name: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    zorder_by: list[str] | None = None,
    zorder_bits: int = 16,
) -> int:
    """Rewrite the table into size-targeted files; returns new file count.

    Plain mode coalesces (no shuffle). ``zorder_by`` mode pays one
    range shuffle on the Morton code to buy multi-dimension file
    skipping on every future scan — the right trade for a table read
    many times per rewrite.
    """
    total = table_bytes(store, name)
    target = max(1, math.ceil(total / target_file_bytes))
    df = store.read(spark, name)
    if zorder_by:
        # Validate up front: cast('long') on a non-numeric column would
        # silently null out in non-ANSI mode and collapse the whole
        # clustering key to one bucket.
        integral = {"byte", "short", "int", "integer", "bigint", "long"}
        types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        for c in zorder_by:
            if c not in types:
                raise ValueError(f"zorder_by column not in table: {c}")
            if types[c] not in integral:
                raise ValueError(
                    f"zorder_by column {c} has non-integral type "
                    f"{types[c]}; bucket an integral surrogate first"
                )
        if len(zorder_by) == 1:
            # Single column: Morton interleave is the identity; a plain
            # range-partitioned sort on the bucketed column gives the
            # same tight min/max stats (Delta OPTIMIZE ZORDER BY one
            # column is likewise just a clustered sort).
            z = bucket16(F.col(zorder_by[0]).cast("long"))
        else:
            z = zvalue(
                [bucket16(F.col(c).cast("long")) for c in zorder_by],
                bits=zorder_bits,
            )
        df = (
            df.withColumn("_z", z)
            .repartitionByRange(target, "_z")
            .sortWithinPartitions("_z")
            .drop("_z")
        )
    else:
        df = df.coalesce(target)
    store.overwrite(spark, name, df)
    return n_files(store, name)
