"""Small-file compaction for store tables.

Append-heavy tracking tables accumulate one file per write at minimum;
at 100TB-scale ingest cadence that means millions of small files and
metadata-bound scans. ``compact`` rewrites a table into
ceil(bytes / target_file_bytes) files via a new store version — the
version-pointer swap makes it safe next to concurrent readers, exactly
like Delta OPTIMIZE."""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession

from ..engine.store import TableStore

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
) -> int:
    """Rewrite the table into size-targeted files; returns new file count."""
    total = table_bytes(store, name)
    target = max(1, math.ceil(total / target_file_bytes))
    df = store.read(spark, name).coalesce(target)
    store.overwrite(spark, name, df)
    return n_files(store, name)
