"""File-level min/max statistics manifest + data-skipping reads.

The Delta/Iceberg data-skipping half that parquet footers alone don't
provide at PLANNING time: Spark's row-group skipping happens inside a
task AFTER the file is already listed, opened, and scheduled — at 100 TB
the win is never scheduling the task at all. This module collects
per-file min/max for chosen columns into a manifest (one tiny JSON per
store version, like Delta's Add-file stats or an Iceberg manifest), and
a skipping read consults the manifest driver-side to hand Spark an
explicit pruned file list.

Composes with ops/zorder.py / ops/compact.py: clustering is exactly
what makes per-file min/max TIGHT, so `compact(zorder_by=...)` followed
by `read_skipping(...)` is the full OPTIMIZE -> skippable-scan loop.
The stats collection is one scan with a map-side-combined groupBy on
input_file_name (#files rows out); manifests for an immutable store
version never need refreshing.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.store import TableStore

MANIFEST_NAME = "_FILE_STATS.json"


def collect_file_stats(
    spark: SparkSession, store: TableStore, name: str, cols: list[str]
) -> dict:
    """Write the per-file min/max manifest for the CURRENT version.

    Returns the manifest dict: {file_path: {col: [min, max], ...}}.
    Only numeric/string orderable columns make sense; values are stored
    JSON-native (ints/floats/strings).
    """
    path = store.data_path(name)
    df = spark.read.parquet(path).withColumn("_f", F.input_file_name())
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"_min_{c}"))
        aggs.append(F.max(c).alias(f"_max_{c}"))
    rows = df.groupBy("_f").agg(*aggs).collect()
    manifest = {
        r["_f"]: {c: [r[f"_min_{c}"], r[f"_max_{c}"]] for c in cols}
        for r in rows
    }
    tmp = os.path.join(path, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, MANIFEST_NAME))
    return manifest


def read_skipping(
    spark: SparkSession,
    store: TableStore,
    name: str,
    col: str,
    lo,
    hi,
) -> DataFrame:
    """Read rows with ``lo <= col <= hi``, scheduling ONLY files whose
    manifest range intersects [lo, hi].

    Exactness: the manifest prunes files that cannot contain matches
    (their [min, max] is disjoint from [lo, hi]); the residual filter
    still applies row-level, so results equal an unpruned filtered scan
    (pinned by tests/test_filestats.py). Files missing from the
    manifest (e.g. written after collect_file_stats on a mutable dir)
    are conservatively KEPT. A NULL bound in the manifest (all-null
    file) means the file holds no matching non-null values and is
    skipped.
    """
    path = store.data_path(name)
    mpath = os.path.join(path, MANIFEST_NAME)
    with open(mpath) as f:
        manifest = json.load(f)
    listed = [
        os.path.join(root, e)
        for root, _dirs, files in os.walk(path)
        for e in files
        if e.endswith(".parquet")
    ]

    def norm(p: str) -> str:
        return p.split("://", 1)[-1]

    stats_by_file = {norm(k): v for k, v in manifest.items()}
    keep = []
    for fpath in listed:
        st = stats_by_file.get(norm(os.path.abspath(fpath)))
        if st is None or col not in st:
            keep.append(fpath)  # unknown file: never skip blindly
            continue
        mn, mx = st[col]
        if mn is None or mx is None:
            continue  # all-null file: no value in [lo, hi]
        if mx < lo or mn > hi:
            continue  # disjoint range: provably no matches
        keep.append(fpath)
    if not keep:
        return (
            spark.read.parquet(path)
            .filter(F.lit(False))
            .filter(F.col(col).between(lo, hi))
        )
    return spark.read.parquet(*keep).filter(F.col(col).between(lo, hi))
