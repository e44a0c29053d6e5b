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


# ---------------------------------------------------------------------------
# Per-file Bloom filters: equality-predicate file skipping for columns
# where clustering (and therefore min/max) can't help — every file's
# [min, max] on a non-leading column overlaps every other's, so range
# stats prune nothing, but a point lookup `col = v` only needs files
# whose Bloom MIGHT contain v (Delta's bloomFilterIndex / Iceberg's
# bloom column metric). No false negatives -> pruning is lossless; the
# residual row filter still applies.
#
# The hash family is md5-prefix mod (the same portable construction as
# ops/invindex.py's term buckets and the CMS in ops/sketches.py): it
# computes bit-identically as a JVM expression at build time and in
# driver-side hashlib at probe time, so probing costs zero Spark jobs.
# ---------------------------------------------------------------------------

BLOOM_MANIFEST_NAME = "_FILE_BLOOMS.json"
_BLOOM_M_BITS = 1 << 16  # 8 KiB packed bitmap per (file, column)
_BLOOM_K = 4


def _bloom_pos_py(value: str, j: int, m_bits: int = _BLOOM_M_BITS) -> int:
    """Driver-side bit position — must match _bloom_pos_col exactly."""
    import hashlib

    h = hashlib.md5(f"{j}:{value}".encode("utf-8")).hexdigest()[:15]
    return int(h, 16) % m_bits


def _bloom_pos_col(col, j: int, m_bits: int = _BLOOM_M_BITS):
    """The identical position as a JVM expression (15 hex digits fit a
    long; conv is exact up to 2^60)."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(f"{j}:"), col.cast("string")).cast("binary")
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % m_bits
    ).cast("int")


def _render_probe(spark: SparkSession, value) -> str:
    """Render ``value`` exactly as the JVM rendered ``CAST(col AS
    STRING)`` at Bloom build time.

    ADVICE r6: probing with Python ``str(value)`` diverges from the
    JVM rendering for booleans ('True' vs 'true'), doubles ('1e+16'
    vs '1.0E16'), decimals and timestamps — a divergent rendering
    probes the wrong bits and silently SKIPS files that contain
    matching rows, violating the no-false-negative contract. Fast
    path: bool/int/str render identically in both runtimes. Anything
    else goes through Spark itself (a constant-folded 1-row literal
    cast — no table scan)."""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, str):
        return value
    if isinstance(value, int):
        return str(value)
    row = (
        spark.range(1).select(F.lit(value).cast("string").alias("v")).first()
    )
    if row is None or row["v"] is None:
        raise TypeError(
            f"unsupported Bloom probe type: {type(value).__name__}"
        )
    return row["v"]


def collect_file_blooms(
    spark: SparkSession,
    store: TableStore,
    name: str,
    cols: list[str],
    m_bits: int = _BLOOM_M_BITS,
    k: int = _BLOOM_K,
) -> dict:
    """Build per-file Bloom bitmaps for ``cols`` and write the manifest.

    One scan: every row expands to k bit positions per column (map-side
    JVM expressions), distinct (file, col, pos) triples aggregate to a
    position list per file — output size is bounded by
    #files x #cols x m_bits bits, independent of row count. NULLs set
    no bits (a NULL never equals a probe value).

    Manifest: {file: {col: base64(packed bitmap)}}.
    """
    import base64

    path = store.data_path(name)
    df = spark.read.parquet(path).withColumn("_f", F.input_file_name())
    per_col = []
    for c in cols:
        positions = F.array(
            *[_bloom_pos_col(F.col(c), j, m_bits) for j in range(k)]
        )
        per_col.append(
            df.filter(F.col(c).isNotNull()).select(
                "_f", F.lit(c).alias("_c"), F.explode(positions).alias("_p")
            )
        )
    union = per_col[0]
    for p in per_col[1:]:
        union = union.unionByName(p)
    rows = (
        union.distinct()
        .groupBy("_f", "_c")
        .agg(F.collect_list("_p").alias("_ps"))
        .collect()
    )
    manifest: dict = {}
    for r in rows:
        bitmap = bytearray(m_bits // 8)
        for pos in r["_ps"]:
            bitmap[pos >> 3] |= 1 << (pos & 7)
        manifest.setdefault(r["_f"], {})[r["_c"]] = base64.b64encode(
            bytes(bitmap)
        ).decode("ascii")
    tmp = os.path.join(path, BLOOM_MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"m_bits": m_bits, "k": k, "files": manifest}, f)
    os.replace(tmp, os.path.join(path, BLOOM_MANIFEST_NAME))
    return manifest


def read_skipping_eq(
    spark: SparkSession,
    store: TableStore,
    name: str,
    col: str,
    value,
) -> DataFrame:
    """Read rows with ``col = value``, scheduling ONLY files whose Bloom
    might contain the value (no false negatives -> lossless pruning;
    pinned by tests/test_filestats.py). Files absent from the manifest
    are conservatively kept. Probing is driver-side arithmetic over the
    manifest — no table scan (non-int/str probes cost one 1-row literal
    cast so the rendering matches the JVM's, see _render_probe)."""
    import base64

    path = store.data_path(name)
    with open(os.path.join(path, BLOOM_MANIFEST_NAME)) as f:
        doc = json.load(f)
    m_bits, k = doc["m_bits"], doc["k"]
    probe = _render_probe(spark, value)
    positions = [_bloom_pos_py(probe, j, m_bits) for j in range(k)]

    def norm(p: str) -> str:
        return p.split("://", 1)[-1]

    blooms = {norm(fp): colmap for fp, colmap in doc["files"].items()}
    listed = [
        os.path.join(root, e)
        for root, _dirs, files in os.walk(path)
        for e in files
        if e.endswith(".parquet")
    ]
    keep = []
    for fpath in listed:
        colmap = blooms.get(norm(os.path.abspath(fpath)))
        if colmap is None or col not in colmap:
            keep.append(fpath)  # unknown file: never skip blindly
            continue
        bitmap = base64.b64decode(colmap[col])
        if all(bitmap[p >> 3] & (1 << (p & 7)) for p in positions):
            keep.append(fpath)
    if not keep:
        return spark.read.parquet(path).filter(F.lit(False))
    return spark.read.parquet(*keep).filter(F.col(col) == value)
