"""Bucketed (pre-shuffled) table layout for shuffle-free joins.

At 100 TB the dominant recurring cost of a fact-fact or fact-dim join
is the shuffle: both sides exchange on the join key every time the join
runs. Bucketing pays that shuffle ONCE at write time — rows are
hash-split into a fixed number of buckets on the join key, each bucket
optionally sorted — so every later join on that key reads co-located
buckets and sort-merges them directly: zero Exchange (and with sorted
buckets, zero Sort) in the plan, forever. This is the storage-side
complement of ops/partitioning.py (partition pruning skips data;
bucketing skips shuffles).

Spark specifics worth knowing at scale:
- Bucketed layout is a CATALOG property (``bucketBy`` + ``saveAsTable``),
  not a bare-parquet property: the scan must know the bucketing to elide
  the exchange, so tables are saved as external tables (explicit path)
  in the session catalog.
- Bucket counts on the two sides must match, or divide evenly with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``.
- One file per bucket requires repartitioning on the bucket column
  before the write; otherwise every task writes a sliver of every
  bucket (the small-files explosion ops/compact.py exists to fix).

Reference parity: the reference pushes joins to Snowflake, whose
micro-partition clustering plays the same role
(tracking_table_materialization.sql:17-35 CTAS + MERGE on the key);
this module is the Spark-native equivalent of "keep the table
physically organized on its merge key".
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def _safe_ident(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_]", "_", name)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Save ``df`` as an external bucketed (and bucket-sorted) table.

    Repartitions on the bucket column first so each bucket is written
    by exactly one task -> exactly ``n_buckets`` data files.
    """
    writer = (
        df.repartition(n_buckets, bucket_col)
        .write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(_safe_ident(table))


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back through the catalog (REQUIRED — a bare
    ``spark.read.parquet(path)`` would lose the bucketing metadata and
    reintroduce the shuffle)."""
    return spark.table(_safe_ident(table))


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables on their bucket keys.

    With matching bucket counts the plan is scan->SortMergeJoin with no
    Exchange on either side (asserted by tests/test_bucketing.py).
    """
    lt = bucketed_table(spark, left_table)
    rt = bucketed_table(spark, right_table)
    return lt.join(rt, lt[left_key] == rt[right_key], how)
