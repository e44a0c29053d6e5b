"""Versioned parquet table store: Delta-style primitives without Delta.

The reference's tracking tables need CTAS, append, MERGE-upsert, forced
rebuild and schema widening (tracking_table_materialization.sql:17-35,
SURVEY.md §2.1 D2). This container has no Delta/Iceberg, so we provide a
minimal transactional-pointer format:

    <root>/<table>/v=<N>/part-*.parquet     immutable version directories
    <root>/<table>/_VERSION                 current version pointer

Reads resolve the pointer; rewrites (merge/overwrite) write v=N+1 and
atomically swap the pointer, so a reader never observes a half-written
merge. Appends add files to the current version directory (single-writer
engine; the reference likewise assumes one dbt run at a time — its
random temp-table suffixes, macros/random.sql:1-3, exist for the same
reason).

On a production lakehouse this module is replaced 1:1 by Delta/Iceberg
(`MERGE INTO`, `mergeSchema`); the materialization layer only talks to
this interface.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class TableStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- helpers ----------------------------------------------------------
    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name.replace(".", "__"))

    def _version_file(self, name: str) -> str:
        return os.path.join(self._dir(name), "_VERSION")

    def current_version(self, name: str) -> int | None:
        try:
            with open(self._version_file(name)) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def data_path(self, name: str) -> str:
        v = self.current_version(name)
        if v is None:
            raise FileNotFoundError(f"table not found: {name}")
        return os.path.join(self._dir(name), f"v={v}")

    def exists(self, name: str) -> bool:
        return self.current_version(name) is not None

    def _set_version(self, name: str, v: int) -> None:
        tmp = self._version_file(name) + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._version_file(name))  # atomic pointer swap

    def vacuum(self, name: str | None = None, keep: int = 1) -> None:
        """Delete superseded version directories.

        NEVER called implicitly: Spark DataFrames bind to concrete file
        listings at plan time, so a live DataFrame handed out by an
        earlier read may still scan an old version. Callers vacuum only
        when no plans from prior versions remain (end of a run), like
        Delta's VACUUM retention contract.
        """
        names = [name] if name else [
            n for n in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, n))
        ]
        for n in names:
            cur = self.current_version(n.replace("__", "."))
            if cur is None:
                continue
            d = os.path.join(self.root, n)
            for entry in os.listdir(d):
                if entry.startswith("v=") and int(entry[2:]) <= cur - keep:
                    shutil.rmtree(os.path.join(d, entry), ignore_errors=True)

    # -- operations -------------------------------------------------------
    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.option("mergeSchema", "true").parquet(self.data_path(name))

    def create(self, spark: SparkSession, name: str, df: DataFrame) -> None:
        """CTAS (create_table_as, tracking_table_materialization.sql:18)."""
        os.makedirs(self._dir(name), exist_ok=True)
        v = (self.current_version(name) or -1) + 1
        df.write.mode("overwrite").parquet(os.path.join(self._dir(name), f"v={v}"))
        self._set_version(name, v)

    def append(self, spark: SparkSession, name: str, df: DataFrame) -> None:
        """insert into ... select (salesforce_bulk_load.sql:35-47)."""
        if not self.exists(name):
            self.create(spark, name, df)
            return
        df.write.mode("append").parquet(self.data_path(name))

    def merge_upsert(
        self, spark: SparkSession, name: str, src: DataFrame, unique_key: str
    ) -> None:
        """Delta-MERGE equivalent: matched rows replaced, new rows inserted.

        incremental_upsert on unique_key (tracking_table_materialization
        .sql:34) with schema widening: unionByName(allowMissingColumns)
        reproduces expand_target_column_types (lines 31-33) for added
        columns.
        """
        if not self.exists(name):
            self.create(spark, name, src)
            return
        target = self.read(spark, name)
        keys = src.select(F.col(unique_key).alias("_mk")).distinct()
        kept = target.join(
            keys, target[unique_key] == keys["_mk"], "left_anti"
        )
        merged = kept.unionByName(src, allowMissingColumns=True)
        self._rewrite(spark, name, merged)

    def update_from(
        self,
        spark: SparkSession,
        name: str,
        src: DataFrame,
        unique_key: str,
        set_cols: list[str],
    ) -> None:
        """UPDATE ... FROM (salesforce_bulk_load.sql:52-55): overwrite only
        ``set_cols`` on matching keys, leave other rows untouched."""
        target = self.read(spark, name)
        patch = src.select(
            F.col(unique_key).alias("_uk"),
            *[F.col(c).alias(f"_new_{c}") for c in set_cols],
        )
        joined = target.join(patch, target[unique_key] == patch["_uk"], "left")
        out = joined.select(
            *[
                (
                    F.when(F.col("_uk").isNotNull(), F.col(f"_new_{c}"))
                    .otherwise(F.col(c))
                    .alias(c)
                    if c in set_cols
                    else F.col(c)
                )
                for c in target.columns
            ]
        )
        self._rewrite(spark, name, out)

    def overwrite(self, spark: SparkSession, name: str, df: DataFrame) -> None:
        """Forced rebuild (the reference's rename-to-backup/CTAS/drop dance,
        tracking_table_materialization.sql:19-27 — the version pointer swap
        makes the backup choreography unnecessary)."""
        self._rewrite(spark, name, df) if self.exists(name) else self.create(
            spark, name, df
        )

    def drop(self, name: str) -> None:
        shutil.rmtree(self._dir(name), ignore_errors=True)

    def _rewrite(self, spark: SparkSession, name: str, df: DataFrame) -> None:
        v = self.current_version(name)
        new_v = v + 1
        df.write.mode("overwrite").parquet(
            os.path.join(self._dir(name), f"v={new_v}")
        )
        self._set_version(name, new_v)
