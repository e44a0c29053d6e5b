"""Spark 4 Python DataSource: the modern custom-connector surface.

The reference's ingestion boundary is Snowflake external functions
(remote services surfaced as table functions); Spark's native analogue
is the DataSource API — a registered source the planner treats like
any other: schema known at plan time, work split into partitions, each
partition read executor-side. ``SyntheticDocsDataSource`` is the
deterministic reference implementation (md5-derived documents, so a
SQL oracle can reproduce every byte); a real connector swaps the
row-generation body for API calls and keeps the partitioning contract.

Usage:
    spark.dataSource.register(SyntheticDocsDataSource)
    df = spark.read.format("synthdocs").option("n_docs", 1000).load()
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

DEFAULT_N_DOCS = 1000
DEFAULT_N_PARTITIONS = 8


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", DEFAULT_N_DOCS))
        self.n_partitions = int(options.get("n_partitions", DEFAULT_N_PARTITIONS))

    def partitions(self):
        # Even row ranges: the planner schedules one task per slice, so
        # a 10^9-doc source parallelizes like a parquet scan.
        per = max(1, -(-self.n_docs // self.n_partitions))
        return [
            _Slice(lo, min(lo + per, self.n_docs))
            for lo in range(0, self.n_docs, per)
        ]

    def read(self, partition: _Slice):
        for i in range(partition.start, partition.end):
            yield (i, hashlib.md5(f"doc:{i}".encode()).hexdigest())


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return "doc_id bigint, text string"

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)
