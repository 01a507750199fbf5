"""Custom Python Data Source (PySpark 4 ``pyspark.sql.datasource``).

The reference ingests via a Lambda copying files into bronze
(``lambda/nyc_tlc_ingest.py``); the engine's file readers cover that
path. This module covers the OTHER ingestion shape a lakehouse
needs: sources that are not files — an API, a queue, a generator —
exposed to Spark through the Python Data Source API so they get real
partitioned parallel reads (one ``read(partition)`` per task, on
executors, Arrow-batched back to the JVM) instead of a driver-side
collect-and-parallelize.

``SyntheticDocsDataSource`` is the deterministic demonstrator: every
field derives from ``md5('doc:' || id)``, so the driver's DuckDB
oracle reproduces the exact rows with SQL md5 arithmetic — a green
CORRECTNESS row certifies the full partition-planning → per-task
read → Arrow transport cycle of a from-scratch source, not just a
smoke check. The same skeleton (options → partitions() →
read(partition)) is what a real HTTP/queue source fills in.

Scale shape: ``partitions()`` splits the id range into
``partitions`` independent slices; each task generates its slice —
no driver materialization, no shuffle. A real deployment points each
slice at an API page range or a queue shard.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SOURCES = ("web", "books", "code", "wiki")
SCHEMA = "doc_id bigint, digest string, source string, n_words int"


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def synth_row(i: int) -> tuple:
    """One deterministic row; kept module-level so tests and the
    oracle-parity derivation share the exact formula."""
    h = hashlib.md5(f"doc:{i}".encode()).hexdigest()
    return (
        i,
        h,
        SOURCES[int(h[:2], 16) % 4],
        50 + int(h[2:4], 16) % 200,
    )


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", "1000"))
        self.n_partitions = int(options.get("partitions", "8"))

    def partitions(self):
        step = max(1, -(-self.n // self.n_partitions))
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield synth_row(i)


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthdocs").option("n", 500).load()``"""

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticDocsStreamReader":
        return SyntheticDocsStreamReader(self.options)


def register_synthdocs(spark) -> None:
    """Idempotent registration of the source under ``synthdocs``."""
    spark.dataSource.register(SyntheticDocsDataSource)


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the synthetic source: offsets are row ids;
    each micro-batch emits the next ``batch_size`` rows until ``n``
    is exhausted. ``readBetweenOffsets`` regenerates any committed
    range deterministically, which is what makes checkpoint replay
    exactly-once for this source (same contract a real queue source
    meets by re-reading its log between offsets)."""

    def __init__(self, options: dict):
        self.n = int(options.get("n", "1000"))
        self.batch_size = int(options.get("batch_size", "100"))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = int(start["next"])
        hi = min(lo + self.batch_size, self.n)
        # Must be a list ITERATOR, not the list itself: the engine's
        # prefetch cache copy.copy()s it when serving planInputPartitions
        # (so it can't be a one-shot generator), but on an exhausted
        # source (end == start) it instead calls next() to verify the
        # batch is empty — a bare list fails that with TypeError and
        # kills the stream after the data drains.
        return iter([synth_row(i) for i in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return [
            synth_row(i)
            for i in range(int(start["next"]), int(end["next"]))
        ]
