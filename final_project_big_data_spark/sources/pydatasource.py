"""Custom connectors via the Spark 4 Python Data Source API.

The reference's only "connectors" are parquet files and Kafka; a real
engine is extensible — this module implements both halves of the
``pyspark.sql.datasource`` contract:

- ``SynthDocsDataSource`` (format ``synthdocs``): a PARTITIONED batch
  reader. ``partitions()`` plans N independent splits; each executor task
  calls ``read(partition)`` for its split only — the source parallelizes
  like any file scan (no driver materialization, no single-task read).
  Rows are a deterministic closed form of ``doc_id``, which is what makes
  the connector oracle-checkable end-to-end (x04).
- ``RowCountSinkDataSource`` (format ``rowcount_sink``): a writer
  demonstrating the distributed commit protocol — ``write()`` runs
  per-partition on executors and returns a ``WriterCommitMessage``;
  ``commit()`` runs once on the driver with ALL messages and publishes an
  atomic summary. That message/commit split is exactly how exactly-once
  file/table sinks are built.

Python data sources run rows through Arrow on the executor — the slow
path relative to a JVM scan, right for custom protocols/APIs, not for
bulk columnar data (use parquet/ORC there).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

FORMAT_DOCS = "synthdocs"
FORMAT_ROWCOUNT = "rowcount_sink"


def doc_text(doc_id: int) -> str:
    """Closed-form text for one doc — mirrored by x04's DuckDB oracle."""
    return f"w{doc_id % 7} w{(doc_id * 3) % 11} w{(doc_id * 7) % 13}"


class SynthDocsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self) -> list[InputPartition]:
        # one InputPartition per split: Spark schedules one task each
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        # round-robin split: this task yields ONLY its residue class
        for doc_id in range(partition.value, self.n, self.num_partitions):
            yield (doc_id, doc_id % 4, doc_text(doc_id))


class SynthDocsStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the connector: offset-tracked micro-batches.

    The offset is a plain dict checkpointed by the engine; each trigger
    calls ``read(start)`` → (rows, next_offset), and replay after failure
    calls ``readBetweenOffsets`` — which MUST be deterministic for the
    checkpoint recovery contract to give exactly-once. The closed-form
    rows make that determinism trivial here; a real API source would
    re-fetch by the same cursor range.
    """

    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 1000))
        self.rows_per_batch = int(options.get("rowsPerBatch", 50))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _rows(self, lo: int, hi: int) -> list[tuple]:
        # a concrete list, not a generator: the engine pickles prefetched
        # rows into its offset cache for failure replay
        return [(i, i % 4, doc_text(i)) for i in range(lo, hi)]

    def read(self, start: dict):
        lo = start["pos"]
        hi = min(lo + self.rows_per_batch, self.n)
        return self._rows(lo, hi), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return self._rows(start["pos"], end["pos"])


class SynthDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_DOCS

    def schema(self) -> str:
        return "doc_id bigint, shard int, text string"

    def reader(self, schema) -> SynthDocsReader:
        return SynthDocsReader(self.options)

    def simpleStreamReader(self, schema) -> SynthDocsStreamReader:
        return SynthDocsStreamReader(self.options)


class _CountMessage(WriterCommitMessage):
    def __init__(self, rows: int, task_part: int) -> None:
        self.rows = rows
        self.task_part = task_part


class RowCountWriter(DataSourceWriter):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def write(self, iterator: Iterator) -> _CountMessage:
        # executor-side: consume this partition's rows, report, don't store
        from pyspark import TaskContext

        n = sum(1 for _ in iterator)
        return _CountMessage(n, TaskContext.get().partitionId())

    def commit(self, messages: list[_CountMessage]) -> None:
        # driver-side, after EVERY task succeeded: atomic publish
        summary = {
            "total_rows": sum(m.rows for m in messages),
            "partitions": len(messages),
        }
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(summary, f)
        os.replace(tmp, self.path)

    def abort(self, messages: list) -> None:
        # failed job must leave no partial output
        for p in (self.path + ".tmp", self.path):
            if os.path.exists(p):
                os.remove(p)


class RowCountSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_ROWCOUNT

    def writer(self, schema, overwrite: bool) -> RowCountWriter:
        return RowCountWriter(self.options)


def register_sources(spark) -> None:
    """Idempotently register both custom formats on the session."""
    spark.dataSource.register(SynthDocsDataSource)
    spark.dataSource.register(RowCountSinkDataSource)
