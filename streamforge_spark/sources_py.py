"""Custom Spark Python DataSource: a CDC source with resume-token
offsets, implemented against the pyspark.sql.datasource API (Spark 4).

This is the connector surface the reference builds in Java
(MongoSourceBuilder / MongoChangeStreamSource,
src/main/java/com/streamforge/connector/mongo/*.java) expressed as a
FIRST-CLASS Spark source instead of an adapter over files:

- batch mode: a bounded snapshot (``spark.read.format("synthetic_cdc")``)
  split into range InputPartitions — the scan parallelizes like any
  native source;
- streaming mode: a change stream whose offset IS the resume token
  (MongoChangeStreamSource.java's resumeToken -> ``{"id": N}``):
  Spark checkpoints the offset, and a restarted query resumes exactly
  after the last committed id — no duplicates, no gaps — which the
  tests prove by killing and restarting a query mid-stream.

Rows are deterministic (op cycles insert/update/delete by id; payload
derives from the id), so tests can assert exact content. A real
deployment swaps the row generator for a change-stream client; the
offset/partition/commit contract — the part Spark owns — is identical.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource, DataSourceReader, DataSourceStreamReader, InputPartition,
)

SCHEMA_DDL = ("id BIGINT, operation STRING, primary_key STRING, "
              "payload_json STRING, seq BIGINT")

_OPS = ("insert", "update", "delete")


def _row(i: int) -> tuple:
    return (i, _OPS[i % 3], f"pk-{i % 50}",
            json.dumps({"id": i, "v": i * 7 % 1000}, sort_keys=True), i)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticCdcDataSource(DataSource):
    """``spark.read.format("synthetic_cdc").option("n", 1000)`` after
    ``spark.dataSource.register(SyntheticCdcDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_cdc"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> DataSourceReader:
        return _SnapshotReader(int(self.options.get("n", 1000)),
                               int(self.options.get("parts", 4)))

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _ChangeStreamReader(
            int(self.options.get("batch_size", 100)),
            int(self.options.get("max_id", 10_000)))


class _SnapshotReader(DataSourceReader):
    """Bounded snapshot split into range partitions (the
    MongoSourceBuilder analog — hash-mod splits become range splits
    because ids are dense here)."""

    def __init__(self, n: int, parts: int):
        self.n, self.parts = n, parts

    def partitions(self):
        step = max(1, self.n // self.parts)
        bounds = list(range(0, self.n, step)) + [self.n]
        return [_RangePartition(a, b) for a, b in zip(bounds, bounds[1:])]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i)


class _ChangeStreamReader(DataSourceStreamReader):
    """Change stream with resume-token offsets: offset = next unread
    id. Spark persists offsets in the checkpoint; after a crash the
    query calls partitions(last_committed, latest) and re-reads ONLY
    the uncommitted tail — exactly the resume-token contract."""

    def __init__(self, batch_size: int, max_id: int):
        self.batch_size, self.max_id = batch_size, max_id

    def initialOffset(self) -> dict:
        return {"id": 0}

    def latestOffset(self) -> dict:
        # a real client would ask the change stream for its head; the
        # synthetic feed's head is max_id (what exists to be read)
        return {"id": self.max_id}

    def partitions(self, start: dict, end: dict):
        # split the uncommitted tail into batch_size range partitions
        # so a large catch-up after restart still parallelizes
        a, b = int(start["id"]), int(end["id"])
        bounds = list(range(a, b, self.batch_size)) + [b]
        parts = [_RangePartition(x, y)
                 for x, y in zip(bounds, bounds[1:]) if x < y]
        return parts or [_RangePartition(a, a)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i)

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; nothing external to ack

    def stop(self) -> None:
        pass
