"""Custom Python DataSource (Spark 4 API) for the Kafka-shaped replay log.

``streaming/replay.py`` replays staged record files through the built-in
file source. This module exposes the SAME staged directory through
Spark 4's ``pyspark.sql.datasource`` API instead — a first-class
``format("kafka_replay")`` with a batch reader and a micro-batch stream
reader that owns its offsets, the way a real connector does:

* offsets are ``{"batch": i}`` — the index of the next staged batch dir;
  the engine checkpoints them, so a restarted query resumes mid-log
  exactly like a Kafka consumer group.
* ``partitions(start, end)`` maps an offset range to one InputPartition
  per staged batch; ``read`` deserializes that batch's parquet with
  pyarrow ON THE EXECUTOR — the driver never touches record bytes.
* at 100 TB the same class points at an object-store prefix; nothing in
  the protocol assumes local disk.

Registration is per-session:  ``spark.dataSource.register(ReplayDataSource)``
then ``spark.readStream.format("kafka_replay").option("path", dir).load()``.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

RECORD_SCHEMA = (
    "key string, value string, topic string, partition int, offset bigint"
)
_COLS = ["key", "value", "topic", "partition", "offset"]


def _batch_dirs(path: str) -> list[str]:
    return sorted(
        os.path.join(path, d) for d in os.listdir(path) if d.startswith("batch_")
    )


def _read_batch_rows(batch_dir: str):
    import pyarrow.parquet as pq

    for fname in sorted(os.listdir(batch_dir)):
        if not fname.endswith(".parquet"):
            continue
        tbl = pq.read_table(os.path.join(batch_dir, fname), columns=_COLS)
        for row in zip(*(tbl.column(c).to_pylist() for c in _COLS)):
            yield row


class _BatchPartition(InputPartition):
    def __init__(self, batch_dir: str):
        self.batch_dir = batch_dir


class ReplayBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]

    def partitions(self):
        return [_BatchPartition(d) for d in _batch_dirs(self.path)]

    def read(self, partition):
        yield from _read_batch_rows(partition.batch_dir)


class ReplayStreamReader(DataSourceStreamReader):
    """Micro-batch reader: one staged batch dir per offset increment."""

    def __init__(self, options):
        self.path = options["path"]

    def initialOffset(self):
        return {"batch": 0}

    def latestOffset(self):
        return {"batch": len(_batch_dirs(self.path))}

    def partitions(self, start, end):
        dirs = _batch_dirs(self.path)
        return [_BatchPartition(dirs[i]) for i in range(start["batch"], end["batch"])]

    def read(self, partition):
        yield from _read_batch_rows(partition.batch_dir)

    def commit(self, end):
        pass  # staged files are immutable; nothing to clean up


class ReplayDataSource(DataSource):
    @classmethod
    def name(cls):
        return "kafka_replay"

    def schema(self):
        return RECORD_SCHEMA

    def reader(self, schema):
        return ReplayBatchReader(self.options)

    def streamReader(self, schema):
        return ReplayStreamReader(self.options)
