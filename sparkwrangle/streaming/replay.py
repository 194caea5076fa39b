"""File-replay streaming source — the Kafka stand-in (SURVEY §2.J A3).

No broker exists in this container, so the engine ships a replay harness
with Kafka's SHAPE: records are (key, value, topic, partition, offset)
where value is a JSON-encoded row, staged as one file per micro-batch and
consumed via the file source with ``maxFilesPerTrigger=1``. The parse
stage (``parse_feed_records``) is exactly what a real Kafka deployment
runs after ``spark.readStream.format("kafka")`` — swapping transports
changes ONE line (the source), not the pipeline:

    kafka:  readStream.format("kafka")...load()         → key/value binary
    replay: read_replay(spark, dir)                     → key/value string

Ordering semantics mirror Kafka's: per-key (company) order is guaranteed
by staging batch files in feed_seq ranges with monotone modification
times; cross-key order is not promised (and the trader operator does not
need it — state is per company).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FEED_SCHEMA = (
    "company string, feed_seq int, ts timestamp, ticker_idx bigint, "
    "price double, ret double"
)

# Kafka-record twin: what format("kafka") yields after a cast to string.
RECORD_SCHEMA = (
    "key string, value string, topic string, partition int, offset bigint"
)


def to_feed_records(feed: DataFrame, topic: str = "bars_5m") -> DataFrame:
    """Encode feed rows as Kafka-shaped records: key = company (Kafka's
    partition-by-key contract ≡ the trader's groupBy axis), value = the
    row as JSON, offset = feed_seq (monotone per key, like a partition
    offset)."""
    return feed.select(
        F.col("company").alias("key"),
        F.to_json(
            F.struct("company", "feed_seq", "ts", "ticker_idx", "price", "ret")
        ).alias("value"),
        F.lit(topic).alias("topic"),
        (F.crc32(F.col("company")) % 8).cast("int").alias("partition"),
        F.col("feed_seq").cast("bigint").alias("offset"),
    )


def parse_feed_records(records: DataFrame) -> DataFrame:
    """Decode Kafka-shaped records back to typed feed rows — the stage a
    real Kafka consumer runs verbatim (from_json over value)."""
    return records.select(
        F.from_json(F.col("value"), FEED_SCHEMA).alias("row")
    ).select("row.*")


def stage_replay(
    feed: DataFrame, directory: str, n_batches: int = 4, topic: str = "bars_5m"
) -> list[str]:
    """Stage a batch feed as ``n_batches`` sequential record files.

    Batches split on feed_seq ranges, so a tick's rows stay within one
    batch per key unless the caller splits deliberately (the trader
    buffers partial ticks either way). Modification times are spaced so
    the file source replays in staging order.
    """
    bounds = feed.agg(
        F.min("feed_seq").alias("lo"), F.max("feed_seq").alias("hi")
    ).collect()[0]
    if bounds.lo is None:
        # fail BEFORE creating the directory — int(None) used to throw a
        # bare TypeError after mkdir, leaving a half-staged directory
        raise ValueError("stage_replay: feed is empty, nothing to stage")
    os.makedirs(directory, exist_ok=True)
    lo, hi = int(bounds.lo), int(bounds.hi)
    span = max(hi - lo + 1, 1)
    paths = []
    now = time.time()
    records = to_feed_records(feed, topic)
    for b in range(n_batches):
        b_lo = lo + (span * b) // n_batches
        b_hi = lo + (span * (b + 1)) // n_batches - 1
        part = records.filter(
            (F.col("offset") >= b_lo) & (F.col("offset") <= b_hi)
        )
        sub = os.path.join(directory, f"batch_{b:05d}")
        part.coalesce(1).write.mode("overwrite").parquet(sub)
        mt = now - (n_batches - b) * 60
        for fname in os.listdir(sub):
            full = os.path.join(sub, fname)
            os.utime(full, (mt, mt))
        paths.append(sub)
    return paths


def read_replay(
    spark: SparkSession, directory: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """The replay source: one staged file per micro-batch, in mtime order —
    the transport line a real deployment replaces with format('kafka')."""
    return (
        spark.readStream.schema(RECORD_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(os.path.join(directory, "*"))
    )
