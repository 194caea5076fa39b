"""Streaming ANN serving: answer a STREAM of query vectors against the
persisted PQ index (tools/ann.py layout) — the online face of the
build-once/query-many contract.

Each micro-batch of queries is a bounded batch DataFrame, so the batch
ADC plan applies unchanged inside ``foreachBatch``: broadcast the
per-batch lookup table, scan the narrow code table, one combinable
groupBy sum. The index tables are loaded ONCE and reused across
batches (parquet footers/listing amortize); the corpus's raw embedding
column is never read while serving. foreachBatch is the right operator
here — the per-query broadcast LUT is data-dependent, which no
continuous stateful operator can express, and query answering is
stateless across batches so exactly-once reduces to the sink's
idempotence: each batch writes its OWN ``batch_id=<n>`` partition with
dynamic partition overwrite, so a batch replayed after a failure
between write and checkpoint commit overwrites its previous partition
instead of appending duplicates."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkwrangle.ext.similarity import pq_adc_from_index


def serve_ann_stream(
    query_stream: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 5,
    m: int = 8,
    d_sub: int = 8,
    available_now: bool = True,
):
    """Start the serving query: ADC top-k per micro-batch, written to
    ``out_dir`` as parquet partitioned by ``batch_id`` with dynamic
    partition overwrite — a replayed batch overwrites its own partition,
    never duplicates it. Returns the StreamingQuery handle."""
    spark = query_stream.sparkSession
    codebooks = spark.read.parquet(f"{index_dir}/codebooks.parquet")
    codes = spark.read.parquet(f"{index_dir}/codes.parquet")

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = pq_adc_from_index(
            codes, codebooks, batch_df, k=k, m=m, d_sub=d_sub
        ).withColumn("batch_id", F.lit(batch_id))
        # idempotent replay: overwrite ONLY this batch's partition —
        # a replay after a write-then-crash rewrites the same directory
        # instead of appending a second copy of the batch's rows
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    writer = query_stream.writeStream.foreachBatch(_handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
