"""Streaming incremental near-dedup — new documents against a prepared
corpus, per micro-batch (the streaming twin of
``ext.prepared.incremental_lsh_pairs``).

The batch incremental path computes a new batch's MinHash signatures
with a groupBy; on a stream that aggregation is unbounded state. The
streaming form therefore uses ``ext.dedup.mapside_minhash_sigs`` — the
whole signature is a per-row projection (shingle-hash array → k
``array_min`` folds), bit-identical to the aggregate form (pinned by
test) and STATELESS. Banding is a map-side explode, and candidate
generation is a stream-STATIC equi-join on (band, bh) against the
corpus band table (in production: a read of the prepared
``minhash_sigs.parquet``, banded — a columnar scan, refreshed per batch
by the source, never recomputed from text).

Scope (documented, tested): the stream emits new×corpus candidate
pairs. New×new pairs within the ingest window are the batch boundary's
job (``incremental_lsh_pairs`` at compaction time, or fold each
micro-batch into the corpus table) — a stream-stream self-join would
buffer the whole stream for no bounded-state benefit.

A pair can match in several bands; ``dropDuplicatesWithinWatermark``
emits it once per watermark horizon with state that actually evicts
(plain dropDuplicates would keep every pair forever).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkwrangle.ext.dedup import band_struct_array, mapside_minhash_sigs


def corpus_band_table(corpus_sigs: DataFrame, k: int = 16, bands: int = 4) -> DataFrame:
    """Static join side: the prepared corpus signatures, banded long.
    (id renamed so the stream-static join never collides on doc_id)."""
    from sparkwrangle.ext.dedup import band_explode

    return band_explode(corpus_sigs, "doc_id", k, bands).withColumnRenamed(
        "doc_id", "corpus_id"
    )


def incremental_pairs_stream(
    new_docs: DataFrame,
    corpus_bands: DataFrame,
    ts_col: str = "ts",
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Candidate pairs touching a streaming batch of new documents.

    ``new_docs`` needs (doc_id, ts, text); ``corpus_bands`` is the
    static banded signature table (``corpus_band_table``). Returns
    (id_a, id_b, ts) with id_a < id_b, deduplicated within the
    watermark horizon. Works identically on a batch frame (the
    watermark is a no-op there) — the parity test pins stream ≡ batch
    restricted to new×corpus pairs.
    """
    src = (
        new_docs.withWatermark(ts_col, watermark)
        if new_docs.isStreaming
        else new_docs
    )
    sigs = mapside_minhash_sigs(
        src, "doc_id", "text", n=n, k=k, keep_cols=[ts_col]
    )
    exploded = sigs.select(
        "doc_id", ts_col, F.explode(band_struct_array(k, bands)).alias("bb")
    ).select("doc_id", ts_col, "bb.band", "bb.bh")
    hits = exploded.join(corpus_bands, ["band", "bh"]).filter(
        F.col("corpus_id") != F.col("doc_id")
    )
    pairs = hits.select(
        F.least("doc_id", "corpus_id").alias("id_a"),
        F.greatest("doc_id", "corpus_id").alias("id_b"),
        ts_col,
    )
    if pairs.isStreaming:
        return pairs.dropDuplicatesWithinWatermark(["id_a", "id_b"])
    # deterministic batch twin: keep the EARLIEST ts per pair (the
    # event-time analog of the stream's first-arrival keep) — a bare
    # dropDuplicates keeps an arbitrary partition's row, so a doc
    # re-arriving with a new ts within one batch would make repeated
    # runs return different ts values for the same pair
    return pairs.groupBy("id_a", "id_b").agg(F.min(ts_col).alias(ts_col))
