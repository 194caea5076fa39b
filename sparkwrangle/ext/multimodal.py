"""Multimodal columns: opaque binary payloads + typed metadata
(north-star §2.J).

At 100 TB the payload column stores a POINTER (uri) plus small inline
bytes for thumbnails; decode/feature-extract runs as Arrow-batched
``mapInPandas`` so bytes never round-trip through the driver and batches
stream through fixed-size Arrow buffers. The actual image/audio decoders
are not available in this container — ``decode_features`` therefore ships
a clearly-marked deterministic STUB with the real schema, partitioning,
UDF signature, and batch shape, swappable for PIL/ffmpeg workers.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("uri", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_mean", DoubleType()),
        StructField("feature_dim", LongType()),
    ]
)


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap documents as a multimodal table: utf-8 bytes play the opaque
    payload; metadata (type, uri, size) is typed and prunable — filters on
    metadata never touch payload bytes (columnar projection)."""
    return docs.select(
        F.col("doc_id"),
        F.lit("text/plain").alias("media_type"),
        F.concat(F.lit("mem://doc/"), F.col("doc_id")).alias("uri"),
        F.octet_length(F.encode(F.col(text_col), "UTF-8")).cast("long").alias("n_bytes"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def decode_features(media: DataFrame) -> DataFrame:
    """Feature extraction over payload bytes via mapInPandas.

    STUB decoder: real image/audio libs are absent here, so features are a
    deterministic function of the bytes (mean byte value). The Spark-side
    plumbing — Arrow batching, schema, per-partition streaming — is the
    production shape; replace ``_extract`` with a real decoder.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    # STUB: mean byte value stands in for a decoded feature
                    "byte_mean": [
                        (sum(b) / len(b)) if b is not None and len(b) else None
                        for b in payloads
                    ],
                    "feature_dim": [1] * len(pdf),
                }
            )
            yield out

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_bytes", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling: one payload row → n evenly-spaced 'frame' rows.

    STUB decoder (no video libs here): frames are evenly-spaced byte
    slices of the payload — but the Spark-side shape is the production
    one: a mapInPandas row EXPANSION (1 → n) streaming through Arrow
    batches, never materializing a document's frames in driver memory.
    Swap the slicer for cv2/ffmpeg keyframe extraction.
    """

    def _expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        empty = pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "frame_idx": pd.Series(dtype="int64"),
                "frame_bytes": pd.Series(dtype="object"),
                "n_bytes": pd.Series(dtype="int64"),
            }
        )
        for pdf in batches:
            payloads = pdf["payload"].to_numpy()
            lens = np.fromiter(
                (0 if p is None else len(p) for p in payloads),
                dtype=np.int64,
                count=len(payloads),
            )
            keep = lens > 0
            if not keep.any():
                yield empty
                continue
            payloads, lens = payloads[keep], lens[keep]
            doc_ids = pdf["doc_id"].to_numpy()[keep]
            # Frame offsets computed vectorized (a real decoder swap keeps
            # this loop shape: only the per-row byte slice stays Python).
            steps = np.maximum(lens // n_frames, 1)
            n_chunks = np.minimum(n_frames, lens)  # step=1 when len<n_frames
            frame_idx = np.concatenate([np.arange(c) for c in n_chunks])
            rep_steps = np.repeat(steps, n_chunks)
            starts = frame_idx * rep_steps
            ends = np.minimum(starts + rep_steps, np.repeat(lens, n_chunks))
            rep_payloads = np.repeat(payloads, n_chunks)
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(doc_ids, n_chunks),
                    "frame_idx": frame_idx,
                    "frame_bytes": [
                        bytes(p[s:e])
                        for p, s, e in zip(rep_payloads, starts, ends)
                    ],
                    "n_bytes": ends - starts,
                }
            )

    return media.mapInPandas(_expand, FRAME_SCHEMA)


def pointer_table(docs: DataFrame, base_uri: str = "s3://corpus/raw") -> DataFrame:
    """The 100 TB layout: metadata + URI pointer, NO inline payload — the
    scan stays tiny and byte fetches happen only inside the decode stage
    for rows that survive metadata predicates."""
    return docs.select(
        F.col("doc_id"),
        F.lit("text/plain").alias("media_type"),
        F.concat(F.lit(base_uri + "/"), F.col("doc_id")).alias("uri"),
        F.col("n_chars").cast("long").alias("n_bytes_hint"),
    )
