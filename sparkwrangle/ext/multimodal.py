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
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = row["payload"]
                if payload is None or len(payload) == 0:
                    continue
                step = max(len(payload) // n_frames, 1)
                for k in range(n_frames):
                    chunk = bytes(payload[k * step : (k + 1) * step])
                    if not chunk:
                        break
                    out.append(
                        {
                            "doc_id": row["doc_id"],
                            "frame_idx": k,
                            "frame_bytes": chunk,
                            "n_bytes": len(chunk),
                        }
                    )
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_idx", "frame_bytes", "n_bytes"]
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
