"""Streaming windowed aggregations with event-time watermarks.

The engine surface beyond the reference's simulated feed (SURVEY §2.J):
tumbling/sliding event-time windows with late-data bounds. In append mode
a window emits once its end passes the watermark; rows later than the
watermark are dropped — the contract a 100 TB ingest needs to bound state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
    keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling (or sliding, if ``slide``) event-time counts + value sums
    with a late-data watermark. Works identically on batch DataFrames
    (window() is the same expression; the watermark is a no-op there)."""
    w = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    src = stream.withWatermark(ts_col, watermark) if stream.isStreaming else stream
    g = src.groupBy(w, *(keys or []))
    return g.agg(F.count("*").alias("n"), F.sum("value").alias("sum_value")).select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *(keys or []),
        "n",
        "sum_value",
    )


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: drop repeated keys within the watermark
    horizon — the ingest-side exactly-once guard. State is bounded by the
    watermark (keys older than it are evicted), which is what makes this
    viable at 100 TB/day ingest rates."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates(key_cols)
