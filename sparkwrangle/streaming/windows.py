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
    horizon — the ingest-side exactly-once guard.

    Uses ``dropDuplicatesWithinWatermark`` (not ``dropDuplicates``): plain
    ``dropDuplicates(subset)`` only evicts state when the event-time column
    is IN the subset, so deduping on e.g. ``["doc_id"]`` would grow state
    forever. ``dropDuplicatesWithinWatermark`` evicts a key once the
    watermark passes its first occurrence + delay for ANY key set — the
    bounded-state contract a 100 TB/day ingest needs. On batch frames the
    watermark is meaningless, so plain exact dedup applies."""
    if not stream.isStreaming:
        return stream.dropDuplicates(key_cols)
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def session_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str | None = "10 minutes",
    keys: list[str] | None = None,
) -> DataFrame:
    """Session windows: rows within ``gap`` of each other merge into one
    session per key; a session closes (and emits, in append mode) once
    the watermark passes its end + gap. State per key is one open
    session, not history — the sessionization contract at ingest scale.
    ``watermark=None`` skips the late-data bound (complete-mode analytics
    / batch). Works identically on batch DataFrames (session_window is
    the same expression; the watermark is a no-op there)."""
    src = (
        stream.withWatermark(ts_col, watermark)
        if (watermark and stream.isStreaming)
        else stream
    )
    g = src.groupBy(F.session_window(ts_col, gap), *(keys or []))
    return g.agg(F.count("*").alias("n"), F.sum("value").alias("sum_value")).select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *(keys or []),
        "n",
        "sum_value",
    )


def windowed_hll_registers(
    stream: DataFrame,
    item_col: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str | None = "10 minutes",
    keys: list[str] | None = None,
) -> DataFrame:
    """Streaming white-box HLL: per event-time window (and keys), the
    256-register table for approximate COUNT(DISTINCT item) — built by a
    single MAX aggregation, which is exactly the shape streaming state
    wants: the register value is monotone and mergeable, so state per
    (window, keys) is 256 small ints regardless of stream volume, and
    late data folds in with the same MAX. Finalize with
    ``sparkwrangle.ext.sketches.hll_estimate`` on the sink contents (the
    read-side step — chaining the estimate aggregation into the same
    streaming query would be a second stateful operator).

    Works identically on batch frames (watermark is a no-op there)."""
    from sparkwrangle.ext.hashing import h60
    from sparkwrangle.ext.sketches import HLL_M, hll_rho

    w = F.window(ts_col, window)
    src = (
        stream.withWatermark(ts_col, watermark)
        if (watermark and stream.isStreaming)
        else stream
    )
    h = h60(F.col(item_col))
    # NULL items are dropped like the batch twin (sketches.hll_registers):
    # a NULL would otherwise become a phantom (window, reg=NULL) register
    # row that inflates `present` in the read-side hll_estimate
    base = src.filter(F.col(item_col).isNotNull()).select(
        F.col(ts_col), *(keys or []), (h % HLL_M).alias("reg"), hll_rho(h).alias("rho")
    )
    return (
        base.groupBy(w, *(keys or []), "reg")
        .agg(F.max("rho").alias("mx"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *(keys or []),
            "reg",
            "mx",
        )
    )


def windowed_cms_counters(
    stream: DataFrame,
    item_col: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str | None = "10 minutes",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Streaming Count-Min: per event-time window, the depth×width counter
    table for heavy-hitter queries — a single COUNT aggregation (counts
    are sum-mergeable, so state per window is ≤ depth·width small ints
    however large the stream; late data folds in additively). Point
    estimates finalize read-side with ``ext.sketches.cms_estimates``
    against the sink contents. Works identically on batch frames."""
    from sparkwrangle.ext.sketches import cms_buckets

    w = F.window(ts_col, window)
    src = (
        stream.withWatermark(ts_col, watermark)
        if (watermark and stream.isStreaming)
        else stream
    )
    base = src.select(
        F.col(ts_col),
        F.posexplode(cms_buckets(F.col(item_col), depth, width)).alias("d", "bucket"),
    )
    return (
        base.groupBy(w, "d", "bucket")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "d",
            "bucket",
            "cnt",
        )
    )
