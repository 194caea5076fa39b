"""Stream-stream joins (Structured Streaming surface).

An interval equi-join between two event streams: rows pair when they
share a key and the right event lands inside ``[left.ts + lower,
left.ts + upper]``. Both sides carry watermarks, so Spark can bound the
join state it buffers: a left row is held only until the right
watermark passes ``left.ts + upper`` (and symmetrically), which is what
makes the operator runnable forever at 100 TB/day — state is O(rate ×
interval), not O(history).

The same helper works batch-side (no watermarks needed), which the
parity test exploits: stream result ≡ batch result on a replayed feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    lower_sec: int,
    upper_sec: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Inner interval join: pairs (l, r) with equal ``key`` and
    ``r.ts − l.ts ∈ [lower_sec, upper_sec]``.

    ``watermark`` applies to BOTH event-time columns when the inputs are
    streaming (pass None for batch inputs). Output columns: key, l_ts,
    r_ts, plus every non-key/non-ts column from each side prefixed
    ``l_`` / ``r_``.
    """
    if watermark is not None:
        left = left.withWatermark(left_ts, watermark)
        right = right.withWatermark(right_ts, watermark)
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("l_ts"),
        *[
            F.col(c).alias(f"l_{c}")
            for c in left.columns
            if c not in (key, left_ts)
        ],
    )
    r = right.select(
        F.col(key).alias("_rk"),
        F.col(right_ts).alias("r_ts"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in (key, right_ts)
        ],
    )
    cond = (
        (F.col("_k") == F.col("_rk"))
        & (F.col("r_ts") >= F.col("l_ts") + F.expr(f"INTERVAL {lower_sec} SECOND"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {upper_sec} SECOND"))
    )
    return l.join(r, cond).drop("_rk").withColumnRenamed("_k", key)
