"""Skew-mitigation utilities for 100 TB aggregation/join plans.

AQE's skew-join handles most runtime skew; salting is the explicit tool
when one grouping key dominates (a hot ticker, a mega-company): aggregate
in two phases — partial by (key, salt) spreads the hot key over N tasks,
final by key collapses the partials. Only algebraic aggregates (sum,
count, min, max) can be split this way; avg = sum/count downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPLITTABLE = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column → (function, input column) with function in
    {sum, count, min, max}. Example::

        salted_agg(events, ["event_type"],
                   {"n": ("count", "*"), "total": ("sum", "value")})

    Phase 1 shuffles on (keys, salt) — the hot key spreads over
    ``salt_buckets`` tasks; phase 2 shuffles the tiny partials on keys.
    """
    for name, (fn, _) in aggs.items():
        if fn not in _SPLITTABLE:
            raise ValueError(f"{name}: '{fn}' is not an algebraic aggregate")
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            _SPLITTABLE[fn](F.lit(1) if col == "*" else F.col(col)).alias(f"__p_{name}")
            for name, (fn, col) in aggs.items()
        ]
    )
    final = partial.groupBy(*keys).agg(
        *[
            _MERGE[fn](F.col(f"__p_{name}")).alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )
    return final
