"""Joins and timestamp alignment (SURVEY.md §2.C).

The reference aligns series by pandas index; the engine keeps long format
where a union IS the alignment, and uses one idiom for as-of semantics:
union + forward-fill window (pure Catalyst — no custom operator needed,
SURVEY §4). Dimension joins broadcast; ts-aligned joins are sort-merge
and AQE is free to re-plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def align_union(long_dfs: list[DataFrame]) -> DataFrame:
    """Multi-series full-outer alignment (C1): in long format,
    ``pd.concat(axis=1)`` is just a union of (ts, key, value) rows.
    The wide view, when a bounded report needs it, is reshape.pivot_wide."""
    out = long_dfs[0]
    for df in long_dfs[1:]:
        out = out.unionByName(df)
    return out


def join_on_ts(a: DataFrame, b: DataFrame, on: list[str], how: str = "inner") -> DataFrame:
    """Two-series index-aligned arithmetic feed (C2): plain equi-join on the
    timestamp key; Catalyst/AQE picks SMJ or broadcast by size."""
    return a.join(b, on=on, how=how)


def asof_union_ffill(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """As-of join (C3): for each left row, the most recent ``right.value_col``
    at or before ``left.on`` — the reference's
    ``reindex(index).fillna(method='ffill')`` (intra_day_arbitrage.ipynb:111).

    Spark SQL has no native as-of join; the scalable idiom is:
    union both sides into one timeline, forward-fill the right value over
    an ordered window, keep left rows. One shuffle on (by, on) — the same
    cost a native as-of would pay. Ties (equal ts) order the right row
    first, so a same-timestamp rate is visible to the left row, matching
    pandas reindex-then-ffill.
    """
    out_col = out_col or value_col
    by = by or []
    lcols = left.columns
    lhs = left.withColumn("__src", F.lit(1)).withColumn(f"__r_{value_col}", F.lit(None).cast("double"))
    rhs = right.select(
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(0).alias("__src"),
        F.col(value_col).alias(f"__r_{value_col}"),
    )
    for c in lcols:
        if c not in set(by) | {on}:
            rhs = rhs.withColumn(c, F.lit(None))
    unioned = lhs.unionByName(rhs.select(lhs.columns))
    w = (
        Window.partitionBy(*by)
        .orderBy(on, "__src")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn(
        out_col, F.last(f"__r_{value_col}", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("__src") == 1).select(*lcols, out_col)


def conditional_convert(
    df: DataFrame,
    value_col: str,
    rate_col: str,
    predicate: Column,
    out_col: str | None = None,
) -> DataFrame:
    """Conditional currency conversion (C4): multiply only rows matching the
    predicate (ticker contains '.', i.e. an EU listing) by the as-of rate
    (intra_day_arbitrage.ipynb:113-114, cell 7)."""
    out_col = out_col or value_col
    return df.withColumn(
        out_col,
        F.when(predicate, F.col(value_col) * F.col(rate_col)).otherwise(F.col(value_col)),
    )


def block_range_join(
    facts: DataFrame, blocks: DataFrame, ts_col: str, start_col: str, end_col: str
) -> DataFrame:
    """Key-range dispatch (C7): tag fact rows with the block whose
    [start, end] range contains them (time_blocks,
    intra_day_arbitrage.ipynb:1146-1148). Blocks are tiny → broadcast, so
    the range join is a broadcast nested loop, not a cartesian shuffle.
    At ingest, prefer materializing block_id as a partition column."""
    return facts.join(
        F.broadcast(blocks),
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col)),
        "inner",
    )
