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
    # placeholder cast uses the RIGHT column's ACTUAL type: a hard "double"
    # would make the union widen bigint values (ids above 2^53 round) or
    # flip string/decimal columns' types — silently
    rv_type = right.schema[value_col].dataType
    lhs = left.withColumn("__src", F.lit(1)).withColumn(
        f"__r_{value_col}", F.lit(None).cast(rv_type)
    )
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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None,
    value_col: str,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Full pandas ``merge_asof`` semantics on the union+fill idiom (C3).

    backward: latest right value at or before the left timestamp
    forward : earliest right value at or after the left timestamp
    nearest : whichever of the two is closer (ties → backward, pandas rule)
    tolerance_seconds: matches farther than this become NULL.

    Same cost shape as the backward idiom: one shuffle on (by, on); the
    direction only flips the window frame. Golden-tested against
    pandas.merge_asof in tests/test_asof.py and brute-force-fuzzed in
    tools/fuzz_parity.py (directions x tolerance, heavy exact-timestamp
    ties, missing keys, empty sides).

    CONTRACT: ``right`` must be unique per (by, on) — with duplicate
    right timestamps inside one key the window's tie order (and hence
    which duplicate wins) is not defined, the same reason
    pandas.merge_asof demands sorted keys. Dedup upstream (keep the
    intended row) before calling.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(direction)
    out_col = out_col or value_col
    by = by or []
    lcols = left.columns
    # same type-faithful placeholder rule as asof_union_ffill above
    rv_type = right.schema[value_col].dataType
    lhs = (
        left.withColumn("__src", F.lit(1))
        .withColumn("__rv", F.lit(None).cast(rv_type))
        .withColumn("__rts", F.lit(None).cast("timestamp"))
    )
    rhs = right.select(
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(0).alias("__src"),
        F.col(value_col).alias("__rv"),
        F.col(on).alias("__rts"),
    )
    for c in lcols:
        if c not in set(by) | {on}:
            rhs = rhs.withColumn(c, F.lit(None))
    u = lhs.unionByName(rhs.select(lhs.columns))

    # backward frame: right rows sort before left at equal ts (inclusive)
    wb = (
        Window.partitionBy(*by)
        .orderBy(on, "__src")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # forward frame: right rows sort after left at equal ts... but pandas
    # forward INCLUDES exact matches, so order right-first and span from
    # the current row forward — the same-ts right row precedes the left
    # row, so give the frame one extra preceding slot via a first() over
    # an ordering where left sorts first.
    wf = (
        Window.partitionBy(*by)
        .orderBy(on, (F.col("__src") == 0).cast("int"))
        .rowsBetween(0, Window.unboundedFollowing)
    )
    u = u.withColumn("__bv", F.last(F.when(F.col("__src") == 0, F.col("__rv")), ignorenulls=True).over(wb))
    u = u.withColumn("__bts", F.last(F.when(F.col("__src") == 0, F.col("__rts")), ignorenulls=True).over(wb))
    u = u.withColumn("__fv", F.first(F.when(F.col("__src") == 0, F.col("__rv")), ignorenulls=True).over(wf))
    u = u.withColumn("__fts", F.first(F.when(F.col("__src") == 0, F.col("__rts")), ignorenulls=True).over(wf))
    u = u.filter(F.col("__src") == 1)

    bgap = F.col(on).cast("double") - F.col("__bts").cast("double")
    fgap = F.col("__fts").cast("double") - F.col(on).cast("double")
    if tolerance_seconds is not None:
        u = u.withColumn("__bv", F.when(bgap <= tolerance_seconds, F.col("__bv")))
        u = u.withColumn("__fv", F.when(fgap <= tolerance_seconds, F.col("__fv")))
    if direction == "backward":
        val = F.col("__bv")
    elif direction == "forward":
        val = F.col("__fv")
    else:  # nearest: closer side wins; ties and one-sided cases → backward
        val = (
            F.when(F.col("__bts").isNull(), F.col("__fv"))
            .when(F.col("__fts").isNull(), F.col("__bv"))
            .when(fgap < bgap, F.col("__fv"))
            .otherwise(F.col("__bv"))
        )
    return u.withColumn(out_col, val).select(*lcols, out_col)
