"""Projections, filters, predicates (SURVEY.md §2.B).

Reference behaviors covered: time-range slices (B1), ±inf replacement
after division-by-zero (B7, quirk K.4), time-of-day band filters (B9),
threshold predicates (B10/B11), null dropping (B6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_POS_INF = float("inf")
_NEG_INF = float("-inf")


def time_range(df: DataFrame, ts_col: str, start=None, end=None) -> DataFrame:
    """Half-open [start, end) timestamp slice.

    Reference: ``history["2006":]`` label slice
    (stock_arbitrage.ipynb:27-28, cell 1). Parquet row-group pruning makes
    this a metadata skip at scale, so the filter must stay a plain
    comparison (no UDF wrapping).
    """
    out = df
    if start is not None:
        out = out.filter(F.col(ts_col) >= F.lit(start))
    if end is not None:
        out = out.filter(F.col(ts_col) < F.lit(end))
    return out


def minute_of_day(ts: Column) -> Column:
    """Integer minute-of-day; the engine's replacement for the reference's
    ``datetime.time`` comparisons (IntradayRegionArbitrage.py:152-159)."""
    return F.hour(ts) * 60 + F.minute(ts)


def time_of_day_band(
    df: DataFrame, ts_col: str, start_hm: tuple[int, int], end_hm: tuple[int, int]
) -> DataFrame:
    """Inclusive time-of-day band, pandas ``between_time`` semantics
    (intra_day_arbitrage.ipynb:92, cell 6 — the 14:30–16:30 UTC session).

    Compared at second-of-day resolution: pandas compares full times, so a
    16:30:45 row is OUTSIDE a band ending 16:30 — a whole-minute compare
    would wrongly include it (the reference's 5-minute bars never hit this,
    but the op is documented as general between_time)."""
    ts = F.col(ts_col)
    lo = (start_hm[0] * 60 + start_hm[1]) * 60
    hi = (end_hm[0] * 60 + end_hm[1]) * 60
    s = minute_of_day(ts) * 60 + F.second(ts)
    return df.filter(s.between(lo, hi))


def safe_div_pandas(num: Column, den: Column) -> Column:
    """Division with pandas semantics: x/0 → ±inf, 0/0 → NaN.

    Spark returns NULL on /0; the reference relies on numpy's ±inf and then
    replaces them (stock_arbitrage.ipynb:268, cell 5 — quirk K.4). Emulate
    so downstream `replace_inf` sees what pandas would produce.
    """
    return (
        # NULL in/NULL out (pandas has no NULL; NULL plays missing ≡ NaN
        # for downstream dropna)
        F.when(num.isNull() | den.isNull(), F.lit(None).cast("double"))
        .when(den != 0, num / den)  # den NaN lands here (NaN != 0) → NaN out
        # den == 0 below; NaN num must short-circuit because Spark orders
        # NaN ABOVE all numbers (NaN > 0 is true), unlike pandas.
        .when(F.isnan(num), F.lit(float("nan")))
        .when(num > 0, F.lit(_POS_INF))
        .when(num < 0, F.lit(_NEG_INF))
        .otherwise(F.lit(float("nan")))
    )


def replace_inf(df: DataFrame, cols: list[str], value: float = 0.0) -> DataFrame:
    """``.replace([np.inf, -np.inf], value)`` (stock_arbitrage.ipynb:268)."""
    out = df
    for c in cols:
        out = out.withColumn(
            c,
            F.when(F.col(c).isin(_POS_INF, _NEG_INF), F.lit(value)).otherwise(F.col(c)),
        )
    return out


def drop_nulls(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """``dropna()`` (stock_arbitrage.ipynb:268; intra_day_arbitrage.ipynb:11123)."""
    return df.na.drop(subset=cols)
