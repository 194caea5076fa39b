"""Aggregations (SURVEY.md §2.D).

Everything here compiles to hash aggregates with map-side partial
aggregation; no UDAFs. At 100 TB the grouping keys are low-cardinality
(ticker, company, date) so partials collapse early and the shuffle is
tiny relative to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exceedance_share(df: DataFrame, col: str, threshold: float) -> DataFrame:
    """Share of rows with |col| >= threshold (D1):
    ``(delta.abs() >= pct).sum() / len(delta)``
    (stock_arbitrage.ipynb:73-74, cell 3)."""
    return df.agg(
        F.avg((F.abs(F.col(col)) >= F.lit(threshold)).cast("int")).alias("share")
    )


def compounded_return(df: DataFrame, ret_col: str) -> DataFrame:
    """Compounded total return over log-returns (D4):
    ``np.exp(returns).product()`` == exp(sum(returns)) — exact identity
    (stock_arbitrage.ipynb:468, cell 8)."""
    return df.agg(F.exp(F.sum(ret_col)).alias("compounded"))


def trade_report_cols(
    roi_col: str = "roi", type_col: str = "close_type"
) -> dict[str, F.Column]:
    """The cell-33 aggregate expressions, shared by ``trade_stats`` and
    ``pipelines.intraday.trade_report`` so the two report surfaces cannot
    drift (zero-roi trades count in NEITHER bucket — reference cell 33:
    a zero-roi close, e.g. mc at unchanged prices, is excluded from the
    win share on both sides of the ratio)."""
    roi, typ = F.col(roi_col), F.col(type_col)
    n_wins = F.count(F.when(roi > 0, 1))
    n_losses = F.count(F.when(roi < 0, 1))
    return {
        "n_wins": n_wins,
        "n_losses": n_losses,
        "win_share": n_wins / (n_wins + n_losses),
        "avg_profit": F.avg(F.when(roi > 0, roi)),
        "avg_loss": F.avg(F.when(roi < 0, roi)),
        "mc_loss_share": F.count(F.when((roi < 0) & (typ == "mc"), 1)) / n_losses,
    }


def trade_stats(df: DataFrame, roi_col: str = "roi", type_col: str = "close_type") -> DataFrame:
    """Single-pass conditional trade statistics (D7) — the cell-33 report
    (intra_day_arbitrage.ipynb:11686-11714): win share, avg profit/loss,
    market-close loss share."""
    c = trade_report_cols(roi_col, type_col)
    return df.agg(
        F.count("*").alias("n_trades"),
        *[c[k].alias(k) for k in ("win_share", "avg_profit", "avg_loss", "mc_loss_share")],
    )


def roi_report(df: DataFrame, balance_col: str, ts_col: str, keys: list[str] | None = None) -> DataFrame:
    """First/last + date-span ROI and annualization (D8)
    (intra_day_arbitrage.ipynb:11211-11215, cell 31)."""
    g = df.groupBy(*keys) if keys else df.groupBy()
    first_bal = F.min_by(balance_col, ts_col)
    last_bal = F.max_by(balance_col, ts_col)
    days = F.datediff(F.max(F.to_date(ts_col)), F.min(F.to_date(ts_col)))
    roi = last_bal / first_bal - 1
    return g.agg(
        roi.alias("roi"),
        days.alias("span_days"),
        (F.pow(roi + 1, 365.0 / days) - 1).alias("annualized_roi"),
    )


def portfolio_total(df: DataFrame, ts_col: str, balance_col: str) -> DataFrame:
    """Row-wise portfolio total (D5): in long format the axis-1 sum is just
    a groupBy(ts) sum (intra_day_arbitrage.ipynb:11190, cell 30)."""
    return df.groupBy(ts_col).agg(F.sum(balance_col).alias("total"))


def final_above_share(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    threshold: float,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Profitable-ticker share (D10): fraction of series whose final value
    beats the threshold (intra_day_arbitrage.ipynb:11708-11711).

    Pass ``tiebreak_col`` (a unique row id) whenever (keys, ts) is not
    provably unique: max_by on a tied ordering key keeps whichever row a
    partition delivers first — run-to-run nondeterminism."""
    order = F.struct(ts_col, tiebreak_col) if tiebreak_col else F.col(ts_col)
    finals = df.groupBy(*keys).agg(F.max_by(value_col, order).alias("final"))
    return finals.agg(
        F.avg((F.col("final") > F.lit(threshold)).cast("int")).alias("share_above")
    )
