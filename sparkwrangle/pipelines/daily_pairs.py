"""EP1 — daily dual-listing pairs arbitrage (stock_arbitrage.ipynb).

Pipeline (SURVEY.md §3 EP1): per-ticker daily bars → time slice (B1) →
ratio scaling (B2) → ts-aligned delta (C2) → log returns (W2) → dropna +
±inf→0 (B6/B7, in the reference's exact order: dropna THEN replace) →
sequential pair scan (S1) → compounded return (D4).

Everything before the S1 UDF is pure Catalyst: filters and the ratio
projection push into the parquet scan; the join is a sort-merge (or
broadcast at small SF via AQE) on ts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkwrangle.ops.filters import replace_inf, safe_div_pandas
from sparkwrangle.stateful.pairs_scan import pairs_trade_scan

_INF, _NINF = float("inf"), float("-inf")


def _log1p(x: F.Column) -> F.Column:
    """np.log(1 + x) with pandas semantics: log(0) → -inf, log(<0) → NaN
    (Spark's built-in log yields NULL for both, which would change dropna
    behavior). Computed literally as log(1 + x) for bit-parity with the
    reference's np.log(1 + pct_change())."""
    arg = F.lit(1.0) + x
    return (
        F.when(arg > 0, F.log(arg))
        .when(arg == 0, F.lit(_NINF))
        .when(arg < 0, F.lit(float("nan")))
    )


def _pad_returns(df: DataFrame, w, out_col: str) -> DataFrame:
    """log(1 + pct_change()) with pandas' (legacy-default) fill_method='pad':
    forward-fill the close, then v_ff[i]/v_ff[i-1] - 1 — a NaN bar yields a
    0.0 return and the next real bar diffs against the last REAL close.
    NaN closes are nullified before the ignorenulls ffill. Stepwise
    withColumns because window expressions cannot nest."""
    clean = F.when(~F.isnan(F.col("close")), F.col("close"))
    df = df.withColumn(
        "__ff",
        F.last(clean, ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    df = df.withColumn("__prev", F.lag("__ff").over(w))
    pct = safe_div_pandas(F.col("__ff"), F.col("__prev")) - 1
    return df.withColumn(out_col, _log1p(pct)).drop("__ff", "__prev")


def prepare_pair(
    bars: DataFrame,
    ticker1: str,
    ticker2: str,
    ratio: float = 1500.0,
    from_ts: str | None = "2006-01-01",
    pair_name: str | None = None,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Build the prepared pair frame (ts, delta, ret1, ret2) the S1 scan
    consumes. Matches stock_arbitrage.ipynb cells 1/3/5:

    * asset2 is scaled by ``ratio`` BEFORE returns (the reference multiplies
      the whole frame, cell 1) — fp-identical to pandas.
    * ret1 (asset1 log returns) is computed over asset1's OWN row sequence,
      then aligned onto asset2's timestamps (pandas index alignment on
      column assignment, cell 5).
    * delta = (c2 - c1)/c2 on asset2's timestamps, NaN where asset1 absent.
    * dropna over (delta, ret1, ret2), THEN ±inf → 0.0 (cell 5 order).
    """
    keys = list(extra_keys or [])
    if from_ts is not None:
        bars = bars.filter(F.col("ts") >= F.lit(from_ts))
    w = Window.partitionBy(*keys, "ticker").orderBy("ts")

    a1 = _pad_returns(bars.filter(F.col("ticker") == ticker1), w, "ret1").select(
        *keys, "ts", F.col("close").alias("c1"), "ret1"
    )
    a2 = bars.filter(F.col("ticker") == ticker2).withColumn(
        "close", F.col("close") * F.lit(ratio)
    )
    a2 = _pad_returns(a2, w, "ret2").select(
        *keys, "ts", F.col("close").alias("c2"), "ret2"
    )
    joined = a2.join(a1, on=[*keys, "ts"], how="left")
    prepared = joined.withColumn(
        "delta", safe_div_pandas(F.col("c2") - F.col("c1"), F.col("c2"))
    )
    # pandas dropna treats NaN and missing alike; Spark must drop NaN too.
    cond = None
    for c in ["delta", "ret1", "ret2"]:
        k = F.col(c).isNotNull() & ~F.isnan(c)
        cond = k if cond is None else (cond & k)
    prepared = prepared.filter(cond)
    prepared = replace_inf(prepared, ["delta", "ret1", "ret2"], 0.0)
    if not keys:
        prepared = prepared.withColumn("pair", F.lit(pair_name or f"{ticker1}/{ticker2}"))
        keys = ["pair"]
    return prepared.select(*keys, "ts", "delta", "ret1", "ret2")


def daily_pairs_backtest(
    bars: DataFrame,
    ticker1: str,
    ticker2: str,
    ratio: float = 1500.0,
    buy_at: float = 0.005,
    fees: float = 0.0,
    from_ts: str | None = "2006-01-01",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Full EP1: prepared pair → S1 scan → trades table
    (open_date, end_date, return)."""
    prepared = prepare_pair(bars, ticker1, ticker2, ratio, from_ts, extra_keys=extra_keys)
    keys = list(extra_keys or []) or ["pair"]
    return pairs_trade_scan(prepared, buy_at=buy_at, fees=fees, keys=keys)


def compounded_return_pct(trades: DataFrame) -> DataFrame:
    """Cell 8: ``np.exp(returns).product() * 100`` — exp of the sum."""
    return trades.agg((F.exp(F.sum("return")) * 100).alias("return_pct"))
