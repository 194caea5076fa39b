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
    df = _pad_log_arg(df, w, "__arg")
    return df.withColumn(out_col, _log1p_from_arg(F.col("__arg"))).drop("__arg")


def _pad_log_arg(df: DataFrame, w, out_col: str) -> DataFrame:
    """The log1p ARGUMENT of the pad-semantics return: 1 + pct_change(ffill).

    Split out from the log itself so that downstream dropna/±inf handling
    can be expressed as tiny predicates on this one column instead of
    re-inlining the full safe-div CASE tree per reference (the collapsed
    projections made the S1 dropna filter a multi-KB codegen unit — the
    driver's cold pass paid ~16 s of compilation for it; guide §1.2 step 2,
    "make the code inside each stage fast")."""
    clean = F.when(~F.isnan(F.col("close")), F.col("close"))
    df = df.withColumn(
        "__ff",
        F.last(clean, ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    df = df.withColumn("__prev", F.lag("__ff").over(w))
    pct = safe_div_pandas(F.col("__ff"), F.col("__prev")) - 1
    return df.withColumn(out_col, F.lit(1.0) + pct).drop("__ff", "__prev")


def _log1p_from_arg(arg: F.Column) -> F.Column:
    """_log1p expressed over the materialized argument column — branch
    structure identical to _log1p(pct) with arg = 1 + pct."""
    return (
        F.when(arg > 0, F.log(arg))
        .when(arg == 0, F.lit(_NINF))
        .when(arg < 0, F.lit(float("nan")))
    )


def _ret_kept(arg: F.Column) -> F.Column:
    """dropna keep-predicate for a pad-returns column, expressed on the
    log ARGUMENT: ret = _log1p(arg) is non-null and non-NaN exactly when
    arg >= 0 and arg is not NaN. Case-by-case against _log1p: arg NULL →
    ret NULL (dropped; arg >= 0 is NULL → filtered). arg NaN → Spark
    orders NaN above all doubles, so the arg > 0 branch fires and ret =
    log(NaN) = NaN (dropped; here ~isnan(arg) filters). arg < 0 → NaN
    (dropped). arg == 0 → -inf (KEPT by dropna — replaced by 0.0 later).
    arg in (0, inf] → log(arg) finite or +inf (kept). One comparison and
    one isnan instead of re-inlining the ~40-node safe-div/log CASE tree
    six times through the collapsed filter."""
    return (arg >= 0) & ~F.isnan(arg)


def _ret_final(arg: F.Column) -> F.Column:
    """ret AFTER dropna + replace([±inf], 0.0), for rows where _ret_kept:
    arg == +inf → log = +inf → 0.0; arg == 0 → -inf → 0.0; else (finite
    positive) log(arg), which is always finite (log of the smallest
    positive double is ≈ -744.44, never -inf). Bitwise identical to
    replace_inf(_log1p(arg)) on the kept rows."""
    return (
        F.when((arg == F.lit(_INF)) | (arg == F.lit(0.0)), F.lit(0.0))
        .otherwise(F.log(arg))
    )


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
    # Each leg is filtered to ONE ticker before its window, so the window
    # partition key only needs the extra keys — within a leg, (keys) and
    # (keys, ticker) group identical row sets. Dropping the constant
    # ticker key makes every exchange in the plan hash(keys): the two leg
    # windows, the a2⋈a1 join, and the downstream S1 groupBy(keys)
    # applyInPandas all share that clustering, so EnsureRequirements
    # inserts no re-shuffle between the windows and the Python stage
    # (guide §2.4: two operations keyed the same way share one exchange).
    # The no-keys case keeps ticker as the partition key as before (one
    # constant partition per leg — never a global window).
    w = Window.partitionBy(*(keys or ["ticker"])).orderBy("ts")

    a1 = _pad_log_arg(bars.filter(F.col("ticker") == ticker1), w, "__arg1").select(
        *keys, "ts", F.col("close").alias("c1"), "__arg1"
    )
    a2 = bars.filter(F.col("ticker") == ticker2).withColumn(
        "close", F.col("close") * F.lit(ratio)
    )
    a2 = _pad_log_arg(a2, w, "__arg2").select(
        *keys, "ts", F.col("close").alias("c2"), "__arg2"
    )
    joined = a2.join(a1, on=[*keys, "ts"], how="left")
    joined = joined.withColumn(
        "delta", safe_div_pandas(F.col("c2") - F.col("c1"), F.col("c2"))
    )
    # pandas dropna treats NaN and missing alike; Spark must drop NaN too.
    # For the two return columns the predicate is expressed on the log
    # ARGUMENT (_ret_kept — provably the same row set), which keeps the
    # collapsed filter's expression tree ~10x smaller than filtering on
    # the full log-return CASE trees; delta's own tree is small enough to
    # reference directly.
    prepared = joined.filter(
        F.col("delta").isNotNull()
        & ~F.isnan("delta")
        & _ret_kept(F.col("__arg1"))
        & _ret_kept(F.col("__arg2"))
    )
    prepared = replace_inf(prepared, ["delta"], 0.0)
    prepared = prepared.withColumn("ret1", _ret_final(F.col("__arg1"))).withColumn(
        "ret2", _ret_final(F.col("__arg2"))
    )
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
