"""Deterministic synthetic fixtures per FIXTURES.md §A (seed 42).

The reference fetches everything from Yahoo Finance at run time
(non-reproducible), so golden-replication tests run on these stand-ins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def bars_daily(n_days: int = 1000, seed: int = 42, zero_close: bool = True) -> pd.DataFrame:
    """A1: two tickers of daily closes; second ≈ first/1500 + mean-reverting
    noise so |delta| crosses 0.005; ~1% NaN and one zero close (K.4,
    disable with zero_close=False for comparisons against engines that
    lack pandas' x/0 → inf semantics)."""
    rng = np.random.default_rng(seed)
    idx = pd.bdate_range("2006-01-02", periods=n_days, tz="UTC")
    steps = rng.normal(0.0003, 0.012, n_days)
    a = 100000.0 * np.exp(np.cumsum(steps))
    spread = np.zeros(n_days)
    for i in range(1, n_days):
        spread[i] = 0.92 * spread[i - 1] + rng.normal(0, 0.004)
    b = a / 1500.0 * (1.0 + spread)
    a_nan = rng.random(n_days) < 0.01
    b_nan = rng.random(n_days) < 0.01
    a = np.where(a_nan, np.nan, a)
    b = np.where(b_nan, np.nan, b)
    if zero_close:
        b[n_days // 2] = 0.0  # one zero close → /0 → inf → 0.0 path
    rows = []
    for tkr, closes in (("AAA", a), ("BBB", b)):
        for t, c in zip(idx, closes):
            rows.append((tkr, t, c))
    return pd.DataFrame(rows, columns=["ticker", "ts", "close"])


def intraday_fixture(seed: int = 42):
    """A2-A5: 3 companies × 2-3 tickers × 2 weekly blocks of 5-min bars,
    EU tickers ('.') in EUR; sparse fx series; missing (ticker, ts) rows.

    Returns (bars, fx, blocks, listings) pandas frames, ts tz-aware UTC.
    """
    rng = np.random.default_rng(seed)
    companies = {
        "Alpha": ["ALF", "ALF.DE", "ALF.F"],
        "Beta": ["BET", "BET.DE"],
        "Gamma": ["GAM", "GAM.PA"],
    }
    blocks = []
    starts = [pd.Timestamp("2022-12-26", tz="UTC"), pd.Timestamp("2023-01-02", tz="UTC")]
    for bi, s in enumerate(starts):
        blocks.append((bi, s, s + pd.Timedelta(days=7)))
    blocks_df = pd.DataFrame(blocks, columns=["block_id", "start_ts", "end_ts"])

    # 5-min grid 13:30–17:30 UTC per business day → spans the 14:30–16:30
    # session plus out-of-session rows (normalization must include them)
    all_ts = []
    for _, s, e in blocks:
        days = pd.bdate_range(s, e - pd.Timedelta(days=1), tz="UTC")
        for d in days:
            all_ts.append(
                pd.date_range(
                    d + pd.Timedelta(hours=13, minutes=30),
                    d + pd.Timedelta(hours=17, minutes=30),
                    freq="5min",
                    tz="UTC",
                )
            )
    grid = pd.DatetimeIndex(np.concatenate([t.values for t in all_ts])).tz_localize("UTC")

    fx_mask = rng.random(len(grid)) < 0.6  # sparser + offset vs bars
    fx_rate = 1.05 + np.cumsum(rng.normal(0, 0.0005, len(grid)))
    fx_df = pd.DataFrame({"ts": grid[fx_mask], "rate": fx_rate[fx_mask]})

    rows = []
    listings = []
    for company, tickers in companies.items():
        base_usd = 100.0 * np.exp(np.cumsum(rng.normal(0, 0.002, len(grid))))
        for k, tkr in enumerate(tickers):
            listings.append((company, tkr, k))
            # deviations around base large enough to cross min_deviation=0.1
            # after min-max normalization and base-ratio
            dev = np.zeros(len(grid))
            for i in range(1, len(grid)):
                dev[i] = 0.97 * dev[i - 1] + rng.normal(0, 0.012)
            px = base_usd * (1.0 + (0.0 if k == 0 else dev))
            if "." in tkr:
                px = px / 1.05  # quoted in EUR
            present = rng.random(len(grid)) > 0.06  # missing rows → ffill
            for t, p, keep in zip(grid, px, present):
                if keep:
                    rows.append((company, tkr, t, float(p)))
    bars_df = pd.DataFrame(rows, columns=["company", "ticker", "ts", "close"])
    listings_df = pd.DataFrame(listings, columns=["company", "ticker", "ticker_idx"])
    return bars_df, fx_df, blocks_df, listings_df


TRADER_PARAMS = dict(
    bal=1000.0,
    min_deviation=0.1,
    sl_percent=0.03,
    trigger_range=0.01,
    trade_size=0.1,
    trade_size_percent=True,
)


def bars_for_listings(listings: dict[str, list[str]], seed: int = 11):
    """Synthetic 5-min bars for arbitrary (company → ordered tickers)
    structures — used to drive EP2 over the REAL workbook's ticker shapes
    (6-deep Ryanair, EU-based Casio) beyond the 3-company fixture."""
    rng = np.random.default_rng(seed)
    start = pd.Timestamp("2023-01-02", tz="UTC")
    days = pd.bdate_range(start, start + pd.Timedelta(days=6), tz="UTC")
    grid = pd.DatetimeIndex(
        np.concatenate(
            [
                pd.date_range(
                    d + pd.Timedelta(hours=14),
                    d + pd.Timedelta(hours=17),
                    freq="5min",
                    tz="UTC",
                ).values
                for d in days
            ]
        )
    ).tz_localize("UTC")
    blocks = pd.DataFrame(
        [(0, start, start + pd.Timedelta(days=7))],
        columns=["block_id", "start_ts", "end_ts"],
    )
    fx_mask = rng.random(len(grid)) < 0.5
    fx = pd.DataFrame(
        {"ts": grid[fx_mask], "rate": 1.08 + np.cumsum(rng.normal(0, 0.0004, fx_mask.sum()))}
    )
    rows, listing_rows = [], []
    for company, tickers in listings.items():
        base = 80.0 * np.exp(np.cumsum(rng.normal(0, 0.0025, len(grid))))
        for k, tkr in enumerate(tickers):
            listing_rows.append((company, tkr, k))
            dev = np.zeros(len(grid))
            for i in range(1, len(grid)):
                dev[i] = 0.96 * dev[i - 1] + rng.normal(0, 0.015)
            px = base * (1.0 + (0.0 if k == 0 else dev))
            if "." in tkr:
                px = px / 1.08
            present = rng.random(len(grid)) > 0.05
            for t, p, keep in zip(grid, px, present):
                if keep:
                    rows.append((company, tkr, t, float(p)))
    return (
        pd.DataFrame(rows, columns=["company", "ticker", "ts", "close"]),
        fx,
        blocks,
        pd.DataFrame(listing_rows, columns=["company", "ticker", "ticker_idx"]),
    )
