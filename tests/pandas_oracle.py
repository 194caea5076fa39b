"""Vendored-reference test oracle: pandas implementations that follow the
published pipelines step by step (stock_arbitrage.ipynb cells 1-6;
intra_day_arbitrage.ipynb cells 3-8), executed on synthetic fixtures.

These exist ONLY to gate the Spark engine's golden-replication tests —
the structure deliberately mirrors pandas idioms (wide frames, iterrows,
between_time, groupby(index.day)) that the engine replaces with Catalyst
plans, so any semantic drift in the engine shows up as a diff here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ira_reference import ReferenceIntradayTrader, sod_time


# ---------------------------------------------------------------------------
# EP1 — daily pairs (independent of the engine's scan implementation)
# ---------------------------------------------------------------------------


def ep1_prepare(bars: pd.DataFrame, t1: str, t2: str, ratio: float, from_year: str):
    """Cells 1/3/5: wide series, delta, log returns, dropna, inf→0."""
    wide = bars.pivot(index="ts", columns="ticker", values="close").sort_index()
    a1 = wide[t1][from_year:]
    a2 = wide[t2][from_year:] * ratio
    frame = pd.DataFrame({"close2": a2})
    frame["delta"] = (a2 - a1) / a2
    # the reference ran on old pandas where pct_change() defaulted to
    # fill_method='pad'; pin that behavior explicitly (ffill-then-diff)
    frame["ret2"] = np.log(1 + a2.ffill().pct_change(fill_method=None))
    frame["ret1"] = np.log(1 + a1.ffill().pct_change(fill_method=None))
    frame = frame.dropna().replace([np.inf, -np.inf], 0.0)
    return frame


def ep1_scan(frame: pd.DataFrame, buy_at: float, fees: float) -> pd.DataFrame:
    """Cell 6: the sequential trade scan, row by row."""
    arbitrage = False
    sign = 0.0
    out = []
    pos_label = None
    for label, row in frame.iterrows():
        if not arbitrage and np.abs(row.delta) >= buy_at:
            loc = frame.index.get_loc(label)
            if loc + 1 < len(frame):
                arbitrage = True
                sign = np.sign(row.delta)
                pos_label = frame.index[loc + 1]
        if arbitrage and sign * row.delta <= 0.0:
            cum = (
                -sign * frame.ret2[pos_label:label].sum()
                + sign * frame.ret1[pos_label:label].sum()
            )
            out.append((pos_label, label, cum - fees))
            arbitrage = False
            sign = 0.0
    return pd.DataFrame(out, columns=["open_date", "end_date", "return"])


# ---------------------------------------------------------------------------
# EP2 — intraday feed + trade loop (validates the engine's Catalyst feed)
# ---------------------------------------------------------------------------


def _normalize(col: pd.Series) -> pd.Series:
    return (col - col.min()) / (col.max() - col.min())


def ep2_run_company(
    bars: pd.DataFrame,
    fx: pd.DataFrame,
    blocks: pd.DataFrame,
    tickers: list[str],
    params: dict,
):
    """The trade() loop of cell 8 for one company: per block build price and
    normalized-return frames, per day-of-month group slice the session,
    base the returns, and feed ticks sequentially.

    The expected side is the ENGINE-INDEPENDENT reference transcription
    (ira_reference.py), not the engine's own TraderState — a ledger bug
    shared with the engine cannot hide here (VERDICT r9 missing #2)."""
    trader = ReferenceIntradayTrader(**params)
    fx_series = fx.set_index("ts")["rate"].sort_index()
    history: list[tuple] = []

    for _, blk in blocks.sort_values("block_id").iterrows():
        in_block = bars[(bars.ts >= blk.start_ts) & (bars.ts < blk.end_ts)]
        cols = {
            t: in_block[in_block.ticker == t].set_index("ts")["close"].sort_index()
            for t in tickers
        }
        price_df = pd.concat(cols.values(), axis=1)
        price_df.columns = tickers
        eur = fx_series.reindex(price_df.index).ffill()
        to_convert = [t for t in tickers if "." in t]
        price_df.loc[:, to_convert] = price_df.loc[:, to_convert].multiply(eur, axis=0)

        return_df = pd.concat(cols.values(), axis=1)
        return_df.columns = tickers
        for c in return_df.columns:
            return_df[c] = _normalize(return_df[c])

        def trading_days(df):
            filled = df.ffill()
            return [
                grp.between_time("14:30", "16:30")
                for _, grp in filled.groupby(filled.index.day)
            ]

        for td_ret, td_price in zip(trading_days(return_df), trading_days(price_df)):
            base = td_ret.iloc[:, 0].ffill()
            diff = td_ret.iloc[:, 1:].div(base, axis=0) - 1
            for idx in diff.index:
                price_data = td_price.loc[idx].values.flatten().tolist()
                return_data = diff.loc[idx].values.flatten().tolist()
                sod = idx.hour * 3600 + idx.minute * 60 + idx.second
                trader.data_feed(sod_time(sod), return_data, price_data, tickers)
                history.append((idx, trader.balance))
    return trader.trades, history
