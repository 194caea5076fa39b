"""Streaming twin of the S2 intraday trader (SURVEY.md §2.J, M4).

Same per-tick protocol as ``stateful.trader.TraderState``, hosted in
``applyInPandasWithState`` keyed by company: state (balance, open
positions, ledgers) persists across micro-batches in Spark's state store;
each batch appends the trades it closed. Parity contract (tested):
replaying a batch feed through the stream in order yields exactly the
batch operator's trade log.

Late/out-of-order data: the reference has no late-data semantics (ffill
is its only robustness), so the operator processes rows in feed_seq order
WITHIN a batch and trusts batch boundaries to be ordered — the production
deployment puts ``withWatermark('ts', ...)`` upstream and a monotonic
feed_seq in the source (e.g. Kafka partition offsets per company).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from sparkwrangle.stateful.trader import TraderState

_OUT_SCHEMA = "company string, trade_seq int, close_type string, roi double"
_STATE_SCHEMA = (
    "balance double, cpt string, shares string, base_shares string, n_trades int"
)


def _restore(state: GroupState, params: dict) -> tuple[TraderState, int]:
    st = TraderState(**params)
    if state.exists:
        balance, cpt_s, shares_s, base_s, n_trades = state.get
        st.balance = balance
        st.cpt = json.loads(cpt_s)
        st.shares = {int(k): v for k, v in json.loads(shares_s).items()}
        st.base_shares = {int(k): v for k, v in json.loads(base_s).items()}
        return st, n_trades
    return st, 0


def _persist(state: GroupState, st: TraderState, n_trades: int) -> None:
    state.update(
        (
            st.balance,
            json.dumps(st.cpt),
            json.dumps(st.shares),
            json.dumps(st.base_shares),
            n_trades,
        )
    )


def streaming_backtest_trades(feed_stream: DataFrame, params: dict) -> DataFrame:
    """S2 over a stream: feed rows (company, feed_seq, ts, ticker_idx,
    price, ret) → appended trade rows as positions close."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        company = key[0]
        st, seen = _restore(state, params)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:
            _persist(state, st, seen)
            return
        pdf = pdf.sort_values(["feed_seq", "ticker_idx"], kind="mergesort")
        n_idx = int(pdf["ticker_idx"].max()) + 1
        before = len(st.trades)
        for _, tick in pdf.groupby("feed_seq", sort=True):
            by_idx = tick.set_index("ticker_idx")
            prices = [
                float(by_idx["price"].get(i, float("nan"))) for i in range(n_idx)
            ]
            rets = [float(by_idx["ret"].get(i, float("nan"))) for i in range(1, n_idx)]
            ts = tick["ts"].iloc[0]
            sod = ts.hour * 3600 + ts.minute * 60 + ts.second
            st.data_feed(sod, rets, prices)
        new_trades = st.trades[before:]
        out = pd.DataFrame(
            [
                {
                    "company": company,
                    "trade_seq": seen + i,
                    "close_type": t,
                    "roi": r,
                }
                for i, (t, r) in enumerate(new_trades)
            ],
            columns=["company", "trade_seq", "close_type", "roi"],
        )
        _persist(state, st, seen + len(new_trades))
        yield out

    return (
        feed_stream.groupBy("company")
        .applyInPandasWithState(
            fn, _OUT_SCHEMA, _STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )
    )
