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
    "balance double, cpt string, shares string, base_shares string, n_trades int, "
    "last_prices string, deadline_ms bigint, n_idx int, pending string"
)

_MARKET_CLOSE_SEC = 16 * 3600 + 29 * 60 + 1  # first second past 16:29:00


def _decode_state(
    tup, params: dict
) -> tuple[TraderState, int, list, int, int, "pd.DataFrame | None"]:
    """Shared state codec: tuple (in _STATE_SCHEMA order) → live trader.
    Used by both the applyInPandasWithState operator and the Spark 4
    transformWithStateInPandas twin, so the two APIs can never drift."""
    st = TraderState(**params)
    (
        balance,
        cpt_s,
        shares_s,
        base_s,
        n_trades,
        prices_s,
        deadline,
        n_idx,
        pending_s,
    ) = tup
    st.balance = balance
    st.cpt = json.loads(cpt_s)
    st.shares = {int(k): v for k, v in json.loads(shares_s).items()}
    st.base_shares = {int(k): v for k, v in json.loads(base_s).items()}
    return (
        st,
        n_trades,
        json.loads(prices_s),
        deadline or 0,
        n_idx or 0,
        _pending_from_json(pending_s),
    )


def _encode_state(
    st: TraderState,
    n_trades: int,
    last_prices: list,
    deadline_ms: int = 0,
    n_idx: int = 0,
    pending: "pd.DataFrame | None" = None,
) -> tuple:
    return (
        st.balance,
        json.dumps(st.cpt),
        json.dumps(st.shares),
        json.dumps(st.base_shares),
        n_trades,
        json.dumps(last_prices),
        deadline_ms,
        n_idx,
        _pending_to_json(pending),
    )


def _restore(
    state: GroupState, params: dict
) -> tuple[TraderState, int, list, int, int, "pd.DataFrame | None"]:
    if state.exists:
        return _decode_state(state.get, params)
    return TraderState(**params), 0, [], 0, 0, None


def _persist(
    state: GroupState,
    st: TraderState,
    n_trades: int,
    last_prices: list,
    deadline_ms: int = 0,
    n_idx: int = 0,
    pending: "pd.DataFrame | None" = None,
) -> None:
    state.update(
        _encode_state(st, n_trades, last_prices, deadline_ms, n_idx, pending)
    )


def _pending_to_json(pending: "pd.DataFrame | None") -> str:
    if pending is None or len(pending) == 0:
        return "[]"
    rows = [
        {
            "company": str(r.company),
            "feed_seq": int(r.feed_seq),
            "ts": int(pd.Timestamp(r.ts).value),  # exact ns epoch
            "ticker_idx": int(r.ticker_idx),
            "price": float("nan") if pd.isna(r.price) else float(r.price),
            "ret": float("nan") if pd.isna(r.ret) else float(r.ret),
        }
        for r in pending.itertuples()
    ]
    return json.dumps(rows)  # json emits NaN literals; json.loads accepts them


def _pending_from_json(s: str) -> "pd.DataFrame | None":
    rows = json.loads(s or "[]")
    if not rows:
        return None
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pd.to_datetime(pdf["ts"].astype("int64"))
    return pdf


def _split_ticks(
    pdf: pd.DataFrame, n_idx_state: int, pending: "pd.DataFrame | None"
) -> tuple[list, int, "pd.DataFrame | None"]:
    """Order this batch's rows (prepending any buffered partial tick), grow
    the persisted universe size, and hold back a trailing incomplete tick.

    A feed_seq whose rows straddle a micro-batch boundary must not be
    played half-delivered: missing ticker indices would feed NaN prices
    into persisted state, and a batch-local ``max(ticker_idx)`` could
    shrink the universe below an open position's index (IndexError in
    price_check/close_trade). The universe size is therefore monotone
    state, every tick is padded to it, and the LAST tick of a batch is
    buffered until all its ticker_idx rows have arrived (earlier ticks
    play as-is — feed order means their missing rows can never come).

    FEED CONTRACT: ticks are DENSE — the feed builder emits one row per
    (tick, ticker) for the whole universe (pipelines/intraday.py does).
    Completeness of the trailing tick is judged by index coverage, so a
    deliberately sparse FINAL tick would be indistinguishable from rows
    still in flight and stay buffered through end-of-stream (a sparse
    non-final tick is fine: the next tick's arrival releases it). Feeds
    with genuinely sparse ticks need an explicit end-of-tick marker,
    which this synthetic-replay surface does not model.
    """
    if pending is not None:
        pdf = pd.concat([pending, pdf], ignore_index=True)
    pdf = pdf.sort_values(["feed_seq", "ticker_idx"], kind="mergesort")
    n_idx = max(n_idx_state, int(pdf["ticker_idx"].max()) + 1)
    groups = list(pdf.groupby("feed_seq", sort=True))
    new_pending = None
    if groups:
        _, last_tick = groups[-1]
        if {int(x) for x in last_tick["ticker_idx"]} != set(range(n_idx)):
            new_pending = last_tick
            groups = groups[:-1]
    return groups, n_idx, new_pending


def streaming_backtest_trades(
    feed_stream: DataFrame,
    params: dict,
    market_close_flush: bool = False,
    watermark: str = "10 minutes",
) -> DataFrame:
    """S2 over a stream: feed rows (company, feed_seq, ts, ticker_idx,
    price, ret) → appended trade rows as positions close.

    ``market_close_flush=True`` arms an EVENT-TIME TIMER (SURVEY §2.J /
    W7): if positions are still open and no tick past 16:29 ever arrives
    (a halted feed), the timer fires once the watermark passes that day's
    16:29:01 and force-closes every position as 'mc' at the last seen
    prices. This is an engine extension over batch semantics — the batch
    operator can only close on an actual tick.
    """

    def _emit(company, st, seen, new_trades):
        return pd.DataFrame(
            [
                {"company": company, "trade_seq": seen + i, "close_type": t, "roi": r}
                for i, (t, r) in enumerate(new_trades)
            ],
            columns=["company", "trade_seq", "close_type", "roi"],
        )

    def _flush(st, last_prices):
        """Force-close every open position at the last seen prices
        (a timer fires once, so the corrected close loop applies)."""
        if st.cpt and last_prices:
            base, arbs = last_prices[0], last_prices[1:]
            for i in list(st.cpt):
                st._close_trade(i, "mc", arbs, base)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        company = key[0]
        st, seen, last_prices, deadline, n_idx, pending = _restore(state, params)

        if market_close_flush and state.hasTimedOut:
            before = len(st.trades)
            _flush(st, last_prices)
            new_trades = st.trades[before:]
            _persist(state, st, seen + len(new_trades), last_prices, 0, n_idx, pending)
            yield _emit(company, st, seen, new_trades)
            return

        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0 and pending is None:
            _persist(state, st, seen, last_prices, deadline, n_idx, pending)
            return
        groups, n_idx, pending = _split_ticks(pdf, n_idx, pending)
        before = len(st.trades)
        last_ts = None
        for _, tick in groups:
            by_idx = tick.set_index("ticker_idx")
            prices = [
                float(by_idx["price"].get(i, float("nan"))) for i in range(n_idx)
            ]
            rets = [float(by_idx["ret"].get(i, float("nan"))) for i in range(1, n_idx)]
            ts = tick["ts"].iloc[0]
            last_ts = ts
            sod = ts.hour * 3600 + ts.minute * 60 + ts.second
            st.data_feed(sod, rets, prices)
            last_prices = prices

        if market_close_flush:
            wm = state.getCurrentWatermarkMs()
            if not st.cpt:
                deadline = 0
            else:
                if deadline == 0 and last_ts is not None:
                    # arm at the market close of the day the position is
                    # open on — the deadline does NOT roll forward; a
                    # position carried past its day's close is flushed as
                    # soon as the watermark proves no closing tick came
                    day = last_ts.normalize()
                    close_ts = day + pd.Timedelta(seconds=_MARKET_CLOSE_SEC)
                    if last_ts >= close_ts:
                        close_ts += pd.Timedelta(days=1)
                    deadline = int(close_ts.timestamp() * 1000)
                if deadline <= wm:
                    # watermark already past the close → flush inline (a
                    # timer for the past cannot be registered)
                    _flush(st, last_prices)
                    deadline = 0
                else:
                    # timers are cleared on every invocation — re-register
                    state.setTimeoutTimestamp(deadline)
        new_trades = st.trades[before:]
        _persist(
            state, st, seen + len(new_trades), last_prices, deadline, n_idx, pending
        )
        yield _emit(company, st, seen, new_trades)

    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if market_close_flush
        else GroupStateTimeout.NoTimeout
    )
    src = (
        feed_stream.withWatermark("ts", watermark)
        if market_close_flush
        else feed_stream
    )
    return src.groupBy("company").applyInPandasWithState(
        fn, _OUT_SCHEMA, _STATE_SCHEMA, "append", timeout
    )


_BAL_SCHEMA = "company string, ts timestamp, balance double"


def streaming_backtest_balances(feed_stream: DataFrame, params: dict) -> DataFrame:
    """Streaming twin of backtest_balances: one (company, ts, balance) row
    per tick as batches arrive — the live equity curve. Same state
    encoding as the trades operator, so the two can't drift."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        company = key[0]
        st, seen, last_prices, deadline, n_idx, pending = _restore(state, params)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0 and pending is None:
            _persist(state, st, seen, last_prices, deadline, n_idx, pending)
            return
        groups, n_idx, pending = _split_ticks(pdf, n_idx, pending)
        history = []
        for _, tick in groups:
            by_idx = tick.set_index("ticker_idx")
            prices = [
                float(by_idx["price"].get(i, float("nan"))) for i in range(n_idx)
            ]
            rets = [float(by_idx["ret"].get(i, float("nan"))) for i in range(1, n_idx)]
            ts = tick["ts"].iloc[0]
            sod = ts.hour * 3600 + ts.minute * 60 + ts.second
            st.data_feed(sod, rets, prices)
            last_prices = prices
            history.append({"company": company, "ts": ts, "balance": st.balance})
        _persist(state, st, seen + 0, last_prices, deadline, n_idx, pending)
        yield pd.DataFrame(history, columns=["company", "ts", "balance"])

    return feed_stream.groupBy("company").applyInPandasWithState(
        fn, _BAL_SCHEMA, _STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
