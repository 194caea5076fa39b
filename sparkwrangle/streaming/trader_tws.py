"""Spark 4 ``transformWithStateInPandas`` twin of the streaming trader.

Same per-tick protocol, same state encoding, same partial-tick buffering
as ``trader_stream.streaming_backtest_trades`` — hosted in the new
StatefulProcessor API instead of ``applyInPandasWithState``. The shared
``_decode_state``/``_encode_state``/``_split_ticks`` codecs guarantee the
two operators cannot drift; the parity test replays the same feed through
both.

Why ship both: transformWithState is the forward path (typed state
variables, timers, TTL, initial-state bootstrap, RocksDB-only), while
applyInPandasWithState remains the broadly-deployed API. An engine
claiming streaming capability parity should run on either.

Requires the RocksDB state store provider:
``spark.sql.streaming.stateStore.providerClass =
org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``
— and the ``protobuf`` package (transformWithState's python runner
speaks protobuf to the JVM). This container ships neither protobuf nor a
way to install it, so the parity test skips here; on a standard Spark 4
deployment it runs. The shared codec keeps the two operators in
lock-step regardless.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from sparkwrangle.stateful.trader import TraderState
from sparkwrangle.streaming.trader_stream import (
    _OUT_SCHEMA,
    _STATE_SCHEMA,
    _decode_state,
    _encode_state,
    _split_ticks,
)

# transformWithState value-state schema IS the applyInPandasWithState
# tuple schema — imported, not re-declared, so a state-tuple change
# cannot drift the two operators apart (the codecs are shared verbatim).
_TWS_STATE_SCHEMA = _STATE_SCHEMA

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class TraderProcessor(StatefulProcessor):
    """The S2 trader as a Spark 4 StatefulProcessor (value state +
    micro-batch tick replay; no timers — the market-close flush stays an
    applyInPandasWithState feature until timer parity is needed)."""

    def __init__(self, params: dict):
        self._params = params

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("trader", _TWS_STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        company = key[0]
        if self._state.exists():
            st, seen, last_prices, deadline, n_idx, pending = _decode_state(
                self._state.get(), self._params
            )
        else:
            st = TraderState(**self._params)
            seen, last_prices, deadline, n_idx, pending = 0, [], 0, 0, None

        pdf = pd.concat(list(rows), ignore_index=True)
        if len(pdf) == 0 and pending is None:
            return
        groups, n_idx, pending = _split_ticks(pdf, n_idx, pending)
        before = len(st.trades)
        for _, tick in groups:
            by_idx = tick.set_index("ticker_idx")
            prices = [
                float(by_idx["price"].get(i, float("nan"))) for i in range(n_idx)
            ]
            rets = [
                float(by_idx["ret"].get(i, float("nan"))) for i in range(1, n_idx)
            ]
            ts = tick["ts"].iloc[0]
            sod = ts.hour * 3600 + ts.minute * 60 + ts.second
            st.data_feed(sod, rets, prices)
            last_prices = prices

        new_trades = st.trades[before:]
        self._state.update(
            _encode_state(
                st, seen + len(new_trades), last_prices, deadline, n_idx, pending
            )
        )
        yield pd.DataFrame(
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

    def close(self) -> None:
        pass


def tws_backtest_trades(feed_stream: DataFrame, params: dict) -> DataFrame:
    """S2 over a stream via transformWithStateInPandas — drop-in output
    parity with ``streaming_backtest_trades``."""
    return feed_stream.groupBy("company").transformWithStateInPandas(
        statefulProcessor=TraderProcessor(params),
        outputStructType=_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
