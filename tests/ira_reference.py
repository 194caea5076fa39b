"""Engine-independent S2 behavioral oracle: a test-only transcription of
the reference trader class (IntradayRegionArbitrage.py:35-159).

Why this exists: the EP2 golden test previously imported the engine's own
``TraderState`` as its expected side, so a ledger bug shared by both sides
would have been invisible (VERDICT r9, "What's missing" #2). This module
reproduces the reference class's per-tick protocol with the reference's
own structure — ticker-keyed share dicts, one method per reference method,
the same floating-point expression shapes and evaluation order — so parity
failures localize to the ENGINE, never to a shared implementation.

Deliberately preserved reference quirks (same list as
``sparkwrangle/stateful/trader.py``, independently re-derived here):

* K.1 — ``check_opportunity`` triggers on ``ret > min_deviation`` only
  (no abs), so every triggered signal is long (ref :67-79).
* K.3 — one take-profit close per tick (the ``break`` at ref :117), and
  both the stop-loss sweep (ref :112) and the market-close sweep
  (ref :57-58, where ``tmp`` merely aliases the live position list)
  iterate a list that ``close_trade`` mutates — Python's
  skip-after-remove behavior is part of the semantics.
* Market close strictly after 16:29:00 (ref :152-159); a closing tick
  with open positions runs the TP/SL check FIRST, then force-closes the
  (live-list) remainder as ``'mc'`` (ref :51-59).
* Feed shape: ``tickers[0]`` is the base; ``price_data`` aligns with
  ``tickers``; ``return_data`` excludes the base (ref :44-49).

Ledger arithmetic keeps the reference's exact expression grouping so
parity with the engine is BITWISE, not approximate: open adds the two
legs as two separate ``+=`` (ref :98-99); close adds their negation as
one grouped sum (ref :137); roi is measured against the pre-close
balance (ref :139); order size is ``(size or size*balance) / n_open * 2``
left-associated (ref :90).

Test-only vendored oracle — never imported by the package (the
``tests-never-imported`` lint direction doesn't apply; this is the same
adjudicated class as ``pandas_oracle.py``).
"""

from __future__ import annotations

from datetime import time


class ReferenceIntradayTrader:
    """Per-tick state machine matching IntradayRegionArbitrage.py:5-159."""

    def __init__(
        self,
        bal: float,
        min_deviation: float,
        sl_percent: float,
        trigger_range: float,
        trade_size: float,
        trade_size_percent: bool = False,
    ):
        # parameter validation per ref :9-12
        assert min_deviation > 0
        assert sl_percent > 0
        assert min_deviation > trigger_range > 0
        assert trade_size < 1 if trade_size_percent else True

        self.min_deviation = min_deviation
        self.sl_percent = sl_percent
        self.trigger_range = trigger_range
        self.trade_size_percent = trade_size_percent
        self.trade_size = trade_size

        self.balance = bal
        self.tickers: list = []
        self.base_ticker: str = ""
        self.trades: list = []
        self.shares: dict = {}  # keyed by arb ticker SYMBOL (ref :27)
        self.base_shares: dict = {}  # base-leg shares, same keys (ref :28)

        self._price_data: list = []
        self._base_share_price: float = 0
        self._cpt: list = []  # indices of open positions into self.tickers

    def data_feed(
        self,
        timestamp: time,
        return_data: list,
        price_data: list,
        tickers: list,
    ) -> None:
        """One tick (ref :35-65)."""
        assert len(tickers[1:]) == len(return_data)
        assert len(tickers) == len(price_data)

        self.base_ticker, self.tickers = tickers[0], tickers[1:]
        self._base_share_price = price_data[0]
        self._price_data = price_data[1:]

        is_closing = self.is_closing(timestamp)
        in_trade = len(self._cpt) > 0
        if in_trade:
            self.price_check(return_data)
            if is_closing:
                # ref :57-58 — tmp ALIASES the live list; close_trade
                # removes from it mid-iteration (skip-after-remove)
                tmp = self._cpt
                for i in tmp:
                    self.close_trade(i, "mc")
        elif (not in_trade) and (not is_closing):
            opportunity, signal = self.check_opportunity(return_data)
            # equivalent to np.where(opportunity)[0].tolist() (ref :63)
            self._cpt = [i for i, hit in enumerate(opportunity) if hit]
            if len(self._cpt) > 0:
                self.trade_signal(signal)

    def check_opportunity(self, return_data: list):
        """ref :67-79 — K.1: positive-side threshold only, no abs; NaN
        compares False on both lists."""
        opportunity, signal = [], []
        for data_point in return_data:
            opportunity.append(data_point > self.min_deviation)
            signal.append(data_point > 0)
        return opportunity, signal

    def trade_signal(self, signal: list) -> None:
        """ref :81-102 — open a zero-net-cash pair per triggered index."""
        order_size = (
            self.trade_size * self.balance
            if self.trade_size_percent
            else self.trade_size
        ) / len(self._cpt) * 2
        for idx in self._cpt:
            ticker = self.tickers[idx]
            price = self._price_data[idx]

            self.shares[ticker] = order_size / price * (1 if signal[idx] else -1)
            self.base_shares[ticker] = order_size / self._base_share_price * (
                -1 if signal[idx] else 1
            )

            # two SEPARATE adds, arb leg first (ref :98-99)
            self.balance += self.shares[ticker] * price
            self.balance += self.base_shares[ticker] * self._base_share_price

    def price_check(self, return_data: list) -> None:
        """ref :104-124 — TP band then mark-to-market SL, iterating the
        LIVE position list."""
        for i in self._cpt:
            if (return_data[i] <= self.trigger_range) and (
                return_data[i] >= -self.trigger_range
            ):
                self.close_trade(i, "tp")
                break  # K.3: at most one TP per tick (ref :117)

            ticker = self.tickers[i]
            pnl = (
                self.balance
                + (self.base_shares[ticker] * self._base_share_price * -1)
                + (self.shares[ticker] * self._price_data[i] * -1)
            ) / self.balance - 1
            if pnl < (self.sl_percent * -1):
                self.close_trade(i, "sl")

    def close_trade(self, idx: int, type: str) -> None:
        """ref :126-150 — settle both legs at current prices; roi vs the
        pre-close balance; remove idx from the live list."""
        ticker = self.tickers[idx]
        tmp_bal = self.balance

        self.balance += (self.base_shares[ticker] * self._base_share_price * -1) + (
            self.shares[ticker] * self._price_data[idx] * -1
        )

        roi = self.balance / tmp_bal - 1

        del self.shares[ticker]
        del self.base_shares[ticker]

        self.trades.append((type, roi))
        self._cpt.remove(idx)

    def is_closing(self, timestamp: time) -> bool:
        """ref :152-159 — strictly after 16:29:00."""
        return timestamp > time(16, 29, 0)


def sod_time(second_of_day: int) -> time:
    """Adapter: the engine feeds integer seconds-of-day; the reference
    class takes datetime.time (ref :35)."""
    return time(
        second_of_day // 3600, (second_of_day % 3600) // 60, second_of_day % 60
    )
