"""Golden-replication + property tests for the stateful operators
(SURVEY.md §5 items 2-4): the Spark engine must reproduce the vendored
pandas oracle on the synthetic fixtures to 1e-9."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from pyspark.sql import functions as F

from sparkwrangle.pipelines.daily_pairs import daily_pairs_backtest, prepare_pair
from sparkwrangle.pipelines.intraday import build_intraday_feed, intraday_backtest
from sparkwrangle.stateful.trader import TraderState

from fixtures import TRADER_PARAMS, bars_daily, intraday_fixture
from pandas_oracle import ep1_prepare, ep1_scan, ep2_run_company


# ---------------------------------------------------------------------------
# EP1 golden replication
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module", params=[42, 7])
def daily_bars_pdf(request):
    return bars_daily(seed=request.param)


def _spark_bars(spark, pdf):
    out = pdf.copy()
    out["ts"] = out["ts"].dt.tz_localize(None)  # session tz is UTC already
    return spark.createDataFrame(out)


def test_ep1_golden_trades(spark, daily_bars_pdf):
    expected = ep1_scan(
        ep1_prepare(daily_bars_pdf, "AAA", "BBB", 1500.0, "2006"), 0.005, 0.0
    )
    got = (
        daily_pairs_backtest(
            _spark_bars(spark, daily_bars_pdf), "AAA", "BBB", ratio=1500.0, buy_at=0.005
        )
        .orderBy("open_date")
        .toPandas()
    )
    assert len(expected) > 5, "fixture must produce trades"
    assert len(got) == len(expected)
    for (_, e), (_, g) in zip(expected.iterrows(), got.iterrows()):
        assert g.open_date == e.open_date.tz_localize(None)
        assert g.end_date == e.end_date.tz_localize(None)
        assert abs(g["return"] - e["return"]) < 1e-9


def test_ep1_prepared_handles_zero_close(spark, daily_bars_pdf):
    # the injected zero close produces ret = -inf (log 0) then +-inf rows
    # replaced by 0.0 — both engines must agree row-for-row
    exp = ep1_prepare(daily_bars_pdf, "AAA", "BBB", 1500.0, "2006")
    got = (
        prepare_pair(_spark_bars(spark, daily_bars_pdf), "AAA", "BBB", 1500.0)
        .orderBy("ts")
        .toPandas()
    )
    assert len(got) == len(exp)
    for col in ["delta", "ret1", "ret2"]:
        assert max(abs(got[col].to_numpy() - exp[col].to_numpy())) < 1e-9


# ---------------------------------------------------------------------------
# EP2 golden replication
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def intraday_pdf():
    return intraday_fixture()


def test_ep2_golden(spark, intraday_pdf):
    bars, fx, blocks, listings = intraday_pdf

    def naive(df, cols):
        out = df.copy()
        for c in cols:
            out[c] = out[c].dt.tz_localize(None)
        return out

    feed = build_intraday_feed(
        spark.createDataFrame(naive(bars, ["ts"])),
        spark.createDataFrame(naive(fx, ["ts"])),
        spark.createDataFrame(naive(blocks, ["start_ts", "end_ts"])),
        spark.createDataFrame(listings),
    )
    trades_df, balances_df = intraday_backtest(feed, TRADER_PARAMS)
    got_trades = trades_df.orderBy("company", "trade_seq").toPandas()
    got_bal = balances_df.toPandas()

    total_trades = 0
    for company, tickers in [
        ("Alpha", ["ALF", "ALF.DE", "ALF.F"]),
        ("Beta", ["BET", "BET.DE"]),
        ("Gamma", ["GAM", "GAM.PA"]),
    ]:
        exp_trades, exp_hist = ep2_run_company(
            bars[bars.company == company], fx, blocks, tickers, TRADER_PARAMS
        )
        total_trades += len(exp_trades)
        g = got_trades[got_trades.company == company]
        assert len(g) == len(exp_trades), f"{company}: trade count"
        for (typ, roi), (_, row) in zip(exp_trades, g.iterrows()):
            assert row.close_type == typ
            assert abs(row.roi - roi) < 1e-9
        gb = got_bal[got_bal.company == company].sort_values("ts")
        exp_hist_df = (
            pd.DataFrame(exp_hist, columns=["ts", "balance"])
            .assign(ts=lambda d: d.ts.dt.tz_localize(None))
            .sort_values("ts")
        )
        assert len(gb) == len(exp_hist_df), f"{company}: history length"
        assert max(abs(gb.balance.to_numpy() - exp_hist_df.balance.to_numpy())) < 1e-9
    assert total_trades > 3, "fixture must produce trades across companies"


# ---------------------------------------------------------------------------
# S3 ledger property tests (SURVEY §5 item 3)
# ---------------------------------------------------------------------------


def _mk_trader(**over):
    params = dict(TRADER_PARAMS)
    params.update(over)
    return TraderState(**params)


def test_open_is_cash_neutral():
    st = _mk_trader()
    st.data_feed(15 * 3600, [0.25], [100.0, 50.0])  # one arb ticker, dev > 0.1
    assert st.cpt == [0]
    assert abs(st.balance - 1000.0) < 1e-9  # both legs net to ~zero cash


def test_close_realizes_spread_pnl():
    st = _mk_trader()
    st.data_feed(15 * 3600, [0.25], [100.0, 50.0])
    bal_open = st.balance
    order = 0.1 * 1000.0 / 1 * 2
    # ticker falls 10%, base flat. The ledger books +shares·p at open and
    # −shares·p at close (IntradayRegionArbitrage.py:98-99,137), so the
    # round trip realizes order·(base_ret − ticker_ret) — the position is
    # economically SHORT the overvalued ticker: +10% falls → +0.1·order.
    st.data_feed(15 * 3600 + 300, [0.005], [100.0, 45.0])  # inside trigger → tp
    assert [t for t, _ in st.trades] == ["tp"]
    expected_pnl = order * (0.0 - (45.0 / 50.0 - 1.0))
    assert abs((st.balance - bal_open) - expected_pnl) < 1e-9


def test_nan_ticks_are_noops():
    st = _mk_trader()
    st.data_feed(15 * 3600, [float("nan")], [100.0, 50.0])
    assert st.cpt == [] and st.balance == 1000.0
    st.data_feed(15 * 3600, [0.25], [100.0, 50.0])
    st.data_feed(15 * 3600 + 300, [float("nan")], [100.0, float("nan")])
    assert st.cpt == [0] and len(st.trades) == 0  # NaN: no tp, no sl


def test_market_close_flushes_positions_mc():
    st = _mk_trader()
    st.data_feed(15 * 3600, [0.25], [100.0, 50.0])
    st.data_feed(16 * 3600 + 30 * 60, [0.25], [100.0, 50.0])  # 16:30 > 16:29
    assert st.cpt == [] and [t for t, _ in st.trades] == ["mc"]


def test_market_close_alias_skip_quirk():
    # two open positions at market close: closing the first skips the
    # second (live-list iteration, ref :57-58) — it closes on the NEXT tick
    st = _mk_trader()
    st.data_feed(15 * 3600, [0.25, 0.3], [100.0, 50.0, 60.0])
    assert st.cpt == [0, 1]
    st.data_feed(16 * 3600 + 30 * 60, [0.25, 0.3], [100.0, 50.0, 60.0])
    assert st.cpt == [1] and len(st.trades) == 1
    st.data_feed(16 * 3600 + 35 * 60, [0.25, 0.3], [100.0, 50.0, 60.0])
    assert st.cpt == [] and len(st.trades) == 2
    assert all(t == "mc" for t, _ in st.trades)


def test_at_most_one_tp_per_tick():
    st = _mk_trader()
    st.data_feed(15 * 3600, [0.25, 0.3], [100.0, 50.0, 60.0])
    # both inside trigger range → only ONE tp this tick (break, quirk K.3)
    st.data_feed(15 * 3600 + 300, [0.005, 0.005], [100.0, 50.0, 60.0])
    assert len(st.trades) == 1 and st.trades[0][0] == "tp"
    assert st.cpt == [1]


def test_no_abs_opportunity_quirk():
    # K.1: negative deviations never trigger (no abs in check_opportunity)
    st = _mk_trader()
    st.data_feed(15 * 3600, [-0.5], [100.0, 50.0])
    assert st.cpt == []


def test_param_validation():
    with pytest.raises(ValueError):
        _mk_trader(min_deviation=0.0)
    with pytest.raises(ValueError):
        _mk_trader(trigger_range=0.5)  # > min_deviation
    with pytest.raises(ValueError):
        _mk_trader(trade_size=1.5, trade_size_percent=True)


def test_ep2_report_layer_golden(spark, intraday_pdf):
    """Cells 29-33 metrics computed by the Spark report layer must match
    the same metrics derived pandas-style from the oracle's outputs."""
    import numpy as np
    from sparkwrangle.pipelines.intraday import balance_report, trade_report

    bars, fx, blocks, listings = intraday_pdf

    def naive(df, cols):
        out = df.copy()
        for c in cols:
            out[c] = out[c].dt.tz_localize(None)
        return out

    feed = build_intraday_feed(
        spark.createDataFrame(naive(bars, ["ts"])),
        spark.createDataFrame(naive(fx, ["ts"])),
        spark.createDataFrame(naive(blocks, ["start_ts", "end_ts"])),
        spark.createDataFrame(listings),
    )
    trades_df, balances_df = intraday_backtest(feed, TRADER_PARAMS)

    # pandas-oracle side: concat per-company series, ffill on the union
    # grid, drop first row, TOTAL = row sum (cells 29-31)
    all_trades, hist_frames = [], []
    for company, tickers in [
        ("Alpha", ["ALF", "ALF.DE", "ALF.F"]),
        ("Beta", ["BET", "BET.DE"]),
        ("Gamma", ["GAM", "GAM.PA"]),
    ]:
        tr, hist = ep2_run_company(
            bars[bars.company == company], fx, blocks, tickers, TRADER_PARAMS
        )
        all_trades.extend(tr)
        s = pd.DataFrame(hist, columns=["ts", company]).set_index("ts")[company]
        hist_frames.append(s)
    bal = pd.concat(hist_frames, axis=1).ffill().iloc[1:]
    total = bal.sum(axis=1)
    exp_roi = total.iloc[-1] / total.iloc[0] - 1
    exp_days = (total.index[-1] - total.index[0]).days

    got = balance_report(balances_df).collect()[0]
    assert got.span_days == exp_days
    assert abs(got.roi - exp_roi) < 1e-9

    # cell 33 trade stats
    wins = [r for _, r in all_trades if r > 0]
    losses = [(t, r) for t, r in all_trades if r < 0]
    got_t = trade_report(trades_df).collect()[0]
    assert got_t.n_wins == len(wins) and got_t.n_losses == len(losses)
    assert abs(got_t.win_share - len(wins) / (len(wins) + len(losses))) < 1e-12
    assert abs(got_t.avg_profit - np.mean(wins)) < 1e-9
    assert abs(got_t.avg_loss - np.mean([r for _, r in losses])) < 1e-9
    mc = [r for t, r in losses if t == "mc"]
    assert abs(got_t.mc_loss_share - len(mc) / len(losses)) < 1e-12


def test_ep2_golden_on_real_ticker_structures(spark):
    """EP2 golden replication over the REAL workbook's hardest ticker
    shapes: 6-listing Ryanair, 4-listing Berkshire, EU-based Casio
    (tickers[0] contains '.'), on synthetic bars."""
    from fixtures import bars_for_listings

    real = {
        "Ryanair": ["RYAAY", "RY4C.DE", "RY4C.F", "RY4D.BE", "RY4D.DU", "RYA.IR"],
        "Berkshire Hathaway": ["BRK-B", "BRK-A", "BRKB.VI", "BRKA.VI"],
        "Casio": ["CA5.F", "CA5.BE"],  # EU-only: base ticker contains '.'
    }
    bars, fx, blocks, listings = bars_for_listings(real)

    def naive(df, cols):
        out = df.copy()
        for c in cols:
            out[c] = out[c].dt.tz_localize(None)
        return out

    feed = build_intraday_feed(
        spark.createDataFrame(naive(bars, ["ts"])),
        spark.createDataFrame(naive(fx, ["ts"])),
        spark.createDataFrame(naive(blocks, ["start_ts", "end_ts"])),
        spark.createDataFrame(listings),
    )
    trades_df, balances_df = intraday_backtest(feed, TRADER_PARAMS)
    got = trades_df.orderBy("company", "trade_seq").toPandas()
    got_bal = balances_df.toPandas()
    total = 0
    for company, tickers in real.items():
        exp_trades, exp_hist = ep2_run_company(
            bars[bars.company == company], fx, blocks, tickers, TRADER_PARAMS
        )
        total += len(exp_trades)
        g = got[got.company == company]
        assert len(g) == len(exp_trades), f"{company} trade count"
        for (typ, roi), (_, row) in zip(exp_trades, g.iterrows()):
            assert row.close_type == typ and abs(row.roi - roi) < 1e-9
        gb = got_bal[got_bal.company == company].sort_values("ts")
        eh = (
            pd.DataFrame(exp_hist, columns=["ts", "balance"])
            .assign(ts=lambda d: d.ts.dt.tz_localize(None))
            .sort_values("ts")
        )
        assert len(gb) == len(eh)
        assert max(abs(gb.balance.to_numpy() - eh.balance.to_numpy())) < 1e-9
    assert total > 0, "structures must produce trades"


def test_s2_single_position_restricted_regime(spark):
    """The restricted-regime S2 twin (single arb ticker, fixed order size,
    unreachable SL) runs the REAL state machine and must agree with an
    independent straight-line simulation of the data_feed protocol —
    guarding the recursive-CTE oracle's regime assumptions (no same-tick
    re-open, TP-before-mc priority, running-sum balance)."""
    import duckdb

    from sparkwrangle.catalog import CATALOG

    sf = "/root/testdata/sf0.001"
    got = (
        CATALOG["s2_trader_single_position"]
        .fn(spark, sf)
        .orderBy("company", "trade_seq")
        .toPandas()
    )
    ev = duckdb.sql(
        f"SELECT user_id, event_id, value FROM '{sf}/events.parquet' "
        "ORDER BY user_id, event_id"
    ).df()
    os_, bal0 = 20.0, 1000.0
    rows = []
    for uid, g in ev.groupby("user_id", sort=True):
        bal, open_px, n = bal0, None, 0
        for _, e in g.iterrows():
            v = e.value
            r = (v - 50.0) / 200.0
            ap, bp = v + 1.0, v / 10.0 + 50.0
            closing = (9 * 3600 + (int(e.event_id) * 7919) % 28800) > 59340
            if open_px is not None:
                tp = -0.01 <= r <= 0.01
                if tp or closing:
                    chg = os_ * (bp / open_px[1] - ap / open_px[0])
                    roi = chg / bal
                    bal += chg
                    rows.append((uid, n, "tp" if tp else "mc", roi))
                    n += 1
                    open_px = None
            elif not closing and r > 0.1:
                open_px = (ap, bp)
        assert bal > 0
    assert len(rows) == len(got), (len(rows), len(got))
    assert {"tp", "mc"} >= set(got.close_type)
    for (uid, seq, typ, roi), (_, row) in zip(rows, got.iterrows()):
        assert row.company == uid and row.trade_seq == seq
        assert row.close_type == typ
        import math

        assert abs(math.floor(roi * 1e6 + 0.5) / 1e6 - row.roi) < 1e-9


def test_malformed_feed_error_names_company_and_feed_seq():
    """Round-12 VERDICT item 7: the feed pivot's duplicate-(feed_seq,
    ticker_idx) error must name the company and the offending feed_seq
    values, so a 100 TB-scale user can locate the malformed rows."""
    from sparkwrangle.stateful.trader import run_trader_on_feed

    feed = pd.DataFrame(
        {
            "company": "ACME",
            "feed_seq": [1, 1, 2, 2],
            "ts": pd.to_datetime(["2026-01-05 15:00:00"] * 4),
            "ticker_idx": [0, 0, 0, 1],  # (1, 0) duplicated
            "price": [100.0, 100.5, 101.0, 50.0],
            "ret": [float("nan")] * 3 + [0.2],
        }
    )
    with pytest.raises(ValueError) as exc:
        run_trader_on_feed(feed, TRADER_PARAMS)
    msg = str(exc.value)
    assert "ACME" in msg and "feed_seq=[1]" in msg, msg
