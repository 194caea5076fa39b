"""Property-based tests (SURVEY.md §5 item 3) — hypothesis drives the
ledger arithmetic and the numeric idioms through randomized inputs.

Invariants:
* opening a position is cash-neutral to fp noise (ref :98-99)
* closing realizes order·(base_ret − ticker_ret) exactly (ref :137)
* D4 identity: exp(sum(log r)) == product(r) to fp tolerance
* ffill is idempotent; NaN ticks never mutate trader state
* W3 min-max normalization lands in [0, 1]
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from sparkwrangle.stateful.trader import TraderState

PRICES = st.floats(min_value=1e-3, max_value=1e6, allow_nan=False)
DEVS = st.floats(min_value=0.11, max_value=5.0, allow_nan=False)


def _trader(**over):
    params = dict(
        bal=1000.0,
        min_deviation=0.1,
        sl_percent=0.03,
        trigger_range=0.01,
        trade_size=0.1,
        trade_size_percent=True,
    )
    params.update(over)
    return TraderState(**params)


@settings(max_examples=200, deadline=None)
@given(base_price=PRICES, arb_price=PRICES, dev=DEVS)
def test_open_cash_neutral(base_price, arb_price, dev):
    st_ = _trader()
    st_.data_feed(15 * 3600, [dev], [base_price, arb_price])
    assert st_.cpt == [0]
    # both legs net to zero cash up to fp rounding of the two products
    assert abs(st_.balance - 1000.0) <= 1e-9 * max(1000.0, abs(st_.balance))


@settings(max_examples=200, deadline=None)
@given(
    base0=PRICES,
    arb0=PRICES,
    base_ret=st.floats(min_value=-0.5, max_value=0.5, allow_nan=False),
    tick_ret=st.floats(min_value=-0.5, max_value=0.5, allow_nan=False),
)
def test_close_realizes_spread(base0, arb0, base_ret, tick_ret):
    st_ = _trader()
    st_.data_feed(15 * 3600, [0.2], [base0, arb0])
    bal_open = st_.balance
    order = 0.1 * 1000.0 * 2  # trade_size% × bal ÷ 1 position × 2
    base1 = base0 * (1 + base_ret)
    arb1 = arb0 * (1 + tick_ret)
    # force an exit through the tp branch (deviation inside trigger range)
    st_.data_feed(15 * 3600 + 300, [0.0], [base1, arb1])
    assert len(st_.trades) == 1
    expected = order * (base_ret - tick_ret)
    got = st_.balance - bal_open
    assert math.isclose(got, expected, rel_tol=1e-9, abs_tol=1e-6)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(min_value=0.01, max_value=100.0), min_size=1, max_size=50))
def test_exp_sum_log_equals_product(ratios):
    via_logs = math.exp(sum(math.log(r) for r in ratios))
    direct = math.prod(ratios)
    assert math.isclose(via_logs, direct, rel_tol=1e-9)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.floats(min_value=-1e6, max_value=1e6)),
        min_size=1,
        max_size=60,
    )
)
def test_ffill_idempotent(values):
    def ffill(xs):
        out, last = [], None
        for x in xs:
            if x is not None:
                last = x
            out.append(last)
        return out

    once = ffill(values)
    assert ffill(once) == once


@settings(max_examples=200, deadline=None)
@given(base_price=PRICES, arb_price=PRICES)
def test_nan_ticks_never_mutate_state(base_price, arb_price):
    st_ = _trader()
    nan = float("nan")
    st_.data_feed(15 * 3600, [nan], [base_price, arb_price])
    assert st_.cpt == [] and st_.balance == 1000.0 and st_.trades == []
    st_.data_feed(15 * 3600, [0.2], [base_price, arb_price])
    bal, cpt = st_.balance, list(st_.cpt)
    st_.data_feed(15 * 3600 + 300, [nan], [nan, nan])
    assert st_.balance == bal and st_.cpt == cpt and st_.trades == []


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6), min_size=2, max_size=60))
def test_minmax_normalization_bounds(xs):
    lo, hi = min(xs), max(xs)
    if hi == lo:
        return
    for x in xs:
        n = (x - lo) / (hi - lo)
        assert -1e-12 <= n <= 1 + 1e-12


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-0.05, max_value=0.05, allow_nan=False),  # delta
            st.floats(min_value=-0.02, max_value=0.02, allow_nan=False),  # ret1
            st.floats(min_value=-0.02, max_value=0.02, allow_nan=False),  # ret2
        ),
        min_size=2,
        max_size=120,
    )
)
def test_s1_scan_matches_independent_oracle(rows):
    """The engine's numpy scan core and the vendored iterrows-style oracle
    are INDEPENDENT implementations of cell 6 — hypothesis feeds both the
    same random prepared frames and they must emit identical trades."""
    import pandas as pd

    from pandas_oracle import ep1_scan
    from sparkwrangle.stateful.pairs_scan import scan_pair_pdf

    idx = pd.date_range("2020-01-01", periods=len(rows), freq="B")
    frame = pd.DataFrame(rows, columns=["delta", "ret1", "ret2"], index=idx)
    frame["ts"] = idx
    expected = ep1_scan(frame, buy_at=0.01, fees=0.0)
    got = scan_pair_pdf(frame.reset_index(drop=True), buy_at=0.01, fees=0.0)
    assert len(got) == len(expected)
    for (o, e, r), (_, row) in zip(got, expected.iterrows()):
        assert o == row.open_date and e == row.end_date
        assert math.isclose(r, row["return"], rel_tol=0, abs_tol=1e-12)


def test_connected_components_invariants(spark):
    """CC is idempotent (running it on its own keeper-edges is stable) and
    invariant to edge direction/duplication."""
    from pyspark.sql import functions as F

    from sparkwrangle.ext.dedup import connected_components

    edges = [(1, 2), (2, 3), (7, 8), (9, 9)]
    ids = [(i,) for i in range(1, 11)]
    pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    # duplicated + reversed edges must not change the components
    noisy = pairs.union(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    ).union(pairs)
    ids_df = spark.createDataFrame(ids, "doc_id bigint")
    base = {tuple(r) for r in connected_components(pairs, ids_df, "doc_id").collect()}
    noisy_out = {
        tuple(r) for r in connected_components(noisy, ids_df, "doc_id").collect()
    }
    assert base == noisy_out
    # idempotence: components of the (node -> cluster rep) star graph
    star = spark.createDataFrame(
        [(a, b) for a, b in base if a != b], "id_a bigint, id_b bigint"
    )
    again = {tuple(r) for r in connected_components(star, ids_df, "doc_id").collect()}
    assert again == base
