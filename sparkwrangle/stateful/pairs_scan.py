"""S1 — daily pairs-trade scan (SURVEY.md §2.S1).

Reference behavior (stock_arbitrage.ipynb:399-414, cell 6): sequential scan
over the prepared pair frame (delta, per-leg log returns), one open position
at a time:

* not in a trade and ``abs(delta) >= buy_at`` → open; ``delta_sign =
  sign(delta)``; the position is priced at the NEXT bar (quirk K.9 /
  ``iloc[get_loc(index)+1]``).
* in a trade and ``delta_sign * delta <= 0`` (zero-crossing, checked in the
  same iteration — though the opening row itself can never close because
  ``|delta| >= buy_at > 0``) → close; emit
  ``(open_date, end_date, -sign·Σret2 + sign·Σret1 - fees)`` where both
  sums run over the INCLUSIVE label slice [open, close] (quirk K.9).
* cannot re-enter while open.

The scan is inherently sequential (entry eligibility depends on the prior
exit), so it runs as an Arrow-vectorized ``applyInPandas`` per pair key —
Python touches each group exactly once, pre-sorted, pre-projected; Spark
parallelizes across pairs. At 100 TB the key space (pairs) is the
parallelism axis; a single pair's history is bounded (decades of daily bars
≈ 10⁴ rows) so per-group memory is trivial.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scan_pair_pdf(pdf: pd.DataFrame, buy_at: float, fees: float) -> list[tuple]:
    """Run the sequential scan over one pair's prepared, ts-sorted frame.

    Expects columns: ts, delta, ret1, ret2 (ret* = log returns already
    cleaned with dropna + inf→0, as the reference does in cell 5).
    Returns a list of (open_ts, end_ts, ret) tuples.
    """
    ts = pdf["ts"].to_numpy()
    delta = pdf["delta"].to_numpy()
    ret1 = pdf["ret1"].to_numpy()
    ret2 = pdf["ret2"].to_numpy()
    n = len(pdf)

    trades: list[tuple] = []
    in_trade = False
    sign = 0.0
    open_i = -1
    for i in range(n):
        d = delta[i]
        if not in_trade and abs(d) >= buy_at and i + 1 < n:
            in_trade = True
            sign = 1.0 if d > 0 else (-1.0 if d < 0 else 0.0)
            open_i = i + 1  # entry at next bar (K.9)
        if in_trade and sign * d <= 0.0:
            # inclusive [open, close] slice, pandas label-slicing semantics
            lo, hi = open_i, i + 1
            cum = -sign * ret2[lo:hi].sum() + sign * ret1[lo:hi].sum()
            trades.append((ts[lo], ts[i], cum - fees))
            in_trade = False
            sign = 0.0
    return trades


def pairs_trade_scan(
    prepared: DataFrame,
    buy_at: float = 0.005,
    fees: float = 0.0,
    keys: list[str] = ("pair",),
) -> DataFrame:
    """Distributed S1: one sequential scan per pair key.

    ``prepared`` must carry ``keys + [ts, delta, ret1, ret2]`` — build it
    with pipelines.daily_pairs.prepare_pair (filters/projections happen in
    Catalyst BEFORE this UDF boundary, so pushdown still works).
    """
    keys = list(keys)
    key_fields = {f.name: f.dataType.simpleString() for f in prepared.schema.fields}
    out_schema = (
        ", ".join(f"{k} {key_fields[k]}" for k in keys)
        + ", open_date timestamp, end_date timestamp, return double"
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts", kind="mergesort")
        trades = scan_pair_pdf(pdf, buy_at, fees)
        key_vals = {k: pdf[k].iloc[0] for k in keys}
        return pd.DataFrame(
            [
                {**key_vals, "open_date": o, "end_date": e, "return": r}
                for (o, e, r) in trades
            ],
            columns=[*keys, "open_date", "end_date", "return"],
        )

    cols = [*keys, "ts", "delta", "ret1", "ret2"]
    return prepared.select(*cols).groupBy(*keys).applyInPandas(run, out_schema)
