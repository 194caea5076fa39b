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
    import numpy as np

    ts = pdf["ts"].to_numpy()
    delta = pdf["delta"].to_numpy()
    n = len(pdf)

    # The per-row loop reduces to index jumps: the next entry is the next
    # |delta| >= buy_at at or after the cursor, the close is the next
    # zero-crossing strictly after the entry row (the opening row itself
    # can never close: |d| >= buy_at > 0), and re-entry resumes after the
    # close (the close row's own entry check ran while still in-trade).
    # Interval return sums become prefix-sum differences. NaN deltas
    # compare False in every mask, exactly as in the scalar comparisons.
    entry_idx = np.flatnonzero(np.abs(delta) >= buy_at)
    close_pos = np.flatnonzero(delta <= 0.0)  # closes a sign=+1 trade
    close_neg = np.flatnonzero(delta >= 0.0)  # closes a sign=-1 trade
    c1 = np.concatenate(([0.0], np.cumsum(pdf["ret1"].to_numpy())))
    c2 = np.concatenate(([0.0], np.cumsum(pdf["ret2"].to_numpy())))

    trades: list[tuple] = []
    cursor = 0
    while True:
        p = int(np.searchsorted(entry_idx, cursor))
        if p >= len(entry_idx):
            break
        i = int(entry_idx[p])
        if i + 1 >= n:
            break
        if delta[i] == 0.0:  # reachable only at buy_at == 0: sign = 0,
            # the same-row close check fires immediately, cum = 0
            trades.append((ts[i + 1], ts[i], -fees))
            cursor = i + 1
            continue
        sign = 1.0 if delta[i] > 0 else -1.0
        arr = close_pos if sign > 0 else close_neg
        q = int(np.searchsorted(arr, i + 1))
        if q >= len(arr):
            break  # final trade never closes → nothing to emit
        j = int(arr[q])
        lo, hi = i + 1, j + 1  # inclusive [open, close] label slice (K.9)
        cum = -sign * (c2[hi] - c2[lo]) + sign * (c1[hi] - c1[lo])
        trades.append((ts[lo], ts[j], cum - fees))
        cursor = j + 1
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
