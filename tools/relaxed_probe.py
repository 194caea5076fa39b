"""Relaxed-mode S2 parallelism probe: faithful vs relaxed wall-clock on a
DEEP-HISTORY feed (ONE company, many weekly blocks).

Faithful mode (`state_scope="company"`, the reference protocol —
stateful/trader.py:backtest_trades) is per-company sequential: one company
with years of 5-minute history is ONE applyInPandas task no matter how
many cores exist. Relaxed mode (`state_scope="block"`,
stateful/trader.py:399) keys the Python stage by (company, block_id) and
reconstructs the carried ledger with a JVM stitch — parallelism becomes
company × block. This probe measures that win empirically on local[N] and
asserts the two modes produce IDENTICAL trades (the feed is market-close-
bounded — 4 post-16:29 drain ticks per day, because the reference's K.3
skip-after-remove quirk halves the open book per close tick — i.e. the
reference's own regime, where relaxed mode is exact under percent sizing).

The synthetic feed is deterministic and DENSE: all 8 arbitrage listings
open at tick 2 of every day and hold (deviation outside both the TP band
and the trigger) until the TP band at tick 22, then the post-16:29 drain
closes the remainder (one TP per close tick + the K.3 half-the-book mc
sweep). The book is therefore non-empty for ~20 of 28 ticks per day —
run_trader_on_feed's vectorized skip-ahead (which fast-forwards only
flat-book no-op stretches) cannot flatten the comparison, and the
sequential protocol does real per-tick work (an 8-position price check)
all day, exactly like a trigger-dense production feed. A sparse feed
(2 short trades/day) measures pivot + skip-ahead throughput instead and
shows only ~1.2x — recorded in SCALE.md as the density caveat.

Usage: python tools/relaxed_probe.py [--blocks 1600] [--reps 2]
Prints one JSON line per (mode, rep) and a SUMMARY line for SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PARAMS = dict(
    bal=10_000.0,
    min_deviation=0.10,
    sl_percent=0.05,
    trigger_range=0.05,
    trade_size=0.10,
    trade_size_percent=True,  # relaxed mode is exact under percent sizing
)


def build_deep_feed(n_blocks: int, n_arb: int = 8) -> pd.DataFrame:
    """One company, ``n_blocks`` weekly blocks × 5 days × 28 ticks
    (24 in-session at 5-minute spacing + 4 post-16:29 drain ticks),
    1 base + ``n_arb`` arbitrage listings → ``28 * (1 + n_arb)`` rows
    per block-day. Daily script (dense — see module docstring): all arb
    deviations open at tick 2, hold through tick 21, enter the TP band
    at tick 22, drain at the close."""
    ticks_per_day = 28
    n_days = n_blocks * 5
    n_ticks = n_days * ticks_per_day
    tick = np.tile(np.arange(ticks_per_day), n_days)
    day = np.repeat(np.arange(n_days), ticks_per_day)
    block = day // 5 + 1
    # 14:30..16:25 in-session, then 16:30/16:35/16:40/16:45 drain
    minutes = np.where(tick < 24, 14 * 60 + 30 + 5 * tick, 16 * 60 + 30 + 5 * (tick - 24))
    date = (
        np.datetime64("2020-01-06")
        + (7 * (block - 1) + day % 5).astype("timedelta64[D]")
    )
    ts = date + minutes.astype("timedelta64[m]")
    feed_seq = np.arange(1, n_ticks + 1)

    # open at tick 2 (0.15 > min_deviation), hold at 0.07 (outside both
    # the ±0.05 TP band and the 0.10 trigger), TP band from tick 22; the
    # drain ticks keep 0.02 so _price_check TPs one per close tick while
    # the mc sweep halves the rest (K.3). Per-ticker offsets keep ROIs
    # distinct; prices move mildly but never enough to SL.
    base_ret = np.select(
        [tick == 2, tick < 22],
        [0.15, 0.07],
        default=0.02,
    )
    legs = [
        pd.DataFrame(
            {
                "company": "DEEP",
                "block_id": block.astype("int64"),
                "feed_seq": feed_seq,
                "ts": ts,
                "ticker_idx": np.int32(0),
                "price": 100.0 + (tick % 5) * 0.1 + (block % 11) * 0.05,
                "ret": np.nan,
            }
        )
    ]
    for i in range(1, n_arb + 1):
        legs.append(
            pd.DataFrame(
                {
                    "company": "DEEP",
                    "block_id": block.astype("int64"),
                    "feed_seq": feed_seq,
                    "ts": ts,
                    "ticker_idx": np.int32(i),
                    "price": 40.0 + i * 5.0 + (tick % 7) * 0.2 + (block % 7) * 0.03,
                    "ret": base_ret + i * 0.001,
                }
            )
        )
    feed = pd.concat(legs, ignore_index=True)
    return feed.sort_values(["feed_seq", "ticker_idx"], ignore_index=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=1600)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from sparkwrangle.session import get_spark
    from sparkwrangle.stateful.trader import backtest_trades_ledger

    spark = get_spark("sparkwrangle-relaxed-probe")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    pdf = build_deep_feed(args.blocks)
    n_rows, n_ticks = len(pdf), pdf["feed_seq"].max()
    # materialize the feed once so both modes read the same local relation
    # and neither pays the createDataFrame conversion inside its timing
    feed = spark.createDataFrame(pdf).localCheckpoint()
    print(
        json.dumps(
            {"feed_rows": int(n_rows), "ticks": int(n_ticks),
             "blocks": args.blocks, "cores": cores}
        ),
        flush=True,
    )
    # warm the python-worker fork + codegen on a tiny slice of the feed
    small = feed.filter("block_id <= 2")
    backtest_trades_ledger(small, PARAMS).count()
    backtest_trades_ledger(small, PARAMS, state_scope="block").count()

    times: dict[str, float] = {}
    trades: dict[str, pd.DataFrame] = {}
    for scope in ("company", "block"):
        best = None
        for rep in range(args.reps):
            t0 = time.perf_counter()
            out = backtest_trades_ledger(feed, PARAMS, state_scope=scope)
            out.write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 2)
            best = dt if best is None else min(best, dt)
            print(json.dumps({"mode": scope, "rep": rep, "sec": dt}), flush=True)
        times[scope] = best
        trades[scope] = (
            backtest_trades_ledger(feed, PARAMS, state_scope=scope)
            .orderBy("trade_seq")
            .toPandas()
        )

    # ADVICE-5 measurement: when BOTH outputs are needed, the combined
    # single-pass intraday_backtest vs two standalone relaxed operators
    # (each re-running the per-(company, block) Python pass).
    from sparkwrangle.pipelines.intraday import intraday_backtest
    from sparkwrangle.stateful.trader import backtest_balances, backtest_trades

    def drain(df):
        df.write.format("noop").mode("overwrite").save()

    t0 = time.perf_counter()
    drain(backtest_trades(feed, PARAMS, state_scope="block"))
    drain(backtest_balances(feed, PARAMS, state_scope="block"))
    two_pass = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    tr, bal = intraday_backtest(feed, PARAMS, state_scope="block")
    drain(tr)
    drain(bal)
    one_pass = round(time.perf_counter() - t0, 2)
    print(
        json.dumps(
            {"both_outputs_two_standalone_sec": two_pass,
             "both_outputs_combined_sec": one_pass,
             "combined_win": round(two_pass / one_pass, 2)}
        ),
        flush=True,
    )

    f, r = trades["company"], trades["block"]
    assert len(f) == len(r) and len(f) > 0, (len(f), len(r))
    assert list(f.close_type) == list(r.close_type)
    roi_err = float(max(abs(f.roi.to_numpy() - r.roi.to_numpy())))
    # bal_after compounds over tens of thousands of trades on this feed, so
    # the parity check is RELATIVE (absolute FP roundoff scales with the
    # balance magnitude; the trajectory itself is exact by scale invariance)
    fb, rb = f.bal_after.to_numpy(), r.bal_after.to_numpy()
    bal_err = float(max(abs(fb - rb) / np.maximum(abs(fb), 1e-12)))
    assert roi_err < 1e-9 and bal_err < 1e-9, (roi_err, bal_err)
    print(
        "SUMMARY "
        + json.dumps(
            {
                "feed_rows": int(n_rows),
                "ticks": int(n_ticks),
                "blocks": args.blocks,
                "cores": cores,
                "trades": int(len(f)),
                "faithful_sec": times["company"],
                "relaxed_sec": times["block"],
                "speedup": round(times["company"] / times["block"], 1),
                "max_roi_err": roi_err,
                "max_bal_err": bal_err,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
