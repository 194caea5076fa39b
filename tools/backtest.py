"""User-facing CLI: the reference's two notebook workflows as commands.

    python tools/backtest.py ep1 --bars BARS.parquet \
        --ticker1 BRK-A --ticker2 BRK-B [--ratio 1500] [--buy-at 0.005]
    python tools/backtest.py ep2 --bars BARS.parquet --fx FX.parquet \
        --blocks BLOCKS.parquet --listings LISTINGS.parquet

Prints the same terminal report the notebooks print (compounded return;
total/annualized ROI and trade statistics). Inputs are parquet in the
engine's long schemas (FIXTURES.md A1-A5); xlsx/csv ingest lives in
sparkwrangle.jobs.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser(description="sparkwrangle backtests")
    sub = p.add_subparsers(dest="cmd", required=True)

    e1 = sub.add_parser("ep1", help="daily dual-listing pairs backtest")
    e1.add_argument("--bars", required=True)
    e1.add_argument("--ticker1", required=True)
    e1.add_argument("--ticker2", required=True)
    e1.add_argument("--ratio", type=float, default=1500.0)
    e1.add_argument("--buy-at", type=float, default=0.005)
    e1.add_argument("--fees", type=float, default=0.0)
    e1.add_argument("--from-ts", default="2006-01-01")

    e2 = sub.add_parser("ep2", help="intraday cross-exchange backtest")
    e2.add_argument("--bars", required=True)
    e2.add_argument("--fx", required=True)
    e2.add_argument("--blocks", required=True)
    e2.add_argument("--listings", required=True)
    e2.add_argument("--bal", type=float, default=1000.0)
    e2.add_argument("--min-deviation", type=float, default=0.1)
    e2.add_argument("--sl-percent", type=float, default=0.03)
    e2.add_argument("--trigger-range", type=float, default=0.01)
    e2.add_argument("--trade-size", type=float, default=0.1)
    e2.add_argument(
        "--state-scope",
        choices=["company", "block"],
        default="company",
        help="'company' = faithful reference protocol (state carries "
        "across weekly blocks); 'block' = relaxed scale mode (fresh "
        "state per block + stitched ledger — exact for market-close-"
        "bounded feeds; see SCALE.md)",
    )

    args = p.parse_args()
    from sparkwrangle.session import get_spark

    spark = get_spark("sparkwrangle-backtest")
    spark.sparkContext.setLogLevel("ERROR")

    from sparkwrangle.io import load_user_parquet

    if args.cmd == "ep1":
        from sparkwrangle.pipelines.daily_pairs import (
            compounded_return_pct,
            daily_pairs_backtest,
        )

        bars = load_user_parquet(spark, args.bars, ts_cols=("ts",))
        trades = daily_pairs_backtest(
            bars,
            args.ticker1,
            args.ticker2,
            ratio=args.ratio,
            buy_at=args.buy_at,
            fees=args.fees,
            from_ts=args.from_ts,
        ).cache()
        n = trades.count()
        ret = compounded_return_pct(trades).collect()[0].return_pct
        print(f"Round-trip trades: {n}")
        print(f"Return: {ret}%")
    else:
        from sparkwrangle.pipelines.intraday import (
            balance_report,
            build_intraday_feed,
            intraday_backtest,
            trade_report,
        )

        feed = build_intraday_feed(
            load_user_parquet(spark, args.bars, ts_cols=("ts",)),
            load_user_parquet(spark, args.fx, ts_cols=("ts",)),
            load_user_parquet(spark, args.blocks, ts_cols=("start_ts", "end_ts")),
            load_user_parquet(spark, args.listings),
            with_block_id=args.state_scope == "block",
        )
        params = dict(
            bal=args.bal,
            min_deviation=args.min_deviation,
            sl_percent=args.sl_percent,
            trigger_range=args.trigger_range,
            trade_size=args.trade_size,
            trade_size_percent=True,
        )
        trades, balances = intraday_backtest(feed, params, state_scope=args.state_scope)
        r = balance_report(balances).collect()[0]

        # every metric can legitimately be NULL (empty balances, a
        # single-day span making 365/0 NULL, an all-win or all-loss trade
        # log) — a bare f"{None:.3%}" would crash the report AFTER the
        # backtest already ran
        def pct(x, digits=3):
            return f"{x:.{digits}%}" if x is not None else "n/a"

        print(f"Total ROI: {pct(r.roi)}")
        print(f"Over: {r.span_days} days")
        print(f"Annualized ROI: {pct(r.annualized_roi)}")
        t = trade_report(trades).collect()[0]
        if t.n_wins is not None and (t.n_wins + (t.n_losses or 0)) > 0:
            print(f"Percent of winning trades: {pct(t.win_share, 2)}")
            print(
                f"Average loss: {pct(t.avg_loss, 4)}, "
                f"Average profit: {pct(t.avg_profit, 4)}"
            )
            if t.mc_loss_share is not None:
                print(
                    f"Percent of loosing trades due to market close: {pct(t.mc_loss_share, 2)}"
                )


if __name__ == "__main__":
    main()
