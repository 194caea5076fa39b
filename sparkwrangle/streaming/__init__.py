"""Structured Streaming surface (SURVEY.md §2.J).

The reference only *simulates* a stream (cell 8's per-tick loop); the
engine provides the real thing: the same trader state machine as an
``applyInPandasWithState`` operator over a streaming feed, plus the
standard windowed-aggregation surface (F.window / watermarks) that batch
queries share.
"""

from sparkwrangle.streaming.trader_stream import streaming_backtest_trades

__all__ = ["streaming_backtest_trades"]
