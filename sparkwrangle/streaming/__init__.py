"""Structured Streaming surface (SURVEY.md §2.J).

The reference only *simulates* a stream (cell 8's per-tick loop); the
engine provides the real thing: the same trader state machine as an
``applyInPandasWithState`` operator over a streaming feed, plus the
standard windowed-aggregation surface (F.window / watermarks) that batch
queries share.
"""

from sparkwrangle.streaming.replay import (
    parse_feed_records,
    read_replay,
    stage_replay,
    to_feed_records,
)
from sparkwrangle.streaming.trader_stream import streaming_backtest_trades

__all__ = [
    "parse_feed_records",
    "read_replay",
    "stage_replay",
    "streaming_backtest_trades",
    "to_feed_records",
]
