"""M4 parity: the streaming trader must reproduce the batch operator's
trade log exactly when the same feed is replayed through micro-batches."""

from __future__ import annotations

import os
import time

import pytest

from pyspark.sql import functions as F

from sparkwrangle.pipelines.intraday import build_intraday_feed
from sparkwrangle.stateful.trader import backtest_trades
from sparkwrangle.streaming.trader_stream import streaming_backtest_trades

from fixtures import TRADER_PARAMS, intraday_fixture


@pytest.fixture(scope="module")
def feed_df(spark):
    bars, fx, blocks, listings = intraday_fixture()

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
    return feed.cache()


def _run_stream(spark, feed_dir, n_files, sink):
    schema = (
        "company string, feed_seq int, ts timestamp, ticker_idx bigint, "
        "price double, ret double"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir)
    )
    out = streaming_backtest_trades(stream, TRADER_PARAMS)
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {sink}")


def _assert_same_trades(batch_pdf, stream_pdf):
    assert len(batch_pdf) == len(stream_pdf)
    b = batch_pdf.sort_values(["company", "trade_seq"]).reset_index(drop=True)
    s = stream_pdf.sort_values(["company", "trade_seq"]).reset_index(drop=True)
    for i in range(len(b)):
        assert b.company[i] == s.company[i]
        assert b.trade_seq[i] == s.trade_seq[i]
        assert b.close_type[i] == s.close_type[i]
        assert abs(b.roi[i] - s.roi[i]) < 1e-12


def test_streaming_parity_single_batch(spark, feed_df, tmp_path):
    batch = backtest_trades(feed_df, TRADER_PARAMS).toPandas()
    assert len(batch) > 3
    d = str(tmp_path / "feed1")
    feed_df.coalesce(1).write.parquet(d)
    got = _run_stream(spark, d, 1, "stream_one").toPandas()
    _assert_same_trades(batch, got)


def test_streaming_parity_multi_batch(spark, feed_df, tmp_path):
    """Two ordered micro-batches: state must carry across the boundary."""
    batch = backtest_trades(feed_df, TRADER_PARAMS).toPandas()
    mid = feed_df.agg(F.expr("percentile_approx(feed_seq, 0.5)")).collect()[0][0]
    d = str(tmp_path / "feed2")
    os.makedirs(d)
    f1, f2 = os.path.join(d, "p1"), os.path.join(d, "p2")
    feed_df.filter(F.col("feed_seq") <= mid).coalesce(1).write.parquet(f1)
    feed_df.filter(F.col("feed_seq") > mid).coalesce(1).write.parquet(f2)
    # file source orders batches by modification time — make it explicit
    now = time.time()
    for sub, mt in ((f1, now - 60), (f2, now)):
        for fn in os.listdir(sub):
            os.utime(os.path.join(sub, fn), (mt, mt))
    stream_dir_files = [os.path.join(f1, "*"), os.path.join(f2, "*")]
    # read both subdirs via glob
    schema = (
        "company string, feed_seq int, ts timestamp, ticker_idx bigint, "
        "price double, ret double"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "*"))
    )
    out = streaming_backtest_trades(stream, TRADER_PARAMS)
    q = (
        out.writeStream.format("memory")
        .queryName("stream_two")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM stream_two").toPandas()
    _assert_same_trades(batch, got)
