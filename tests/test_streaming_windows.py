"""Watermark semantics: windows finalize in append mode once the watermark
passes; rows arriving later than the watermark are dropped."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from sparkwrangle.streaming.windows import windowed_counts

_SCHEMA = "ts timestamp, value double"


def _df(spark, rows):
    return spark.createDataFrame(rows, "ts string, value double").select(
        F.col("ts").cast("timestamp").alias("ts"), "value"
    )


def _write(spark, rows, path):
    _df(spark, rows).coalesce(1).write.parquet(path)


def _wait_batches(q, n, timeout=60):
    t0 = time.time()
    while time.time() - t0 < timeout:
        p = q.lastProgress
        if p and p["batchId"] >= n - 1 and p["numInputRows"] >= 0:
            time.sleep(1.5)  # let the commit settle
            if q.lastProgress["batchId"] >= n - 1:
                return
        time.sleep(0.3)
    raise TimeoutError(f"stream did not reach batch {n}")


def test_watermark_drops_late_rows(spark, tmp_path):
    d = str(tmp_path / "win")
    os.makedirs(d)
    # batch 1: two full hours of data → watermark advances to 11:50
    _write(
        spark,
        [
            ("2024-01-01 10:05:00", 1.0),
            ("2024-01-01 10:55:00", 2.0),
            ("2024-01-01 11:30:00", 3.0),
            ("2024-01-01 12:00:00", 0.5),
        ],
        os.path.join(d, "b1"),
    )
    stream = spark.readStream.schema(_SCHEMA).parquet(os.path.join(d, "*"))
    out = windowed_counts(stream, window="1 hour", watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("win_sink")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        _wait_batches(q, 1)
        # batch 2 (written only after batch 1 committed): one on-time row
        # and one LATE row (10:20 — before the 11:50 watermark) → dropped
        _write(
            spark,
            [
                ("2024-01-01 12:10:00", 8.0),
                ("2024-01-01 10:20:00", 100.0),
                ("2024-01-01 13:05:00", 4.0),
            ],
            os.path.join(d, "b2"),
        )
        deadline = time.time() + 60
        rows = {}
        while time.time() < deadline:
            rows = {
                r.window_start.strftime("%H:%M"): (r.n, r.sum_value)
                for r in spark.sql("SELECT * FROM win_sink").collect()
            }
            if "11:00" in rows:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    # the 10:00 window finalized with n=2 (sum 3.0): the late 100.0 row
    # never entered it
    assert rows.get("10:00") == (2, 3.0)
    assert rows.get("11:00") == (1, 3.0)
    # the 13:00 window is still open in append mode (not yet emitted)
    assert "13:00" not in rows


def test_windowed_counts_batch_equivalence(spark):
    df = _df(
        spark,
        [("2024-01-01 10:05:00", 1.0), ("2024-01-01 10:35:00", 2.0),
         ("2024-01-01 11:10:00", 4.0)],
    )
    out = {r.window_start.strftime("%H:%M"): (r.n, r.sum_value)
           for r in windowed_counts(df).collect()}
    assert out == {"10:00": (2, 3.0), "11:00": (1, 4.0)}


def test_streaming_dedup_drops_repeats(spark, tmp_path):
    from sparkwrangle.streaming.windows import dedup_stream

    d = str(tmp_path / "dedup")
    os.makedirs(d)
    rows1 = [("2024-01-01 10:00:00", 1.0), ("2024-01-01 10:01:00", 2.0)]
    rows2 = [("2024-01-01 10:00:00", 1.0),  # exact repeat → dropped
             ("2024-01-01 10:02:00", 3.0)]
    _write(spark, rows1, os.path.join(d, "b1"))
    _write(spark, rows2, os.path.join(d, "b2"))
    stream = spark.readStream.schema(_SCHEMA).parquet(os.path.join(d, "*"))
    out = dedup_stream(stream, ["ts", "value"])
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)
    got = spark.sql("SELECT * FROM dedup_sink").collect()
    assert len(got) == 3  # 4 input rows, one dropped as duplicate
    assert sorted(r.value for r in got) == [1.0, 2.0, 3.0]


def test_streaming_dedup_non_ts_key_state_evicts(spark, tmp_path):
    """dedup_stream on a key set that EXCLUDES the event-time column —
    the case where plain dropDuplicates(subset) would hold state forever.
    dropDuplicatesWithinWatermark evicts a key once the watermark passes
    its first occurrence + delay (eviction lands at micro-batch commit),
    so a recurrence one batch after expiry is admitted fresh, while a
    recurrence within the horizon is dropped."""
    from sparkwrangle.streaming.windows import dedup_stream

    d = str(tmp_path / "dedup_key")
    os.makedirs(d)
    batches = [
        [
            ("2024-01-01 10:00:00", 7.0),
            # same VALUE key, different ts, within the 10-min horizon → drop
            ("2024-01-01 10:05:00", 7.0),
            # pacer: advances the watermark to 10:20 at batch-0 commit
            ("2024-01-01 10:30:00", 1.0),
        ],
        # batch 1: watermark (10:20) > key-7 expiry (10:10), but eviction
        # happens at COMMIT after processing → this one is still dropped
        [("2024-01-01 10:25:00", 7.0)],
        # batch 2: state for key 7 evicted → admitted again
        [("2024-01-01 10:40:00", 7.0)],
    ]
    for i, rs in enumerate(batches):
        _write(spark, rs, os.path.join(d, f"b{i}"))
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "*"))
    )
    out = dedup_stream(stream, ["value"], watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_key_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)
    got = sorted(
        (r.ts.strftime("%H:%M"), r.value)
        for r in spark.sql("SELECT * FROM dedup_key_sink").collect()
    )
    assert got == [("10:00", 7.0), ("10:30", 1.0), ("10:40", 7.0)], got


def test_stream_static_enrichment_join(spark, tmp_path):
    """Stream-static join: enrich streaming facts with a broadcast static
    dimension — the streaming form of the engine's dimension joins."""
    d = str(tmp_path / "enrich")
    os.makedirs(d)
    _write(spark, [("2024-01-01 10:00:00", 1.0), ("2024-01-01 10:01:00", 2.0)],
           os.path.join(d, "b1"))
    dim = spark.createDataFrame([(1.0, "low"), (2.0, "high")], "value double, tier string")
    stream = spark.readStream.schema(_SCHEMA).parquet(os.path.join(d, "*"))
    out = stream.join(F.broadcast(dim), "value", "left")
    q = (
        out.writeStream.format("memory")
        .queryName("enrich_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)
    rows = {r.value: r.tier for r in spark.sql("SELECT * FROM enrich_sink").collect()}
    assert rows == {1.0: "low", 2.0: "high"}


def test_rate_source_drives_windowed_counts(spark):
    """The built-in rate source (the Kafka stand-in in this container)
    flows through the windowed-aggregation surface."""
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 50).load()
        .withColumnRenamed("timestamp", "ts")
        .withColumn("value", F.col("value").cast("double"))
    )
    out = windowed_counts(stream, window="1 second", watermark="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("rate_sink")
        .outputMode("append")
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) FROM rate_sink").collect()[0][0]
            if n >= 2:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert n >= 2, "rate source should finalize at least two 1s windows"


def test_session_windows_stream_equals_batch(spark, tmp_path):
    """Session windows merge rows within the gap per key; the streaming
    run (availableNow over two files) emits exactly the batch sessions."""
    import pandas as pd

    from sparkwrangle.streaming.windows import session_counts

    base = pd.Timestamp("2024-03-04 09:00:00")
    rows = pd.DataFrame(
        {
            "user": ["u1"] * 4 + ["u2"] * 3,
            "ts": [base + pd.Timedelta(minutes=m) for m in (0, 10, 70, 75, 5, 50, 200)],
            "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0],
        }
    )
    batch = session_counts(
        spark.createDataFrame(rows), gap="30 minutes", keys=["user"]
    )
    want = {tuple(r) for r in batch.collect()}
    # u1: sessions {0,10} and {70,75}; u2: {5}, {50}, {200}
    assert len(want) == 5

    d = str(tmp_path / "sess")
    spark.createDataFrame(rows.iloc[:4]).write.parquet(f"{d}/p0")
    spark.createDataFrame(rows.iloc[4:]).write.parquet(f"{d}/p1")
    stream = (
        spark.readStream.schema("user string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    # no watermark + complete mode: nothing is dropped as late whatever
    # order the two files replay in, every trigger rewrites the full
    # session table, and the final result equals the batch sessions
    # (append mode would hold tail sessions open forever here — no later
    # batch ever advances the watermark past them).
    out = session_counts(stream, gap="30 minutes", watermark=None, keys=["user"])
    q = (
        out.writeStream.format("memory").queryName("sess_sink")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(600)
    got = {tuple(r) for r in spark.sql("SELECT * FROM sess_sink").collect()}
    assert got == want


def test_session_windows_stream_batch_fuzz(spark, tmp_path):
    """Randomized stream≡batch parity for session windows: random event
    sets (dense timestamp collisions, single-event sessions, sessions
    that only merge once a later file arrives), random gap, random split
    into 1-3 replay files — the streaming run must emit exactly the
    batch sessions for every trial, whatever the file boundaries cut
    through. Generalizes the fixed-fixture parity test above."""
    import random

    import pandas as pd

    from sparkwrangle.streaming.windows import session_counts

    rng = random.Random(31)
    base = pd.Timestamp("2024-03-04 09:00:00")
    for trial in range(3):
        n = rng.choice([1, 7, 25])
        gap_min = rng.choice([5, 30])
        rows = pd.DataFrame(
            {
                "user": [rng.choice(["u1", "u2", "u3"]) for _ in range(n)],
                "ts": [
                    base + pd.Timedelta(minutes=rng.randrange(0, 240))
                    for _ in range(n)
                ],
                "value": [float(i) for i in range(n)],
            }
        )
        batch = session_counts(
            spark.createDataFrame(rows), gap=f"{gap_min} minutes", keys=["user"]
        )
        want = {tuple(r) for r in batch.collect()}

        d = str(tmp_path / f"fuzz{trial}")
        nfiles = rng.choice([1, 2, 3])
        cuts = sorted(rng.sample(range(1, n), min(nfiles - 1, n - 1))) if n > 1 else []
        parts = []
        prev = 0
        for c in [*cuts, n]:
            parts.append(rows.iloc[prev:c])
            prev = c
        for i, part in enumerate(p for p in parts if len(p)):
            spark.createDataFrame(part).write.parquet(f"{d}/p{i}")
        stream = (
            spark.readStream.schema("user string, ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(d + "/*")
        )
        out = session_counts(
            stream, gap=f"{gap_min} minutes", watermark=None, keys=["user"]
        )
        q = (
            out.writeStream.format("memory").queryName(f"sess_fuzz{trial}")
            .outputMode("complete").trigger(availableNow=True).start()
        )
        assert q.awaitTermination(600)
        got = {
            tuple(r)
            for r in spark.sql(f"SELECT * FROM sess_fuzz{trial}").collect()
        }
        assert got == want, f"trial {trial} (gap={gap_min}m, files={nfiles})"


def test_curate_stream_matches_batch(spark, tmp_path):
    """Streaming curation (quality -> redact -> decontaminate -> dedup)
    emits exactly the batch pipeline's keep-set; the duplicate key keeps
    its first arrival in the stream."""
    from sparkwrangle.streaming.curation import (
        curate_stream,
        eval_shingle_hashes,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    good = " ".join(["the and of to a in is that with for"] * 12)
    rows = [
        # kept: long, stopword-structured, unique
        (1, "2024-01-01 10:00:00", good + " one", "en", "srcA"),
        # dup pair (identical after email redaction), split across batches
        (2, "2024-01-01 10:01:00", good + " contact bob@x.com now", "en", "srcA"),
        (5, "2024-01-01 10:05:00", good + " contact eve@y.org now", "en", "srcB"),
        # dropped: quality below threshold (short)
        (3, "2024-01-01 10:02:00", "tiny doc", "en", "srcA"),
        # dropped: contains the eval 8-gram verbatim
        (4, "2024-01-01 10:03:00", good + " " + base, "en", "srcB"),
    ]
    eval_docs = spark.createDataFrame(
        [(100, base)], "doc_id long, text string"
    )
    # DataFrame form on BOTH paths: batch takes the explode/semi/anti
    # join, the stream takes the stream-static left-anti join — the
    # parity assertion below pins the two join shapes to each other.
    ev = eval_shingle_hashes(eval_docs, n=8)
    assert ev.count() == 3  # 10 tokens -> three 8-grams

    def _docs(rs):
        return spark.createDataFrame(
            rs, "doc_id long, ts string, text string, lang string, source string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    batch_out = curate_stream(_docs(rows), ev).collect()
    # batch keep-first is deterministic: earliest ts wins the dup key
    assert sorted(r.doc_id for r in batch_out) == [1, 2]
    assert all("[EMAIL]" in r.redacted for r in batch_out if r.doc_id in (2, 5))

    d = str(tmp_path / "curate")
    os.makedirs(d)
    _docs(rows[:3]).coalesce(1).write.parquet(os.path.join(d, "b1"))
    _docs(rows[3:]).coalesce(1).write.parquet(os.path.join(d, "b2"))
    schema = "doc_id long, ts timestamp, text string, lang string, source string"
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(os.path.join(d, "*"))
    out = curate_stream(stream, ev)
    q = (
        out.writeStream.format("memory")
        .queryName("curate_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)
    got = spark.sql("SELECT * FROM curate_sink").collect()
    got_ids = sorted(r.doc_id for r in got)
    # first arrival (doc 2) wins the dedup key in arrival order
    assert got_ids == [1, 2]
    assert {r.doc_id for r in got} <= {1, 2, 5}


def test_curate_stream_dedup_state_bounded_by_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark semantics: duplicates within the
    horizon are dropped, and once the watermark passes a key's expiry
    (first occurrence + delay) its state is EVICTED — eviction happens at
    micro-batch COMMIT, so a recurrence lands fresh one batch later. The
    bounded-state behavior a 100 TB stream needs: plain
    dropDuplicates(subset) would dedup over all history and drop doc 14.
    (The in-order parity test cannot distinguish the two.)"""
    import os

    from sparkwrangle.streaming.curation import curate_stream

    good = " ".join(["the and of to a in is that with for"] * 12)
    dup_text = good + " recurring bulletin body"
    batches = [
        [
            (10, "2024-01-01 10:00:00", dup_text, "en", "srcA"),
            # same normalized text within the 10-minute horizon -> dropped
            (11, "2024-01-01 10:05:00", dup_text, "en", "srcB"),
            # pacer advances the watermark to 10:20 after batch 0
            (12, "2024-01-01 10:30:00", good + " unique pacer marker", "en", "srcA"),
        ],
        [
            # batch 1 runs with watermark 10:20 > expiry 10:10, but state
            # eviction happens at batch COMMIT after input processing, so
            # this in-batch recurrence is still deduplicated...
            (13, "2024-01-01 10:25:00", dup_text, "en", "srcB"),
        ],
        [
            # ...while a recurrence in the NEXT batch finds the state
            # evicted and is admitted again
            (14, "2024-01-01 10:40:00", dup_text, "en", "srcA"),
        ],
    ]

    def _docs(rs):
        from pyspark.sql import functions as F

        return spark.createDataFrame(
            rs, "doc_id long, ts string, text string, lang string, source string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    d = str(tmp_path / "curate_wm")
    os.makedirs(d)
    for i, rs in enumerate(batches):
        _docs(rs).coalesce(1).write.parquet(os.path.join(d, f"b{i}"))
    schema = "doc_id long, ts timestamp, text string, lang string, source string"
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(os.path.join(d, "*"))
    out = curate_stream(stream, [99_999_999], watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("curate_wm_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)
    got_ids = sorted(
        r.doc_id for r in spark.sql("SELECT doc_id FROM curate_wm_sink").collect()
    )
    assert got_ids == [10, 12, 14], got_ids


def test_windowed_hll_stream_equals_batch(spark, tmp_path):
    """Streaming HLL registers (availableNow over two files, complete
    mode) match the batch registers exactly, and the finalized per-window
    distinct estimates land within the HLL error band of the true
    distinct counts."""
    import pandas as pd
    from pyspark.sql import functions as F

    from sparkwrangle.ext.sketches import hll_estimate
    from sparkwrangle.streaming.windows import windowed_hll_registers

    base = pd.Timestamp("2024-03-04 09:00:00")
    rows = pd.DataFrame(
        {
            "user": [f"u{i % 37}" for i in range(200)],
            "ts": [base + pd.Timedelta(minutes=i % 170) for i in range(200)],
            "value": [float(i) for i in range(200)],
        }
    )
    bdf = spark.createDataFrame(rows)
    batch = windowed_hll_registers(bdf, "user", window="1 hour")
    want = {tuple(r) for r in batch.collect()}
    assert want

    d = str(tmp_path / "hll")
    spark.createDataFrame(rows.iloc[:120]).write.parquet(f"{d}/p0")
    spark.createDataFrame(rows.iloc[120:]).write.parquet(f"{d}/p1")
    stream = (
        spark.readStream.schema("user string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = windowed_hll_registers(stream, "user", window="1 hour", watermark=None)
    q = (
        out.writeStream.format("memory").queryName("hll_sink")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(600)
    got = {tuple(r) for r in spark.sql("SELECT * FROM hll_sink").collect()}
    assert got == want

    # read-side finalize: estimates within the ±3σ band of exact
    regs = spark.sql("SELECT * FROM hll_sink")
    est = {
        (r.window_start, r.window_end): r.hll_raw
        for r in hll_estimate(regs, ["window_start", "window_end"]).collect()
    }
    exact = {
        (r.window_start, r.window_end): r.n
        for r in bdf.groupBy(F.window("ts", "1 hour"))
        .agg(F.countDistinct("user").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n",
        )
        .collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert abs(est[k] - n) / n < 0.25, (k, est[k], n)


def test_windowed_cms_stream_equals_batch(spark, tmp_path):
    """Streaming CMS counters (availableNow, complete mode) equal the
    batch counters exactly; finalized point estimates never undercount
    the true per-window item frequencies."""
    import pandas as pd
    from pyspark.sql import functions as F

    from sparkwrangle.streaming.windows import windowed_cms_counters

    base = pd.Timestamp("2024-03-04 09:00:00")
    rows = pd.DataFrame(
        {
            "user": [f"u{i % 23}" for i in range(200)],
            "ts": [base + pd.Timedelta(minutes=i % 170) for i in range(200)],
            "value": [float(i) for i in range(200)],
        }
    )
    bdf = spark.createDataFrame(rows)
    want = {tuple(r) for r in windowed_cms_counters(bdf, "user", window="1 hour").collect()}
    assert want

    d = str(tmp_path / "cms")
    spark.createDataFrame(rows.iloc[:100]).write.parquet(f"{d}/p0")
    spark.createDataFrame(rows.iloc[100:]).write.parquet(f"{d}/p1")
    stream = (
        spark.readStream.schema("user string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = windowed_cms_counters(stream, "user", window="1 hour", watermark=None)
    q = (
        out.writeStream.format("memory").queryName("cms_sink")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(600)
    got = {tuple(r) for r in spark.sql("SELECT * FROM cms_sink").collect()}
    assert got == want

    # read-side finalize for one window: estimates >= exact counts
    from sparkwrangle.ext.sketches import cms_estimates

    regs = spark.sql("SELECT * FROM cms_sink")
    first_win = regs.agg(F.min("window_start")).collect()[0][0]
    sketch = regs.filter(F.col("window_start") == first_win).select("d", "bucket", "cnt")
    exact = (
        bdf.filter(
            (F.col("ts") >= F.lit(first_win))
            & (F.col("ts") < F.lit(first_win) + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy(F.col("user").alias("item"))
        .agg(F.count("*").alias("exact_cnt"))
    )
    est = cms_estimates(exact, sketch, "item").collect()
    assert est and all(r.cms_est >= r.exact_cnt for r in est)


def test_streaming_expectations_drop_and_observe(spark, tmp_path):
    """Expectations gate a stream: violating rows are dropped, per-rule
    violation counts surface in the query's own observedMetrics (the
    production monitoring surface), and mode='fail' poisons the batch."""
    import pyspark.sql.functions as F
    import pytest

    from sparkwrangle.streaming.expectations import with_expectations

    d = str(tmp_path / "exp")
    os.makedirs(d)
    _write(
        spark,
        [
            ("2024-01-01 10:00:00", 1.0),
            ("2024-01-01 10:01:00", -3.0),   # violates nonneg
            ("2024-01-01 10:02:00", None),   # violates not_null
            ("2024-01-01 10:03:00", 2.0),
        ],
        os.path.join(d, "b1"),
    )
    rules = {
        "not_null": F.col("value").isNotNull(),
        "nonneg": F.col("value").isNull() | (F.col("value") >= 0),
    }
    stream = spark.readStream.schema(_SCHEMA).parquet(os.path.join(d, "*"))
    out = with_expectations(stream, rules)
    q = (
        out.writeStream.format("memory")
        .queryName("exp_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)
    kept = sorted(
        r.value for r in spark.sql("SELECT * FROM exp_sink").collect()
    )
    assert kept == [1.0, 2.0]
    metrics = None
    for p in q.recentProgress:
        om = p["observedMetrics"] if isinstance(p, dict) else p.observedMetrics
        if om and "expectations" in om:
            metrics = om["expectations"]
    assert metrics is not None
    assert metrics["rows_in"] == 4
    assert metrics["violations_not_null"] == 1
    assert metrics["violations_nonneg"] == 1

    # batch frames: same gate, same metrics via Observation-free observe
    bdf = _df(spark, [("2024-01-01 10:00:00", 5.0), ("2024-01-01 10:01:00", -1.0)])
    got = with_expectations(bdf, rules).collect()
    assert [r.value for r in got] == [5.0]

    # mode='fail': the violating batch raises instead of dropping
    with pytest.raises(Exception, match="expectation violated"):
        with_expectations(bdf, rules, mode="fail").collect()

    # mode='keep': audit only, nothing dropped
    assert len(with_expectations(bdf, rules, mode="keep").collect()) == 2


def test_expectations_fail_mode_pass_path_and_batch_metrics(spark):
    """VERDICT r4 #5: pin the two with_expectations surfaces the drop-path
    test does not reach — (a) mode='fail' on a CLEAN frame is a pure
    pass-through (assert_true yields NULL for every passing row, no rows
    lost, no raise), and (b) the observed-metric VALUES are readable
    batch-side through a pyspark Observation handle, including zero
    violation counts on the clean frame and exact counts on a dirty one."""
    import pyspark.sql.functions as F
    from pyspark.sql import Observation

    from sparkwrangle.streaming.expectations import with_expectations

    rules = {
        "not_null": F.col("value").isNotNull(),
        "nonneg": F.col("value").isNull() | (F.col("value") >= 0),
    }

    clean = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "value double")
    obs = Observation("exp_clean")
    got = with_expectations(
        clean, rules, observation_name=obs, mode="fail"
    ).collect()
    assert sorted(r.value for r in got) == [1.0, 2.0, 3.0]
    m = obs.get
    assert m["rows_in"] == 3
    assert m["violations_not_null"] == 0
    assert m["violations_nonneg"] == 0

    dirty = spark.createDataFrame(
        [(5.0,), (-1.0,), (None,), (-2.0,)], "value double"
    )
    obs2 = Observation("exp_dirty")
    kept = with_expectations(
        dirty, rules, observation_name=obs2, mode="drop"
    ).collect()
    assert [r.value for r in kept] == [5.0]
    m2 = obs2.get
    assert m2["rows_in"] == 4
    assert m2["violations_not_null"] == 1
    assert m2["violations_nonneg"] == 2


def test_curate_stream_unscoreable_docs_gate_as_zero(spark):
    """A doc with no [a-z0-9] tokens (quality NULL from add_text_stats)
    gates as quality 0.0: dropped at the default threshold, KEPT at
    min_quality=0 — previously the NULL comparison dropped it even at 0,
    silently and unconditionally."""
    import datetime

    from sparkwrangle.streaming.curation import curate_stream

    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, t0, "the quick brown fox and the lazy dog with many common words "
         * 5, "en", "s1"),
        (2, t0, "!!! ??? ***", "und", "s1"),  # punctuation-only → quality NULL
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, ts timestamp, text string, lang string, source string"
    )
    kept_default = curate_stream(docs, eval_hashes=[]).select("doc_id").collect()
    assert [r.doc_id for r in kept_default] == [1]
    kept_zero = (
        curate_stream(docs, eval_hashes=[], min_quality=0.0)
        .select("doc_id")
        .collect()
    )
    assert sorted(r.doc_id for r in kept_zero) == [1, 2]


def test_expectations_null_rules_count_as_violations(spark):
    """A rule that evaluates to NULL (naively-written `value > 0` against
    a NULL value) drops the row, so it must COUNT as a violation — the
    metrics must reconcile with the gate: rows_in − violations == rows_out
    for a single rule, with no hand-written null-safety required."""
    import pyspark.sql.functions as F
    from pyspark.sql import Observation

    from sparkwrangle.streaming.expectations import with_expectations

    df = spark.createDataFrame([(1.0,), (None,), (-1.0,)], "value double")
    obs = Observation("exp_null")
    kept = with_expectations(
        df, {"pos": F.col("value") > 0}, observation_name=obs, mode="drop"
    ).collect()
    assert [r.value for r in kept] == [1.0]
    m = obs.get
    assert m["rows_in"] == 3
    assert m["violations_pos"] == 2  # the NULL row counts, not just -1.0
    assert m["rows_in"] - m["violations_pos"] == len(kept)


def test_windowed_hll_ignores_null_items(spark):
    """Streaming twin of the r5 hll_registers NULL guard: a NULL item
    must not create a phantom (window, reg=NULL) register row."""
    import datetime

    import pyspark.sql.functions as F

    from sparkwrangle.streaming.windows import windowed_hll_registers

    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    rows = [(t0, "a"), (t0, None), (t0, "b")]
    bdf = spark.createDataFrame(rows, "ts timestamp, user string")
    regs = windowed_hll_registers(bdf, "user", window="1 hour")
    assert regs.filter(F.col("reg").isNull()).count() == 0
    assert regs.count() == 2  # one register per non-null distinct user


def test_stage_replay_rejects_empty_feed(spark, tmp_path):
    """An empty feed must raise a clear ValueError BEFORE creating the
    staging directory (int(None) used to throw a bare TypeError after
    mkdir, leaving a half-staged directory)."""
    import os

    import pytest as _pytest

    from sparkwrangle.streaming.replay import stage_replay

    empty = spark.createDataFrame(
        [], "feed_seq bigint, company string, ticker_idx int, price double"
    )
    target = str(tmp_path / "stage_empty")
    with _pytest.raises(ValueError, match="empty"):
        stage_replay(empty, target)
    assert not os.path.exists(target)


def test_curate_stream_static_anti_join_edges(spark, tmp_path):
    """The stream-static decontamination anti join: (a) an EMPTY eval
    suite folds to one row with an empty array, overlaps nothing, and
    keeps every surviving doc; (b) a non-empty suite drops exactly the
    contaminated doc; (c) the join is STATELESS — the streaming query's
    only state operator is the final dedup, so the static side adds no
    per-key streaming state to evict."""
    import os

    from pyspark.sql import functions as F

    from sparkwrangle.streaming.curation import curate_stream

    good = " ".join(["the and of to a in is that with for"] * 12)
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, "2024-01-01 10:00:00", good + " one", "en", "srcA"),
        (4, "2024-01-01 10:03:00", good + " " + base, "en", "srcB"),
    ]

    def _docs(rs):
        return spark.createDataFrame(
            rs, "doc_id long, ts string, text string, lang string, source string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    d = str(tmp_path / "anti")
    os.makedirs(d)
    _docs(rows).coalesce(1).write.parquet(os.path.join(d, "b1"))
    schema = "doc_id long, ts timestamp, text string, lang string, source string"

    def _run(ev_df, sink):
        stream = spark.readStream.schema(schema).parquet(os.path.join(d, "*"))
        q = (
            curate_stream(stream, ev_df)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600)
        n_state_ops = len(q.lastProgress["stateOperators"])
        return (
            sorted(
                r.doc_id
                for r in spark.sql(f"SELECT doc_id FROM {sink}").collect()
            ),
            n_state_ops,
        )

    empty_ev = spark.createDataFrame([], "shash long")
    got_empty, state_empty = _run(empty_ev, "anti_empty_sink")
    assert got_empty == [1, 4]  # nothing contaminated, both kept

    eval_docs = spark.createDataFrame([(100, base)], "doc_id long, text string")
    from sparkwrangle.streaming.curation import eval_shingle_hashes

    got_real, state_real = _run(eval_shingle_hashes(eval_docs, n=8), "anti_real_sink")
    assert got_real == [1]  # doc 4 carries the eval 8-grams -> dropped
    # exactly ONE stateful operator either way: dropDuplicatesWithinWatermark.
    # The stream-static anti join must not appear as a state operator.
    assert state_empty == 1 and state_real == 1
