"""Unit tests for the pure-Catalyst operator library on tiny frames."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sparkwrangle.ops.filters import replace_inf, safe_div_pandas, time_of_day_band
from sparkwrangle.ops.joins import asof_union_ffill, block_range_join
from sparkwrangle.ops.windows import (
    business_days,
    drop_first_row,
    ffill,
    lag_pct_change,
    log_returns,
    minmax_normalize,
    next_bar,
)


def _bars(spark):
    rows = [
        ("A", "2024-01-01 10:00:00", 100.0),
        ("A", "2024-01-01 10:05:00", 110.0),
        ("A", "2024-01-01 10:10:00", None),
        ("A", "2024-01-01 10:15:00", 121.0),
        ("B", "2024-01-01 10:00:00", 50.0),
        ("B", "2024-01-01 10:05:00", 45.0),
    ]
    return spark.createDataFrame(rows, "ticker string, ts_s string, close double").select(
        "ticker", F.col("ts_s").cast("timestamp").alias("ts"), "close"
    )


def test_ffill_carries_last_value(spark):
    out = ffill(_bars(spark), "close", ["ticker"], ["ts"]).orderBy("ticker", "ts")
    vals = [r.close for r in out.collect()]
    assert vals == [100.0, 110.0, 110.0, 121.0, 50.0, 45.0]


def test_pct_change_and_log_returns(spark):
    df = _bars(spark).filter(F.col("close").isNotNull())
    out = lag_pct_change(df, "close", ["ticker"], ["ts"]).orderBy("ticker", "ts")
    pct = [r.pct_change for r in out.collect()]
    assert pct[0] is None
    assert abs(pct[1] - 0.10) < 1e-12
    lr = log_returns(df, "close", ["ticker"], ["ts"]).orderBy("ticker", "ts").collect()
    assert abs(lr[1].log_ret - math.log(1.10)) < 1e-12


def test_minmax_normalize_bounds(spark):
    out = minmax_normalize(_bars(spark), "close", ["ticker"]).collect()
    for r in out:
        if r.norm is not None:
            assert -1e-12 <= r.norm <= 1 + 1e-12


def test_minmax_degenerate_group_is_null(spark):
    df = spark.createDataFrame([("A", 5.0), ("A", 5.0)], "k string, v double")
    out = minmax_normalize(df, "v", ["k"]).collect()
    assert all(r.norm is None for r in out)


def test_safe_div_pandas_inf_then_replace(spark):
    df = spark.createDataFrame(
        [(1.0, 0.0), (-1.0, 0.0), (0.0, 0.0), (6.0, 2.0)], "num double, den double"
    )
    df = df.withColumn("q", safe_div_pandas(F.col("num"), F.col("den")))
    rows = df.collect()
    assert rows[0].q == float("inf") and rows[1].q == float("-inf")
    assert math.isnan(rows[2].q) and rows[3].q == 3.0
    cleaned = replace_inf(df, ["q"]).collect()
    assert cleaned[0].q == 0.0 and cleaned[1].q == 0.0


def test_time_of_day_band_inclusive(spark):
    df = _bars(spark)
    out = time_of_day_band(df, "ts", (10, 5), (10, 10))
    assert out.count() == 3  # 10:05 A, 10:10 A, 10:05 B — inclusive both ends


def test_time_of_day_band_second_resolution(spark):
    # pandas between_time compares full times: 16:30:45 is OUTSIDE a band
    # ending 16:30, while 16:30:00 is inside (inclusive end).
    df = spark.createDataFrame(
        [("2023-01-02 16:30:00",), ("2023-01-02 16:30:45",), ("2023-01-02 14:29:59",)],
        "ts_s string",
    ).select(F.col("ts_s").cast("timestamp").alias("ts"))
    got = {r.ts.strftime("%H:%M:%S") for r in time_of_day_band(df, "ts", (14, 30), (16, 30)).collect()}
    assert got == {"16:30:00"}


def test_next_bar_lead(spark):
    df = _bars(spark).filter(F.col("close").isNotNull())
    out = next_bar(df, ["close"], ["ticker"], ["ts"]).orderBy("ticker", "ts").collect()
    assert out[0].next_close == 110.0
    assert out[-1].next_close is None


def test_drop_first_row(spark):
    out = drop_first_row(_bars(spark), ["ticker"], ["ts"])
    assert out.count() == 4


def test_asof_union_ffill_snaps_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [("u", "2024-01-01 10:00:00"), ("u", "2024-01-01 10:07:00")],
        "k string, ts_s string",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [("u", "2024-01-01 10:00:00", 1.0), ("u", "2024-01-01 10:05:00", 2.0)],
        "k string, ts_s string, rate double",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "rate")
    out = asof_union_ffill(left, right, "ts", ["k"], "rate").orderBy("ts").collect()
    # same-timestamp right row is visible (pandas reindex+ffill semantics)
    assert [r.rate for r in out] == [1.0, 2.0]


def test_block_range_join(spark):
    facts = _bars(spark)
    blocks = spark.createDataFrame(
        [(0, "2024-01-01 09:00:00", "2024-01-01 10:07:00")],
        "block_id int, s string, e string",
    ).select(
        "block_id",
        F.col("s").cast("timestamp").alias("start_ts"),
        F.col("e").cast("timestamp").alias("end_ts"),
    )
    out = block_range_join(facts, blocks, "ts", "start_ts", "end_ts")
    assert out.count() == 4  # inclusive ends: 10:00,10:05 per ticker


def test_business_days_skips_weekends(spark):
    df = spark.sql("SELECT DATE '2022-12-01' AS s, DATE '2022-12-14' AS e")
    days = df.select(business_days(F.col("s"), F.col("e")).alias("d")).collect()[0].d
    assert len(days) == 10  # two full business weeks
    assert all(d.isoweekday() <= 5 for d in days)


def test_ewma_matches_pandas_adjust_true(spark):
    """For series shorter than the 20-lag truncation, the windowed EWMA
    equals pandas ewm(alpha=0.2, adjust=True) exactly (same closed
    form); the truncated tail only matters beyond 20 rows, where the
    residual weight is 0.8^20 ~ 1.2%."""
    import pandas as pd

    from sparkwrangle.catalog import CATALOG

    vals = [3.0, 7.5, 1.25, 9.0, 0.5, 4.75, 2.0, 8.125, 6.5, 5.0]
    rows = pd.DataFrame(
        {
            "event_id": range(1, len(vals) + 1),
            "ts": pd.to_datetime(
                [1_700_000_000 + i * 60 for i in range(len(vals))], unit="s"
            ),
            "user_id": [1] * len(vals),
            "event_type": ["view"] * len(vals),
            "value": vals,
            "props": ["{}"] * len(vals),
        }
    )
    import tempfile
    from pathlib import Path

    d = Path(tempfile.mkdtemp()) / "ewma"
    d.mkdir()
    rows.to_parquet(d / "events.parquet", index=False)
    got = {
        r.event_id: r.ewma
        for r in CATALOG["w_ewma_smoothing"].fn(spark, str(d)).collect()
    }
    want = pd.Series(vals).ewm(alpha=0.2, adjust=True).mean()
    for i, w in enumerate(want):
        assert abs(got[i + 1] - round(w, 6)) <= 1e-6, (i, got[i + 1], w)


def test_grouped_rank_randomized_parity_fuzz(spark):
    """Committed slice of the bitwise parity fuzz (tools/fuzz_parity.py
    — the single source of the harness; run the tool directly for the
    full campaign). The round-8 80-trial run caught a real ulp
    divergence (the interpolation had to be (ceil−pos)·lo +
    (pos−floor)·hi to match percentile() bitwise); this keeps that
    class pinned in the suite."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools import fuzz_parity as fp

    fp.FAILS.clear()
    fp.fuzz_grouped_ranks(spark, trials=8)
    assert not fp.FAILS, fp.FAILS


def test_window_decorrelation_parity_fuzz_slice(spark):
    """Committed slice of the window-decorrelation parity fuzz
    (tools/fuzz_parity.py::fuzz_window_decorrelation — full campaign in
    the tool): the round-9 tpch_q2/q17/q20/h_struct rewrites replaced
    aggregate-join-back forms with window decorrelations; this pins
    row-identity / bitwise equality between the two forms across tied
    minima, NULL/NaN values, and dimension-filtered keys, so a future
    semantics change to either shape fails here instead of shipping."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools import fuzz_parity as fp

    fp.FAILS.clear()
    fp.fuzz_window_decorrelation(spark, trials=4)
    assert not fp.FAILS, fp.FAILS


def test_grouped_rank_string_order_matches_window_form(spark):
    """The struct-sampled boundary path (non-numeric leading order key —
    the numeric approxQuantile fast path can't engage) is bitwise the
    plain window form, with NULL order values, NaN-free strings, and a
    NULL group key."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sparkwrangle.ops.windows import grouped_percent_rank, grouped_row_number

    rows = [
        (i, ["a", None][i % 2], f"tok{(i * 37) % 50:02d}" if i % 11 else None)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, g string, s string")
    w = Window.partitionBy("g").orderBy("s", "id")
    want_rn = {r.id: r.rn for r in df.withColumn("rn", F.row_number().over(w)).collect()}
    got_rn = {
        r.id: r.rn
        for r in grouped_row_number(df, ["g"], ["s", "id"], num_partitions=5).collect()
    }
    assert got_rn == want_rn
    want_pr = {r.id: r.pr for r in df.withColumn("pr", F.percent_rank().over(w)).collect()}
    got_pr = {
        r.id: r.pr
        for r in grouped_percent_rank(df, ["g"], ["s", "id"], num_partitions=5).collect()
    }
    assert got_pr == want_pr


def test_grouped_rank_order_block_matches_window_form(spark):
    """The caller-supplied zero-job ``order_block`` path (a bucketing
    expression monotone in the order key — here floor(v), with NULLs
    mapped to the minimum block) is bitwise the plain window form,
    including NULL order values and NULL group keys."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sparkwrangle.ops.windows import grouped_percent_rank, grouped_row_number

    rows = [
        (i, ["a", "b", None][i % 3], float(i % 11) / 2 if i % 13 else None)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    blk = F.coalesce(F.floor("v").cast("bigint"), F.lit(-1))
    w = Window.partitionBy("g").orderBy("v", "id")
    want_rn = {r.id: r.rn for r in df.withColumn("rn", F.row_number().over(w)).collect()}
    got_rn = {
        r.id: r.rn
        for r in grouped_row_number(df, ["g"], ["v", "id"], order_block=blk).collect()
    }
    assert got_rn == want_rn
    want_pr = {r.id: r.pr for r in df.withColumn("pr", F.percent_rank().over(w)).collect()}
    got_pr = {
        r.id: r.pr
        for r in grouped_percent_rank(df, ["g"], ["v", "id"], order_block=blk).collect()
    }
    assert got_pr == want_pr

    # a NULL block would silently vanish in the offsets equi-join — the
    # helper must fail LOUDLY on a violated never-null contract instead
    import pytest as _pytest

    bad = F.floor("v").cast("bigint")  # NULL for the null-v rows
    with _pytest.raises(Exception, match="order_block must never be NULL"):
        grouped_row_number(df, ["g"], ["v", "id"], order_block=bad).collect()


def test_grouped_percent_rank_matches_window_form(spark):
    """grouped_percent_rank (two-level range ranking, no per-group
    single-task sort) is bitwise the plain percent_rank window: groups
    spanning many range partitions, a single-row group (pr = 0.0), an
    empty-group-cols global ranking, and a forced tiny partition count
    so every group straddles partition boundaries."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sparkwrangle.ops.windows import grouped_percent_rank

    rng = random.Random(7)
    rows = [
        (i, ["en", "de", "fr"][i % 3], float(rng.randint(0, 9)))
        for i in range(300)
    ]
    rows.append((9999, "zz", 5.0))  # single-row group
    df = spark.createDataFrame(rows, "doc_id long, lang string, q double")

    w = Window.partitionBy("lang").orderBy("q", "doc_id")
    want = {
        (r.doc_id): r.pr
        for r in df.withColumn("pr", F.percent_rank().over(w)).collect()
    }
    got = {
        (r.doc_id): r.pr
        for r in grouped_percent_rank(
            df, ["lang"], ["q", "doc_id"], num_partitions=5
        ).collect()
    }
    assert got == want  # bitwise: same (rank-1)/(n-1) arithmetic

    wg = Window.orderBy("q", "doc_id")
    want_g = {
        r.doc_id: r.pr
        for r in df.withColumn("pr", F.percent_rank().over(wg)).collect()
    }
    got_g = {
        r.doc_id: r.pr
        for r in grouped_percent_rank(
            df, [], ["q", "doc_id"], num_partitions=5
        ).collect()
    }
    assert got_g == want_g

    # the row_number variant shares the core; pin it against the plain
    # window form on the same data
    from sparkwrangle.ops.windows import grouped_row_number

    want_rn = {
        r.doc_id: r.rn
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    got_rn = {
        r.doc_id: r.rn
        for r in grouped_row_number(
            df, ["lang"], ["q", "doc_id"], num_partitions=5
        ).collect()
    }
    assert got_rn == want_rn


def test_grouped_exact_quantiles_matches_percentile(spark):
    """grouped_exact_quantiles == Spark percentile() (linear interp):
    heavy ties (any within-tie position assignment picks the same
    value), a single-row group, nulls ignored, and the global
    (empty-group) case — at a partition count that splits groups and
    ties across range partitions."""
    import random

    from pyspark.sql import functions as F

    from sparkwrangle.ops.windows import grouped_exact_quantiles

    rng = random.Random(11)
    rows = [
        (i, ["a", "b"][i % 2], float(rng.randint(0, 5)))  # heavy ties
        for i in range(401)
    ]
    rows.append((9001, "c", 42.0))        # single-row group
    rows.append((9002, "a", None))        # null value -> ignored
    df = spark.createDataFrame(rows, "id long, g string, v double")
    ps = [0.0, 0.5, 0.9, 1.0]

    want = {
        (r.g, p): r.q[i]
        for r in df.filter(F.col("v").isNotNull())
        .groupBy("g")
        .agg(F.expr("percentile(v, array(0.0D, 0.5D, 0.9D, 1.0D))").alias("q"))
        .collect()
        for i, p in enumerate(ps)
    }
    got = {
        (r.g, r.p): r.v
        for r in grouped_exact_quantiles(
            df, ["g"], "v", ps, tiebreak_cols=["id"], num_partitions=7
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, (k, got[k], want[k])

    want_g = (
        df.filter(F.col("v").isNotNull())
        .agg(F.expr("percentile(v, array(0.0D, 0.5D, 0.9D, 1.0D))").alias("q"))
        .collect()[0]
        .q
    )
    got_g = {
        r.p: r.v
        for r in grouped_exact_quantiles(
            df, [], "v", ps, tiebreak_cols=["id"], num_partitions=7
        ).collect()
    }
    for i, p in enumerate(ps):
        assert abs(got_g[p] - want_g[i]) < 1e-12


def test_grouped_rank_null_group_and_all_null_values(spark):
    """The review-found divergences, pinned: (a) a NULL group key is a
    real group (window PARTITION BY semantics) — the null-safe offsets
    join must not drop its rows; (b) grouped_exact_quantiles emits a
    group whose values are ALL null with NULL quantiles, exactly like
    percentile() under GROUP BY, instead of deleting the group."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sparkwrangle.ops.windows import (
        grouped_exact_quantiles,
        grouped_percent_rank,
        grouped_row_number,
    )

    rows = [
        (1, "a", 3.0), (2, "a", 1.0), (3, "a", 2.0),
        (4, None, 9.0), (5, None, 7.0),          # NULL group key
        (6, "b", None), (7, "b", None),          # all-null value group
    ]
    df = spark.createDataFrame(rows, "id long, g string, v double")

    w = Window.partitionBy("g").orderBy("v", "id")
    want_pr = {
        r.id: r.pr for r in df.withColumn("pr", F.percent_rank().over(w)).collect()
    }
    got_pr = {
        r.id: r.pr
        for r in grouped_percent_rank(df, ["g"], ["v", "id"], num_partitions=3).collect()
    }
    assert got_pr == want_pr  # ids 4,5 (NULL group) present and ranked

    want_rn = {
        r.id: r.rn for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    got_rn = {
        r.id: r.rn
        for r in grouped_row_number(df, ["g"], ["v", "id"], num_partitions=3).collect()
    }
    assert got_rn == want_rn

    # percentile() over an all-null group returns a NULL ARRAY (one null
    # scalar), which expands to NULL per requested p
    want_q = {
        (r.g, p): (r.q[i] if r.q is not None else None)
        for r in df.groupBy("g")
        .agg(F.expr("percentile(v, array(0.5D, 1.0D))").alias("q"))
        .collect()
        for i, p in enumerate([0.5, 1.0])
    }
    got_q = {
        (r.g, r.p): r.v
        for r in grouped_exact_quantiles(
            df, ["g"], "v", [0.5, 1.0], tiebreak_cols=["id"], num_partitions=3
        ).collect()
    }
    assert set(got_q) == set(want_q)  # includes ('b', p) and (None, p)
    for k, v in want_q.items():
        if v is None:
            assert got_q[k] is None, k
        else:
            assert abs(got_q[k] - v) < 1e-12, k


def test_grouped_rank_no_reuse_dependency(spark):
    """_grouped_global_rank's block ids are a pure function of row
    values against driver-materialized literal boundaries, so the count
    and probe branches agree UNCONDITIONALLY — exact results even with
    exchange reuse disabled AND AQE off (the configuration the old
    sampled-range-pid construction had to refuse), and with both off
    plus a hostile shuffle-partition count."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sparkwrangle.ops.windows import (
        grouped_exact_quantiles,
        grouped_percent_rank,
        grouped_row_number,
    )

    # NULL, NaN, and ordinary doubles in the order key: NULLs sort
    # first, NaN last — the block expression must agree with the sort
    def _v(i):
        if i % 13 == 0:
            return None
        if i % 17 == 0:
            return float("nan")
        return float(i % 7)

    rows = [(i, ["x", "y", None][i % 3], _v(i)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    w = Window.partitionBy("g").orderBy("v", "id")
    want_rn = {r.id: r.rn for r in df.withColumn("rn", F.row_number().over(w)).collect()}
    want_pr = {r.id: r.pr for r in df.withColumn("pr", F.percent_rank().over(w)).collect()}
    want_q = {
        (r.g, p): r.q[i]
        for r in df.groupBy("g")
        .agg(F.expr("percentile(v, array(0.25D, 0.5D, 0.9D))").alias("q"))
        .collect()
        for i, p in enumerate([0.25, 0.5, 0.9])
    }

    old_reuse = spark.conf.get("spark.sql.exchange.reuse", "true")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try:
        spark.conf.set("spark.sql.exchange.reuse", "false")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        got_rn = {
            r.id: r.rn
            for r in grouped_row_number(df, ["g"], ["v", "id"], num_partitions=5).collect()
        }
        assert got_rn == want_rn
        got_pr = {
            r.id: r.pr
            for r in grouped_percent_rank(df, ["g"], ["v", "id"], num_partitions=7).collect()
        }
        assert got_pr == want_pr
        got_q = {
            (r.g, r.p): r.v
            for r in grouped_exact_quantiles(
                df, ["g"], "v", [0.25, 0.5, 0.9], tiebreak_cols=["id"], num_partitions=5
            ).collect()
        }
        assert set(got_q) == set(want_q)
        for k, v in want_q.items():
            g = got_q[k]
            if v != v:  # NaN-valued quantile (NaN sorts last, both engines)
                assert g != g, k
            else:
                assert g == v, k  # bit-identical (n-1)*p interpolation
    finally:
        spark.conf.set("spark.sql.exchange.reuse", old_reuse)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
