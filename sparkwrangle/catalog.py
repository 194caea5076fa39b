"""Query catalog: every implemented operator as a (PySpark, oracle SQL) pair.

This is the driver-facing coverage surface (SURVEY.md §2 → __spark_entry__).
Each entry's Spark callable takes (spark, sf_dir) and returns a DataFrame;
``oracle`` is the ANSI-SQL equivalent DuckDB runs on the same parquet views.
Column names are aliased identically on both sides (the driver sorts columns
by name before hashing).

Determinism rules (so value-hashes match across engines):

* Per-row IEEE double arithmetic is bitwise identical across engines; the
  hazards are (a) aggregation ORDER for float sums, (b) libm ulp
  differences (log/exp/pow), and (c) round() implementation divergence —
  Spark rounds the exact BigDecimal expansion, DuckDB multiplies in
  floating point, so equal doubles can round differently on .5 boundaries.
* Rules, validated green at BOTH sf0.01 and sf0.1:
  - plain double SUMs → exact decimal accumulator ``dsum``
    (CAST(SUM(CAST(expr AS DECIMAL(25,8))) AS DOUBLE)) — immune to
    partial-aggregation order, no rounding needed at all;
  - transcendental-derived columns (ln/exp/pow/sqrt chains) → ``rf``
    floor-formula rounding (floor(x·10⁶+0.5)/10⁶ — same IEEE ops in both
    engines, so equal inputs always round equally);
  - other derived doubles → round(x, 6) (r6).
* Every window orders by a unique tiebreak (event_id / l_orderkey+linenumber).
* No F.first/any_value without a deterministic frame.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkwrangle.io import load_table
from sparkwrangle.session import prep_session


@dataclass(frozen=True)
class QuerySpec:
    """One catalog entry: a PySpark query and its DuckDB oracle."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible (rows-only check)
    doc: str = ""


CATALOG: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def wrap(fn):
        CATALOG[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prep_session(spark)
    return load_table(spark, sf_dir, name)


def r6(c):
    return F.round(c, 6)


def rf(c, digits: int = 6):
    """floor-formula rounding: floor(x·10ⁿ + 0.5)/10ⁿ.

    Spark's round() goes through an exact BigDecimal expansion while
    DuckDB's multiplies in floating point — equal input doubles can round
    DIFFERENTLY on .5 boundaries. This formula is the same three IEEE ops
    in both engines, so equal inputs always produce equal outputs. Use for
    transcendental-derived columns (ln/exp/pow chains) where inputs may
    also differ by ulps; pair with rf_sql."""
    scale = float(10**digits)
    return F.floor(c * scale + F.lit(0.5)) / scale


def rf_sql(expr: str, digits: int = 6) -> str:
    scale = float(10**digits)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


# Exact decimal accumulator for big double sums (order-insensitive).
def dsum(col_expr) -> F.Column:
    return F.sum(col_expr.cast("decimal(25,8)")).cast("double")


# ---------------------------------------------------------------------------
# A. Scans / sources / sinks
# ---------------------------------------------------------------------------


@register(
    "a_scan_pushdown",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_quantity < 5.0
    """,
    doc="A2/A3: parquet scan with predicate pushdown + column pruning "
    "(engine-side form of the reference's per-ticker fetches, "
    "stock_arbitrage.ipynb:27-28).",
)
def a_scan_pushdown(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01")) & (F.col("l_quantity") < 5.0)
    ).select("l_orderkey", "l_linenumber", "l_extendedprice")


@register(
    "a_rows_to_table",
    """
    SELECT close_type, CAST(roi AS DOUBLE) AS roi FROM (VALUES
        ('tp', 0.012), ('sl', -0.03), ('mc', -0.001)
    ) AS t(close_type, roi)
    """,
    doc="A4: in-memory rows → table (pd.DataFrame(returns, ...), "
    "stock_arbitrage.ipynb:413).",
)
def a_rows_to_table(spark, sf_dir):
    prep_session(spark)
    return spark.createDataFrame(
        [("tp", 0.012), ("sl", -0.03), ("mc", -0.001)], "close_type string, roi double"
    )


@register(
    "a_plot_downsample",
    """
    WITH base AS (
        -- floor(epoch()): DuckDB's epoch carries fractional seconds and
        -- CAST..BIGINT rounds; Spark's unix_timestamp truncates. floor
        -- matches it for the positive-epoch corpus.
        SELECT event_type AS series, CAST(floor(epoch(ts)) AS BIGINT) AS x,
               CAST(value AS DOUBLE) AS y
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ), rng AS (SELECT min(x) AS xmin, max(x) AS xmax FROM base),
    b AS (
        SELECT series, y, (xmax - xmin + 1) AS span,
               CAST(floor((x - xmin) * 64 / (xmax - xmin + 1)) AS BIGINT)
                   AS bucket
        FROM base, rng
    )
    SELECT series, bucket,
           CAST(floor((bucket * span + floor(span / 2.0)) / 64.0) AS BIGINT)
               AS x_off,
           round(CAST(sum(CAST(y AS DECIMAL(25,8))) AS DOUBLE) / count(*), 6)
               AS y_avg,
           min(y) AS y_min, max(y) AS y_max, count(*) AS n
    FROM b GROUP BY series, bucket, span
    """,
    doc="A5 report sink, distributed half: x-axis bucketing to a bounded "
    "point set (≤ series × 64 rows regardless of input size) with "
    "mean + min/max band per bucket — what feeds the dependency-free "
    "SVG renderer (jobs/report.py) in place of the reference's eager "
    "matplotlib charts (stock_arbitrage.ipynb:468 cell 8). One shuffle "
    "on (series, bucket); floor-based bucket math is engine-exact; "
    "offsets (not absolute epochs) keep the hash timezone-invariant.",
)
def a_plot_downsample(spark, sf_dir):
    from sparkwrangle.jobs.report import downsample_series

    ev = _t(spark, sf_dir, "events")
    out = downsample_series(ev, "ts", "value", "event_type", max_points=64)
    return out.select(
        "series", "bucket", "x_off", "y_avg", "y_min", "y_max", "n"
    )


# ---------------------------------------------------------------------------
# B. Projections / filters / predicates
# ---------------------------------------------------------------------------


@register(
    "b_time_range_projection",
    """
    SELECT event_id, user_id, round(value * 1500.0, 6) AS scaled,
           round(abs(value - 50.0), 6) AS abs_dev
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
      AND abs(value - 50.0) >= 10.0
    """,
    doc="B1+B2+B10: time-range slice (history['2006':]), scalar arithmetic "
    "(asset2*1500), threshold predicate (delta.abs()>=pct) — "
    "stock_arbitrage.ipynb:23-28,73.",
)
def b_time_range_projection(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    dev = F.abs(F.col("value") - 50.0)
    return (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-10 00:00:00"))
            & (F.col("ts") < F.lit("2024-01-20 00:00:00"))
            & (dev >= 10.0)
        )
        .select(
            "event_id",
            "user_id",
            r6(F.col("value") * 1500.0).alias("scaled"),
            r6(dev).alias("abs_dev"),
        )
    )


@register(
    "b_time_of_day_band",
    """
    SELECT event_id, user_id, value
    FROM events
    WHERE ((hour(ts) * 60 + minute(ts)) * 60 + CAST(second(ts) AS INT))
          BETWEEN (14*60+30)*60 AND (16*60+30)*60
    """,
    doc="B9/W7: pandas between_time('14:30','16:30') inclusive band "
    "(intra_day_arbitrage.ipynb:92; IntradayRegionArbitrage.py:159).",
)
def b_time_of_day_band(spark, sf_dir):
    from sparkwrangle.ops.filters import time_of_day_band

    ev = _t(spark, sf_dir, "events")
    return time_of_day_band(ev, "ts", (14, 30), (16, 30)).select(
        "event_id", "user_id", "value"
    )


@register(
    "b_div0_inf_replace",
    """
    SELECT l_orderkey, l_linenumber,
           round(CASE WHEN l_quantity - 25.0 = 0 THEN 0.0
                      ELSE l_extendedprice / (l_quantity - 25.0) END, 6) AS ratio
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01'
    """,
    doc="B7/K.4: pandas x/0 → ±inf → replace 0.0 "
    "(stock_arbitrage.ipynb:268). Spark-side emulates numpy inf then "
    "replaces; net effect = CASE in the oracle.",
)
def b_div0_inf_replace(spark, sf_dir):
    from sparkwrangle.ops.filters import replace_inf, safe_div_pandas

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") < F.lit("1996-01-01"))
    df = li.withColumn(
        "ratio", safe_div_pandas(F.col("l_extendedprice"), F.col("l_quantity") - 25.0)
    )
    df = replace_inf(df, ["ratio"], 0.0)
    return df.select("l_orderkey", "l_linenumber", r6("ratio").alias("ratio"))


@register(
    "b_ffill_gaps",
    """
    SELECT event_id, user_id,
           round(last_value(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value_ffill
    FROM events
    """,
    doc="B8: forward fill, the reference's core missing-data idiom "
    "(fillna(method='ffill'), intra_day_arbitrage.ipynb:58,91,111,11189). "
    "'error' rows play the NaN ticks.",
)
def b_ffill_gaps(spark, sf_dir):
    from sparkwrangle.ops.windows import ffill

    ev = _t(spark, sf_dir, "events").withColumn(
        "value_gap", F.when(F.col("event_type") != "error", F.col("value"))
    )
    out = ffill(ev, "value_gap", ["user_id"], ["ts", "event_id"], "value_ffill")
    return out.select("event_id", "user_id", r6("value_ffill").alias("value_ffill"))


@register(
    "b_eligibility_filter",
    """
    SELECT user_id,
           count(DISTINCT event_type) AS n_types,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase
    FROM events
    GROUP BY user_id
    HAVING count(DISTINCT event_type) >= 4
       AND max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1
    """,
    doc="B13: eligibility filter on ragged per-company ticker lists — "
    "≥2 live tickers AND ≥1 EU listing (intra_day_arbitrage.ipynb:11123-11124), "
    "re-expressed over events users.",
)
def b_eligibility_filter(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("n_types"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("has_purchase"),
    )
    return agg.filter((F.col("n_types") >= 4) & (F.col("has_purchase") == 1))


# ---------------------------------------------------------------------------
# C. Joins / alignment
# ---------------------------------------------------------------------------


@register(
    "c_join_delta",
    """
    SELECT o.o_orderkey,
           round((o.o_totalprice - c.c_acctbal) / o.o_totalprice, 6) AS delta
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'F'
    """,
    doc="C2: two-series index-aligned arithmetic — "
    "delta=(a2.Close−a1.Close)/a2.Close (stock_arbitrage.ipynb:71). "
    "Customer side broadcasts.",
)
def c_join_delta(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = _t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey",
        r6((F.col("o_totalprice") - F.col("c_acctbal")) / F.col("o_totalprice")).alias(
            "delta"
        ),
    )


@register(
    "c_asof_union_ffill",
    """
    WITH unioned AS (
        SELECT user_id, ts, event_id, value, 1 AS src, NULL::DOUBLE AS rate
        FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, ts, NULL AS event_id, NULL AS value, 0 AS src, value AS rate
        FROM events WHERE event_type = 'purchase'
    ), filled AS (
        SELECT *, last_value(rate IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts, src
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_rate
        FROM unioned
    )
    SELECT event_id, user_id, round(value, 6) AS value, round(last_rate, 6) AS last_rate
    FROM filled WHERE src = 1
    """,
    doc="C3: as-of / last-known-value alignment — eur_usd.reindex(idx).ffill() "
    "(intra_day_arbitrage.ipynb:111) via the union+ffill idiom (SURVEY §4): "
    "clicks snap to the latest preceding purchase value per user.",
)
def c_asof_union_ffill(spark, sf_dir):
    from sparkwrangle.ops.joins import asof_union_ffill

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("rate")
    )
    out = asof_union_ffill(
        clicks, purchases, on="ts", by=["user_id"], value_col="rate", out_col="last_rate"
    )
    return out.select(
        "event_id", "user_id", r6("value").alias("value"), r6("last_rate").alias("last_rate")
    )


@register(
    "c_conditional_convert",
    """
    SELECT p_partkey,
           round(CASE WHEN p_type LIKE '%BRASS%' THEN p_retailprice * 1.0842
                      ELSE p_retailprice END, 6) AS price_usd
    FROM part
    """,
    doc="C4: conditional currency conversion — multiply only EU listings "
    "(ticker contains '.') by the EURUSD rate "
    "(intra_day_arbitrage.ipynb:113-114).",
)
def c_conditional_convert(spark, sf_dir):
    from sparkwrangle.ops.joins import conditional_convert

    p = _t(spark, sf_dir, "part").withColumn("rate", F.lit(1.0842))
    out = conditional_convert(
        p, "p_retailprice", "rate", F.col("p_type").contains("BRASS"), "price_usd"
    )
    return out.select("p_partkey", r6("price_usd").alias("price_usd"))


@register(
    "c_block_range_join",
    """
    WITH blocks AS (
        SELECT CAST(b AS INTEGER) AS block_id,
               TIMESTAMP '2024-01-01' + INTERVAL (7 * b) DAY AS start_ts,
               TIMESTAMP '2024-01-01' + INTERVAL (7 * b + 7) DAY AS end_ts
        FROM (SELECT unnest(generate_series(0, 4)) AS b)
    )
    SELECT b.block_id, count(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(25,8))) AS DOUBLE) AS sum_value
    FROM events e JOIN blocks b ON e.ts >= b.start_ts AND e.ts < b.end_ts
    GROUP BY b.block_id
    """,
    doc="C7: key-range dispatch — weekly time_blocks drive each backtest "
    "(intra_day_arbitrage.ipynb:1146-1148,132-133). Blocks broadcast → "
    "broadcast nested-loop range join, then per-block agg.",
)
def c_block_range_join(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    blocks = spark.range(0, 5).select(
        F.col("id").cast("int").alias("block_id"),
        (F.lit("2024-01-01").cast("timestamp") + F.expr("make_interval(0,0,0,id*7,0,0,0)")).alias("start_ts"),
        (F.lit("2024-01-01").cast("timestamp") + F.expr("make_interval(0,0,0,id*7+7,0,0,0)")).alias("end_ts"),
    )
    joined = ev.join(
        F.broadcast(blocks),
        (ev.ts >= blocks.start_ts) & (ev.ts < blocks.end_ts),
    )
    return joined.groupBy("block_id").agg(
        F.count("*").alias("n_events"), dsum(F.col("value")).alias("sum_value")
    )


# ---------------------------------------------------------------------------
# D. Aggregations
# ---------------------------------------------------------------------------


@register(
    "d_exceedance_share",
    """
    WITH deltas AS (
        SELECT value / lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS delta
        FROM events
    )
    SELECT round(avg(CASE WHEN abs(delta) >= 0.5 THEN 1 ELSE 0 END), 6) AS share_05,
           round(avg(CASE WHEN abs(delta) >= 1.0 THEN 1 ELSE 0 END), 6) AS share_10
    FROM deltas WHERE delta IS NOT NULL
    """,
    doc="D1+W1: threshold-exceedance frequency of pct-change deltas "
    "((delta.abs()>=pct).sum()/len, stock_arbitrage.ipynb:73-74).",
)
def d_exceedance_share(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    deltas = ev.withColumn("delta", F.col("value") / F.lag("value").over(w) - 1).filter(
        F.col("delta").isNotNull()
    )
    return deltas.agg(
        r6(F.avg((F.abs("delta") >= 0.5).cast("int"))).alias("share_05"),
        r6(F.avg((F.abs("delta") >= 1.0).cast("int"))).alias("share_10"),
    )


@register(
    "d_compounded_return",
    """
    WITH rets AS (
        SELECT user_id,
               ln(value / lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS log_ret
        FROM events WHERE value > 0
    )
    SELECT user_id,
           floor(exp(CAST(SUM(CAST(log_ret AS DECIMAL(25,8))) AS DOUBLE)) * 1000000.0 + 0.5)
               / 1000000.0 AS compounded
    FROM rets WHERE log_ret IS NOT NULL AND isfinite(log_ret)
    GROUP BY user_id
    """,
    doc="D4+W2: compounded total return — np.exp(returns).product() == "
    "exp(sum(log_ret)) (stock_arbitrage.ipynb:266-268,468).",
)
def d_compounded_return(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("value") > 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rets = ev.withColumn("log_ret", F.log(F.col("value") / F.lag("value").over(w)))
    rets = rets.filter(
        F.col("log_ret").isNotNull()
        & ~F.col("log_ret").isin(float("inf"), float("-inf"))
        & ~F.isnan("log_ret")
    )
    return rets.groupBy("user_id").agg(
        rf(F.exp(dsum(F.col("log_ret")))).alias("compounded")
    )


@register(
    "d_conditional_trade_stats",
    """
    SELECT event_type,
           count(*) AS n,
           count(CASE WHEN value > 50 THEN 1 END) AS n_wins,
           round(avg(CASE WHEN value > 50 THEN value END), 6) AS avg_win,
           round(avg(CASE WHEN value <= 50 THEN value END), 6) AS avg_loss,
           round(count(CASE WHEN value <= 10 THEN 1 END) * 1.0
                 / nullif(count(CASE WHEN value <= 50 THEN 1 END), 0), 6) AS small_loss_share
    FROM events
    GROUP BY event_type
    """,
    doc="D7: single-pass conditional counts/means over trades — the cell-33 "
    "report (intra_day_arbitrage.ipynb:11686-11714).",
)
def d_conditional_trade_stats(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    v = F.col("value")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count(F.when(v > 50, 1)).alias("n_wins"),
        r6(F.avg(F.when(v > 50, v))).alias("avg_win"),
        r6(F.avg(F.when(v <= 50, v))).alias("avg_loss"),
        r6(
            F.count(F.when(v <= 10, 1))
            / F.nullif(F.count(F.when(v <= 50, 1)), F.lit(0))
        ).alias("small_loss_share"),
    )


@register(
    "d_first_last_span",
    """
    SELECT user_id,
           round((min({'ts': ts, 'eid': event_id, 'val': value})).val, 6) AS first_value,
           round((max({'ts': ts, 'eid': event_id, 'val': value})).val, 6) AS last_value,
           date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE)) AS span_days,
           round((max({'ts': ts, 'eid': event_id, 'val': value})).val
                 / (min({'ts': ts, 'eid': event_id, 'val': value})).val - 1, 6) AS roi
    FROM events
    GROUP BY user_id
    """,
    doc="D8: first/last + date-span ROI "
    "(intra_day_arbitrage.ipynb:11211-11215 — (index[-1]-index[0]).days, "
    "iloc[-1]/iloc[0]-1).",
)
def d_first_last_span(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    # first/last ordered by (ts, event_id) — event_id makes the order key
    # UNIQUE, so a duplicate (user, ts) pair cannot make min_by/max_by
    # pick partition-dependent rows (the module determinism rule; the
    # oracle's named-struct min/max compares the same key lexicographically)
    o = F.struct("ts", "event_id")
    return ev.groupBy("user_id").agg(
        r6(F.min_by("value", o)).alias("first_value"),
        r6(F.max_by("value", o)).alias("last_value"),
        F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts"))).alias("span_days"),
        r6(F.max_by("value", o) / F.min_by("value", o) - 1).alias("roi"),
    )


@register(
    "d_per_day_portfolio_total",
    """
    SELECT CAST(ts AS DATE) AS day, count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(25,8))) AS DOUBLE) AS total
    FROM events
    GROUP BY CAST(ts AS DATE)
    """,
    doc="D5+D9: per-day grouping (corrected to_date semantics of the "
    "day-of-month quirk K.2) + portfolio row-sum as a long-format "
    "groupBy(ts).sum (intra_day_arbitrage.ipynb:92,11190).",
)
def d_per_day_portfolio_total(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n"), dsum(F.col("value")).alias("total")
    )


@register(
    "d_day_of_month_quirk",
    """
    SELECT day(ts) AS dom, count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(25,8))) AS DOUBLE) AS total
    FROM events
    GROUP BY day(ts)
    """,
    doc="K.2 faithful mode: groupby(index.day) groups by day-of-month int, "
    "merging equal day numbers across months "
    "(intra_day_arbitrage.ipynb:92).",
)
def d_day_of_month_quirk(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(F.dayofmonth("ts").alias("dom")).agg(
        F.count("*").alias("n"), dsum(F.col("value")).alias("total")
    )


@register(
    "d_final_above_share",
    """
    WITH finals AS (
        SELECT user_id, (max({'ts': ts, 'eid': event_id, 'val': value})).val AS final
        FROM events GROUP BY user_id
    )
    SELECT round(avg(CASE WHEN final > 50.0 THEN 1 ELSE 0 END), 6) AS share_above
    FROM finals
    """,
    doc="D10: profitable-ticker share — fraction of series whose final "
    "value beats the threshold (intra_day_arbitrage.ipynb:11708-11711). "
    "This IS quirk K.6's CORRECTED mode (no ticker dropped), so both "
    "K.6 modes are oracle-checked: faithful by k6_faithful_ticker_share, "
    "corrected here — a separate k6 twin would be a byte-duplicate.",
)
def d_final_above_share(spark, sf_dir):
    from sparkwrangle.ops.aggregates import final_above_share

    ev = _t(spark, sf_dir, "events")
    out = final_above_share(ev, ["user_id"], "ts", "value", 50.0, tiebreak_col="event_id")
    return out.select(r6("share_above").alias("share_above"))


# ---------------------------------------------------------------------------
# W. Window / time-series
# ---------------------------------------------------------------------------


@register(
    "w_pct_change_log_returns",
    """
    SELECT event_id, user_id,
           floor((value / lag(value) OVER w - 1) * 1000000.0 + 0.5) / 1000000.0 AS pct_change,
           floor(ln(value / lag(value) OVER w) * 1000000.0 + 0.5) / 1000000.0 AS log_ret,
           floor(lead(value) OVER w * 1000000.0 + 0.5) / 1000000.0 AS next_value
    FROM events
    WHERE value > 0
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="W1+W2+W5: pct_change, log returns, next-bar lookup "
    "(stock_arbitrage.ipynb:266-267,407).",
)
def w_pct_change_log_returns(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("value") > 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        rf(F.col("value") / F.lag("value").over(w) - 1).alias("pct_change"),
        rf(F.log(F.col("value") / F.lag("value").over(w))).alias("log_ret"),
        rf(F.lead("value").over(w)).alias("next_value"),
    )


@register(
    "w_minmax_normalize",
    """
    SELECT event_id, user_id,
           round(CASE WHEN max(value) OVER w <> min(value) OVER w
                      THEN (value - min(value) OVER w)
                           / (max(value) OVER w - min(value) OVER w) END, 6) AS norm
    FROM events
    WINDOW w AS (PARTITION BY user_id, event_type)
    """,
    doc="W3/D2: per-(ticker,block) min-max normalization — normalize_col "
    "(intra_day_arbitrage.ipynb:46-47,118-119); event_type plays block_id.",
)
def w_minmax_normalize(spark, sf_dir):
    from sparkwrangle.ops.windows import minmax_normalize

    ev = _t(spark, sf_dir, "events")
    out = minmax_normalize(ev, "value", ["user_id", "event_type"], "norm")
    return out.select("event_id", "user_id", r6("norm").alias("norm"))


@register(
    "w_rel_to_base",
    """
    SELECT event_id, user_id,
           round(value / first_value(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1, 6) AS rel_ret
    FROM events WHERE value > 0
    """,
    doc="W4: relative-to-base return — df_basing divides each series by the "
    "ffilled base series (intra_day_arbitrage.ipynb:57-63); base = first "
    "value of the series (tickers[0], IntradayRegionArbitrage.py:47).",
)
def w_rel_to_base(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("value") > 0)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        r6(F.col("value") / F.first("value").over(w) - 1).alias("rel_ret"),
    )


@register(
    "w_running_interval_sum",
    """
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cum_value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
    QUALIFY rn > 1
    """,
    doc="D3+W6: running sum (interval sums between trade events = difference "
    "of running sums, stock_arbitrage.ipynb:409) + drop-first-row "
    "(.iloc[1:], intra_day_arbitrage.ipynb:11189).",
)
def w_running_interval_sum(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = wo.rowsBetween(Window.unboundedPreceding, 0)
    return (
        ev.withColumn("cum_value", r6(F.sum("value").over(wf)))
        .withColumn("rn", F.row_number().over(wo))
        .filter(F.col("rn") > 1)
        .select("event_id", "user_id", "cum_value", "rn")
    )


@register(
    "w_business_days",
    """
    SELECT CAST(d AS DATE) AS bday
    FROM (SELECT unnest(generate_series(DATE '2022-12-01', DATE '2023-01-20',
                                        INTERVAL 1 DAY)) AS d)
    WHERE dayofweek(d) NOT IN (0, 6)
    """,
    doc="W8: business-day sequence generation — pd.bdate_range"
    "('2022-12-01','2023-01-20') (intra_day_arbitrage.ipynb:1146-1148). "
    "DuckDB dayofweek: 0=Sun..6=Sat; Spark: 1=Sun..7=Sat.",
)
def w_business_days(spark, sf_dir):
    prep_session(spark)
    seq = spark.sql(
        "SELECT explode(sequence(DATE '2022-12-01', DATE '2023-01-20', "
        "interval 1 day)) AS bday"
    )
    return seq.filter(~F.dayofweek("bday").isin(1, 7))


@register(
    "w_tumbling_window_agg",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(25,8))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts)
    """,
    doc="J/streaming surface in batch form: tumbling 1-hour event-time window "
    "aggregate (F.window); streaming twin in sparkwrangle.streaming.",
)
def w_tumbling_window_agg(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"), dsum(F.col("value")).alias("sum_value"))
        .select(F.col("window.start").alias("window_start"), "n", "sum_value")
    )


# ---------------------------------------------------------------------------
# F/G. Sort / top-k / dedup / reshape
# ---------------------------------------------------------------------------


@register(
    "f_topk_per_group",
    """
    SELECT event_type, event_id, value
    FROM (
        SELECT event_type, event_id, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value DESC, event_id) AS rk
        FROM events
    ) WHERE rk <= 3
    """,
    doc="F1: ordered top-k per group with deterministic tiebreak; the "
    "engine's explicit form of the reference's implicit time ordering.",
)
def f_topk_per_group(spark, sf_dir):
    from sparkwrangle.ops.windows import grouped_top_k

    ev = _t(spark, sf_dir, "events")
    # event_type is a LOW-CARDINALITY group: a plain per-type window
    # would sort corpus/|types| rows in each of |types| tasks at 100 TB.
    # grouped_top_k runs the two-level form (per-partition top-3, then
    # the real rank over the bounded survivor set).
    return grouped_top_k(
        ev.select("event_type", "event_id", "value"),
        ["event_type"],
        [F.desc("value"), F.asc("event_id")],
        3,
    ).select("event_type", "event_id", "value")


@register(
    "g_dedup_by_key",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
    doc="G1: dedup by key — the idempotent-backtest guard "
    "('row[0] not in histories', intra_day_arbitrage.ipynb:11124).",
)
def g_dedup_by_key(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").distinct()


@register(
    "g_pivot_wide",
    """
    SELECT user_id,
           CAST(SUM(CAST(CASE WHEN event_type = 'click' THEN value END AS DECIMAL(25,8))) AS DOUBLE) AS click,
           CAST(SUM(CAST(CASE WHEN event_type = 'error' THEN value END AS DECIMAL(25,8))) AS DOUBLE) AS error,
           CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value END AS DECIMAL(25,8))) AS DOUBLE) AS purchase,
           CAST(SUM(CAST(CASE WHEN event_type = 'signup' THEN value END AS DECIMAL(25,8))) AS DOUBLE) AS signup,
           CAST(SUM(CAST(CASE WHEN event_type = 'view' THEN value END AS DECIMAL(25,8))) AS DOUBLE) AS view
    FROM events GROUP BY user_id
    """,
    doc="G3/C1: wide reshape — the per-company balance pivot "
    "(intra_day_arbitrage.ipynb:11144-11158); explicit value list skips "
    "the discovery scan; full-outer align semantics == pivot.",
)
def g_pivot_wide(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.sum(F.col("value").cast("decimal(25,8)")).cast("double"))
    )
    return out


@register(
    "g_unpivot_long",
    """
    SELECT l_orderkey, l_linenumber, metric, val
    FROM (
        SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS val
        FROM lineitem WHERE l_orderkey < 1000
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount', l_discount
        FROM lineitem WHERE l_orderkey < 1000
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'tax', l_tax
        FROM lineitem WHERE l_orderkey < 1000
    )
    """,
    doc="G3 inverse: wide → long melt via built-in unpivot/stack.",
)
def g_unpivot_long(spark, sf_dir):
    from sparkwrangle.ops.reshape import unpivot_long

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    wide = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("quantity"),
        F.col("l_discount").alias("discount"),
        F.col("l_tax").alias("tax"),
    )
    return unpivot_long(
        wide, ["l_orderkey", "l_linenumber"], ["quantity", "discount", "tax"], "metric", "val"
    )


# ---------------------------------------------------------------------------
# H. Scalar function surface
# ---------------------------------------------------------------------------


@register(
    "h_scalar_suite",
    """
    SELECT l_orderkey, l_linenumber,
           floor(ln(l_extendedprice) * 1000000.0 + 0.5) / 1000000.0 AS ln_price,
           floor(exp(l_discount) * 1000000.0 + 0.5) / 1000000.0 AS exp_disc,
           round(abs(l_quantity - 25.0), 6) AS abs_dev,
           round(sign(l_quantity - 25.0), 6) AS sgn,
           floor(pow(1.0 + l_discount, 365.0 / 30.0) * 1000000.0 + 0.5) / 1000000.0 AS annualized,
           floor(sqrt(l_quantity) * 1000000.0 + 0.5) / 1000000.0 AS sqrt_qty
    FROM lineitem WHERE l_orderkey < 2000
    """,
    doc="H: the reference's full scalar surface — np.log/exp/abs/sign, "
    "annualizing pow (stock_arbitrage.ipynb:266-268,404-406; "
    "intra_day_arbitrage.ipynb:11215).",
)
def h_scalar_suite(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        rf(F.log("l_extendedprice")).alias("ln_price"),
        rf(F.exp("l_discount")).alias("exp_disc"),
        r6(F.abs(q - 25.0)).alias("abs_dev"),
        r6(F.signum(q - 25.0)).alias("sgn"),
        rf(F.pow(F.lit(1.0) + F.col("l_discount"), 365.0 / 30.0)).alias("annualized"),
        rf(F.sqrt(q)).alias("sqrt_qty"),
    )


@register(
    "h_json_extract",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events WHERE event_type = 'purchase'
    """,
    doc="H extension (engine surface, not reference capability — SURVEY §2.H "
    "note): JSON scalar extraction over events.props.",
)
def h_json_extract(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return ev.select(
        "event_id", F.get_json_object("props", "$.k").cast("bigint").alias("k")
    )


# ---------------------------------------------------------------------------
# S. Stateful operators (S1/S2) — inherently sequential scans, not
# SQL-expressible (SURVEY §2.I) → no oracle; the driver records rows-only
# and the golden-replication tests in tests/test_stateful.py pin values
# against the vendored pandas oracle on FIXTURES.md synthetic data.
# ---------------------------------------------------------------------------


def _events_as_pair_bars(spark, sf_dir):
    """Derive a two-ticker bar stream per user from events: leg A = value,
    leg B = a coupled series crossing A around value≈50 so the S1 scan
    produces trades."""
    ev = _t(spark, sf_dir, "events")
    a = ev.select(
        "user_id", F.lit("A").alias("ticker"), "ts", F.col("value").alias("close")
    )
    b = ev.select(
        "user_id",
        F.lit("B").alias("ticker"),
        "ts",
        (F.col("value") * 0.5 + 25.0).alias("close"),
    )
    return a.unionByName(b)


# Gaps-and-islands SQL twin of the S1 scan (SURVEY §2.S1's sketch made
# concrete): the sequential dependency "next open only after prior close"
# becomes a recursive CTE walking precomputed pointers — next_sig (first
# signal row at/after rn), next_nonpos/next_nonneg (first zero-cross after
# rn per sign) — so each trade is one pointer lookup, no correlated
# subqueries. Interval returns are prefix-sum differences over rows
# (sig_rn+1 .. close_rn], matching the scan's inclusive [open, close]
# label slice with entry at next bar (quirks K.9).
_S1_SCAN_SQL = """
    WITH RECURSIVE lagged AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               value AS c1, (value * 0.5 + 25.0) AS c2,
               lag(value) OVER w AS l1,
               lag(value * 0.5 + 25.0) OVER w AS l2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), rets AS (
        SELECT user_id, ts, c1, c2,
               CASE WHEN l1 IS NULL THEN NULL
                    WHEN l1 = 0 AND c1 = 0 THEN NULL
                    WHEN l1 = 0 THEN 0.0
                    WHEN 1 + (c1 / l1 - 1) > 0 THEN ln(1 + (c1 / l1 - 1))
                    WHEN 1 + (c1 / l1 - 1) = 0 THEN 0.0
                    ELSE NULL END AS ret1_raw,
               ln(1 + (c2 / l2 - 1)) AS ret2
        FROM lagged
    ), prep AS (
        SELECT user_id, ts, (c2 - c1) / c2 AS delta,
               CASE WHEN ret1_raw = 'infinity'::DOUBLE
                      OR ret1_raw = '-infinity'::DOUBLE THEN 0.0
                    ELSE ret1_raw END AS ret1,
               ret2
        FROM rets
        WHERE ret1_raw IS NOT NULL AND ret2 IS NOT NULL
    ), base AS (
        SELECT user_id, ts, delta,
               row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn,
               count(*)    OVER (PARTITION BY user_id) AS n,
               sum(ret1)   OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
               sum(ret2)   OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
        FROM prep
    ), aug AS (
        SELECT *,
               min(CASE WHEN abs(delta) >= 0.005 AND rn < n THEN rn END)
                   OVER (PARTITION BY user_id ORDER BY rn
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS next_sig,
               min(CASE WHEN delta <= 0 THEN rn END)
                   OVER (PARTITION BY user_id ORDER BY rn
                         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS next_nonpos,
               min(CASE WHEN delta >= 0 THEN rn END)
                   OVER (PARTITION BY user_id ORDER BY rn
                         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS next_nonneg,
               min(CASE WHEN abs(delta) >= 0.005 AND rn < n THEN rn END)
                   OVER (PARTITION BY user_id) AS first_sig
        FROM base
    ), trades AS (
        SELECT user_id, rn AS sig_rn,
               CASE WHEN delta > 0 THEN next_nonpos ELSE next_nonneg END
                   AS close_rn
        FROM aug WHERE rn = first_sig
        UNION ALL
        SELECT s.user_id, s.rn,
               CASE WHEN s.delta > 0 THEN s.next_nonpos
                    ELSE s.next_nonneg END
        FROM trades t
        JOIN aug c ON c.user_id = t.user_id AND c.rn = t.close_rn + 1
        JOIN aug s ON s.user_id = c.user_id AND s.rn = c.next_sig
        WHERE t.close_rn IS NOT NULL
    )
    SELECT t.user_id, o.ts AS open_date, cl.ts AS end_date,
           floor((CASE WHEN sig.delta > 0 THEN -1.0 ELSE 1.0 END
                    * (cl.cum2 - sig.cum2)
                  + CASE WHEN sig.delta > 0 THEN 1.0 ELSE -1.0 END
                    * (cl.cum1 - sig.cum1)) * 1000000.0 + 0.5) / 1000000.0
               AS "return"
    FROM trades t
    JOIN aug sig ON sig.user_id = t.user_id AND sig.rn = t.sig_rn
    JOIN aug o   ON o.user_id   = t.user_id AND o.rn   = t.sig_rn + 1
    JOIN aug cl  ON cl.user_id  = t.user_id AND cl.rn  = t.close_rn
    WHERE t.close_rn IS NOT NULL
"""


@register(
    "s1_daily_pairs_backtest",
    _S1_SCAN_SQL,
    doc="S1: sequential pairs-trade scan (stock_arbitrage.ipynb:399-414) via "
    "applyInPandas per (user) pair — entry at next bar, zero-crossing exit, "
    "inclusive interval log-return sums. Golden-tested vs pandas oracle AND "
    "cross-checked by a recursive-CTE gaps-and-islands SQL oracle.",
)
def s1_daily_pairs_backtest(spark, sf_dir):
    from sparkwrangle.pipelines.daily_pairs import daily_pairs_backtest

    bars = _events_as_pair_bars(spark, sf_dir)
    out = daily_pairs_backtest(
        bars, "A", "B", ratio=1.0, buy_at=0.005, from_ts=None, extra_keys=["user_id"]
    )
    return out.select(
        "user_id", "open_date", "end_date", rf(F.col("return")).alias("return")
    )


@register(
    "s1_compounded_return",
    "SELECT "
    + rf_sql('CAST(sum(CAST("return" AS DECIMAL(25,8))) AS DOUBLE)')
    + f' AS log_compounded FROM ({_S1_SCAN_SQL})',
    doc="EP1 terminal metric: np.exp(returns).product() over the S1 trade "
    "log (stock_arbitrage.ipynb:468), reported in log space — the product "
    "form overflows double at driver data scale (Σreturn ≈ 10⁴), where "
    "inf breaks fixed-digit rounding. Hash-checked over the recursive-CTE "
    "S1 oracle's rf-rounded per-trade returns (identical addends both "
    "engines) through a decimal accumulator.",
)
def s1_compounded_return(spark, sf_dir):
    from sparkwrangle.pipelines.daily_pairs import daily_pairs_backtest

    bars = _events_as_pair_bars(spark, sf_dir)
    trades = daily_pairs_backtest(
        bars, "A", "B", ratio=1.0, buy_at=0.005, from_ts=None, extra_keys=["user_id"]
    )
    # Sum the same rf-rounded returns the trades query exposes, so the
    # decimal-cast addends are bitwise identical to the oracle's.
    return trades.agg(rf(dsum(rf(F.col("return")))).alias("log_compounded"))


def _s2_two_leg_feed(seq):
    """Shared base/arb two-leg expansion for BOTH S2 regimes (full
    event-time and restricted NTZ): the price/ret maps (value/10+50,
    value+1, (value-50)/200) live HERE once — editing them in one regime
    but not the other would silently diverge the two traders.

    r13 optimization (guide §2.4): the two legs are emitted by ONE
    ``inline`` explode instead of a union of two selects — the union
    re-evaluated the whole events scan + feed_seq window per branch, and
    its output lost the window's hash(user_id) partitioning, forcing the
    trader's applyInPandas to re-shuffle. The explode preserves the
    window exchange, so the feed reaches the Python stage with no
    further exchange; per-group row ORDER differs from the union form
    (legs interleave instead of concatenating) but every trader consumer
    pivots/sorts on (feed_seq, ticker_idx), which is order-insensitive
    (oracle-pinned for both restricted twins)."""
    legs = F.array(
        F.struct(
            F.lit(0).alias("ticker_idx"),
            (F.col("value") / 10.0 + 50.0).alias("price"),
            F.lit(None).cast("double").alias("ret"),
        ),
        F.struct(
            F.lit(1).alias("ticker_idx"),
            (F.col("value") + 1.0).alias("price"),
            ((F.col("value") - 50.0) / 200.0).alias("ret"),
        ),
    )
    return seq.select(
        F.col("user_id").alias("company"), "feed_seq", "ts", F.inline(legs)
    )


@register(
    "s2_intraday_trader",
    None,
    doc="S2/S3: per-tick intraday trader state machine "
    "(IntradayRegionArbitrage.py:35-159) via applyInPandas per company — "
    "TP/SL/market-close ledger with quirks K.1/K.3 preserved. "
    "Golden-tested vs pandas oracle on FIXTURES.md synthetic data.",
)
def s2_intraday_trader(spark, sf_dir):
    from sparkwrangle.stateful.trader import backtest_trades

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("feed_seq", F.row_number().over(w))
    feed = _s2_two_leg_feed(seq)
    params = dict(
        bal=1000.0,
        min_deviation=0.1,
        sl_percent=0.03,
        trigger_range=0.01,
        trade_size=0.1,
        trade_size_percent=True,
    )
    return backtest_trades(feed, params)


# Restricted-regime SQL twin of the S2 trader (the S1 recursive-CTE
# pattern applied to IntradayRegionArbitrage.py:35-159 semantics). The
# regime restrictions make the sequential ledger SQL-expressible without
# changing ONE line of the state machine — the Spark side runs the real
# applyInPandas trader:
#
# * single arb ticker → cpt is at most [0]: no K.3 one-TP-per-tick break
#   ambiguity, no live-list skip on market close (one element).
# * trade_size_percent=False → order_size is a constant (2·trade_size),
#   so the balance is bal₀ + os·Σ_{j<k} Δⱼ — a WINDOW RUNNING SUM, where
#   Δⱼ = bp_close/bp_open − ap_close/ap_open (cash-neutral open
#   contributes 0; roiₖ = os·Δₖ / balₖ vs the pre-close balance, ref
#   :137-139).
# * sl_percent=9.0 (unreachable: |pnl| ≤ (os/bal)·|Δ| ≪ 9 on this
#   price map) → closes are data-determined: TP when −tr ≤ r ≤ tr
#   (checked FIRST, ref :104-124), else 'mc' on any tick strictly after
#   16:29:00 (ref :152-159). Re-entry earliest at close_rn+1 (the
#   data_feed if/elif shape admits no same-tick re-open).
#
# Tick times are synthesized tz-independently (NTZ from event_id
# arithmetic) so the second-of-day the trader sees is identical under
# any driver session timezone — the full-regime s2_intraday_trader keeps
# the real event-time feed and stays rows-only.
_S2_SOD_SQL = "(9*3600 + (event_id * 7919) % 28800)"

_S2_TRADES_SQL = f"""
    WITH RECURSIVE ticks AS (
        SELECT user_id,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id)
                   AS rn,
               (value - 50.0) / 200.0 AS r,
               value + 1.0 AS ap,
               value / 10.0 + 50.0 AS bp,
               {_S2_SOD_SQL} > 59340 AS closing
        FROM events
    ), aug AS (
        SELECT *,
               (NOT closing AND r > 0.1) AS trig,
               (r >= -0.01 AND r <= 0.01) AS tp,
               ((r >= -0.01 AND r <= 0.01) OR closing) AS closes
        FROM ticks
    ), ptr AS MATERIALIZED (
        SELECT *,
               min(CASE WHEN trig THEN rn END) OVER (
                   PARTITION BY user_id ORDER BY rn
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS next_open,
               min(CASE WHEN closes THEN rn END) OVER (
                   PARTITION BY user_id ORDER BY rn
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS next_close,
               min(CASE WHEN trig THEN rn END) OVER (PARTITION BY user_id)
                   AS first_open
        FROM aug
    ), trades AS (
        SELECT user_id, rn AS open_rn, next_close AS close_rn
        FROM ptr WHERE rn = first_open
        UNION ALL
        SELECT c.user_id, s.rn, s.next_close
        FROM trades t
        JOIN ptr c ON c.user_id = t.user_id AND c.rn = t.close_rn + 1
        JOIN ptr s ON s.user_id = c.user_id AND s.rn = c.next_open
        WHERE t.close_rn IS NOT NULL
    ), closed AS MATERIALIZED (
        SELECT t.user_id,
               row_number() OVER (PARTITION BY t.user_id ORDER BY t.open_rn)
                   - 1 AS trade_seq,
               CASE WHEN cl.tp THEN 'tp' ELSE 'mc' END AS close_type,
               (cl.bp / op.bp - cl.ap / op.ap) AS delta
        FROM trades t
        JOIN ptr op ON op.user_id = t.user_id AND op.rn = t.open_rn
        JOIN ptr cl ON cl.user_id = t.user_id AND cl.rn = t.close_rn
        WHERE t.close_rn IS NOT NULL
    )"""

# Fixed order size: balance is bal0 + os·Σ delta — a window RUNNING SUM.
_S2_RESTRICTED_SQL = (
    _S2_TRADES_SQL
    + """
    , bal AS (
        SELECT *, 20.0 * delta AS chg,
               1000.0 + coalesce(sum(20.0 * delta) OVER (
                   PARTITION BY user_id ORDER BY trade_seq
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
                   AS bal_before
        FROM closed
    )
    SELECT user_id AS company, CAST(trade_seq AS INT) AS trade_seq,
           close_type,
           floor((chg / bal_before) * 1000000.0 + 0.5) / 1000000.0 AS roi
    FROM bal
"""
)

# Percent sizing (trade_size_percent=True): order size is 2·ts·bal at each
# open, so the ledger COMPOUNDS — bal_k = bal_{k-1}·(1 + 2·ts·delta_k), a
# sequential product no window can express; the recursion carries it in
# trade order exactly as the state machine does (ref :90-99 open,
# :137-139 close). roi_k = bal_k/bal_{k-1} − 1, and bal_rel = bal_k/bal0
# pins the compounded series itself, not just per-trade increments.
_S2_PERCENT_SQL = (
    _S2_TRADES_SQL
    + """
    , ledg AS (
        SELECT user_id, CAST(-1 AS BIGINT) AS trade_seq,
               CAST(NULL AS VARCHAR) AS close_type,
               CAST(1000.0 AS DOUBLE) AS bal, CAST(NULL AS DOUBLE) AS roi
        FROM (SELECT DISTINCT user_id FROM closed)
        UNION ALL
        SELECT c.user_id, c.trade_seq, c.close_type,
               l.bal * (1.0 + 0.02 * c.delta),
               l.bal * (1.0 + 0.02 * c.delta) / l.bal - 1.0
        FROM ledg l JOIN closed c
          ON c.user_id = l.user_id AND c.trade_seq = l.trade_seq + 1
    )
    SELECT user_id AS company, CAST(trade_seq AS INT) AS trade_seq,
           close_type,
           floor(roi * 1000000.0 + 0.5) / 1000000.0 AS roi,
           floor((bal / 1000.0) * 1000000.0 + 0.5) / 1000000.0 AS bal_rel
    FROM ledg WHERE trade_seq >= 0
"""
)


def _s2_restricted_feed(spark, sf_dir):
    """Shared tz-independent single-arb-ticker feed for the restricted-regime
    trader twins (synthesized NTZ tick times from event_id arithmetic)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    # ONE source of truth for the synthesized second-of-day: _S2_SOD_SQL
    # is the same string the recursive-CTE oracles interpolate, so the
    # Spark feed and its DuckDB twins cannot silently desynchronize
    seq = ev.withColumn("feed_seq", F.row_number().over(w)).withColumn(
        "ts",
        F.expr(
            f"make_timestamp_ntz(2024, 1, 1, "
            f"cast({_S2_SOD_SQL} / 3600 as int), "
            f"cast(({_S2_SOD_SQL} % 3600) / 60 as int), "
            f"cast({_S2_SOD_SQL} % 60 as int))"
        ),
    )
    return _s2_two_leg_feed(seq)


@register(
    "s2_trader_single_position",
    _S2_RESTRICTED_SQL,
    doc="S2/S3 restricted regime: the REAL applyInPandas trader state "
    "machine (IntradayRegionArbitrage.py:35-159 semantics, strict "
    "quirks) parameterized to single-arb-ticker / fixed order size / "
    "unreachable SL, which makes the sequential TP/market-close ledger "
    "exactly expressible as a recursive-CTE gaps-and-islands oracle — "
    "the externally-checkable twin of the golden-pinned full regime.",
)
def s2_trader_single_position(spark, sf_dir):
    from sparkwrangle.stateful.trader import backtest_trades

    feed = _s2_restricted_feed(spark, sf_dir)
    params = dict(
        bal=1000.0,
        min_deviation=0.1,
        sl_percent=9.0,
        trigger_range=0.01,
        trade_size=10.0,
        trade_size_percent=False,
    )
    out = backtest_trades(feed, params)
    return out.select(
        "company", "trade_seq", "close_type", rf(F.col("roi")).alias("roi")
    )


@register(
    "s2_trader_percent_ledger",
    _S2_PERCENT_SQL,
    doc="S3 compounding ledger, externally verified: the REAL applyInPandas "
    "trader with trade_size_percent=True (order size 2·1%·balance, ref "
    ":85-99), restricted regime as s2_trader_single_position. Balance "
    "compounds bal_k = bal_{k-1}·(1+0.02·Δ_k) — a sequential product the "
    "oracle re-derives with a recursive CTE carrying the ledger in trade "
    "order; bal_rel pins the compounded series, closing the one S3 cell "
    "that was golden-only (percent sizing).",
)
def s2_trader_percent_ledger(spark, sf_dir):
    from sparkwrangle.stateful.trader import backtest_trades_ledger

    feed = _s2_restricted_feed(spark, sf_dir)
    params = dict(
        bal=1000.0,
        min_deviation=0.1,
        sl_percent=9.0,
        trigger_range=0.01,
        trade_size=0.01,
        trade_size_percent=True,
    )
    out = backtest_trades_ledger(feed, params)
    return out.select(
        "company",
        "trade_seq",
        "close_type",
        rf(F.col("roi")).alias("roi"),
        rf(F.col("bal_after") / 1000.0).alias("bal_rel"),
    )


@register(
    "r_balance_report",
    """
    WITH ticks AS (SELECT DISTINCT ts FROM events),
    comps AS (SELECT DISTINCT user_id FROM events),
    grid AS (SELECT t.ts, c.user_id FROM ticks t CROSS JOIN comps c),
    joined AS (
        SELECT g.ts, g.user_id, e.value
        FROM grid g LEFT JOIN events e ON g.ts = e.ts AND g.user_id = e.user_id
    ), filled AS (
        SELECT ts, user_id, last_value(value IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bal_ff
        FROM joined
    ), dropped AS (
        SELECT * FROM filled WHERE ts > (SELECT min(ts) FROM events)
    ), totals AS (
        SELECT ts, CAST(sum(CAST(bal_ff AS DECIMAL(25,8))) AS DOUBLE) AS total
        FROM dropped GROUP BY ts
    )
    SELECT round(arg_max(total, ts) / arg_min(total, ts) - 1, 6) AS roi,
           date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE)) AS span_days,
           CASE WHEN arg_max(total, ts) / arg_min(total, ts) > 0 THEN
               floor(ln(arg_max(total, ts) / arg_min(total, ts))
                     * (365.0 / date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE)))
                     * 1000000.0 + 0.5) / 1000000.0
           END AS log_annualized_roi
    FROM totals
    """,
    doc="EP2 report layer (cells 29-31): per-company balance series → "
    "global-grid ffill → drop first row → TOTAL per ts → ROI + "
    "annualization (G3/C1/B8/W6/D5/D8), events.value playing balance.",
)
def r_balance_report(spark, sf_dir):
    from sparkwrangle.pipelines.intraday import balance_report

    ev = _t(spark, sf_dir, "events")
    balances = ev.select(
        F.col("user_id").alias("company"), "ts", F.col("value").alias("balance")
    )
    out = balance_report(balances)
    return out.select(
        r6("roi").alias("roi"),
        "span_days",
        # pow-form annualized_roi reaches 1e32 at driver SFs, where 6-digit
        # rounding is a no-op and one libm ulp flips the hash (the r01 red
        # row); report the bounded log form instead and round it stably.
        rf(F.col("log_annualized_roi")).alias("log_annualized_roi"),
    )


@register(
    "r_trade_report",
    """
    WITH trades AS (
        SELECT CASE event_type WHEN 'purchase' THEN 'tp'
                               WHEN 'error' THEN 'mc' ELSE 'sl' END AS close_type,
               (value - 50.0) / 100.0 AS roi
        FROM events
    )
    SELECT count(CASE WHEN roi > 0 THEN 1 END) AS n_wins,
           count(CASE WHEN roi < 0 THEN 1 END) AS n_losses,
           round(count(CASE WHEN roi > 0 THEN 1 END) * 1.0 /
                 (count(CASE WHEN roi > 0 THEN 1 END) + count(CASE WHEN roi < 0 THEN 1 END)), 6) AS win_share,
           round(avg(CASE WHEN roi > 0 THEN roi END), 6) AS avg_profit,
           round(avg(CASE WHEN roi < 0 THEN roi END), 6) AS avg_loss,
           round(count(CASE WHEN roi < 0 AND close_type = 'mc' THEN 1 END) * 1.0 /
                 count(CASE WHEN roi < 0 THEN 1 END), 6) AS mc_loss_share
    FROM trades
    """,
    doc="EP2 cell-33 report: win share, avg profit/loss, market-close loss "
    "share (D7) over a trades table derived from events.",
)
def r_trade_report(spark, sf_dir):
    from sparkwrangle.pipelines.intraday import trade_report

    ev = _t(spark, sf_dir, "events")
    trades = ev.select(
        F.when(F.col("event_type") == "purchase", "tp")
        .when(F.col("event_type") == "error", "mc")
        .otherwise("sl")
        .alias("close_type"),
        ((F.col("value") - 50.0) / 100.0).alias("roi"),
    )
    out = trade_report(trades)
    return out.select(
        "n_wins",
        "n_losses",
        r6("win_share").alias("win_share"),
        r6("avg_profit").alias("avg_profit"),
        r6("avg_loss").alias("avg_loss"),
        r6("mc_loss_share").alias("mc_loss_share"),
    )


# Extension operators register themselves into the same CATALOG (import at
# the bottom so `register` is already bound; the circular edge is benign).
from sparkwrangle import catalog_ext  # noqa: E402,F401
from sparkwrangle import catalog_relational  # noqa: E402,F401
