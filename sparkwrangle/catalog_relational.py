"""Relational-breadth catalog entries: multi-join analytics in the TPC-H
style over the driver's star schema, plus set ops, rollup, ranking, and
the faithful-mode K.6 quirk — the "free from Spark SQL" surface
(SURVEY.md §2.D note) exercised and oracle-checked.

Big double sums go through the exact decimal accumulator (see catalog.py
docstring) so partial-aggregation order can never break the cross-engine
hash.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sparkwrangle.catalog import _t, dsum, r6, register, rf_sql

_DSUM = "CAST(SUM(CAST({expr} AS DECIMAL(25,8))) AS DOUBLE)"


@register(
    "tpch_q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_DSUM.format(expr='l_quantity')} AS sum_qty,
           {_DSUM.format(expr='l_extendedprice')} AS sum_base_price,
           {_DSUM.format(expr='l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {_DSUM.format(expr='l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           count(*) AS count_order,
           round({_DSUM.format(expr='l_quantity')} / count(*), 6) AS avg_qty,
           round({_DSUM.format(expr='l_discount')} / count(*), 6) AS avg_disc
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: the flagship wide aggregation — "
    "map-side partial aggregation over a pushed-down scan; exact decimal "
    "accumulators keep the doubles order-insensitive.",
)
def tpch_q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity")).alias("sum_qty"),
        dsum(F.col("l_extendedprice")).alias("sum_base_price"),
        dsum(disc_price).alias("sum_disc_price"),
        dsum(charge).alias("sum_charge"),
        F.count("*").alias("count_order"),
        r6(dsum(F.col("l_quantity")) / F.count("*")).alias("avg_qty"),
        r6(dsum(F.col("l_discount")) / F.count("*")).alias("avg_disc"),
    )


@register(
    "tpch_q3_shipping_priority",
    f"""
    SELECT o.o_orderkey,
           {_DSUM.format(expr='l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           CAST(o.o_orderdate AS DATE) AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-style shipping priority: selective dimension filter → "
    "broadcast join chain → top-10 by revenue with deterministic tiebreak.",
)
def tpch_q3_shipping_priority(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
    )
    return (
        joined.groupBy("o_orderkey", F.to_date("o_orderdate").alias("orderdate"))
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "revenue", "orderdate")
    )


@register(
    "tpch_q5_local_supplier",
    f"""
    SELECT n.n_name,
           {_DSUM.format(expr='l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5-style local-supplier revenue: five-way join with the "
    "region/nation/supplier dimensions broadcast; AQE owns the join order.",
)
def tpch_q5_local_supplier(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy("n_name").agg(dsum(revenue).alias("revenue"))


@register(
    "q_rollup_revenue",
    f"""
    SELECT n.n_name, year(o.o_orderdate) AS yr,
           {_DSUM.format(expr='o.o_totalprice')} AS total, count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP (n.n_name, year(o.o_orderdate))
    """,
    doc="Grouping-sets surface: ROLLUP over (nation, year) — subtotals and "
    "grand total in one pass (free from Spark SQL per SURVEY §2.D note).",
)
def q_rollup_revenue(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    joined = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    return joined.rollup("n_name", F.year("o_orderdate").alias("yr")).agg(
        dsum(F.col("o_totalprice")).alias("total"), F.count("*").alias("n_orders")
    )


@register(
    "q_set_ops",
    """
    SELECT user_id, 'both' AS tag FROM (
        SELECT user_id FROM events WHERE event_type = 'purchase'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'error'
    )
    UNION ALL
    SELECT user_id, 'purchase_only' AS tag FROM (
        SELECT user_id FROM events WHERE event_type = 'purchase'
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'error'
    )
    """,
    doc="Set-operation surface: INTERSECT / EXCEPT / UNION ALL over user "
    "cohorts.",
)
def q_set_ops(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("user_id")
    e = ev.filter(F.col("event_type") == "error").select("user_id")
    both = p.intersect(e).withColumn("tag", F.lit("both"))
    only = p.subtract(e).withColumn("tag", F.lit("purchase_only"))  # EXCEPT = distinct set-minus
    return both.unionByName(only)


@register(
    "q_anti_semi_join",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Anti-join surface: customers with no orders (left_anti — the "
    "distributed form of the reference's 'not in processed set' guard G1).",
)
def q_anti_semi_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_rank_family",
    """
    SELECT event_id, event_type,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS quartile
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id)
    QUALIFY rnk <= 5
    """,
    doc="Ranking-window surface: rank / dense_rank / ntile with "
    "deterministic tiebreaks (beyond the reference's running windows).",
)
def q_rank_family(spark, sf_dir):
    from sparkwrangle.ops.windows import grouped_top_k

    ev = _t(spark, sf_dir, "events")
    # Scale form of rank/dense_rank/ntile over a LOW-CARDINALITY stratum
    # (a plain PARTITION BY event_type window sorts corpus/|types| rows
    # per task). The (value, event_id) ordering is a TOTAL order, so
    # rank == dense_rank == row_number, and only rnk <= 5 survives —
    # grouped_top_k's two-level pass produces exactly those rows.
    top = grouped_top_k(
        ev.select("event_type", "event_id", "value"),
        ["event_type"],
        [F.desc("value"), F.asc("event_id")],
        5,
        rank_col="rnk",
    ).localCheckpoint()
    # ^ ≤ 5×|types| rows consumed twice (broadcast side of `after` and
    # the final join) — materialize once or the two-window top-k subtree
    # re-evaluates per consumer.
    # ntile(4) needs each survivor's ASCENDING position p and the group
    # size n — NOT derivable from rnk (the ascending tiebreak direction
    # differs), so count rows ordered strictly after each survivor in
    # (value ASC NULLS FIRST, event_id ASC): an equi-join on event_type
    # against the broadcast survivor set + a combinable conditional sum
    # (5x map-side fan-out, no giant sort), then the exact ntile closed
    # form: first (n mod 4) tiles hold ceil(n/4) rows, the rest floor.
    # The after-predicate spells out asc-nulls-first three-valued logic
    # so a NULL-valued survivor (possible when a type has < 5 non-null
    # values) still gets the quartile ntile() would have assigned.
    s_null = F.col("value").isNull()
    r_null = F.col("_v").isNull()
    after_pred = F.when(
        s_null, (~r_null) | (r_null & (F.col("_e") > F.col("event_id")))
    ).otherwise(
        (~r_null)
        & (
            (F.col("_v") > F.col("value"))
            | ((F.col("_v") == F.col("value")) & (F.col("_e") > F.col("event_id")))
        )
    )
    after = (
        ev.select(
            F.col("event_type").alias("_ty"),
            F.col("value").alias("_v"),
            F.col("event_id").alias("_e"),
        )
        .join(
            F.broadcast(top.select("event_type", "event_id", "value")),
            # null-safe: a NULL event_type is a real group under window
            # PARTITION BY semantics — plain EqualTo would drop it here
            # even though grouped_top_k surfaced its survivors
            F.col("_ty").eqNullSafe(F.col("event_type")),
        )
        .groupBy("event_type", "event_id")
        .agg(
            F.sum(after_pred.cast("long")).alias("n_after"),
            F.count("*").alias("n"),
        )
    )
    base = F.floor(F.col("n") / 4)
    rem = F.col("n") % 4
    p = F.col("n") - F.col("n_after")  # 1-based ascending position
    head = rem * (base + 1)
    quartile = F.when(
        p <= head, F.ceil(p / (base + 1))
    ).otherwise(rem + F.ceil((p - head) / F.when(base > 0, base).otherwise(1)))
    return (
        top.join(
            after.withColumnRenamed("event_type", "_aty").withColumnRenamed(
                "event_id", "_aid"
            ),
            F.col("event_type").eqNullSafe(F.col("_aty"))
            & (F.col("event_id") == F.col("_aid")),
        )
        .select(
            "event_id",
            "event_type",
            F.col("rnk").cast("int").alias("rnk"),
            F.col("rnk").cast("int").alias("drnk"),
            quartile.cast("int").alias("quartile"),
        )
    )


@register(
    "q_global_sort_limit",
    """
    SELECT event_id, user_id, value
    FROM events
    ORDER BY value DESC, event_id
    LIMIT 20
    """,
    doc="Global top-k: ORDER BY + LIMIT compiles to TakeOrderedAndProject "
    "(per-partition top-k + driver merge — no full sort shuffle).",
)
def q_global_sort_limit(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.orderBy(F.desc("value"), F.asc("event_id"))
        .limit(20)
        .select("event_id", "user_id", "value")
    )


@register(
    "k6_faithful_ticker_share",
    """
    WITH finals AS (
        SELECT user_id, (max({'ts': ts, 'eid': event_id, 'val': value})).val AS final
        FROM events GROUP BY user_id
    ), trimmed AS (
        -- K.6: columns[:-2] drops TOTAL *and* the last ticker column;
        -- 'last' = highest key in processing order
        SELECT * FROM finals WHERE user_id < (SELECT max(user_id) FROM finals)
    )
    SELECT round(avg(CASE WHEN final > 50.0 THEN 1 ELSE 0 END), 6) AS share_above
    FROM trimmed
    """,
    doc="Quirk K.6 faithful mode: the cell-33 ticker-share metric silently "
    "drops the LAST ticker column (columns[:-2] though only TOTAL was "
    "appended) — reproduced by excluding the max-order company. The "
    "CORRECTED mode (nothing dropped) is d_final_above_share — both "
    "modes of the quirk are oracle-checked.",
)
def k6_faithful_ticker_share(spark, sf_dir):
    from sparkwrangle.ops.aggregates import final_above_share

    ev = _t(spark, sf_dir, "events")
    last = ev.groupBy().agg(F.max("user_id").alias("last_uid"))
    trimmed = ev.crossJoin(F.broadcast(last)).filter(
        F.col("user_id") < F.col("last_uid")
    )
    out = final_above_share(
        trimmed, ["user_id"], "ts", "value", 50.0, tiebreak_col="event_id"
    )
    return out.select(r6("share_above").alias("share_above"))


def _ep2_inputs(spark, sf_dir):
    """Events-derived EP2 inputs (bars, fx, blocks, listings) — shared by
    the rows-only full pipeline and the oracle-checked feed/trader twins
    so the derivations can never drift apart."""
    ev = _t(spark, sf_dir, "events")
    # derive a bars table: 3 companies × (base, EU) tickers from events
    company = F.concat(F.lit("CO"), (F.col("user_id") % 3).cast("string"))
    # bounded pseudo-random deviation (±10%) so the base-relative return
    # oscillates through the open/TP thresholds after normalization
    dev = ((F.col("event_id") % 7) - 3).cast("double") / 30.0
    # r13 optimization (guide §2.4): ONE inline explode emits both
    # listings per event instead of a union of two selects — the union
    # form scanned events twice per evaluation of bars (and bars is
    # evaluated more than once inside the feed plan). Same rows, same
    # expressions; only physical row order changes, and every consumer
    # (range join, distinct, windows) is order-insensitive.
    tick3 = (F.col("user_id") % 3).cast("string")
    legs = F.array(
        F.struct(
            F.concat(F.lit("T"), tick3).alias("ticker"),
            (F.col("value") + 100.0).alias("close"),
        ),
        F.struct(
            F.concat(F.lit("T"), tick3, F.lit(".DE")).alias("ticker"),
            ((F.col("value") + 100.0) * (1 + dev) / 1.05).alias("close"),
        ),
    )
    bars = ev.select(company.alias("company"), "ts", F.inline(legs)).select(
        "company", "ticker", "ts", "close"
    )
    listings = (
        bars.select("company", "ticker")
        .distinct()
        .withColumn(
            "ticker_idx", F.when(F.col("ticker").contains("."), 1).otherwise(0)
        )
    )
    fx = ev.filter(F.col("event_type") == "signup").select(
        "ts", (F.lit(1.0) + (F.col("value") - 50.0) / 1000.0).alias("rate")
    )
    blocks = spark.range(0, 5).select(
        F.col("id").cast("int").alias("block_id"),
        (F.lit("2024-01-01").cast("timestamp") + F.expr("make_interval(0,0,0,id*7,0,0,0)")).alias("start_ts"),
        (F.lit("2024-01-01").cast("timestamp") + F.expr("make_interval(0,0,0,id*7+7,0,0,0)")).alias("end_ts"),
    )
    return bars, fx, blocks, listings


@register(
    "ep2_full_pipeline",
    None,
    doc="EP2 end-to-end on driver testdata: events-derived 5-min bars for "
    "3 synthetic companies (base + EU ticker with '.') → block range join, "
    "tick grid, FX snap, normalize, ffill, session band, base-relative "
    "returns → S2 trader → trade log. The full SURVEY §3 EP2 lifecycle in "
    "one plan; golden-tested against the pandas oracle on fixtures; the "
    "feed construction is separately hash-checked by ep2_feed_builder.",
)
def ep2_full_pipeline(spark, sf_dir):
    from sparkwrangle.pipelines.intraday import build_intraday_feed
    from sparkwrangle.stateful.trader import backtest_trades

    bars, fx, blocks, listings = _ep2_inputs(spark, sf_dir)
    feed = build_intraday_feed(bars, fx, blocks, listings)
    # looser thresholds than the reference defaults: the events-derived
    # deviations are mild and the synthetic session has few post-16:29
    # ticks, so tp/sl must carry the exits
    params = dict(
        bal=1000.0,
        min_deviation=0.02,
        sl_percent=0.03,
        trigger_range=0.005,
        trade_size=0.1,
        trade_size_percent=True,
    )
    return backtest_trades(feed, params)


# Full SQL translation of pipelines.intraday.build_intraday_feed over the
# events-derived EP2 inputs — every step (block range join, tick grid, FX
# snap+ffill, conditional conversion, block min-max normalize with pandas
# /0→±inf/NaN semantics, ffill, session band, base-relative deviation,
# day-of-month feed order) in window SQL. NaN/±inf are produced with the
# SAME branch structure as ops.filters.safe_div_pandas so every row is
# bitwise identical; per-row arithmetic is IEEE-identical across engines.
_EP2_FEED_CTE = """
    bars AS (
        SELECT 'CO' || CAST(user_id % 3 AS VARCHAR) AS company,
               'T' || CAST(user_id % 3 AS VARCHAR) AS ticker,
               ts, value + 100.0 AS close
        FROM events
        UNION ALL
        SELECT 'CO' || CAST(user_id % 3 AS VARCHAR),
               'T' || CAST(user_id % 3 AS VARCHAR) || '.DE',
               ts,
               (value + 100.0)
                   * (1 + CAST((event_id % 7) - 3 AS DOUBLE) / 30.0) / 1.05
        FROM events
    ), fx AS (
        SELECT ts, 1.0 + (value - 50.0) / 1000.0 AS rate
        FROM events WHERE event_type = 'signup'
    ), blocks AS (
        SELECT CAST(i AS INT) AS block_id,
               TIMESTAMP '2024-01-01' + to_days(CAST(i * 7 AS INT)) AS start_ts,
               TIMESTAMP '2024-01-01' + to_days(CAST(i * 7 + 7 AS INT)) AS end_ts
        FROM (SELECT unnest(range(0, 5)) AS i)
    ), listings AS (
        SELECT DISTINCT company, ticker,
               CASE WHEN contains(ticker, '.') THEN 1 ELSE 0 END AS ticker_idx
        FROM bars
    ), b AS (
        SELECT bars.company, bars.ticker, bars.ts, bars.close, blocks.block_id
        FROM bars JOIN blocks
          ON bars.ts >= blocks.start_ts AND bars.ts < blocks.end_ts
    ), ticks AS (
        SELECT DISTINCT company, block_id, ts FROM b
    ), grid AS (
        SELECT t.company, t.block_id, t.ts, l.ticker, l.ticker_idx
        FROM ticks t JOIN listings l ON t.company = l.company
    ), g0 AS (
        SELECT g.*, b.close, fx.rate
        FROM grid g
        LEFT JOIN b USING (company, block_id, ts, ticker)
        LEFT JOIN fx USING (ts)
    ), g1 AS (
        SELECT *,
               last_value(rate IGNORE NULLS) OVER wg AS rate_ff,
               min(close) OVER wb AS lo,
               max(close) OVER wb AS hi
        FROM g0
        WINDOW wg AS (PARTITION BY company, block_id, ticker ORDER BY ts
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wb AS (PARTITION BY company, block_id, ticker)
    ), g2 AS (
        SELECT *,
               CASE WHEN contains(ticker, '.') THEN close * rate_ff
                    ELSE close END AS price_conv,
               CASE WHEN close IS NULL OR hi IS NULL THEN NULL
                    WHEN (hi - lo) <> 0 THEN (close - lo) / (hi - lo)
                    WHEN isnan(close - lo) THEN 'nan'::DOUBLE
                    WHEN (close - lo) > 0 THEN 'infinity'::DOUBLE
                    WHEN (close - lo) < 0 THEN '-infinity'::DOUBLE
                    ELSE 'nan'::DOUBLE END AS norm
        FROM g1
    ), g3 AS (
        SELECT *,
               last_value(price_conv IGNORE NULLS) OVER wg2 AS price_ff,
               last_value(norm IGNORE NULLS) OVER wg2 AS norm_ff
        FROM g2
        WINDOW wg2 AS (PARTITION BY company, block_id, ticker ORDER BY ts
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), g4 AS (
        SELECT * FROM g3
        WHERE (hour(ts) * 60 + minute(ts)) BETWEEN 870 AND 990
    ), g5 AS (
        SELECT *,
               max(CASE WHEN ticker_idx = 0 THEN norm_ff END)
                   OVER (PARTITION BY company, block_id, ts) AS base_norm
        FROM g4
    ), g6 AS (
        SELECT *,
               CASE WHEN ticker_idx > 0 THEN
                   (CASE WHEN norm_ff IS NULL OR base_norm IS NULL THEN NULL
                         WHEN base_norm <> 0 THEN norm_ff / base_norm
                         WHEN isnan(norm_ff) THEN 'nan'::DOUBLE
                         WHEN norm_ff > 0 THEN 'infinity'::DOUBLE
                         WHEN norm_ff < 0 THEN '-infinity'::DOUBLE
                         ELSE 'nan'::DOUBLE END) - 1
               END AS ret,
               dense_rank() OVER (PARTITION BY company
                                  ORDER BY block_id, day(ts), ts) AS feed_seq
        FROM g5
    )
"""

_EP2_FEED_SQL = (
    "WITH "
    + _EP2_FEED_CTE
    + """
    SELECT company, CAST(feed_seq AS INT) AS feed_seq, ts, ticker_idx,
           round(price_ff, 6) AS price, round(ret, 6) AS ret
    FROM g6
"""
)


@register(
    "ep2_feed_builder",
    _EP2_FEED_SQL,
    doc="The EP2 feed CONSTRUCTION (pipelines.intraday.build_intraday_feed) "
    "hash-checked end to end: block range join → tick grid → FX snap + "
    "ffill → conditional EU conversion → block min-max normalize (pandas "
    "/0 → ±inf/NaN branch structure reproduced exactly) → ffill → "
    "14:30-16:30 session band → base-relative deviation → day-of-month "
    "feed order (quirk K.2). The pure-Catalyst half of ep2_full_pipeline, "
    "externally verified; only the sequential trader on top stays "
    "rows-only.",
)
def ep2_feed_builder(spark, sf_dir):
    from sparkwrangle.pipelines.intraday import build_intraday_feed

    bars, fx, blocks, listings = _ep2_inputs(spark, sf_dir)
    feed = build_intraday_feed(bars, fx, blocks, listings)
    return feed.select(
        "company",
        "feed_seq",
        "ts",
        "ticker_idx",
        r6(F.col("price")).alias("price"),
        r6(F.col("ret")).alias("ret"),
    )


# Restricted-regime EP2 trader twin: the SAME recursive-CTE machinery as
# s2_trader_single_position (catalog.py) stacked on the full feed-builder
# SQL above — single arb ticker per company (the EP2 feed has exactly
# base + one EU listing), fixed order size, unreachable SL. Ticks where
# either price is still null (no close / no FX rate yet in the block) are
# filtered identically on both sides BEFORE the state machine: the
# reference protocol would poison the ledger with NaN arithmetic there,
# which no SQL twin can follow. NaN/±inf deviations are handled with
# explicit isnan guards (DuckDB orders NaN above all doubles, pandas
# comparisons with NaN are False — the guards make both engines take the
# reference's branch).
_EP2_TRADES_CTE = (
    "WITH RECURSIVE "
    + _EP2_FEED_CTE
    + """
    , ticksq AS (
        SELECT company, CAST(feed_seq AS INT) AS fs,
               max(CASE WHEN ticker_idx = 0 THEN price_ff END) AS bp,
               max(CASE WHEN ticker_idx = 1 THEN price_ff END) AS ap,
               max(CASE WHEN ticker_idx = 1 THEN ret END) AS r,
               max(hour(ts) * 3600 + minute(ts) * 60
                   + CAST(second(ts) AS BIGINT)) AS sod
        FROM g6 GROUP BY company, feed_seq
    ), filt AS MATERIALIZED (
        -- MATERIALIZED: everything above re-derives the full feed-builder
        -- pipeline; the recursive CTEs below would otherwise re-evaluate
        -- it once PER RECURSION STEP (DuckDB inlines CTEs by default),
        -- which turns the sf0.1 oracle from seconds into tens of minutes
        SELECT *, row_number() OVER (PARTITION BY company ORDER BY fs) AS rn
        FROM ticksq WHERE bp IS NOT NULL AND ap IS NOT NULL
    ), aug AS (
        SELECT *,
               (sod > 59340) AS closing,
               (NOT sod > 59340 AND r IS NOT NULL AND NOT isnan(r)
                AND r > 0.02) AS trig,
               (r IS NOT NULL AND NOT isnan(r)
                AND r >= -0.005 AND r <= 0.005) AS tp,
               ((r IS NOT NULL AND NOT isnan(r)
                 AND r >= -0.005 AND r <= 0.005) OR sod > 59340) AS closes
        FROM filt
    ), ptr AS MATERIALIZED (
        SELECT *,
               min(CASE WHEN trig THEN rn END) OVER (
                   PARTITION BY company ORDER BY rn
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS next_open,
               min(CASE WHEN closes THEN rn END) OVER (
                   PARTITION BY company ORDER BY rn
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS next_close,
               min(CASE WHEN trig THEN rn END) OVER (PARTITION BY company)
                   AS first_open
        FROM aug
    ), trades AS (
        SELECT company, rn AS open_rn, next_close AS close_rn
        FROM ptr WHERE rn = first_open
        UNION ALL
        SELECT c.company, s.rn, s.next_close
        FROM trades t
        JOIN ptr c ON c.company = t.company AND c.rn = t.close_rn + 1
        JOIN ptr s ON s.company = c.company AND s.rn = c.next_open
        WHERE t.close_rn IS NOT NULL
    ), closed AS MATERIALIZED (
        SELECT t.company,
               row_number() OVER (PARTITION BY t.company ORDER BY t.open_rn)
                   - 1 AS trade_seq,
               CASE WHEN cl.tp THEN 'tp' ELSE 'mc' END AS close_type,
               (cl.bp / op.bp - cl.ap / op.ap) AS delta
        FROM trades t
        JOIN ptr op ON op.company = t.company AND op.rn = t.open_rn
        JOIN ptr cl ON cl.company = t.company AND cl.rn = t.close_rn
        WHERE t.close_rn IS NOT NULL
    )"""
)

_EP2_TRADER_SQL = (
    _EP2_TRADES_CTE
    + """
    , bal AS (
        SELECT *, 2.0 * delta AS chg,
               1000.0 + coalesce(sum(2.0 * delta) OVER (
                   PARTITION BY company ORDER BY trade_seq
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
                   AS bal_before
        FROM closed
    )
    SELECT company, CAST(trade_seq AS INT) AS trade_seq, close_type,
           floor((chg / bal_before) * 1000000.0 + 0.5) / 1000000.0 AS roi
    FROM bal
"""
)

# Percent sizing on the REAL EP2 feed — the reference's own run mode
# (intra_day_arbitrage.ipynb:11122: trade_size=0.1, trade_size_percent=
# True). Order size is 2·10%·balance at each open, so the ledger
# compounds bal_k = bal_{k-1}·(1 + 0.2·delta_k); the recursion carries it
# in trade order and bal_rel pins the compounded series itself.
_EP2_PERCENT_SQL = (
    _EP2_TRADES_CTE
    + """
    , ledg AS (
        SELECT company, CAST(-1 AS BIGINT) AS trade_seq,
               CAST(NULL AS VARCHAR) AS close_type,
               CAST(1000.0 AS DOUBLE) AS bal, CAST(NULL AS DOUBLE) AS roi
        FROM (SELECT DISTINCT company FROM closed)
        UNION ALL
        SELECT c.company, c.trade_seq, c.close_type,
               l.bal * (1.0 + 0.2 * c.delta),
               l.bal * (1.0 + 0.2 * c.delta) / l.bal - 1.0
        FROM ledg l JOIN closed c
          ON c.company = l.company AND c.trade_seq = l.trade_seq + 1
    )
    SELECT company, CAST(trade_seq AS INT) AS trade_seq, close_type,
           floor(roi * 1000000.0 + 0.5) / 1000000.0 AS roi,
           floor((bal / 1000.0) * 1000000.0 + 0.5) / 1000000.0 AS bal_rel
    FROM ledg WHERE trade_seq >= 0
"""
)


@register(
    "ep2_trader_single_position",
    _EP2_TRADER_SQL,
    doc="EP2 end-to-end with an ORACLE: the real applyInPandas trader in "
    "the restricted regime (fixed order size, unreachable SL; the EP2 "
    "feed already has exactly one arb ticker per company) on top of the "
    "full feed-builder SQL — block join, grid, FX ffill, normalize, "
    "session band, K.2 feed order, then the gaps-and-islands trade CTE. "
    "With ep2_feed_builder this makes the whole EP2 lifecycle "
    "externally hash-checked except the reference-faithful "
    "percent-sizing ledger, which stays golden-pinned "
    "(ep2_full_pipeline).",
)
def ep2_trader_single_position(spark, sf_dir):
    from sparkwrangle.catalog import rf
    from sparkwrangle.stateful.trader import backtest_trades

    params = dict(
        bal=1000.0,
        min_deviation=0.02,
        sl_percent=9.0,
        trigger_range=0.005,
        trade_size=1.0,
        trade_size_percent=False,
    )
    out = backtest_trades(_ep2_restricted_feed(spark, sf_dir), params)
    return out.select(
        "company", "trade_seq", "close_type", rf(F.col("roi")).alias("roi")
    )


def _ep2_restricted_feed(spark, sf_dir):
    """The real EP2 feed with both-legs-priced ticks only: drop ticks
    before the first close / FX rate of the block (the state machine
    would NaN-poison the ledger there; the oracle applies the identical
    filter)."""
    from sparkwrangle.pipelines.intraday import build_intraday_feed

    bars, fx, blocks, listings = _ep2_inputs(spark, sf_dir)
    feed = build_intraday_feed(bars, fx, blocks, listings)
    w = Window.partitionBy("company", "feed_seq")
    return (
        feed.withColumn("_np", F.count("price").over(w))
        .filter(F.col("_np") == 2)
        .drop("_np")
    )


@register(
    "ep2_trader_percent_ledger",
    _EP2_PERCENT_SQL,
    doc="EP2 lifecycle in the reference's OWN sizing mode "
    "(intra_day_arbitrage.ipynb:11122: trade_size=0.1, percent=True), "
    "externally verified: the real applyInPandas trader with percent "
    "sizing on the real feed (restricted regime: unreachable SL), "
    "against the feed-builder SQL + gaps-and-islands CTE + a recursive "
    "ledger CTE compounding bal_k = bal_{k-1}·(1+0.2·Δ_k) in trade "
    "order. bal_rel hash-checks the compounded balance series itself.",
)
def ep2_trader_percent_ledger(spark, sf_dir):
    from sparkwrangle.catalog import rf
    from sparkwrangle.stateful.trader import backtest_trades_ledger

    params = dict(
        bal=1000.0,
        min_deviation=0.02,
        sl_percent=9.0,
        trigger_range=0.005,
        trade_size=0.1,
        trade_size_percent=True,
    )
    out = backtest_trades_ledger(_ep2_restricted_feed(spark, sf_dir), params)
    return out.select(
        "company",
        "trade_seq",
        "close_type",
        rf(F.col("roi")).alias("roi"),
        rf(F.col("bal_after") / 1000.0).alias("bal_rel"),
    )


@register(
    "q_salted_skew_agg",
    """
    SELECT event_type, count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(25,8))) AS DOUBLE), 6) AS total,
           min(value) AS vmin, max(value) AS vmax
    FROM events GROUP BY event_type
    """,
    doc="Skew path: two-phase salted aggregation (partial by (key, salt), "
    "final by key) — the explicit hot-key spreader for 100 TB groupBys; "
    "algebraic aggregates make the result salt-invariant, so the oracle "
    "is the plain GROUP BY.",
)
def q_salted_skew_agg(spark, sf_dir):
    from sparkwrangle.ops.skew import salted_agg

    ev = _t(spark, sf_dir, "events")
    # the salted sum goes through the DECIMAL accumulator (module rule:
    # big double sums must be order-invariant) — the two-phase partial
    # merge order differs from DuckDB's single pass, and a float total
    # landing near a 5e-7 round boundary would hash-flip intermittently
    ev = ev.withColumn("value_d", F.col("value").cast("decimal(25,8)"))
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n": ("count", "*"),
            "total": ("sum", "value_d"),
            "vmin": ("min", "value"),
            "vmax": ("max", "value"),
        },
        salt_buckets=16,
    )
    return out.select(
        "event_type",
        "n",
        r6(F.col("total").cast("double")).alias("total"),
        "vmin",
        "vmax",
    )


@register(
    "s1_prepared_pair_math",
    """
    WITH lagged AS (
        SELECT user_id, ts, value AS c1, (value * 0.5 + 25.0) AS c2,
               lag(value) OVER w AS l1,
               lag(value * 0.5 + 25.0) OVER w AS l2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), rets AS (
        -- pandas semantics mirrored branch by branch: first row → NULL
        -- (dropped), lag=0 → ±inf → replaced 0.0, log(0) → -inf → 0.0,
        -- log(<0) → NaN → NULL (dropped). Values are ≥ 0 so c2 > 0 always.
        SELECT user_id, ts, c1, c2,
               CASE WHEN l1 IS NULL THEN NULL
                    WHEN l1 = 0 AND c1 = 0 THEN NULL
                    WHEN l1 = 0 THEN 0.0
                    WHEN 1 + (c1 / l1 - 1) > 0 THEN ln(1 + (c1 / l1 - 1))
                    WHEN 1 + (c1 / l1 - 1) = 0 THEN 0.0
                    ELSE NULL END AS ret1_raw,
               ln(1 + (c2 / l2 - 1)) AS ret2_raw
        FROM lagged
    )
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
           round((c2 - c1) / c2, 6) AS delta,
           round(CASE WHEN ret1_raw = 'infinity'::DOUBLE
                        OR ret1_raw = '-infinity'::DOUBLE THEN 0.0
                      ELSE ret1_raw END, 6) AS ret1,
           round(ret2_raw, 6) AS ret2
    FROM rets
    WHERE ret1_raw IS NOT NULL AND ret2_raw IS NOT NULL
    """,
    doc="The SQL-expressible half of EP1 (stock_arbitrage cells 1/3/5): "
    "pad-semantics pct_change -> log returns, ts-aligned delta, dropna — "
    "oracle-checks the exact prep math the S1 scan consumes. The scan "
    "itself (sequential state) is covered by golden tests.",
)
def s1_prepared_pair_math(spark, sf_dir):
    from sparkwrangle.pipelines.daily_pairs import prepare_pair

    bars = _events_as_pair_bars_rel(spark, sf_dir)
    out = prepare_pair(
        bars, "A", "B", ratio=1.0, from_ts=None, extra_keys=["user_id"]
    )
    return out.select(
        "user_id",
        "ts",
        r6("delta").alias("delta"),
        r6("ret1").alias("ret1"),
        r6("ret2").alias("ret2"),
    )


def _events_as_pair_bars_rel(spark, sf_dir):
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


@register(
    "q_array_zip_aggregate",
    """
    WITH arrs AS (
        SELECT user_id, list(value ORDER BY ts, event_id) AS l
        FROM events GROUP BY user_id
    )
    SELECT user_id, len(l) AS n,
           round(list_sum(list_transform(range(1, len(l) + 1),
                 i -> l[i] * list_reverse(l)[i])), 6) AS dot_rev
    FROM arrs
    """,
    doc="D6 + array surface: deterministic per-user value array (ordered "
    "collect) folded element-wise against its reverse via zip_with + "
    "aggregate — the engine form of the reference's sum_dict list zip "
    "(intra_day_arbitrage.ipynb:35, dead helper).",
)
def q_array_zip_aggregate(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    arr = F.transform(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda s: s.value,
    )
    arrs = ev.groupBy("user_id").agg(arr.alias("l"))
    dot_rev = F.aggregate(
        F.zip_with(F.col("l"), F.reverse("l"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return arrs.select("user_id", F.size("l").alias("n"), r6(dot_rev).alias("dot_rev"))


@register(
    "q_percent_format",
    """
    SELECT event_type,
           printf('%.3f%%', avg(value)) AS avg_pct,
           printf('%08.2f', max(value)) AS max_padded
    FROM events GROUP BY event_type
    """,
    doc="H row: percent/number formatting (f-strings in the reference's "
    "reports, intra_day_arbitrage.ipynb:11213-11215) as format_string — "
    "identical C-style formatting in both engines.",
)
def q_percent_format(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.format_string("%.3f%%", F.avg("value")).alias("avg_pct"),
        F.format_string("%08.2f", F.max("value")).alias("max_padded"),
    )


_SHARED_DIALECT_SQL = """
    SELECT l_returnflag,
           count(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,8))) AS DOUBLE) AS sum_qty,
           min(l_shipdate) AS first_ship
    FROM lineitem
    WHERE l_discount > 0.02
    GROUP BY l_returnflag
"""


@register(
    "sql_surface_shared_dialect",
    _SHARED_DIALECT_SQL,
    doc="The engine's SQL entry surface (SURVEY §3 lifecycle #2): the SAME "
    "SQL text runs through spark.sql over registered temp views AND "
    "through the DuckDB oracle — one dialect, two engines, equal hashes.",
)
def sql_surface_shared_dialect(spark, sf_dir):
    from sparkwrangle.io import register_views
    from sparkwrangle.session import prep_session

    prep_session(spark)
    register_views(spark, sf_dir)
    return spark.sql(_SHARED_DIALECT_SQL)


# Deliberately DuckDB-dialect text (unnest-free but exercising the shim's
# rule classes: len(), 1-based subscripts, // integer division, list
# literals, list_transform + list_sum, arg_max, {...} struct literals).
# The catalog fn runs it through sparkwrangle.sql_dialect.translate on
# Spark; the oracle runs the SAME text verbatim on DuckDB — so the shim
# itself sits under the driver's hash gate, not just the pytest suite.
_DUCKDB_DIALECT_SQL = """
    WITH toks AS (
        SELECT doc_id, source,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        FROM documents WHERE doc_id < 500
    ),
    st AS (
        SELECT doc_id, source, t, len(t) AS n_tokens
        FROM toks WHERE len(t) > 0
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(arg_max(doc_id, n_tokens * 100000 + doc_id) AS BIGINT)
               AS longest_doc,
           round(avg(n_tokens // 2), 6) AS avg_half,
           CAST(round(list_sum(list_transform([1, 2, 3], i -> i * 2)), 6)
               AS DOUBLE) AS lit_sum,
           (max({'n': n_tokens, 'first': t[1]})).first AS top_first_token
    FROM st GROUP BY source
"""


@register(
    "sql_dialect_shim",
    _DUCKDB_DIALECT_SQL,
    doc="DuckDB-dialect SQL-text entry (round 12): the same DuckDB text "
    "runs via sql_dialect.translate on Spark AND verbatim on the DuckDB "
    "oracle — the mechanical dialect shim under the driver's hash gate. "
    "tests/test_sql_surface.py pins 74 more catalog oracles through the "
    "same shim.",
)
def sql_dialect_shim(spark, sf_dir):
    from sparkwrangle.io import register_views
    from sparkwrangle.session import prep_session
    from sparkwrangle.sql_dialect import translate

    prep_session(spark)
    register_views(spark, sf_dir)
    return spark.sql(translate(_DUCKDB_DIALECT_SQL))


@register(
    "w_sessionize_gaps",
    """
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('second', lag(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, event_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked
    )
    SELECT user_id, session_id, count(*) AS n_events,
           date_diff('second', min(ts), max(ts)) AS duration_sec
    FROM sessions
    GROUP BY user_id, session_id
    """,
    doc="Sessionization: gaps-and-islands with a 30-minute inactivity "
    "gap — the batch-expressible form of F.session_window (the streaming "
    "variant shares the same semantics via session windows).",
)
def w_sessionize_gaps(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    marked = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0),
    )
    sess = marked.withColumn("session_id", F.sum("new_session").over(wrun))
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias(
            "duration_sec"
        ),
    )


@register(
    "c_interval_overlap_join",
    """
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('second', lag(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WHERE user_id % 10 = 0
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked
    ), sess AS (
        SELECT user_id, session_id,
               CAST(floor(epoch(CAST(min(ts) AS TIMESTAMP))) AS BIGINT) AS s,
               CAST(floor(epoch(CAST(max(ts) AS TIMESTAMP))) AS BIGINT) AS e
        FROM numbered GROUP BY user_id, session_id
    ), ovl AS (
        SELECT a.user_id AS user_a, b.user_id AS user_b
        FROM sess a JOIN sess b
          ON a.user_id < b.user_id AND a.s <= b.e AND b.s <= a.e
    ), counted AS (
        SELECT user_a, user_b, count(*) AS n_overlaps
        FROM ovl GROUP BY user_a, user_b
    )
    SELECT user_a, user_b, CAST(n_overlaps AS BIGINT) AS n_overlaps, rk
    FROM (
        SELECT user_a, user_b, n_overlaps,
               row_number() OVER (ORDER BY n_overlaps DESC, user_a, user_b)
                   AS rk
        FROM counted
    ) WHERE rk <= 20
    """,
    doc="Interval OVERLAP self-join, scale-safe form: per-user sessions "
    "(gaps-and-islands, 30-min gap, sampled to user_id%10=0) paired "
    "across users whenever their [start, end] spans overlap (closed "
    "intervals). The naive form is an inequality-only self-join — "
    "quadratic and unpartitionable; the engine's plan BUCKETS every "
    "session into the hour slots it touches (sequence + explode, "
    "fan-out bounded by session length), equi-joins on the slot — "
    "shuffle-partitionable, AQE-skew-splittable — then dedups session "
    "pairs that share several slots and verifies the exact predicate. "
    "Output = top-20 co-active user pairs by overlapping-session count "
    "(TakeOrderedAndProject; full deterministic tiebreak). The DuckDB "
    "twin runs the direct inequality join (its IEJoin handles that "
    "locally) — same answer, different physical strategy: the point.",
)
def c_interval_overlap_join(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    sess = (
        ev.withColumn(
            "new_session", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
        )
        .withColumn("session_id", F.sum("new_session").over(wrun))
        .groupBy("user_id", "session_id")
        .agg(
            F.min(F.col("ts").cast("long")).alias("s"),
            F.max(F.col("ts").cast("long")).alias("e"),
        )
    )
    slots = sess.withColumn(
        "slot", F.explode(F.sequence(F.floor(F.col("s") / 3600), F.floor(F.col("e") / 3600)))
    )
    a = slots.select(
        F.col("user_id").alias("user_a"), F.col("session_id").alias("sess_a"),
        F.col("s").alias("s_a"), F.col("e").alias("e_a"), "slot",
    )
    b = slots.select(
        F.col("user_id").alias("user_b"), F.col("session_id").alias("sess_b"),
        F.col("s").alias("s_b"), F.col("e").alias("e_b"), "slot",
    )
    pairs = (
        a.join(b, "slot")
        .filter(
            (F.col("user_a") < F.col("user_b"))
            & (F.col("s_a") <= F.col("e_b"))
            & (F.col("s_b") <= F.col("e_a"))
        )
        .select("user_a", "sess_a", "user_b", "sess_b")
        .distinct()  # a pair sharing several hour slots counts once
    )
    counted = pairs.groupBy("user_a", "user_b").agg(
        F.count("*").cast("bigint").alias("n_overlaps")
    )
    top = counted.orderBy(
        F.desc("n_overlaps"), F.asc("user_a"), F.asc("user_b")
    ).limit(20)
    wr = Window.orderBy(F.desc("n_overlaps"), F.asc("user_a"), F.asc("user_b"))
    return top.withColumn("rk", F.row_number().over(wr)).select(
        "user_a", "user_b", "n_overlaps", "rk"
    )


@register(
    "d_percentiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
    doc="Exact interpolated percentiles per group, DISTRIBUTED: two-level "
    "range ranking + pick-and-interpolate the two rows framing each "
    "target position 1+(n-1)*q — the same linear interpolation as "
    "quantile_cont / Spark's percentile(), but without percentile()'s "
    "per-group whole-multiset aggregation buffer (corpus/|types| doubles "
    "in one task at 100 TB).",
)
def d_percentiles(spark, sf_dir):
    from sparkwrangle.ops.windows import grouped_exact_quantiles

    ev = _t(spark, sf_dir, "events")
    # EXACT interpolated percentiles, distributed: Spark's percentile()
    # aggregate buffers each group's whole value multiset in ONE
    # aggregation task (event_type is a handful of strata - corpus/|types|
    # doubles per buffer at 100 TB). grouped_exact_quantiles ranks with
    # the two-level range machinery and interpolates the two rows framing
    # each target position 1+(n-1)*q - identical arithmetic to
    # percentile()/quantile_cont.
    q = grouped_exact_quantiles(
        ev, ["event_type"], "value", [0.5, 0.9, 0.99], tiebreak_cols=["event_id"]
    )
    return (
        q.groupBy("event_type")
        .pivot("p", ["0.5", "0.9", "0.99"])
        .agg(F.first("v"))
        .select(
            "event_type",
            r6(F.col("`0.5`")).alias("p50"),
            r6(F.col("`0.9`")).alias("p90"),
            r6(F.col("`0.99`")).alias("p99"),
        )
    )


@register(
    "h_null_semantics",
    """
    SELECT event_id,
           coalesce(nullif(event_type, 'error'), 'n/a') AS type_or_na,
           (value IS NOT DISTINCT FROM 50.0) AS exactly_fifty,
           CASE WHEN nullif(value, 0.0) IS NULL THEN -1.0
                ELSE round(100.0 / nullif(value, 0.0), 6) END AS inv_pct
    FROM events WHERE user_id < 20
    """,
    doc="NULL-semantics surface: coalesce / nullif / null-safe equality "
    "(Spark <=> == DuckDB IS NOT DISTINCT FROM).",
)
def h_null_semantics(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    nz = F.nullif(F.col("value"), F.lit(0.0))
    return ev.select(
        "event_id",
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("n/a")).alias(
            "type_or_na"
        ),
        F.col("value").eqNullSafe(F.lit(50.0)).alias("exactly_fifty"),
        F.when(nz.isNull(), F.lit(-1.0))
        .otherwise(r6(F.lit(100.0) / nz))
        .alias("inv_pct"),
    )


@register(
    "h_string_suite",
    """
    SELECT p_partkey,
           upper(substr(p_name, 1, 8)) AS name_prefix,
           length(p_name) AS name_len,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           replace(p_brand, '#', '-') AS brand_norm,
           levenshtein(p_brand, 'Brand-11') AS brand_dist,
           split_part(p_type, ' ', 1) AS type_head
    FROM part WHERE p_partkey < 500
    """,
    doc="String-function surface: case/substr/pad/replace/split plus "
    "levenshtein edit distance (the char-level near-dup metric).",
)
def h_string_suite(spark, sf_dir):
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.upper(F.substring("p_name", 1, 8)).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.replace(F.col("p_brand"), F.lit("#"), F.lit("-")).alias("brand_norm"),
        F.levenshtein("p_brand", F.lit("Brand-11")).alias("brand_dist"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
    )


@register(
    "w_rolling_mean",
    """
    SELECT event_id, user_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS ma7,
           round(min(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS roll_min
    FROM events
    """,
    doc="Bounded rolling frames: 7-row moving average/min per series — the "
    "rolling-stats family the reference's windows imply (rowsBetween "
    "bounded frames, not just unbounded-preceding).",
)
def w_rolling_mean(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        r6(F.avg("value").over(w)).alias("ma7"),
        r6(F.min("value").over(w)).alias("roll_min"),
    )


@register(
    "d_corr_stats",
    """
    WITH pairs AS (
        SELECT user_id, value,
               lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
    )
    SELECT user_id,
           round(corr(value, prev), 5) AS autocorr,
           round(covar_samp(value, prev), 5) AS autocov,
           round(stddev_samp(value), 5) AS sd
    FROM pairs WHERE prev IS NOT NULL
    GROUP BY user_id
    """,
    doc="Statistical aggregate surface: lag-1 autocorrelation, sample "
    "covariance, stddev per series (5dp — both engines use numerically "
    "stable one-pass algorithms with ulp-level differences).",
)
def d_corr_stats(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.withColumn("prev", F.lag("value").over(w)).filter(
        F.col("prev").isNotNull()
    )
    return pairs.groupBy("user_id").agg(
        F.round(F.corr("value", "prev"), 5).alias("autocorr"),
        F.round(F.covar_samp("value", "prev"), 5).alias("autocov"),
        F.round(F.stddev_samp("value"), 5).alias("sd"),
    )


@register(
    "c_positional_join",
    """
    WITH a AS (
        SELECT value AS v_a, row_number() OVER (ORDER BY value DESC, event_id) AS rn
        FROM events WHERE event_type = 'purchase'
    ), b AS (
        SELECT value AS v_b, row_number() OVER (ORDER BY value DESC, event_id) AS rn
        FROM events WHERE event_type = 'click'
    )
    SELECT a.rn, round(a.v_a, 6) AS v_a, round(b.v_b, 6) AS v_b,
           round(a.v_a - b.v_b, 6) AS spread
    FROM a JOIN b ON a.rn = b.rn
    WHERE a.rn <= 100
    """,
    doc="C5: positional (row-index) join — the reference's "
    "us_tickers.join(eu_tickers) row alignment "
    "(intra_day_arbitrage.ipynb:1053). Distributed form: synthesize "
    "explicit row_number keys over a deterministic order, then equi-join; "
    "here joining the rank-aligned purchase/click value curves.",
)
def c_positional_join(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")

    # The rn <= 100 predicate means only each side's top-100 rows by
    # (value DESC, event_id) can ever appear, so rank a bounded head
    # instead of row_number() over the whole filtered set: orderBy +
    # limit plans as TakeOrderedAndProject (per-partition top-100 heaps
    # merged at the driver — fully distributed, no single-partition
    # global sort), and the window then runs over exactly 100 rows.
    # event_id is the unique tiebreak, so the head is deterministic and
    # rn matches the unbounded ranking's first 100 exactly.
    def ranked(tp, alias):
        w = Window.orderBy(F.desc("value"), F.asc("event_id"))
        head = (
            ev.filter(F.col("event_type") == tp)
            .select("value", "event_id")
            .orderBy(F.desc("value"), F.asc("event_id"))
            .limit(100)
        )
        return head.withColumn("rn", F.row_number().over(w)).select(
            "rn", F.col("value").alias(alias)
        )

    a = ranked("purchase", "v_a")
    b = ranked("click", "v_b")
    return (
        a.join(b, "rn")
        .select(
            "rn",
            r6("v_a").alias("v_a"),
            r6("v_b").alias("v_b"),
            r6(F.col("v_a") - F.col("v_b")).alias("spread"),
        )
    )


@register(
    "h_datetime_suite",
    """
    SELECT event_id,
           year(ts) AS y, quarter(ts) AS q, month(ts) AS m,
           weekofyear(ts) AS wk, dayofweek(ts) + 1 AS dow,
           CAST(date_trunc('month', ts) AS DATE) AS month_start,
           CAST(date_trunc('week', ts) AS DATE) AS week_start,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_sec,
           CAST(ts AS TIMESTAMP) + INTERVAL 90 MINUTE AS ts_plus_90m
    FROM events WHERE user_id < 10
    """,
    doc="Datetime surface: field extraction (year/quarter/month/iso-week/"
    "dow), month/week truncation, epoch seconds, interval arithmetic. "
    "DuckDB dayofweek is 0-based Sunday; Spark is 1-based — aligned "
    "explicitly. weekofyear is ISO in both.",
)
def h_datetime_suite(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    return ev.select(
        "event_id",
        F.year("ts").alias("y"),
        F.quarter("ts").alias("q"),
        F.month("ts").alias("m"),
        F.weekofyear("ts").alias("wk"),
        F.dayofweek("ts").alias("dow"),
        F.date_trunc("month", F.col("ts")).cast("date").alias("month_start"),
        F.date_trunc("week", F.col("ts")).cast("date").alias("week_start"),
        F.unix_timestamp("ts").alias("epoch_sec"),
        (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("ts_plus_90m"),
    )


@register(
    "w_range_frame",
    """
    SELECT event_id, user_id,
           count(*) OVER (PARTITION BY user_id ORDER BY value
                          RANGE BETWEEN 5.0 PRECEDING AND 5.0 FOLLOWING) AS n_within_5,
           CAST(SUM(CAST(value AS DECIMAL(25,8))) OVER (
                PARTITION BY user_id ORDER BY value
                RANGE BETWEEN 5.0 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_below_5
    FROM events WHERE user_id < 30
    """,
    doc="RANGE window frames (value-distance bounds, not row counts): "
    "peers within ±5.0 of each row's value — the frame family rows-based "
    "windows can't express; decimal accumulator keeps the sum exact "
    "across engines.",
)
def w_range_frame(spark, sf_dir):
    # fractional RANGE bounds need the SQL expression form — the PySpark
    # Window.rangeBetween API only accepts integral offsets
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    return ev.selectExpr(
        "event_id",
        "user_id",
        "count(*) OVER (PARTITION BY user_id ORDER BY value "
        "RANGE BETWEEN 5.0 PRECEDING AND 5.0 FOLLOWING) AS n_within_5",
        "CAST(SUM(CAST(value AS DECIMAL(25,8))) OVER (PARTITION BY user_id "
        "ORDER BY value RANGE BETWEEN 5.0 PRECEDING AND CURRENT ROW) "
        "AS DOUBLE) AS sum_below_5",
    )


_ASOF_UNION_SQL = """
    WITH unioned AS (
        SELECT user_id, ts, event_id, value, 1 AS src, NULL::DOUBLE AS rate
        FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, ts, NULL AS event_id, NULL AS value, 0 AS src, value AS rate
        FROM events WHERE event_type = 'purchase'
    ), framed AS (
        SELECT *,
            last_value(CASE WHEN src = 0 THEN rate END IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY ts, src
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bv,
            last_value(CASE WHEN src = 0 THEN ts END IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY ts, src
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bts,
            first_value(CASE WHEN src = 0 THEN rate END IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY ts, (CASE WHEN src = 0 THEN 1 ELSE 0 END)
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fv,
            first_value(CASE WHEN src = 0 THEN ts END IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY ts, (CASE WHEN src = 0 THEN 1 ELSE 0 END)
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fts
        FROM unioned
    )
"""


@register(
    "c_asof_forward",
    _ASOF_UNION_SQL
    + """
    SELECT event_id, user_id, round(fv, 6) AS next_rate
    FROM framed WHERE src = 1
    """,
    doc="As-of join, FORWARD direction (pandas merge_asof forward): each "
    "click snaps to the EARLIEST purchase value at or after it — the "
    "union idiom with the window frame flipped to current-row→following.",
)
def c_asof_forward(spark, sf_dir):
    from sparkwrangle.ops.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("rate")
    )
    out = asof_join(
        clicks, purchases, on="ts", by=["user_id"], value_col="rate",
        direction="forward", out_col="next_rate",
    )
    return out.select("event_id", "user_id", r6("next_rate").alias("next_rate"))


@register(
    "c_asof_nearest",
    _ASOF_UNION_SQL
    + """
    SELECT event_id, user_id,
           round(CASE WHEN bts IS NULL THEN fv
                      WHEN fts IS NULL THEN bv
                      WHEN (epoch(CAST(fts AS TIMESTAMP)) - epoch(CAST(ts AS TIMESTAMP)))
                         < (epoch(CAST(ts AS TIMESTAMP)) - epoch(CAST(bts AS TIMESTAMP)))
                      THEN fv ELSE bv END, 6) AS nearest_rate
    FROM framed WHERE src = 1
    """,
    doc="As-of join, NEAREST direction (pandas merge_asof nearest, ties → "
    "backward): the closer of the backward/forward matches per row.",
)
def c_asof_nearest(spark, sf_dir):
    from sparkwrangle.ops.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("rate")
    )
    out = asof_join(
        clicks, purchases, on="ts", by=["user_id"], value_col="rate",
        direction="nearest", out_col="nearest_rate",
    )
    return out.select("event_id", "user_id", r6("nearest_rate").alias("nearest_rate"))


@register(
    "c_asof_tolerance",
    _ASOF_UNION_SQL
    + """
    SELECT event_id, user_id,
           round(CASE WHEN (epoch(CAST(ts AS TIMESTAMP))
                            - epoch(CAST(bts AS TIMESTAMP))) <= 3600.0
                      THEN bv END, 6) AS rate_1h
    FROM framed WHERE src = 1
    """,
    doc="As-of join with a TOLERANCE bound (pandas merge_asof tolerance): "
    "each click snaps to the latest purchase value at or before it, but "
    "matches staler than 1 hour become NULL — the staleness guard every "
    "market-data as-of needs (a quote from yesterday must not price "
    "today's trade). Same one-shuffle union idiom; the bound is a scalar "
    "predicate on the matched timestamp, not a second join.",
)
def c_asof_tolerance(spark, sf_dir):
    from sparkwrangle.ops.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("rate")
    )
    out = asof_join(
        clicks, purchases, on="ts", by=["user_id"], value_col="rate",
        direction="backward", tolerance_seconds=3600.0, out_col="rate_1h",
    )
    return out.select("event_id", "user_id", r6("rate_1h").alias("rate_1h"))


@register(
    "tpch_q13_order_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13-style customer order-count distribution: outer join "
    "with a join-side predicate (customers with zero qualifying orders "
    "must survive as c_count=0), two cascaded counts. The second "
    "aggregate's key space is tiny (distinct order counts), so the "
    "heavy shuffle is only the first groupBy on c_custkey — which AQE "
    "coalesces; the outer join keeps nulls flowing instead of a "
    "filter-then-join that would lose empty customers.",
)
def tpch_q13_order_distribution(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "tpch_q17_small_quantity_revenue",
    f"""
    SELECT round(
        {_DSUM.format(expr='l.l_extendedprice')} / 7.0, 6) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
        SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_limit
        FROM lineitem GROUP BY l_partkey
    ) t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < t.qty_limit
    """,
    doc="TPC-H Q17-style small-quantity revenue: the spec's correlated "
    "scalar subquery (avg quantity per part) decorrelated as AVG() OVER "
    "(PARTITION BY l_partkey) on the brand-slice join output — the "
    "brand filter drops whole partkeys, so each surviving part's window "
    "sees exactly its full lineitem row set and the average is "
    "unchanged, while the aggregate-join-back form would aggregate the "
    "ENTIRE lineitem (every part, brand or not) and scan it twice. "
    "Quantities are integer-valued, so the double sum behind both "
    "engines' avg is exact and order-invariant — the threshold compare "
    "cannot drift cross-engine (same property the join-back form "
    "relied on). Rows per part are bounded (TPC-H ~30), so the window "
    "exchange on l_partkey is balanced at any scale.",
)
def tpch_q17_small_quantity_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    out = (
        li.join(p.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .withColumn(
            "qty_limit",
            F.avg("l_quantity").over(Window.partitionBy("l_partkey")) * 0.2,
        )
        .filter(F.col("l_quantity") < F.col("qty_limit"))
    )
    return out.agg(
        F.round(dsum(F.col("l_extendedprice")) / 7.0, 6).alias("avg_yearly")
    )


@register(
    "tpch_q18_large_orders",
    f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           {_DSUM.format(expr='l.l_quantity')} AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > 220
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18-style large-volume orders: groupBy-HAVING subquery "
    "feeding a semi join (IN-list), then re-join the 3 tables for the "
    "report columns. The HAVING aggregate and the final aggregate share "
    "the l_orderkey shuffle key, so AQE reuses the exchange; top-100 is "
    "TakeOrderedAndProject, never a global sort.",
)
def tpch_q18_large_orders(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tq"))
        .filter(F.col("tq") > 220)
        .select("l_orderkey")
    )
    out = (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )
    return out


@register(
    "tpch_q4_priority_exists",
    """
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
    )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    doc="TPC-H Q4-style priority check: EXISTS correlated subquery planned "
    "as a LEFT SEMI join on the order key — the probe side never "
    "duplicates orders however many lineitems match; the tiny result "
    "sorts after aggregation.",
)
def tpch_q4_priority_exists(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    kept = o.join(
        li.select("l_orderkey", "l_shipdate"),
        (o.o_orderkey == F.col("l_orderkey"))
        & (F.col("l_shipdate") > o.o_orderdate),
        "left_semi",
    )
    return (
        kept.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q14_promo_share",
    f"""
    SELECT round(
        100.0 * {_DSUM.format(
            expr="CASE WHEN p.p_type = 'PROMO' "
                 "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
        / {_DSUM.format(expr='l.l_extendedprice * (1 - l.l_discount)')},
        6) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= DATE '1995-09-01'
      AND l.l_shipdate < DATE '1995-10-01'
    """,
    doc="TPC-H Q14-style promo revenue share: conditional aggregation over "
    "a broadcast dimension join; the date predicate pushes into the "
    "lineitem scan; both sums ride the exact decimal accumulator so the "
    "ratio is partition-order-proof.",
)
def tpch_q14_promo_share(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("date"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    joined = li.join(p.select("p_partkey", "p_type"),
                     li.l_partkey == p.p_partkey)
    return joined.agg(
        F.round(100.0 * dsum(promo) / dsum(rev), 6).alias("promo_revenue_pct")
    )


@register(
    "q_cdc_upsert",
    """
    WITH changes AS (
        SELECT c_custkey AS k,
               CASE WHEN c_custkey % 13 = 0 THEN 'D'
                    WHEN c_custkey % 7 = 0 THEN 'U' END AS op,
               round(c_acctbal + 100.0, 6) AS new_bal
        FROM customer
        WHERE c_custkey % 13 = 0 OR c_custkey % 7 = 0
    )
    SELECT c.c_custkey, c.c_name,
           round(CASE WHEN ch.op = 'U' THEN ch.new_bal
                      ELSE c.c_acctbal END, 6) AS acctbal,
           CASE WHEN ch.op = 'U' THEN 1 ELSE 0 END AS was_updated
    FROM customer c
    LEFT JOIN changes ch ON c.c_custkey = ch.k
    WHERE ch.op IS DISTINCT FROM 'D'
    """,
    doc="CDC upsert (MERGE semantics without a table format): apply a "
    "deterministic change set (updates on key%7, deletes on key%13 — "
    "deletes win the overlap, matching MERGE's first-clause rule) to "
    "the base via one left join: matched-update coalesces the new "
    "value, matched-delete filters out, unmatched passes through. At "
    "100 TB both sides hash-partition on the key — the join IS the "
    "merge; a lakehouse MERGE compiles to exactly this plus a rewrite.",
)
def q_cdc_upsert(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    changes = (
        c.filter((F.col("c_custkey") % 13 == 0) | (F.col("c_custkey") % 7 == 0))
        .select(
            F.col("c_custkey").alias("k"),
            F.when(F.col("c_custkey") % 13 == 0, F.lit("D"))
            .when(F.col("c_custkey") % 7 == 0, F.lit("U"))
            .alias("op"),
            F.round(F.col("c_acctbal") + 100.0, 6).alias("new_bal"),
        )
    )
    merged = c.join(changes, c.c_custkey == changes.k, "left").filter(
        ~F.col("op").eqNullSafe("D")
    )
    return merged.select(
        "c_custkey",
        "c_name",
        F.round(
            F.when(F.col("op") == "U", F.col("new_bal")).otherwise(
                F.col("c_acctbal")
            ),
            6,
        ).alias("acctbal"),
        F.when(F.col("op") == "U", 1).otherwise(0).alias("was_updated"),
    )


@register(
    "q_scd2_intervals",
    """
    SELECT user_id, event_type, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
           CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                IS NULL AS INTEGER) AS is_current
    FROM events
    """,
    doc="SCD2 validity intervals: each per-user event opens a version "
    "valid until the next one (lead window, event_id tiebreak); the "
    "open-ended row is the current version. One shuffle on user_id, "
    "windows bounded per user — the dimension-history build every "
    "warehouse load runs.",
)
def q_scd2_intervals(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().cast("int").alias("is_current"),
    )


@register(
    "c_temporal_scd2_join",
    """
    WITH dim AS (
        SELECT user_id, value AS rate, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to
        FROM events WHERE event_type = 'purchase'
    )
    SELECT c.event_id, c.user_id, round(d.rate, 6) AS asof_rate
    FROM events c
    LEFT JOIN dim d
      ON d.user_id = c.user_id
     AND c.ts >= d.valid_from
     AND (d.valid_to IS NULL OR c.ts < d.valid_to)
    WHERE c.event_type = 'click'
    """,
    doc="Temporal dimension join: facts (clicks) enriched by the SCD2 "
    "version valid AS OF the fact's timestamp — the warehouse-standard "
    "interval-join expression of as-of semantics (vs the union+ffill "
    "idiom of c_asof_union_ffill, which it must agree with: [valid_from, "
    "valid_to) half-open intervals are disjoint per key, so each fact "
    "matches at most one version; a same-ts double version collapses to "
    "a zero-width interval that never matches — deterministic on both "
    "engines). One shuffle per side on the dimension key; the range "
    "predicate rides the user_id sort-merge join.",
)
def c_temporal_scd2_join(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    # the lead must order exactly like the oracle: (ts, event_id)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "event_id", "value", "ts")
        .withColumn("valid_to", F.lead("ts").over(w))
        .select(
            F.col("user_id").alias("d_user"),
            F.col("value").alias("rate"),
            F.col("ts").alias("valid_from"),
            "valid_to",
        )
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    joined = clicks.join(
        dim,
        (F.col("user_id") == F.col("d_user"))
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
        "left",
    )
    return joined.select("event_id", "user_id", r6(F.col("rate")).alias("asof_rate"))


@register(
    "h_struct_map_suite",
    f"""
    WITH per AS (
        SELECT user_id, event_type, count(*) AS n,
               SUM(CAST(value AS DECIMAL(25,8))) AS v
        FROM events GROUP BY 1, 2
    ),
    agg AS (
        SELECT user_id,
               map_from_entries(list(struct_pack(k := event_type, v := n))) AS m,
               CAST(sum(n) AS BIGINT) AS cnt,
               round(CAST(SUM(v) AS DOUBLE), 6) AS tot
        FROM per GROUP BY user_id
    )
    SELECT a.user_id,
           COALESCE((m['purchase'])[1], 0) AS n_purchase,
           COALESCE((m['error'])[1], 0) AS n_error,
           struct_pack(cnt := a.cnt, tot := a.tot).cnt AS n_events,
           struct_pack(cnt := a.cnt, tot := a.tot).tot AS sum_value
    FROM agg a
    """,
    doc="Struct/map scalar surface: per-user event-type counts pivoted "
    "into a MAP (map_from_entries over collected entries — key order "
    "irrelevant, only extraction is observed), element_at with a "
    "missing-key null -> 0, and a STRUCT built then field-accessed. "
    "Output stays flat so the cross-engine hash compares scalars, not "
    "engine-specific nested renderings.",
)
def h_struct_map_suite(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    # the per-user value total rides the per-(user, type) aggregate as an
    # exact decimal partial and rolls up in the second aggregate — one
    # events scan and no join-back (decimal associativity keeps the
    # rounded double bit-equal to the oracle's direct per-user sum)
    per = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(25,8)")).alias("_v"),
    )
    j = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("event_type").alias("k"), F.col("n").alias("v")))
        ).alias("m"),
        F.sum("n").alias("cnt"),
        r6(F.sum("_v").cast("double")).alias("tot"),
    )
    stats = F.struct(F.col("cnt").alias("cnt"), F.col("tot").alias("tot"))
    return j.select(
        "user_id",
        F.coalesce(F.element_at("m", F.lit("purchase")), F.lit(0)).alias("n_purchase"),
        F.coalesce(F.element_at("m", F.lit("error")), F.lit(0)).alias("n_error"),
        stats.getField("cnt").alias("n_events"),
        stats.getField("tot").alias("sum_value"),
    )


@register(
    "tpch_q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           {_DSUM.format(expr='volume')} AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INT) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        WHERE n1.n_name <> n2.n_name
          AND l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate < TIMESTAMP '1999-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 volume shipping: the canonical 6-way join-reordering "
    "benchmark — lineitem fact joined through orders/customer/supplier "
    "to TWO broadcast copies of the nation dimension with a cross-"
    "nation predicate, aggregated by nation pair and ship year. Both "
    "nation sides broadcast; the date filter pushes to the fact scan; "
    "revenue uses the exact decimal accumulator.",
)
def tpch_q7_volume_shipping(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    shipping = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("nk1") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("nk2") == F.col("c_nationkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
    )
    return shipping.groupBy("supp_nation", "cust_nation", "l_year").agg(
        dsum(F.col("volume")).alias("revenue")
    )


@register(
    "tpch_q21_shape_return_blame",
    """
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    """,
    doc="TPC-H Q21 plan shape (adapted to this schema's columns: "
    "l_returnflag = 'R' stands in for late receipt, which the trimmed "
    "lineitem lacks): for finished orders, blame the supplier whose "
    "line was returned when OTHER suppliers participated in the order "
    "(EXISTS → left-semi self-join) but NONE of the others had returns "
    "(NOT EXISTS → left-anti self-join). The classic double "
    "correlated-subquery decorrelation exercise — both subqueries "
    "rewrite to hash joins on the already-partitioned order key.",
)
def tpch_q21_shape_return_blame(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    l1 = (
        l.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select("l_orderkey", "l_suppkey")
    )
    other = l.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    other_r = l.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    blamed = (
        l1.join(
            other,
            (F.col("ok2") == F.col("l_orderkey")) & (F.col("sk2") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            other_r,
            (F.col("ok3") == F.col("l_orderkey")) & (F.col("sk3") != F.col("l_suppkey")),
            "left_anti",
        )
    )
    return (
        blamed.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "tpch_q22_shape_idle_customers",
    """
    WITH avg_bal AS (
        SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey AS nationkey,
           count(*) AS numcust,
           round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(25,8))) AS DOUBLE), 6)
               AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c.c_nationkey
    """,
    doc="TPC-H Q22 plan shape (nation key stands in for the trimmed "
    "schema's missing phone prefix): customers with above-average "
    "positive balance and no orders in the recent window (the Q22 "
    "'7 years idle' predicate) — a scalar subquery (1-row broadcast) feeding a filter plus a left-anti join against "
    "the orders fact, grouped by nation. The canonical 'prospect "
    "analysis' anti-join exercise.",
)
def tpch_q22_shape_idle_customers(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = F.broadcast(
        c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("ab"))
    )
    return (
        c.crossJoin(avg_bal)
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(
            o.filter(
                F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
            ).select(F.col("o_custkey")),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(dsum(F.col("c_acctbal")), 6).alias("totacctbal"),
        )
    )


@register(
    "tpch_q6_forecast_revenue",
    f"""
    SELECT {_DSUM.format(expr='l_extendedprice * l_discount')} AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24.0
    """,
    doc="TPC-H Q6 forecast revenue change: the pure-scan benchmark — "
    "every predicate (date range, discount band, quantity cap) pushes "
    "into the parquet scan, the aggregate is a single map-side-"
    "combinable decimal sum; the query that measures scan + pushdown "
    "throughput with zero join or shuffle cost beyond one partial-agg "
    "exchange.",
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.04, 0.06)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_q8_market_share",
    f"""
    WITH flat AS (
        SELECT year(o.o_orderdate) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n1.n_regionkey
        JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA'
          AND p.p_type = 'PROMO'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           round({_DSUM.format(
               expr="CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0 END")}
                 / {_DSUM.format(expr='volume')}, 6) AS mkt_share
    FROM flat
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8 national market share: NATION_7's slice of ASIA-"
    "customer PROMO-part revenue per order year. The 8-table join "
    "tree Catalyst reorders freely: every dimension (part, supplier, "
    "both nation legs, region) broadcasts; the only shuffles are the "
    "lineitem->orders fact-fact join keys and the final year rollup. "
    "Both the conditional and total volume sums ride the exact decimal "
    "accumulator, so the share is partition-order-proof.",
)
def tpch_q8_market_share(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    flat = (
        li.join(p.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .join(o.select("o_orderkey", "o_custkey", "o_orderdate"),
              li.l_orderkey == F.col("o_orderkey"))
        .join(s.select("s_suppkey", "s_nationkey"),
              li.l_suppkey == F.col("s_suppkey"))
        .join(c.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(r.select("r_regionkey")),
              F.col("c_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    nat_vol = F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(
        F.lit(0.0)
    )
    return (
        flat.groupBy("o_year")
        .agg(F.round(dsum(nat_vol) / dsum(F.col("volume")), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "tpch_q12_shape_ship_lag_priority",
    """
    SELECT CASE WHEN l.l_shipdate >= o.o_orderdate + INTERVAL 90 DAY
                THEN 'late' ELSE 'ontime' END AS ship_class,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    ORDER BY 1
    """,
    doc="TPC-H Q12 plan shape (ship-lag buckets stand in for the trimmed "
    "schema's missing l_shipmode/l_commitdate/l_receiptdate): classify "
    "each line by shipping lag vs its order date, then count urgent vs "
    "non-urgent order lines per class — the canonical conditional "
    "two-way aggregation over a fact-fact join. Integer counts, so no "
    "float accumulation concern; the join shuffles once on the order "
    "key and the 2-row result aggregates map-side first.",
)
def tpch_q12_shape_ship_lag_priority(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    joined = li.select("l_orderkey", "l_shipdate").join(
        o.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        li.l_orderkey == F.col("o_orderkey"),
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        joined.select(
            F.when(
                F.col("l_shipdate")
                >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"),
                F.lit("late"),
            )
            .otherwise(F.lit("ontime"))
            .alias("ship_class"),
            high.alias("_high"),
        )
        .groupBy("ship_class")
        .agg(
            F.sum(F.when(F.col("_high"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~F.col("_high"), 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@register(
    "tpch_q15_top_supplier",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {_DSUM.format(expr='l_extendedprice * (1 - l_discount)')}
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, round(r.total_revenue, 6) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q15 top supplier: quarterly per-supplier revenue, keep the "
    "supplier(s) tying the maximum (the spec keeps ties — equality "
    "against a scalar-subquery max, NOT LIMIT 1). The revenue CTE is "
    "consumed twice (probe + max); the max collapses to a 1-row "
    "broadcast. The equality compare is safe cross-engine because "
    "total_revenue comes out of the exact decimal accumulator — "
    "bit-identical on both engines — and is rounded only for display.",
)
def tpch_q15_top_supplier(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        ))
    )
    mx = F.broadcast(revenue.agg(F.max("total_revenue").alias("_mx")))
    return (
        revenue.crossJoin(mx)
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(s.select("s_suppkey", "s_name"),
              F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.round("total_revenue", 6).alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q19_shape_disjunctive_revenue",
    f"""
    SELECT {_DSUM.format(expr='l.l_extendedprice * (1 - l.l_discount)')}
               AS revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 40)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 60)
    """,
    doc="TPC-H Q19 plan shape (brand/size/quantity bands stand in for the "
    "trimmed schema's missing p_container and l_shipmode): revenue over "
    "an OR of three conjunctive brand x size x quantity bands — the "
    "disjunctive-predicate exercise. Catalyst pushes the brand/size "
    "disjunction (all part-side conjuncts) into the part scan and the "
    "derived quantity envelope (1..60) into the lineitem scan before "
    "the broadcast join evaluates the full cross-side disjunction.",
)
def tpch_q19_shape_disjunctive_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & (q >= 1) & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & (q >= 10) & (q <= 40)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & (q >= 20) & (q <= 60)
        )
    )
    return (
        li.join(
            p.select("p_partkey", "p_brand", "p_size"),
            li.l_partkey == F.col("p_partkey"),
        )
        .filter(band)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_q2_shape_min_cost_supplier",
    """
    WITH supply AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
        SELECT su.l_partkey, su.unit_cost,
               s.s_name, s.s_acctbal, n.n_name
        FROM supply su
        JOIN supplier s ON s.s_suppkey = su.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    )
    SELECT e.s_acctbal, e.s_name, e.n_name AS nation, p.p_partkey,
           round(e.unit_cost, 6) AS unit_cost
    FROM eu e
    JOIN part p ON p.p_partkey = e.l_partkey
    WHERE p.p_type = 'LARGE' AND p.p_size <= 25
      AND e.unit_cost = (SELECT min(e2.unit_cost) FROM eu e2
                         WHERE e2.l_partkey = e.l_partkey)
    ORDER BY e.s_acctbal DESC, e.s_name, p.p_partkey
    LIMIT 20
    """,
    doc="TPC-H Q2 plan shape (lineitem unit prices stand in for the "
    "trimmed schema's missing partsupp.ps_supplycost): for each LARGE "
    "small-size part, keep the EUROPE supplier(s) whose observed unit "
    "cost ties the per-part minimum — the canonical correlated-scalar-"
    "subquery-per-group query. The oracle keeps the correlated form; "
    "the Spark plan decorrelates it as min() OVER (PARTITION BY "
    "l_partkey) — one exchange on the part key and ONE evaluation of "
    "the supplier-region subtree, where the aggregate-join-back form "
    "Catalyst's RewriteCorrelatedScalarSubquery emits would scan and "
    "join the subtree twice and sort-merge the self-join (NOTES lead "
    "#3). The part filter joins BEFORE the window: it only drops whole "
    "partkeys, so the per-part min is unchanged while the window sees "
    "only surviving parts. Every join is statistics-driven (no "
    "broadcast hints — supplier/nation/region/filtered-part scans "
    "carry honest parquet sizes). min() of identically-computed IEEE "
    "doubles is order-invariant, so the equality is safe cross-engine; "
    "ties survive (spec behavior), and the top-20 order has a full "
    "deterministic tiebreak.",
)
def tpch_q2_shape_min_cost_supplier(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 25)
    )
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    eu = (
        supply.join(
            s.select("s_suppkey", "s_name", "s_acctbal", "s_nationkey"),
            supply.l_suppkey == F.col("s_suppkey"),
        )
        .join(
            n.select("n_nationkey", "n_name", "n_regionkey"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            r.select("r_regionkey"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("l_partkey", "unit_cost", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("l_partkey")
    return (
        eu.join(p.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("_mn", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("_mn"))
        .select(
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            r6(F.col("unit_cost")).alias("unit_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey")
        .limit(20)
    )


@register(
    "tpch_q9_shape_product_profit",
    f"""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           round({_DSUM.format(
               expr="l.l_extendedprice * (1 - l.l_discount)"
               " - p.p_retailprice * 0.1 * l.l_quantity")}, 6) AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, year(o.o_orderdate)
    ORDER BY nation, o_year
    """,
    doc="TPC-H Q9 product-type profit shape (p_retailprice * 0.1 stands "
    "in for the trimmed schema's missing partsupp.ps_supplycost): "
    "revenue minus synthetic supply cost for 'red' parts, rolled up by "
    "supplier nation and order year. Two fact-fact joins (lineitem->"
    "orders on orderkey after a lineitem->part broadcast prune) with "
    "every dimension broadcast; the profit expression is computed per "
    "row in IEEE double (identical cross-engine) and accumulated in the "
    "exact decimal sum, so the rollup is partition-order-proof.",
)
def tpch_q9_shape_product_profit(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.lit(0.1) * F.col("l_quantity")
    )
    return (
        li.join(
            p.select("p_partkey", "p_retailprice"),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(
            s.select("s_suppkey", "s_nationkey"),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .join(
            o.select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            profit.alias("_profit"),
        )
        .groupBy("nation", "o_year")
        .agg(r6(dsum(F.col("_profit"))).alias("sum_profit"))
        .orderBy("nation", "o_year")
    )


@register(
    "tpch_q11_shape_important_inventory",
    f"""
    WITH val AS (
        SELECT l.l_partkey,
               {_DSUM.format(expr='l.l_extendedprice * l.l_quantity')} AS value
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY l.l_partkey
    )
    SELECT l_partkey, round(value, 6) AS value
    FROM val
    WHERE value > (SELECT {_DSUM.format(expr='value')} / count(*) * 1.2 FROM val)
    ORDER BY value DESC, l_partkey
    """,
    doc="TPC-H Q11 important-inventory shape (lineitem traded value "
    "stands in for the trimmed schema's missing partsupp availqty x "
    "supplycost): per-part ASIA-supplied value, keeping parts above "
    "1.2x the GLOBAL mean (scale-free, unlike the spec's fixed "
    "fraction, so the result stays non-degenerate at every SF) — the "
    "grouped-aggregate-vs-scalar-subquery-over-the-same-CTE shape (the "
    "CTE is consumed twice, like Q15 but with a HAVING-style threshold "
    "instead of a max). The threshold is a 1-row broadcast; both the "
    "per-part values and the global total ride the exact decimal "
    "accumulator, and the mean x 1.2 arithmetic is the same IEEE op "
    "sequence on both engines, so the comparison boundary cannot "
    "drift cross-engine.",
)
def tpch_q11_shape_important_inventory(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    val = (
        li.join(
            s.select("s_suppkey", "s_nationkey"),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(n.select("n_nationkey", "n_regionkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(r.select("r_regionkey")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("l_partkey")
        .agg(dsum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    thresh = F.broadcast(
        val.agg(
            (dsum(F.col("value")) / F.count("*") * F.lit(1.2)).alias("_thresh")
        )
    )
    return (
        val.crossJoin(thresh)
        .filter(F.col("value") > F.col("_thresh"))
        .select("l_partkey", r6(F.col("value")).alias("value"))
        .orderBy(F.col("value").desc(), "l_partkey")
    )


@register(
    "tpch_q16_shape_supplier_variety",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#9'
      AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 supplier-variety shape (an s_acctbal floor stands in "
    "for the trimmed schema's missing complaint comment filter): count "
    "distinct qualifying suppliers per (brand, type, size) bucket, "
    "excluding low-balance suppliers via NOT IN — the anti-join + "
    "count-distinct shape. The exclusion list is a broadcast left-anti "
    "join (s_suppkey is non-null so NOT IN ≡ anti-join), the part "
    "predicate prunes at the broadcast build, and all outputs are "
    "integers — no float concern anywhere.",
)
def tpch_q16_shape_supplier_variety(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 2000)
        .select("s_suppkey")
    )
    return (
        li.select("l_partkey", "l_suppkey")
        .join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(
            p.select("p_partkey", "p_brand", "p_type", "p_size"),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q20_shape_excess_suppliers",
    f"""
    WITH shipped AS (
        SELECT l_partkey, l_suppkey, {_DSUM.format(expr='l_quantity')} AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_partkey, l_suppkey
    ),
    tot AS (
        SELECT l_partkey, {_DSUM.format(expr='l_quantity')} AS total_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_partkey
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'AMERICA'
      AND s.s_suppkey IN (
          SELECT sh.l_suppkey
          FROM shipped sh
          JOIN tot t ON t.l_partkey = sh.l_partkey
          JOIN part p ON p.p_partkey = sh.l_partkey
          WHERE p.p_name LIKE 'small%'
            AND sh.qty > 0.3 * t.total_qty)
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q20 excess-supplier shape (a 30% share of a part's 1997 "
    "shipments stands in for the trimmed schema's missing "
    "partsupp.ps_availqty > half-of-shipped test): AMERICA suppliers "
    "who dominated shipment volume of some 'small' part — the nested "
    "correlated-aggregate semi-join chain. Spark plan: ONE per-(part, "
    "supplier) decimal aggregate; the per-part total is a window SUM "
    "over the part key of those exact decimal partials (associativity "
    "of exact decimal addition makes it bit-equal to the oracle's "
    "direct per-part sum), so lineitem is scanned and aggregated once "
    "where the aggregate-join form scans it twice and sort-merges the "
    "two aggregates on the part key. The part filter joins before the "
    "window (drops whole partkeys only); the supplier list arrives via "
    "left_semi — no row multiplication reaches the output. The 0.3 "
    "multiply is the same IEEE double op on both engines over "
    "identical exact-decimal inputs, so the share boundary cannot drift.",
)
def tpch_q20_shape_excess_suppliers(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("small"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(25,8)")).alias("_qty_dec")
    )
    dominant = (
        shipped.join(p.select("p_partkey"), shipped.l_partkey == F.col("p_partkey"))
        .withColumn(
            "total_qty",
            F.sum("_qty_dec").over(Window.partitionBy("l_partkey")).cast("double"),
        )
        .withColumn("qty", F.col("_qty_dec").cast("double"))
        .filter(F.col("qty") > F.lit(0.3) * F.col("total_qty"))
        .select("l_suppkey")
    )
    return (
        s.join(
            F.broadcast(n.select("n_nationkey", "n_regionkey")),
            s.s_nationkey == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(r.select("r_regionkey")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q10_returned_items",
    f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {_DSUM.format(expr='l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           round(CAST(any_value(c.c_acctbal) AS DOUBLE), 2) AS c_acctbal
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1998-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-07-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 returned-item reporting: which customers returned the "
    "most revenue last quarter — fact-to-fact join (orders x lineitem) "
    "with a broadcast nation dimension, grouped per customer, "
    "distributed top-20 by revenue (TakeOrderedAndProject, not a "
    "global sort). any_value(c_acctbal) is deterministic: it is "
    "functionally dependent on the c_custkey group key.",
)
def tpch_q10_returned_items(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp"))
        )
        .join(l.filter(F.col("l_returnflag") == "R"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.round(F.any_value("c_acctbal"), 2).alias("c_acctbal"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q_cube_grouping_id",
    f"""
    SELECT n.n_name, c.c_mktsegment,
           CAST(grouping(n.n_name) * 2 + grouping(c.c_mktsegment) AS BIGINT)
               AS gid,
           {_DSUM.format(expr='o.o_totalprice')} AS total,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY CUBE (n.n_name, c.c_mktsegment)
    """,
    doc="Grouping-sets surface, CUBE form: all four grouping combinations "
    "of (nation, market segment) in one pass, with grouping_id "
    "disambiguating real NULL key values from subtotal rows — the "
    "companion to q_rollup_revenue that completes the GROUPING SETS "
    "family. The cube expands map-side (Expand operator), so it is one "
    "shuffle regardless of how many grouping sets it covers.",
)
def q_cube_grouping_id(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    joined = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    return joined.cube("n_name", "c_mktsegment").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        dsum(F.col("o_totalprice")).alias("total"),
        F.count("*").alias("n_orders"),
    ).select("n_name", "c_mktsegment", "gid", "total", "n_orders")


def _ewma_sql(alpha: float = 0.2, lags: int = 20) -> str:
    num = " + ".join(
        f"CASE WHEN lag(value, {j}) OVER w IS NOT NULL THEN "
        f"{(1 - alpha) ** j!r} * lag(value, {j}) OVER w ELSE 0.0 END"
        for j in range(lags)
    )
    den = " + ".join(
        f"CASE WHEN lag(value, {j}) OVER w IS NOT NULL THEN "
        f"{(1 - alpha) ** j!r} ELSE 0.0 END"
        for j in range(lags)
    )
    # den = 0 (a partition opening with a run of NULL values) would give
    # 0.0/0.0 = NaN on both engines — emit NULL instead, on both engines
    return f"""
    SELECT event_id, user_id,
           round(value, 6) AS value,
           CASE WHEN ({den}) > 0.0
                THEN round(({num}) / ({den}), 6) END AS ewma
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


@register(
    "w_ewma_smoothing",
    _ewma_sql(),
    doc="Exponentially weighted moving average (adjust=True, alpha=0.2, "
    "20-lag truncation — the residual weight beyond 20 lags is "
    "0.8^20 ≈ 1.2%): the trading/telemetry smoother the rolling-mean "
    "family lacks. The recurrence s_t = a*x_t + (1-a)*s_{t-1} is "
    "sequential, but the truncated closed form is a FIXED-ORDER chain "
    "of 20 lag terms with literal weights — one window, no recursion, "
    "no float-aggregation-order hazard (the sum order is the literal "
    "expression order on both engines), and early rows renormalize "
    "over the lags that exist exactly as pandas ewm(adjust=True) does.",
)
def w_ewma_smoothing(spark, sf_dir, alpha: float = 0.2, lags: int = 20):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j in range(lags):
        lj = F.lag("value", j).over(w)
        wt = F.lit((1 - alpha) ** j)
        num = num + F.when(lj.isNotNull(), wt * lj).otherwise(F.lit(0.0))
        den = den + F.when(lj.isNotNull(), wt).otherwise(F.lit(0.0))
    return ev.select(
        "event_id",
        "user_id",
        r6(F.col("value")).alias("value"),
        F.when(den > 0.0, r6(num / den)).alias("ewma"),
    )


@register(
    "w_zscore_anomaly",
    f"""
    WITH frames AS (
        SELECT event_id, user_id, value,
               sum(value) OVER w AS s1,
               sum(value * value) OVER w AS s2,
               count(*) OVER w AS n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id,
           {rf_sql("(value - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1))")}
               AS zscore,
           (abs((value - s1 / n)
                / sqrt((s2 - s1 * s1 / n) / (n - 1))) > 2.0) AS is_anomaly
    FROM frames
    WHERE n >= 3 AND (s2 - s1 * s1 / n) / (n - 1) > 1e-12
    """,
    doc="Rolling z-score anomaly flags: per series, how many sample "
    "standard deviations the current value sits from its 7-row rolling "
    "mean, |z| > 2 flagged — the telemetry outlier detector. The "
    "variance comes from EXPLICIT frame sums (Σx, Σx², n — identical "
    "frame order on both engines) rather than the built-in stddev "
    "aggregate, whose Welford-vs-textbook implementations differ "
    "across engines at the ulp level; degenerate frames (n < 3 or "
    "~zero variance) are excluded on both sides.",
)
def w_zscore_anomaly(spark, sf_dir):
    from sparkwrangle.catalog import rf

    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    s1 = F.sum("value").over(w)
    s2 = F.sum(F.col("value") * F.col("value")).over(w)
    n = F.count("*").over(w)
    var = (s2 - s1 * s1 / n) / (n - 1)
    z = (F.col("value") - s1 / n) / F.sqrt(var)
    return (
        ev.select("event_id", "user_id", "value", s1.alias("s1"),
                  s2.alias("s2"), n.alias("n"))
        .filter(
            (F.col("n") >= 3)
            & ((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
               / (F.col("n") - 1) > 1e-12)
        )
        .select(
            "event_id",
            "user_id",
            rf(
                (F.col("value") - F.col("s1") / F.col("n"))
                / F.sqrt(
                    (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
                    / (F.col("n") - 1)
                )
            ).alias("zscore"),
            (
                F.abs(
                    (F.col("value") - F.col("s1") / F.col("n"))
                    / F.sqrt(
                        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
                        / (F.col("n") - 1)
                    )
                )
                > 2.0
            ).alias("is_anomaly"),
        )
    )
