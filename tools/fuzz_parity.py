"""Randomized brute-force parity fuzz for the engine's EXACTNESS claims.

The oracle gate compares engines after 1e-9/round-6 rounding, so any
"bit-identical to a Spark builtin" or "lossless join" claim has a
failure class the gate can never see (round 8 caught two real bugs this
way: a one-ulp quantile-interpolation divergence, and the edit-distance
join silently dropping every pair involving a sub-q string). This tool
re-runs the full campaign; run it whenever one of the covered operators
changes:

    python tools/fuzz_parity.py [trials-multiplier]

Covered: grouped_row_number / grouped_percent_rank /
grouped_exact_quantiles (vs window forms + percentile(), bitwise, incl.
NULL groups, NULL/NaN order keys, string keys, hostile block counts),
grouped_top_k (vs rank window, arbitrary orderings), edit_distance_pairs
(vs Python DP brute force, incl. empty/sub-q strings, multi-byte),
prefix_filter_pairs (vs set brute force, random thresholds incl. 1.0),
connected_components (vs union-find, random/chain/star/clique shapes),
duplicate_spans (vs Counter brute force, window AND join count modes),
window decorrelations (round-9 tpch_q2/q17/q20/h_struct rewrites vs
the aggregate-join-back forms they replaced: tied minima, NULL/NaN,
dimension-filtered keys), asof_join (vs a Python brute force of
pandas.merge_asof semantics: all three directions x tolerance incl.
0.0, dense exact-timestamp ties, missing keys, empty sides),
trader_transcription (engine trader vs the engine-independent
reference transcription, bitwise, fresh random multi-ticker feeds),
sql_dialect_shim (randomized DuckDB-dialect expressions on real DuckDB
vs spark.sql(translate(...)) — rule interactions to depth 3, string
decoys, NULL/empty-list edges).
Exit code 1 on any mismatch.
"""

from __future__ import annotations

import itertools
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window
from pyspark.sql import functions as F

from sparkwrangle.session import get_spark

# guard the parse: this module is also imported by the committed
# regression test, where sys.argv holds pytest arguments
MULT = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 1
FAILS = []


def check(name, ok, detail=""):
    if not ok:
        FAILS.append(name)
        print(f"FAIL  {name}: {detail}")


def fuzz_grouped_ranks(spark, trials=None):
    from sparkwrangle.ops.windows import (
        grouped_exact_quantiles,
        grouped_percent_rank,
        grouped_row_number,
    )

    rng = random.Random(8)
    for trial in range(trials if trials is not None else 20 * MULT):
        n = rng.choice([0, 1, 2, 7, 50, 300])
        ng = rng.choice([1, 2, 5])
        numeric = rng.random() < 0.5
        nparts = rng.choice([1, 2, 3, 5, 16, 50])
        rows = []
        for i in range(n):
            g = rng.choice([None, *[f"g{j}" for j in range(ng)]])
            if numeric:
                r = rng.random()
                v = None if r < 0.1 else (float("nan") if r < 0.15 else float(rng.randint(0, 9)))
            else:
                v = None if rng.random() < 0.1 else f"s{rng.randint(0, 20):02d}"
            rows.append((i, g, v))
        schema = "id long, g string, v double" if numeric else "id long, g string, v string"
        df = spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)
        w = Window.partitionBy("g").orderBy("v", "id")
        want_rn = {r.id: r.rn for r in df.withColumn("rn", F.row_number().over(w)).collect()}
        got_rn = {
            r.id: r.rn
            for r in grouped_row_number(df, ["g"], ["v", "id"], num_partitions=nparts).collect()
        }
        check("grouped_row_number", got_rn == want_rn, f"trial {trial}")
        want_pr = {r.id: r.pr for r in df.withColumn("pr", F.percent_rank().over(w)).collect()}
        got_pr = {
            r.id: r.pr
            for r in grouped_percent_rank(df, ["g"], ["v", "id"], num_partitions=nparts).collect()
        }
        check("grouped_percent_rank", got_pr == want_pr, f"trial {trial}")
        if not numeric:
            continue
        ps = [0.0, 0.33, 0.5, 0.77, 1.0]
        want_q = {
            (r.g, p): (r.q[i] if r.q is not None else None)
            for r in df.groupBy("g")
            .agg(F.expr("percentile(v, array(0.0D,0.33D,0.5D,0.77D,1.0D))").alias("q"))
            .collect()
            for i, p in enumerate(ps)
        }
        got_q = {
            (r.g, r.p): r.v
            for r in grouped_exact_quantiles(
                df, ["g"], "v", ps, tiebreak_cols=["id"], num_partitions=nparts
            ).collect()
        }
        same = set(got_q) == set(want_q) and all(
            (a is None and b is None)
            or (a is not None and b is not None and ((a != a and b != b) or a == b))
            for k in want_q
            for a, b in [(got_q.get(k), want_q[k])]
        )
        check("grouped_exact_quantiles(bitwise)", same, f"trial {trial}")


def fuzz_grouped_top_k(spark):
    from sparkwrangle.ops.windows import grouped_top_k

    rng = random.Random(44)
    for trial in range(15 * MULT):
        n = rng.choice([0, 1, 5, 60, 300])
        k = rng.choice([1, 3, 10])
        rows = []
        for i in range(n):
            g = rng.choice([None, "a", "b", "c"])
            r = rng.random()
            v = None if r < 0.12 else (float("nan") if r < 0.2 else float(rng.randint(0, 9)))
            rows.append((i, g, v))
        df = (
            spark.createDataFrame(rows, "id long, g string, v double")
            if rows
            else spark.createDataFrame([], "id long, g string, v double")
        )
        order = [F.desc("v"), F.asc("id")] if rng.random() < 0.5 else [F.asc_nulls_last("v"), F.asc("id")]
        w = Window.partitionBy("g").orderBy(*order)
        want = {
            r.id: r.rk
            for r in df.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k).collect()
        }
        got = {r.id: r.rk for r in grouped_top_k(df, ["g"], order, k).collect()}
        check("grouped_top_k", got == want, f"trial {trial}")


def _py_lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def fuzz_edit_distance(spark):
    from sparkwrangle.ext.dedup import edit_distance_pairs

    rng = random.Random(5)
    for trial in range(8 * MULT):
        nd = rng.choice([0, 1, 2, 12, 40])
        alpha = rng.choice(["ab", "abcde", "abcdefgh", "aàbβ"])
        k = rng.choice([1, 2, 3])
        q = rng.choice([2, 3])
        rows = [
            (i, "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12))))
            for i in range(nd)
        ]
        df = (
            spark.createDataFrame(rows, "doc_id long, s string")
            if rows
            else spark.createDataFrame([], "doc_id long, s string")
        )
        got = {
            (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
            for r in edit_distance_pairs(df, "doc_id", "s", k=k, q=q).collect()
        }
        want = {
            (min(a[0], b[0]), max(a[0], b[0]))
            for a, b in itertools.combinations(rows, 2)
            if _py_lev(a[1], b[1]) <= k
        }
        check("edit_distance_pairs", got == want, f"trial {trial} k={k} q={q}")


def fuzz_prefix_filter(spark):
    from sparkwrangle.ext.dedup import prefix_filter_pairs

    rng = random.Random(13)
    for trial in range(10 * MULT):
        nd = rng.choice([0, 1, 2, 10, 30])
        vocab = rng.randint(3, 30)
        t = rng.choice([0.2, 0.5, 0.8, 1.0])
        docs = {i: set(rng.sample(range(vocab), min(rng.randint(1, 12), vocab))) for i in range(nd)}
        rows = [(i, f"sh{s}") for i, ss in docs.items() for s in ss]
        df = (
            spark.createDataFrame(rows, "doc_id long, shingle string")
            if rows
            else spark.createDataFrame([], "doc_id long, shingle string")
        )
        got = {
            (r.id_a, r.id_b): r.inter
            for r in prefix_filter_pairs(df, "doc_id", threshold=t).collect()
        }
        want = {}
        for a, b in itertools.combinations(sorted(docs), 2):
            inter = len(docs[a] & docs[b])
            un = len(docs[a] | docs[b])
            if un and inter / un >= t:
                want[(a, b)] = inter
        check("prefix_filter_pairs", got == want, f"trial {trial} t={t}")


def fuzz_connected_components(spark):
    from sparkwrangle.ext.dedup import connected_components

    def brute(nodes, edges):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in nodes}

    rng = random.Random(3)
    for trial in range(10 * MULT):
        nn = rng.choice([0, 1, 2, 9, 40])
        shape = rng.choice(["random", "chain", "star", "clique+isolates"])
        nodes = list(range(nn))
        edges = []
        if nn >= 2:
            if shape == "random":
                edges = [(rng.randrange(nn), rng.randrange(nn)) for _ in range(rng.randint(0, nn * 2))]
            elif shape == "chain":
                edges = [(i, i + 1) for i in range(nn - 1)]
            elif shape == "star":
                edges = [(nn - 1, i) for i in range(nn - 1)]
            else:
                c = nodes[: nn // 2]
                edges = [(a, b) for a in c for b in c if a < b]
        pdf = (
            spark.createDataFrame(edges, "id_a long, id_b long")
            if edges
            else spark.createDataFrame([], "id_a long, id_b long")
        )
        alln = (
            spark.createDataFrame([(n,) for n in nodes], "doc_id long")
            if nodes
            else spark.createDataFrame([], "doc_id long")
        )
        want = brute(nodes, edges)
        got = {r.doc_id: r.cluster_id for r in connected_components(pdf, alln, "doc_id").collect()}
        check("connected_components", got == want, f"trial {trial} {shape} n={nn}")


def fuzz_asof_join(spark, trials=None):
    """asof_join vs a pure-Python brute force of pandas.merge_asof
    semantics: per left row take the latest right ts' <= ts (backward) /
    earliest ts' >= ts (forward) / the closer of the two with ties ->
    backward (nearest), where tolerance NULLs the CHOSEN side's value
    without falling back to the other side (pandas picks nearest first,
    filters second — pinned here so a refactor cannot silently 'improve'
    it). Timestamps draw from a tiny integer range so exact left==right
    ties are dense; keys can be missing from either side; empty frames
    included."""
    from datetime import datetime, timezone

    from sparkwrangle.ops.joins import asof_join

    def ts(s):
        return datetime.fromtimestamp(1_700_000_000 + s, tz=timezone.utc)

    rng = random.Random(99)
    for trial in range(trials if trials is not None else 10 * MULT):
        nl = rng.choice([0, 1, 6, 40])
        nr = rng.choice([0, 1, 5, 30])
        keys = ["a", "b", "c"]
        span = rng.choice([12, 200])
        left = [
            (i, rng.choice(keys), rng.randrange(span)) for i in range(nl)
        ]
        seen = set()
        right = []
        for _ in range(nr):
            k, s = rng.choice(keys[:2]), rng.randrange(span)  # key 'c' never
            if (k, s) in seen:  # contract: right unique per (by, on)
                continue
            seen.add((k, s))
            right.append((k, s, float(rng.randrange(1000))))
        direction = rng.choice(["backward", "forward", "nearest"])
        tol = rng.choice([None, 0.0, 3.0, float(span)])
        ldf = spark.createDataFrame(
            [(i, k, ts(s)) for i, k, s in left] or [],
            "id long, k string, ts timestamp",
        )
        rdf = spark.createDataFrame(
            [(k, ts(s), v) for k, s, v in right] or [],
            "k string, ts timestamp, rate double",
        )
        got = {
            r.id: r.rate
            for r in asof_join(
                ldf, rdf, on="ts", by=["k"], value_col="rate",
                direction=direction, tolerance_seconds=tol,
            ).collect()
        }
        by_key: dict = {}
        for k, s, v in right:
            by_key.setdefault(k, []).append((s, v))
        want = {}
        for i, k, s in left:
            rows = by_key.get(k, [])
            back = max(((t, v) for t, v in rows if t <= s), default=None)
            fwd = min(((t, v) for t, v in rows if t >= s), default=None)
            if direction == "backward":
                pick, gap = back, (s - back[0]) if back else None
            elif direction == "forward":
                pick, gap = fwd, (fwd[0] - s) if fwd else None
            else:
                if back is None:
                    pick, gap = fwd, (fwd[0] - s) if fwd else None
                elif fwd is None:
                    pick, gap = back, s - back[0]
                elif (fwd[0] - s) < (s - back[0]):
                    pick, gap = fwd, fwd[0] - s
                else:
                    pick, gap = back, s - back[0]
            v = pick[1] if pick else None
            if v is not None and tol is not None and gap > tol:
                v = None
            want[i] = v
        check(
            "asof_join",
            got == want,
            f"trial {trial} ({direction}, tol={tol}): {got} != {want}",
        )


def fuzz_window_decorrelation(spark, trials=None):
    """Pins the round-9 TPC-H rewrites: the window decorrelations are
    row-identical / bitwise-equal to the aggregate-join-back forms they
    replaced (tpch_q2 min-tie keep, tpch_q20 / h_struct_map_suite
    decimal-partial rollup, tpch_q17 slice-window avg), including tied
    minima, NULL values (min ignores them; an equality join never
    matches NULL — both forms must drop those rows), NaN (Spark defines
    NaN == NaN true and NaN sorts largest, so both forms keep NaN rows
    of an all-NaN group), and keys dropped wholesale by a dimension
    filter (the avg must be computed over exactly the surviving keys'
    full row sets)."""
    rng = random.Random(17)
    for trial in range(trials if trials is not None else 12 * MULT):
        n = rng.choice([0, 1, 2, 30, 200])
        nk = rng.choice([1, 3, 8])
        rows = []
        if trial == 0:
            # deterministic degenerate groups so even a small committed
            # slice covers the cases that separate the two forms: an
            # all-NULL group (v == NULL-min drops it in BOTH forms — an
            # eqNullSafe join-back would wrongly keep it; verified to be
            # the mutation this block catches), an all-NaN group (Spark
            # NaN == NaN keeps it in both), and a tied-min group.
            n, nk = 9, 8
            rows = [
                (100, 5, 0, None, 7),
                (101, 5, 1, None, 9),
                (102, 6, 0, float("nan"), 3),
                (103, 6, 1, float("nan"), 4),
                (104, 7, 0, 2.0, 5),
                (105, 7, 1, 2.0, 6),
                (106, 7, 2, 3.0, 8),
            ]
        for i in range(n):
            k = rng.randint(0, nk - 1)
            s = rng.randint(0, 2)
            r = rng.random()
            v = (
                None
                if r < 0.12
                else (float("nan") if r < 0.18 else float(rng.randint(0, 4)))
            )
            q = rng.randint(1, 50)
            rows.append((i, k, s, v, q))
        schema = "id long, k long, s long, v double, q int"
        df = (
            spark.createDataFrame(rows, schema)
            if rows
            else spark.createDataFrame([], schema)
        )

        # --- tpch_q2 shape: rows tying the per-key min ----------------
        wmin = (
            df.withColumn("_mn", F.min("v").over(Window.partitionBy("k")))
            .filter(F.col("v") == F.col("_mn"))
        )
        mn = df.groupBy(F.col("k").alias("mk")).agg(F.min("v").alias("_jm"))
        jmin = df.join(
            mn, (df.k == F.col("mk")) & (df.v == F.col("_jm"))
        )
        got = sorted(r.id for r in wmin.collect())
        want = sorted(r.id for r in jmin.collect())
        check("min_decorrelation", got == want, f"trial {trial}: {got} != {want}")

        # --- q20/h_struct shape: decimal partial rollup ---------------
        per = df.groupBy("k", "s").agg(
            F.sum(F.col("v").cast("decimal(25,8)")).alias("pv")
        )
        roll = {
            r.k: r.tot
            for r in per.groupBy("k")
            .agg(F.sum("pv").cast("double").alias("tot"))
            .collect()
        }
        wroll = {
            (r.k, r.tot)
            for r in per.withColumn(
                "tot",
                F.sum("pv").over(Window.partitionBy("k")).cast("double"),
            ).collect()
        }
        direct = {
            r.k: r.tot
            for r in df.groupBy("k")
            .agg(F.sum(F.col("v").cast("decimal(25,8)")).cast("double").alias("tot"))
            .collect()
        }
        check("partial_rollup_agg", roll == direct, f"trial {trial}")
        check(
            "partial_rollup_window",
            wroll == {(k, t) for k, t in direct.items()},
            f"trial {trial}",
        )

        # --- tpch_q17 shape: slice-window avg over surviving keys -----
        kept = [k for k in range(nk) if rng.random() < 0.6]
        keep = (
            spark.createDataFrame([(k,) for k in kept], "k long")
            if kept
            else spark.createDataFrame([], "k long")
        )
        wavg = {
            r.id: r.lim
            for r in df.join(keep, "k")
            .withColumn("lim", F.avg("q").over(Window.partitionBy("k")))
            .collect()
        }
        lim = df.groupBy(F.col("k").alias("lk")).agg(F.avg("q").alias("jlim"))
        javg = {
            r.id: r.jlim
            for r in df.join(keep, "k").join(lim, df.k == F.col("lk")).collect()
        }
        check("slice_window_avg", wavg == javg, f"trial {trial}")


def fuzz_duplicate_spans(spark):
    """Gaps-and-islands span merge vs a Python Counter brute force —
    whitespace-token corpora so the reference tokenizer is trivial."""
    from collections import Counter

    from sparkwrangle.ext.dedup import duplicate_spans

    def brute(docs, n, min_count):
        grams = Counter()
        tok = {i: s.split() for i, s in docs.items()}
        for ts in tok.values():
            for p in range(len(ts) - n + 1):
                grams[" ".join(ts[p : p + n])] += 1
        out = set()
        for i, ts in tok.items():
            dup = [p for p in range(len(ts) - n + 1) if grams[" ".join(ts[p : p + n])] >= min_count]
            if not dup:
                continue
            start = prev = dup[0]
            cnt = 1
            for p in dup[1:]:
                if p <= prev + n:
                    prev = p
                    cnt += 1
                else:
                    out.add((i, start, prev + n, prev + n - start, cnt))
                    start = prev = p
                    cnt = 1
            out.add((i, start, prev + n, prev + n - start, cnt))
        return out

    rng = random.Random(21)
    for trial in range(6 * MULT):
        nd = rng.choice([1, 2, 8, 20])
        vocab = [f"w{j}" for j in range(rng.randint(2, 12))]
        n = rng.choice([2, 3])
        mc = rng.choice([2, 3])
        mode = rng.choice(["window", "join"])
        docs = {
            i: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25)))
            for i in range(nd)
        }
        df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
        got = {
            (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_dup_grams)
            for r in duplicate_spans(
                df, "doc_id", "text", n=n, min_count=mc, count_mode=mode
            ).collect()
        }
        check("duplicate_spans", got == brute(docs, n, mc), f"trial {trial} mode={mode}")


def fuzz_trader_transcription(spark):
    """The engine's trader (run_trader_on_feed, vectorized skip-ahead)
    vs the engine-independent reference transcription
    (tests/ira_reference.py) — BITWISE trade/ledger/balance parity on
    randomized multi-ticker feeds (1-4 arb tickers, trigger/TP-band/NaN
    regimes, fixed + percent sizing). Pure pandas on both sides; spark
    is unused. Complements the committed 7-seed pytest suite with a
    fresh-seed campaign every gate run."""
    import math

    import numpy as np
    import pandas as pd

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    from ira_reference import ReferenceIntradayTrader, sod_time

    from sparkwrangle.stateful.trader import run_trader_on_feed

    base_params = dict(
        bal=10_000.0, min_deviation=0.05, sl_percent=0.02,
        trigger_range=0.01, trade_size=1_000.0, trade_size_percent=False,
    )

    def feq(a, b):
        if isinstance(a, float) and math.isnan(a):
            return isinstance(b, float) and math.isnan(b)
        return a == b

    rng = random.Random(31)
    total_trades = 0
    for trial in range(12 * MULT):
        nrng = np.random.RandomState(rng.randint(0, 10**6))
        n_arb = nrng.randint(1, 5)
        n = n_arb + 1
        params = dict(base_params)
        if trial % 2:
            params.update(trade_size=0.2, trade_size_percent=True)
        prices = 40.0 + nrng.rand(n) * 80.0
        ticks = []
        sod = 9 * 3600 + 30 * 60
        for _ in range(int(nrng.randint(40, 120))):
            sod += int(nrng.randint(30, 1800))
            if sod > 17 * 3600:
                sod = 9 * 3600 + 30 * 60 + int(nrng.randint(0, 600))
            prices = prices * np.exp(nrng.randn(n) * 0.1)
            rets = []
            for _ in range(n_arb):
                u = nrng.rand()
                if u < 0.12:
                    rets.append(0.05 + nrng.rand() * 0.2)
                elif u < 0.30:
                    rets.append((nrng.rand() - 0.5) * 0.02)
                elif u < 0.34:
                    rets.append(float("nan"))
                else:
                    rets.append((nrng.rand() - 0.5) * 0.09)
            ticks.append((sod, prices.tolist(), rets))

        tickers = ["BASE"] + [f"A{i}.DE" for i in range(n_arb)]
        ref = ReferenceIntradayTrader(**params)
        exp_bal = []
        for s, p, r in ticks:
            ref.data_feed(sod_time(s), list(r), list(p), tickers)
            exp_bal.append(ref.balance)

        rows = []
        base_ts = pd.Timestamp("2024-01-01")
        for seq, (s, p, r) in enumerate(ticks):
            ts = base_ts + pd.Timedelta(days=seq) + pd.Timedelta(seconds=int(s))
            for idx in range(n):
                rows.append(
                    (seq, ts, idx, float(p[idx]),
                     float("nan") if idx == 0 else float(r[idx - 1]))
                )
        feed = pd.DataFrame(
            rows, columns=["feed_seq", "ts", "ticker_idx", "price", "ret"]
        )
        got_trades, got_hist, _ = run_trader_on_feed(feed, params)
        total_trades += len(got_trades)
        check(
            "trader_transcription",
            [t for t, _ in got_trades] == [t for t, _ in ref.trades]
            and all(feq(g, e) for (_, e), (_, g) in zip(ref.trades, got_trades))
            and len(got_hist) == len(exp_bal)
            and all(feq(g, e) for e, (_, g) in zip(exp_bal, got_hist)),
            f"trial {trial} n_arb={n_arb} pct={params['trade_size_percent']}",
        )
    # regime guard: a campaign that never trades proves nothing
    check("trader_transcription", total_trades > 20, f"only {total_trades} trades")


def fuzz_relaxed_block_scope(spark):
    """Relaxed-mode S2 (state_scope='block') vs faithful on randomized
    MARKET-CLOSE-BOUNDED multi-block feeds — the regime where relaxed is
    exact by the scan-decomposition argument (SCALE.md r11). Every day
    ends with four post-16:29 drain ticks: under the K.3 skip-after-
    remove quirk one mc tick closes only ~half the open book, so several
    are needed to guarantee a flat block boundary. Percent sizing only
    (the EXACT regime — fixed sizing's SL denominator caveat is
    documented and fixture-pinned instead). Most trials check the pure
    scan-decomposition math in pandas (fresh state per block + stitched
    ledger vs one carried run); the last two drive the DISTRIBUTED
    relaxed path (applyInPandas keyed by (company, block) + the
    F.product/F.sum window stitches) against faithful Spark output."""
    import numpy as np
    import pandas as pd

    from sparkwrangle.stateful.trader import (
        backtest_balances,
        backtest_trades_ledger,
        run_trader_on_feed,
    )

    params = dict(
        bal=5_000.0, min_deviation=0.05, sl_percent=0.02,
        trigger_range=0.01, trade_size=0.15, trade_size_percent=True,
    )
    bal0 = params["bal"]

    def random_feed(nrng) -> pd.DataFrame:
        n_arb = int(nrng.randint(1, 4))
        n = n_arb + 1
        n_blocks = int(nrng.randint(2, 5))
        prices = 40.0 + nrng.rand(n) * 80.0
        rows, seq = [], 0
        base = pd.Timestamp("2024-01-01")
        day = 0
        for b in range(1, n_blocks + 1):
            for _ in range(int(nrng.randint(1, 3))):  # days per block
                sods = sorted(
                    int(9 * 3600 + 30 * 60 + nrng.randint(0, 6 * 3600 + 3000))
                    for _ in range(int(nrng.randint(8, 25)))
                )
                # four drain ticks strictly after 16:29:00 flatten the book
                sods += [16 * 3600 + 29 * 60 + 30 + 60 * i for i in range(4)]
                for s in sods:
                    prices = prices * np.exp(nrng.randn(n) * 0.08)
                    rets = []
                    for _ in range(n_arb):
                        u = nrng.rand()
                        if u < 0.15:
                            rets.append(0.05 + nrng.rand() * 0.2)
                        elif u < 0.35:
                            rets.append((nrng.rand() - 0.5) * 0.02)
                        elif u < 0.39:
                            rets.append(float("nan"))
                        else:
                            rets.append((nrng.rand() - 0.5) * 0.09)
                    seq += 1
                    ts = base + pd.Timedelta(days=day, seconds=s)
                    for idx in range(n):
                        rows.append(
                            ("X", b, seq, ts, idx, float(prices[idx]),
                             float("nan") if idx == 0 else float(rets[idx - 1]))
                        )
                day += 1
        return pd.DataFrame(
            rows,
            columns=["company", "block_id", "feed_seq", "ts",
                     "ticker_idx", "price", "ret"],
        )

    def close(a, b, tol=1e-9):
        return abs(a - b) <= tol * max(1.0, abs(a), abs(b))

    rng = random.Random(47)
    total_trades = 0
    n_trials = 10 * MULT
    for trial in range(n_trials):
        nrng = np.random.RandomState(rng.randint(0, 10**6))
        feed = random_feed(nrng)
        f_trades, f_hist, f_ledger = run_trader_on_feed(feed, params)
        total_trades += len(f_trades)

        if trial >= n_trials - 2:
            # distributed path: both modes through Spark
            sdf = spark.createDataFrame(feed)
            fl = (
                backtest_trades_ledger(sdf, params)
                .orderBy("trade_seq").toPandas()
            )
            rl = (
                backtest_trades_ledger(sdf, params, state_scope="block")
                .orderBy("trade_seq").toPandas()
            )
            fb = backtest_balances(sdf, params).orderBy("ts").toPandas()
            rb = (
                backtest_balances(sdf, params, state_scope="block")
                .orderBy("ts").toPandas()
            )
            check(
                "relaxed_block_scope",
                list(fl.close_type) == list(rl.close_type)
                and all(close(a, b) for a, b in zip(fl.roi, rl.roi))
                and all(close(a, b) for a, b in zip(fl.bal_after, rl.bal_after))
                and len(fb) == len(rb)
                and all(close(a, b) for a, b in zip(fb.balance, rb.balance)),
                f"spark trial {trial}",
            )
            continue

        # pandas scan-decomposition: fresh state per block, stitched
        r_types, r_rois, r_bal, factor = [], [], [], 1.0
        hist_ok = True
        hi = 0
        for b in sorted(feed["block_id"].unique()):
            part = feed[feed.block_id == b]
            t_k, h_k, l_k = run_trader_on_feed(part, params)
            r_types += [t for t, _ in t_k]
            for _, roi in t_k:
                r_rois.append(roi)
                factor *= 1.0 + roi
                r_bal.append(bal0 * factor)
            blk_factor = (l_k[-1] / bal0) if l_k else 1.0
            for _, bal in h_k:
                if not close(bal * (factor / blk_factor), f_hist[hi][1]):
                    hist_ok = False
                hi += 1
        check(
            "relaxed_block_scope",
            r_types == [t for t, _ in f_trades]
            and all(close(a, b) for a, (_, b) in zip(r_rois, f_trades))
            and all(close(a, b) for a, b in zip(r_bal, f_ledger))
            and hist_ok and hi == len(f_hist),
            f"pandas trial {trial}",
        )
    check("relaxed_block_scope", total_trades > 30, f"only {total_trades} trades")


def fuzz_sql_dialect_shim(spark, trials=None):
    """Suite 11 (round 12): randomized DuckDB-dialect EXPRESSIONS run on
    real DuckDB vs spark.sql(translate(...)) over the same table — the
    generator composes the shim's rule classes (len / 1-based
    subscripts / list_slice / list_transform / list_filter / list_sum /
    range / xor / // / {..} struct literals) to depth 3, including
    string-literal decoys containing rule triggers, so rule
    INTERACTIONS are fuzzed, not just the per-rule unit pins. Already
    caught two real edge divergences while being written: empty
    range() must be a typed [] (not NULL), and list_sum needs SQL SUM
    semantics (NULL on empty, NULL elements skipped). r13 widens the
    grammar over the edges the r12 shim documented as exclusions and
    the ADVICE items, all now translated: subscript index 0 / negative
    / out-of-range (NULL on both engines via try_element_at),
    negative- and zero-step range(), list_sum inside the INTEGER
    grammar (the carrier is elem-type⊔BIGINT now, so it composes with
    // and xor), and `--` / block comments containing apostrophes and
    rule triggers."""
    import duckdb
    import pandas as pd

    from sparkwrangle.sql_dialect import translate

    trials = trials or 80 * MULT
    rng = random.Random(0xD1A7EC7)
    n = 25
    pdf = pd.DataFrame(
        {
            "rid": list(range(n)),
            "i": [rng.randrange(0, 50) for _ in range(n)],
            "j": [rng.randrange(1, 7) for _ in range(n)],
            "s": [rng.choice(["ab", "cd", "len", "xor"]) for _ in range(n)],
            "l": [
                [rng.randrange(0, 10) for _ in range(rng.randrange(1, 5))]
                for _ in range(n)
            ],
        }
    )
    con = duckdb.connect()
    con.register("shimfuzz_t", pdf)
    spark.createDataFrame(pdf).createOrReplaceTempView("shimfuzz_t")

    def lst(d):
        r = rng.random()
        if d <= 0 or r < 0.35:
            return "l"
        if r < 0.55:
            rr = rng.random()
            if rr < 0.3:
                # r13: signed / zero steps — descending, empty-direction
                # and zero-step cases are all [] or real sequences on
                # both engines now (sign-branched CASE in the shim)
                return (
                    f"range({rng.randrange(0, 6)}, {rng.randrange(0, 6)}, "
                    f"{rng.choice([-2, -1, 0, 1, 2, 3])})"
                )
            if rr < 0.55:
                # r13: generate_series is inclusive AND direction-guarded
                # in DuckDB (inverted 2-arg bounds are [], where Spark's
                # bare sequence would auto-descend)
                if rng.random() < 0.5:
                    return (
                        f"generate_series({rng.randrange(0, 6)}, "
                        f"{rng.randrange(0, 6)})"
                    )
                return (
                    f"generate_series({rng.randrange(0, 6)}, "
                    f"{rng.randrange(0, 6)}, "
                    f"{rng.choice([-2, -1, 1, 2, 3])})"
                )
            return f"range(1, {rng.randrange(1, 6)})"
        if r < 0.7:
            return f"list_slice({lst(d - 1)}, 1, {rng.randrange(1, 5)})"
        if r < 0.85:
            return f"list_transform({lst(d - 1)}, u -> u + {rng.randrange(0, 4)})"
        return f"list_filter({lst(d - 1)}, u -> u > {rng.randrange(0, 7)})"

    def inum(d):
        # integer-typed expressions only: xor and // stay int-kind on
        # both engines. Since r13 that INCLUDES list_sum — the shim's
        # carrier is the element type widened to BIGINT (DuckDB carries
        # HUGEINT; equal values at these magnitudes) — and subscript
        # indexes 0 / negative / past-the-end, all NULL on both engines
        # through try_element_at + the nullif(idx, 0) guard.
        r = rng.random()
        if d <= 0:
            return rng.choice(["i", "j", str(rng.randrange(0, 9))])
        if r < 0.15:
            return f"({inum(d - 1)} + {inum(d - 1)})"
        if r < 0.3:
            return f"({inum(d - 1)} // j)"
        if r < 0.44:
            return f"xor({inum(d - 1)}, {inum(d - 1)})"
        if r < 0.58:
            return f"len({lst(d - 1)})"
        if r < 0.74:
            return f"{lst(d - 1)}[{rng.randrange(-2, 7)}]"
        if r < 0.88:
            return f"list_sum({lst(d - 1)})"
        return f"({{'a': {inum(d - 1)}, 'b': j}}).a"

    def num(d):
        if rng.random() < 0.25:
            return f"list_sum({lst(d - 1)})"
        return inum(d)

    def norm(v):
        if v is None:
            return None
        if isinstance(v, bool):
            return v
        return round(float(v), 6)

    for trial in range(trials):
        expr = num(3)
        if rng.random() < 0.3:
            # decoy literal full of rule triggers: must never be rewritten
            expr = (
                "(CASE WHEN s = 'xor(i, j) // len(l) [1]' THEN -1 "
                f"ELSE {expr} END)"
            )
        sql = f"SELECT rid, {expr} AS v FROM shimfuzz_t ORDER BY rid"
        if rng.random() < 0.25:
            # r13: comment decoys — apostrophes and rule triggers inside
            # comments must not corrupt the statement (ADVICE r12)
            sql = sql.replace(
                " FROM ", " -- don't xor(i, j) // len(l) [1] 'open\n FROM ", 1
            )
        if rng.random() < 0.2:
            sql = sql.replace(
                "SELECT rid", "SELECT /* nested /* don't */ 'x */ rid", 1
            )
        duck = [(r[0], norm(r[1])) for r in con.execute(sql).fetchall()]
        translated = translate(sql)
        # r13: idempotence fuzzed on the random grammar too (the suite
        # pins it on every oracle; here it covers rule interactions the
        # catalog never exercises)
        check(
            "sql_dialect_shim",
            translate(translated) == translated,
            f"trial {trial} NOT idempotent: {translated!r}",
        )
        got = [
            (r["rid"], norm(r["v"]))
            for r in spark.sql(translated).collect()
        ]
        check(
            "sql_dialect_shim",
            got == duck,
            f"trial {trial} expr={expr!r} duck={duck[:3]} spark={got[:3]}",
        )
        if FAILS:
            break


def main():
    spark = get_spark("fuzz_parity")
    spark.sparkContext.setLogLevel("ERROR")
    for fn in (
        fuzz_grouped_ranks,
        fuzz_grouped_top_k,
        fuzz_edit_distance,
        fuzz_prefix_filter,
        fuzz_connected_components,
        fuzz_duplicate_spans,
        fuzz_window_decorrelation,
        fuzz_asof_join,
        fuzz_trader_transcription,
        fuzz_relaxed_block_scope,
        fuzz_sql_dialect_shim,
    ):
        fn(spark)
        print(f"done  {fn.__name__}")
    if FAILS:
        print(f"\n{len(FAILS)} FAILURES: {sorted(set(FAILS))}")
        sys.exit(1)
    print("\nall parity fuzz suites clean")


if __name__ == "__main__":
    main()
