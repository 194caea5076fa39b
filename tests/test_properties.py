"""Property-based tests (SURVEY.md §5 item 3) — hypothesis drives the
ledger arithmetic and the numeric idioms through randomized inputs.

Invariants:
* opening a position is cash-neutral to fp noise (ref :98-99)
* closing realizes order·(base_ret − ticker_ret) exactly (ref :137)
* D4 identity: exp(sum(log r)) == product(r) to fp tolerance
* ffill is idempotent; NaN ticks never mutate trader state
* W3 min-max normalization lands in [0, 1]
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from sparkwrangle.stateful.trader import TraderState

PRICES = st.floats(min_value=1e-3, max_value=1e6, allow_nan=False)
DEVS = st.floats(min_value=0.11, max_value=5.0, allow_nan=False)


def _trader(**over):
    params = dict(
        bal=1000.0,
        min_deviation=0.1,
        sl_percent=0.03,
        trigger_range=0.01,
        trade_size=0.1,
        trade_size_percent=True,
    )
    params.update(over)
    return TraderState(**params)


@settings(max_examples=200, deadline=None)
@given(base_price=PRICES, arb_price=PRICES, dev=DEVS)
def test_open_cash_neutral(base_price, arb_price, dev):
    st_ = _trader()
    st_.data_feed(15 * 3600, [dev], [base_price, arb_price])
    assert st_.cpt == [0]
    # both legs net to zero cash up to fp rounding of the two products
    assert abs(st_.balance - 1000.0) <= 1e-9 * max(1000.0, abs(st_.balance))


@settings(max_examples=200, deadline=None)
@given(
    base0=PRICES,
    arb0=PRICES,
    base_ret=st.floats(min_value=-0.5, max_value=0.5, allow_nan=False),
    tick_ret=st.floats(min_value=-0.5, max_value=0.5, allow_nan=False),
)
def test_close_realizes_spread(base0, arb0, base_ret, tick_ret):
    st_ = _trader()
    st_.data_feed(15 * 3600, [0.2], [base0, arb0])
    bal_open = st_.balance
    order = 0.1 * 1000.0 * 2  # trade_size% × bal ÷ 1 position × 2
    base1 = base0 * (1 + base_ret)
    arb1 = arb0 * (1 + tick_ret)
    # force an exit through the tp branch (deviation inside trigger range)
    st_.data_feed(15 * 3600 + 300, [0.0], [base1, arb1])
    assert len(st_.trades) == 1
    expected = order * (base_ret - tick_ret)
    got = st_.balance - bal_open
    assert math.isclose(got, expected, rel_tol=1e-9, abs_tol=1e-6)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(min_value=0.01, max_value=100.0), min_size=1, max_size=50))
def test_exp_sum_log_equals_product(ratios):
    via_logs = math.exp(sum(math.log(r) for r in ratios))
    direct = math.prod(ratios)
    assert math.isclose(via_logs, direct, rel_tol=1e-9)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.floats(min_value=-1e6, max_value=1e6)),
        min_size=1,
        max_size=60,
    )
)
def test_ffill_idempotent(values):
    def ffill(xs):
        out, last = [], None
        for x in xs:
            if x is not None:
                last = x
            out.append(last)
        return out

    once = ffill(values)
    assert ffill(once) == once


@settings(max_examples=200, deadline=None)
@given(base_price=PRICES, arb_price=PRICES)
def test_nan_ticks_never_mutate_state(base_price, arb_price):
    st_ = _trader()
    nan = float("nan")
    st_.data_feed(15 * 3600, [nan], [base_price, arb_price])
    assert st_.cpt == [] and st_.balance == 1000.0 and st_.trades == []
    st_.data_feed(15 * 3600, [0.2], [base_price, arb_price])
    bal, cpt = st_.balance, list(st_.cpt)
    st_.data_feed(15 * 3600 + 300, [nan], [nan, nan])
    assert st_.balance == bal and st_.cpt == cpt and st_.trades == []


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6), min_size=2, max_size=60))
def test_minmax_normalization_bounds(xs):
    lo, hi = min(xs), max(xs)
    if hi == lo:
        return
    for x in xs:
        n = (x - lo) / (hi - lo)
        assert -1e-12 <= n <= 1 + 1e-12


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-0.05, max_value=0.05, allow_nan=False),  # delta
            st.floats(min_value=-0.02, max_value=0.02, allow_nan=False),  # ret1
            st.floats(min_value=-0.02, max_value=0.02, allow_nan=False),  # ret2
        ),
        min_size=2,
        max_size=120,
    )
)
def test_s1_scan_matches_independent_oracle(rows):
    """The engine's numpy scan core and the vendored iterrows-style oracle
    are INDEPENDENT implementations of cell 6 — hypothesis feeds both the
    same random prepared frames and they must emit identical trades."""
    import pandas as pd

    from pandas_oracle import ep1_scan
    from sparkwrangle.stateful.pairs_scan import scan_pair_pdf

    idx = pd.date_range("2020-01-01", periods=len(rows), freq="B")
    frame = pd.DataFrame(rows, columns=["delta", "ret1", "ret2"], index=idx)
    frame["ts"] = idx
    expected = ep1_scan(frame, buy_at=0.01, fees=0.0)
    got = scan_pair_pdf(frame.reset_index(drop=True), buy_at=0.01, fees=0.0)
    assert len(got) == len(expected)
    for (o, e, r), (_, row) in zip(got, expected.iterrows()):
        assert o == row.open_date and e == row.end_date
        assert math.isclose(r, row["return"], rel_tol=0, abs_tol=1e-12)


def test_connected_components_invariants(spark):
    """CC is idempotent (running it on its own keeper-edges is stable) and
    invariant to edge direction/duplication."""
    from pyspark.sql import functions as F

    from sparkwrangle.ext.dedup import connected_components

    edges = [(1, 2), (2, 3), (7, 8), (9, 9)]
    ids = [(i,) for i in range(1, 11)]
    pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    # duplicated + reversed edges must not change the components
    noisy = pairs.union(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    ).union(pairs)
    ids_df = spark.createDataFrame(ids, "doc_id bigint")
    base = {tuple(r) for r in connected_components(pairs, ids_df, "doc_id").collect()}
    noisy_out = {
        tuple(r) for r in connected_components(noisy, ids_df, "doc_id").collect()
    }
    assert base == noisy_out
    # idempotence: components of the (node -> cluster rep) star graph
    star = spark.createDataFrame(
        [(a, b) for a, b in base if a != b], "id_a bigint, id_b bigint"
    )
    again = {tuple(r) for r in connected_components(star, ids_df, "doc_id").collect()}
    assert again == base


def _bpe_reference(word_counts: dict[str, int], rounds: int):
    """Independent pure-Python BPE (Sennrich alg. 1): per round, count
    adjacent symbol pairs weighted by word frequency, take the argmax
    with (count desc, pair asc) tiebreak, merge greedily left-to-right
    within every word. Returns [(rank, left, right, count)]."""
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for rank in range(1, rounds + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            tf = word_counts[w]
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                counts[pair] = counts.get(pair, 0) + tf
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (bl, br), n = best
        merges.append((rank, bl, br, n))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == bl and syms[i + 1] == br:
                    out.append(bl + br)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=6),
        min_size=1,
        max_size=12,
    )
)
def test_bpe_matches_independent_reference(spark, words):
    """The relational BPE trainer (run-parity windows for greedy-leftmost)
    equals a sequential pure-Python Sennrich implementation on arbitrary
    2-letter-alphabet corpora — the alphabet maximizes overlapping-match
    runs ('aaaa'), the exact case the window form could get wrong."""
    from sparkwrangle.ext.text import bpe_train_merges

    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id bigint, text string"
    )
    got = [tuple(r) for r in bpe_train_merges(docs, rounds=3).collect()]
    counts: dict[str, int] = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    want = _bpe_reference(counts, 3)
    assert got == want, (words, got, want)


def _pagerank_reference(edges, nodes, iters=3, damping=0.85):
    """Independent Python power iteration mirroring the engine's
    determinism recipe (rf15 contributions, exact decimal accumulation,
    rf12 ranks)."""
    from decimal import Decimal

    def rf(x, d):
        s = float(10**d)
        return math.floor(x * s + 0.5) / s

    deg: dict[str, int] = {}
    for s_, _ in edges:
        deg[s_] = deg.get(s_, 0) + 1
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        acc: dict[str, Decimal] = {}
        for s_, d_ in edges:
            c = rf(rank[s_] / deg[s_], 15)
            acc[d_] = acc.get(d_, Decimal(0)) + round(Decimal(c), 18)
        dmass = float(
            sum(
                (round(Decimal(rank[v]), 18) for v in nodes if v not in deg),
                Decimal(0),
            )
        )
        rank = {
            v: rf(
                (1.0 - damping) / n
                + damping * (float(acc.get(v, Decimal(0))) + dmass / n),
                12,
            )
            for v in nodes
        }
    return rank


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=25,
    )
)
def test_pagerank_matches_independent_reference(spark, raw_edges):
    """Engine PageRank equals a sequential Python power iteration with
    the same rounding recipe on arbitrary small digraphs (self-loops
    dropped, parallel edges kept — they weight the contribution, exactly
    as a multigraph should)."""
    from sparkwrangle.ext.graph import pagerank

    edges = [(f"n{a}", f"n{b}") for a, b in raw_edges if a != b]
    nodes = [f"n{i}" for i in range(10)]
    if not edges:
        return
    edf = spark.createDataFrame(edges, "src string, dst string")
    ndf = spark.createDataFrame([(v,) for v in nodes], "node string")
    got = {r.node: r.rank for r in pagerank(edf, ndf, iters=3).collect()}
    want = _pagerank_reference(edges, nodes, iters=3)
    assert set(got) == set(want)
    for v in nodes:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])


def _spans_reference(docs: dict[int, list[str]], n=3, min_count=2):
    """Independent Python span-dedup: positions of n-grams occurring
    >= min_count times corpus-wide, merged when next_start <= prev + n."""
    grams: dict[tuple, int] = {}
    pos_by_doc: dict[int, list[int]] = {}
    for did, toks in docs.items():
        for i in range(len(toks) - n + 1):
            g = tuple(toks[i : i + n])
            grams[g] = grams.get(g, 0) + 1
    out = {}
    for did, toks in docs.items():
        hits = [
            i
            for i in range(len(toks) - n + 1)
            if grams[tuple(toks[i : i + n])] >= min_count
        ]
        spans = []
        for p in hits:
            # merge when this start overlaps/adjoins the previous gram:
            # p <= prev_start + n
            if spans and p <= spans[-1][2] + n:
                spans[-1] = (spans[-1][0], p + n, p, spans[-1][3] + 1)
            else:
                spans.append((p, p + n, p, 1))
        out[did] = [(s, e, c) for (s, e, _, c) in spans]
    return out


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abc"), min_size=0, max_size=14),
        min_size=1,
        max_size=5,
    )
)
def test_duplicate_spans_matches_independent_reference(spark, tok_lists):
    """Relational span dedup (window count + gaps-and-islands) equals a
    sequential Python scan on arbitrary tiny-alphabet corpora — the
    alphabet forces heavy overlapping repeats, the stress case for the
    span-merge window."""
    from sparkwrangle.ext.dedup import duplicate_spans

    docs = {i: toks for i, toks in enumerate(tok_lists)}
    sdf = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs.items()],
        "doc_id bigint, text string",
    )
    got: dict[int, list] = {}
    for r in duplicate_spans(sdf, "doc_id", "text", n=3).collect():
        got.setdefault(r.doc_id, []).append(
            (r.span_start, r.span_end, r.n_dup_grams)
        )
    for k in got:
        got[k].sort()
    want = {k: v for k, v in _spans_reference(docs, n=3).items() if v}
    assert got == want, (tok_lists, got, want)


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", None]),           # group (incl. NULL)
            st.one_of(st.none(), st.integers(0, 6)),     # value (ties, NULLs)
        ),
        min_size=1,
        max_size=60,
    ),
    nparts=st.integers(2, 6),
)
def test_grouped_rank_and_quantiles_property(spark, rows, nparts):
    """Property: for ANY group/value multiset (NULL groups, NULL values,
    heavy ties) and ANY range-partition count, the two-level helpers
    equal the plain window / percentile() forms. Complements the unit
    pins with breadth — hypothesis drives the shapes."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sparkwrangle.ops.windows import (
        grouped_exact_quantiles,
        grouped_percent_rank,
    )

    data = [
        (i, g, float(v) if v is not None else None)
        for i, (g, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "id long, g string, v double")

    w = Window.partitionBy("g").orderBy("v", "id")
    want_pr = {
        r.id: r.pr
        for r in df.withColumn("pr", F.percent_rank().over(w)).collect()
    }
    got_pr = {
        r.id: r.pr
        for r in grouped_percent_rank(
            df, ["g"], ["v", "id"], num_partitions=nparts
        ).collect()
    }
    assert got_pr == want_pr

    ps = [0.25, 0.5, 1.0]
    want_q = {
        (r.g, p): (r.q[i] if r.q is not None else None)
        for r in df.groupBy("g")
        .agg(F.expr("percentile(v, array(0.25D, 0.5D, 1.0D))").alias("q"))
        .collect()
        for i, p in enumerate(ps)
    }
    got_q = {
        (r.g, r.p): r.v
        for r in grouped_exact_quantiles(
            df, ["g"], "v", ps, tiebreak_cols=["id"], num_partitions=nparts
        ).collect()
    }
    assert set(got_q) == set(want_q)
    for k, v in want_q.items():
        if v is None:
            assert got_q[k] is None, k
        else:
            assert abs(got_q[k] - v) < 1e-9, (k, got_q[k], v)
