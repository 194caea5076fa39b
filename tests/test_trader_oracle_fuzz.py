"""Adversarial fuzz of the trade-ledger oracle twins.

The driver regenerates testdata every round, so the restricted-regime
trader oracles (recursive-CTE gaps-and-islands + compounding ledger)
must agree with the REAL state machine on ANY value sequence — not just
the current corpus. This suite runs both sides on synthetic event
tables engineered for the edge cases a fresh generation could surface:
no triggers at all, a trigger on the very last tick (position never
closes), immediate take-profit, all-closing-time feeds, zero values,
single-event companies, and seeded random sequences.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from sparkwrangle.catalog import CATALOG

_QUERIES = [
    "s2_trader_single_position",
    "s2_trader_percent_ledger",
    # S1 twins read the same events table; ts spacing below spans days so
    # the daily pairs scan sees a multi-day bar stream
    "s1_daily_pairs_backtest",
    "s1_compounded_return",
]


def _norm(cols, rows):
    def cell(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.9g}"
        return str(v)

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(cell(r[i]) for i in order) for r in rows)


def _events_frame(rows):
    """rows: list of (event_id, user_id, value) → full events schema."""
    return pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            # 2-hour steps: spans days (S1's daily grain) while the S2
            # twins ignore real ts entirely (synthesized NTZ ticks)
            "ts": pd.to_datetime(
                [1_704_067_200 + r[0] * 7200 for r in rows], unit="s"
            ),
            "user_id": [r[1] for r in rows],
            "event_type": ["view" for _ in rows],
            "value": [float(r[2]) for r in rows],
            "props": ["{}" for _ in rows],
        }
    )


def _check(spark, tmp_path, rows, label):
    d = tmp_path / label
    d.mkdir()
    _events_frame(rows).to_parquet(d / "events.parquet", index=False)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    for name in _QUERIES:
        spec = CATALOG[name]
        sdf = spec.fn(spark, str(d))
        srows = [tuple(r) for r in sdf.collect()]
        res = con.execute(spec.oracle)
        dcols = [x[0] for x in res.description]
        drows = res.fetchall()
        assert sorted(sdf.columns) == sorted(dcols), (label, name)
        assert _norm(sdf.columns, srows) == _norm(dcols, drows), (
            label,
            name,
            len(srows),
            len(drows),
        )


# value→regime map (catalog.py feed synth): r = (value−50)/200, so
# trigger needs value > 70; TP band needs 48 ≤ value ≤ 52; the synthetic
# second-of-day is 9h + (event_id·7919) % 28800 → closing iff
# (event_id·7919) % 28800 > 26940.
def _closing(eid: int) -> bool:
    return (eid * 7919) % 28800 > 26940


def _open_eid(start: int) -> int:
    e = start
    while _closing(e):
        e += 1
    return e


def test_edge_case_feeds(spark, tmp_path):
    cases = {}
    # 1: no triggers ever (flat low values)
    cases["no_trigger"] = [(i, 1, 30.0) for i in range(1, 40)]
    # 2: trigger on the very LAST tick — position opens, never closes
    e = _open_eid(500)
    cases["open_at_end"] = [(i, 1, 30.0) for i in range(400, e)] + [(e, 1, 90.0)]
    # 3: immediate TP: trigger then straight into the band
    e1 = _open_eid(100)
    e2 = _open_eid(e1 + 1)
    cases["immediate_tp"] = [(e1, 1, 95.0), (e2, 1, 50.0), (e2 + 1, 1, 30.0)]
    # 4: zero values (ANSI div hazards) and negatives mixed in
    cases["zeros"] = [(i, 1, v) for i, v in zip(range(1, 30), [0.0, 80.0, 0.0, 49.0] * 7)]
    # 5: single event per company, multiple companies
    cases["singletons"] = [(1, 1, 90.0), (2, 2, 30.0), (3, 3, 50.0)]
    # 6: everything in closing time (never opens)
    closing_ids = [i for i in range(1, 4000) if _closing(i)][:30]
    cases["all_closing"] = [(i, 1, 90.0) for i in closing_ids]
    for label, rows in cases.items():
        _check(spark, tmp_path, rows, label)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_random_feeds(spark, tmp_path, seed):
    rng = np.random.RandomState(seed)
    rows = []
    eid = 1
    for uid in (1, 2, 3):
        n = int(rng.randint(10, 120))
        for _ in range(n):
            # mix regimes: mostly mid-range, spikes above trigger,
            # dips into the TP band, occasional zeros
            u = rng.rand()
            if u < 0.15:
                v = 70.0 + rng.rand() * 40.0
            elif u < 0.35:
                v = 48.0 + rng.rand() * 4.0
            elif u < 0.40:
                v = 0.0
            else:
                v = rng.rand() * 65.0
            rows.append((eid, uid, round(float(v), 4)))
            eid += int(rng.randint(1, 9))
    _check(spark, tmp_path, rows, f"rand{seed}")


# Every oracle query whose inputs derive solely from the events table —
# discovered by running the whole catalog against a synthetic dir. Each
# must hash-match its DuckDB oracle on data the driver never generated:
# the generalization guard for testdata regeneration.
_EVENTS_ONLY = [
    "a_plot_downsample", "a_rows_to_table", "b_eligibility_filter", "b_ffill_gaps",
    "b_time_of_day_band", "b_time_range_projection", "c_asof_forward",
    "c_asof_nearest", "c_asof_tolerance", "c_asof_union_ffill",
    "c_interval_overlap_join", "c_temporal_scd2_join",
    "c_block_range_join",
    "c_positional_join", "d_compounded_return", "d_conditional_trade_stats",
    "d_corr_stats", "d_day_of_month_quirk", "d_exceedance_share",
    "d_final_above_share", "d_first_last_span", "d_per_day_portfolio_total",
    "d_percentiles", "ep2_feed_builder", "ep2_trader_percent_ledger",
    "ep2_trader_single_position", "f_topk_per_group", "g_dedup_by_key",
    "g_pivot_wide", "h_datetime_suite", "h_json_extract", "h_null_semantics",
    "h_struct_map_suite", "q_array_zip_aggregate", "q_global_sort_limit",
    "q_percent_format",
    "k6_faithful_ticker_share", "q_rank_family", "q_salted_skew_agg",
    "q_scd2_intervals", "q_set_ops", "r_balance_report", "r_trade_report",
    "s1_compounded_return", "s1_daily_pairs_backtest",
    "s1_prepared_pair_math", "w_business_days", "w_minmax_normalize",
    "w_pct_change_log_returns", "w_range_frame", "w_rel_to_base",
    "w_rolling_mean", "w_running_interval_sum", "w_sessionize_gaps",
    "w_ewma_smoothing", "w_tumbling_window_agg", "w_zscore_anomaly",
    "x_countmin_heavy_hitters",
    "x_events_funnel",
    "x_events_retention", "x_grouped_quantiles", "x_histogram_quantiles",
    "x_hll_distinct_users", "x_hll_set_ops",
    "x_zorder_layout",
]


def test_events_only_queries_generalize_to_synthetic_feed(spark, tmp_path):
    """65 oracle queries over the events table hash-match DuckDB on a
    seeded random feed the driver never generated — operator semantics
    hold for the DATA CLASS, not one corpus instance."""
    rng = np.random.RandomState(9)
    rows = []
    eid = 1
    for uid in (1, 2, 3):
        for _ in range(60):
            rows.append((eid, uid, float(round(rng.rand() * 100, 4))))
            eid += int(rng.randint(1, 9))
    d = tmp_path / "gen"
    d.mkdir()
    frame = _events_frame(rows)
    # vary event_type deterministically (the fixed fuzz cases keep 'view')
    frame["event_type"] = [
        np.random.RandomState(e).choice(
            ["view", "click", "error", "purchase", "signup"]
        )
        for e in frame["event_id"]
    ]
    frame["props"] = '{"k":1}'
    frame.to_parquet(d / "events.parquet", index=False)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    bad = []
    for name in _EVENTS_ONLY:
        spec = CATALOG[name]
        sdf = spec.fn(spark, str(d))
        srows = [tuple(r) for r in sdf.collect()]
        res = con.execute(spec.oracle)
        dcols = [x[0] for x in res.description]
        drows = res.fetchall()
        if sorted(sdf.columns) != sorted(dcols) or _norm(
            sdf.columns, srows
        ) != _norm(dcols, drows):
            bad.append(name)
    assert not bad, f"synthetic-feed mismatches: {bad}"


_DOCS_EMB_ONLY = [
    "x_bigram_stats", "x_bloom_decontaminate", "x_bm25_search",
    "x_boilerplate_prune",
    "x_bpe_pair_counts", "x_bpe_segment", "x_bpe_train_merges",
    "x_corpus_stats",
    "x_cross_source_dup_matrix",
    "x_curation_pipeline_end_to_end", "x_decontaminate",
    "x_dedup_cc_clusters", "x_dedup_cc_keep", "x_dedup_containment",
    "x_dedup_exact", "x_dedup_exact_keep_first", "x_dedup_incremental",
    "x_dedup_lsh_recall_audit", "x_dedup_minhash_lsh",
    "x_dedup_minhash_mapside", "x_dedup_minhash_sigs",
    "x_dedup_ngram_jaccard", "x_dedup_pipeline_end_to_end",
    "x_dedup_prefix_filter_join",
    "x_audio_features", "x_image_resize",
    "x_dedup_simhash", "x_doc_chunking", "x_doc_fingerprint",
    "x_embedding_neardup", "x_embedding_normalize", "x_embedding_quantize",
    "x_epoch_shuffle", "x_feature_hashing", "x_frame_sampling",
    "x_fuzzy_edit_join",
    "x_hash_split", "x_ivf_assign", "x_ivf_centroids", "x_knn_cosine_brute",
    "x_knn_ivf_label", "x_knn_ivf_nprobe", "x_knn_ivf_trained", "x_knn_ivfpq",
    "x_knn_lsh_hyperplane", "x_knn_pq_adc", "x_knn_pq_rerank", "x_lang_id",
    "x_length_histogram", "x_minhash_jaccard_est", "x_multimodal_bmp_decode",
    "x_multimodal_features", "x_multimodal_jpeg_decode",
    "x_multimodal_jpeg_progressive", "x_multimodal_meta",
    "x_multimodal_png_decode", "x_multimodal_png_interlaced",
    "x_multimodal_wav_decode", "x_negative_sampling", "x_pii_redact",
    "x_quality_prune",
    "x_quality_score", "x_repetition_stats", "x_semantic_dedup",
    "x_sequence_packing", "x_simhash_hamming_pairs", "x_source_blocklist",
    "x_source_mixing_weights",
    "x_span_dedup",
    "x_stratified_sample", "x_stream_ann_batch_twin",
    "x_stream_curation_batch_twin", "x_text_normalize",
    "x_text_stats", "x_tfidf_top_terms", "x_token_count_bpe",
    "x_token_entropy",
    "x_unigram_logprob", "x_vocab_topk", "x_weighted_sample",
]


def test_llm_pipeline_queries_generalize_to_synthetic_corpus(spark, tmp_path):
    """78 LLM-pipeline oracle queries (the whole dedup / ANN / text /
    multimodal x_ family) hash-match DuckDB on a fully SYNTHETIC corpus —
    random multilingual word salad with planted near-dups and random
    embeddings the driver never generated."""
    rng = np.random.RandomState(11)
    words = [
        "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "theta",
        "kappa", "lambda", "sigma", "the", "and", "of", "to", "in", "der",
        "und", "von", "el", "la", "que", "le", "pour", "data", "spark",
    ]
    rows = []
    for i in range(120):
        n = rng.randint(3, 60)
        text = " ".join(rng.choice(words, size=n))
        if i % 7 == 0 and i > 0:
            prev = rows[i - 7][1].split()
            prev[min(2, len(prev) - 1)] = "changed"
            text = " ".join(prev)  # planted near-dup
        rows.append((i, text))
    docs = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": [["en", "de", "es", "fr"][i % 4] for i in range(120)],
            "source": [f"src{i % 5}" for i in range(120)],
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    d = tmp_path / "corpus"
    d.mkdir()
    docs.to_parquet(d / "documents.parquet", index=False)
    emb = pd.DataFrame(
        {
            "vec_id": range(80),
            "embedding": [
                np.round(rng.randn(64), 4).astype(np.float32).tolist()
                for _ in range(80)
            ],
            "label": np.int32(rng.randint(0, 10, 80)),
        }
    )
    emb.to_parquet(d / "embeddings.parquet", index=False)
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    bad = []
    for name in _DOCS_EMB_ONLY:
        spec = CATALOG[name]
        sdf = spec.fn(spark, str(d))
        srows = [tuple(r) for r in sdf.collect()]
        res = con.execute(spec.oracle)
        dcols = [x[0] for x in res.description]
        drows = res.fetchall()
        if sorted(sdf.columns) != sorted(dcols) or _norm(
            sdf.columns, srows
        ) != _norm(dcols, drows):
            bad.append(name)
    assert not bad, f"synthetic-corpus mismatches: {bad}"


_TPCH_ONLY = [
    "a_scan_pushdown", "b_div0_inf_replace", "c_conditional_convert",
    "c_join_delta", "g_unpivot_long", "h_scalar_suite", "h_string_suite",
    "q_anti_semi_join", "q_cdc_upsert", "q_cube_grouping_id",
    "q_rollup_revenue",
    "tpch_q11_shape_important_inventory",
    "tpch_q12_shape_ship_lag_priority", "tpch_q13_order_distribution",
    "tpch_q14_promo_share", "tpch_q15_top_supplier",
    "tpch_q16_shape_supplier_variety",
    "tpch_q17_small_quantity_revenue", "tpch_q18_large_orders",
    "tpch_q19_shape_disjunctive_revenue",
    "tpch_q1_pricing_summary", "tpch_q20_shape_excess_suppliers",
    "tpch_q21_shape_return_blame",
    "tpch_q22_shape_idle_customers",
    "tpch_q2_shape_min_cost_supplier", "tpch_q3_shipping_priority",
    "tpch_q4_priority_exists", "tpch_q5_local_supplier",
    "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "tpch_q9_shape_product_profit",
    "sql_surface_shared_dialect",
    "x_data_quality_checks", "x_frequent_pairs", "x_pagerank_centrality",
]


def test_tpch_family_generalizes_to_synthetic_star_schema(spark, tmp_path):
    """The 37 oracle queries that read the TPC-H star schema
    hash-match DuckDB on a fully SYNTHETIC seeded schema the driver never
    generated — covering the relational family (joins, subquery shapes,
    rollup, CDC), pagerank, and frequent pairs for the data CLASS, the
    same protection the events/documents guards give those families."""
    rng = np.random.RandomState(17)
    d = tmp_path / "star"
    d.mkdir()

    region = pd.DataFrame(
        {"r_regionkey": np.arange(5, dtype=np.int32),
         "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]}
    )
    nation = pd.DataFrame(
        {"n_nationkey": np.arange(10, dtype=np.int32),
         "n_name": [f"NATION_{i}" for i in range(10)],
         "n_regionkey": np.int32(rng.randint(0, 5, 10))}
    )
    customer = pd.DataFrame(
        {"c_custkey": np.arange(60),
         "c_name": [f"Customer#{i}" for i in range(60)],
         "c_nationkey": np.int32(rng.randint(0, 10, 60)),
         "c_acctbal": np.round(rng.uniform(-500, 8000, 60), 2),
         "c_mktsegment": rng.choice(
             ["BUILDING", "MACHINERY", "HOUSEHOLD", "AUTOMOBILE", "FURNITURE"], 60
         )}
    )
    supplier = pd.DataFrame(
        {"s_suppkey": np.arange(8),
         "s_name": [f"Supplier#{i}" for i in range(8)],
         "s_nationkey": np.int32(rng.randint(0, 10, 8)),
         "s_acctbal": np.round(rng.uniform(-200, 5000, 8), 2)}
    )
    part = pd.DataFrame(
        {"p_partkey": np.arange(30),
         "p_name": rng.choice(["small ring", "red widget", "blue bolt"], 30),
         "p_brand": rng.choice(["Brand#1", "Brand#2", "Brand#17"], 30),
         "p_type": rng.choice(["PROMO", "ECONOMY", "SMALL", "LARGE BRASS"], 30),
         "p_size": np.int32(rng.randint(1, 50, 30)),
         "p_retailprice": np.round(900 + rng.uniform(0, 100, 30), 2)}
    )
    base = pd.Timestamp("1995-01-01")
    n_ord = 300
    orders = pd.DataFrame(
        {"o_orderkey": np.arange(n_ord),
         "o_custkey": rng.randint(0, 55, n_ord),  # a few custkeys 55-59 stay idle
         "o_orderstatus": rng.choice(["F", "O", "P"], n_ord, p=[0.5, 0.4, 0.1]),
         "o_totalprice": np.round(rng.uniform(1000, 300000, n_ord), 2),
         "o_orderdate": pd.Series(
             [base + pd.Timedelta(days=int(x))
              for x in rng.randint(0, 2400, n_ord)]
         ).astype("datetime64[us]"),
         "o_orderpriority": rng.choice(
             ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"], n_ord
         )}
    )
    n_li = 900
    ok = rng.randint(0, n_ord, n_li)
    lineitem = pd.DataFrame(
        {"l_orderkey": ok,
         "l_partkey": rng.randint(0, 30, n_li),
         "l_suppkey": rng.randint(0, 8, n_li),
         "l_linenumber": np.int32(rng.randint(1, 7, n_li)),
         "l_quantity": np.float64(rng.randint(1, 51, n_li)),
         "l_extendedprice": np.round(rng.uniform(900, 90000, n_li), 2),
         "l_discount": np.round(rng.choice([0.0, 0.02, 0.05, 0.1], n_li), 2),
         "l_tax": np.round(rng.choice([0.0, 0.04, 0.08], n_li), 2),
         "l_returnflag": rng.choice(["R", "N", "A"], n_li),
         "l_linestatus": rng.choice(["F", "O"], n_li),
         "l_shipdate": pd.Series(
             [base + pd.Timedelta(days=int(x))
              for x in rng.randint(1, 2450, n_li)]
         ).astype("datetime64[us]")}
    )
    # plant a divide-by-zero row for b_div0_inf_replace's /0 path
    lineitem.loc[0, "l_discount"] = 1.0

    frames = {"region": region, "nation": nation, "customer": customer,
              "supplier": supplier, "part": part, "orders": orders,
              "lineitem": lineitem}
    con = duckdb.connect()
    # sql_surface_shared_dialect also reads events — give it a small feed
    ev = _events_frame([(i, 1 + i % 3, float(i % 97)) for i in range(1, 61)])
    ev.to_parquet(d / "events.parquet", index=False)
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    for t, frame in frames.items():
        frame.to_parquet(d / f"{t}.parquet", index=False)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    bad = []
    for name in _TPCH_ONLY:
        spec = CATALOG[name]
        sdf = spec.fn(spark, str(d))
        srows = [tuple(r) for r in sdf.collect()]
        res = con.execute(spec.oracle)
        dcols = [x[0] for x in res.description]
        drows = res.fetchall()
        if sorted(sdf.columns) != sorted(dcols) or _norm(
            sdf.columns, srows
        ) != _norm(dcols, drows):
            bad.append(name)
    assert not bad, f"synthetic-star-schema mismatches: {bad}"
