"""SQL-text entry surface (SURVEY §3 lifecycle #2) — the broad slice.

``sql_surface_shared_dialect`` proves ONE query runs from identical SQL
text in both engines; this suite proves the claim is structural, not a
one-off: every entry pinned below has an oracle SQL string that parses
and runs UNCHANGED through ``spark.sql`` over ``register_views`` and
returns the same result as the entry's DataFrame implementation. The
list spans the catalog's families — scan/filter (A/B), join (C),
aggregate (D), window (W), reshape (G), top-k (F), scalar (H), the
S1 window math, curation ops (x_*), relational shapes (q_*), and all
21 TPC-H-shaped queries — so a user can enter the engine through SQL
text for anything SQL-expressible, exactly as SURVEY §3 claims.

The list is PINNED, not probed: if an oracle is rewritten into
DuckDB-only dialect (or a new shared-dialect entry appears), this test
fails and the list is updated consciously. Entries whose oracle parses
on Spark but is semantically DuckDB-specific (e.g. engine-native hash(),
round-half-even boundaries) are deliberately absent.
"""

from __future__ import annotations

import math

import pytest

from conftest import SF_SMOKE

# 63 of the catalog's 185 SQL oracles run verbatim on Spark and match
# the DataFrame surface (probed at sf0.001, round-11).
SHARED_DIALECT_ENTRIES = [
    "a_scan_pushdown",
    "a_rows_to_table",
    "b_time_range_projection",
    "b_time_of_day_band",
    "b_div0_inf_replace",
    "b_eligibility_filter",
    "c_join_delta",
    "c_conditional_convert",
    "c_positional_join",
    "c_temporal_scd2_join",
    "d_exceedance_share",
    "d_per_day_portfolio_total",
    "d_day_of_month_quirk",
    "d_corr_stats",
    "w_minmax_normalize",
    "w_rel_to_base",
    "w_tumbling_window_agg",
    "w_rolling_mean",
    "w_range_frame",
    "w_ewma_smoothing",
    "f_topk_per_group",
    "g_dedup_by_key",
    "g_pivot_wide",
    "g_unpivot_long",
    "h_null_semantics",
    "s1_prepared_pair_math",
    "x_data_quality_checks",
    "x_source_blocklist",
    "x_zorder_layout",
    "x_events_funnel",
    "x_frequent_pairs",
    "q_rollup_revenue",
    "q_cube_grouping_id",
    "q_set_ops",
    "q_anti_semi_join",
    "q_global_sort_limit",
    "q_salted_skew_agg",
    "q_percent_format",
    "q_cdc_upsert",
    "q_scd2_intervals",
    "sql_surface_shared_dialect",
    "tpch_q1_pricing_summary",
    "tpch_q2_shape_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_priority_exists",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_shape_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_shape_important_inventory",
    "tpch_q12_shape_ship_lag_priority",
    "tpch_q13_order_distribution",
    "tpch_q14_promo_share",
    "tpch_q15_top_supplier",
    "tpch_q16_shape_supplier_variety",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_shape_disjunctive_revenue",
    "tpch_q20_shape_excess_suppliers",
    "tpch_q21_shape_return_blame",
    "tpch_q22_shape_idle_customers",
]


def _norm(rows, cols):
    """Order- and ulp-insensitive row multiset (5-digit float rounding —
    both sides run on Spark, so only aggregation-order ulps differ)."""
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c]
            if isinstance(v, float):
                v = "nan" if math.isnan(v) else round(v, 5)
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.fixture(scope="module")
def sql_session(spark):
    from sparkwrangle.io import register_views
    from sparkwrangle.session import prep_session

    prep_session(spark)
    register_views(spark, SF_SMOKE)
    import __spark_entry__ as entry

    return spark, entry.queries(), entry.oracle_sql()


@pytest.mark.parametrize("name", SHARED_DIALECT_ENTRIES)
def test_sql_text_matches_dataframe_surface(sql_session, name):
    spark, queries, oracles = sql_session
    sql = oracles[name]
    assert sql is not None, f"{name} lost its oracle SQL"
    via_sql = spark.sql(sql)
    via_df = queries[name](spark, SF_SMOKE)
    assert set(via_sql.columns) == set(via_df.columns), (
        f"{name}: SQL-text columns {via_sql.columns} != DataFrame "
        f"columns {via_df.columns}"
    )
    got_sql = _norm(via_sql.collect(), via_sql.columns)
    got_df = _norm(via_df.collect(), via_df.columns)
    assert got_sql == got_df, (
        f"{name}: SQL-text result diverges from the DataFrame surface — "
        f"first sql={got_sql[:2]} df={got_df[:2]}"
    )
