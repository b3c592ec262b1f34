"""Query registry: every SURVEY §2 operator re-expressed Spark-first.

Each submodule exposes ``QUERIES`` (name -> fn(spark, sf_dir) -> DataFrame)
and ``ORACLE`` (name -> equivalent DuckDB SQL). Names without an ORACLE
entry are genuinely non-SQL-expressible (driver records rows-only).

Registration order matters: the correctness driver checks the first 50
registered queries each round, so ``all_queries()`` orders entries by how
many driver rounds have already verified them (fewest first). Names absent
from ``_TIMES_DRIVER_CHECKED`` (new this round) sort first of all, then
never-checked, once-checked, twice-checked — so every query rotates
through the driver's window instead of the same 50 being re-verified.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from konohadataplatform_spark.queries import analytics, events, llmdata, tpch

# How many of the driver's CORRECTNESS_r01/r02 rounds included each query
# (from /root/repo/CORRECTNESS_r01.json and CORRECTNESS_r02.json). Queries
# not listed here have never been driver-checked and sort first.
_TIMES_DRIVER_CHECKED: dict[str, int] = {
    # once (r01 only or r02 only)
    "q_pivot_status_year": 1,
    "q_date_spine_gapfill": 1,
    "q_string_agg_types": 1,
    "q_balance_deciles": 1,
    "q_rolling_90d_orders": 1,
    "q_cube_revenue": 1,
    "q_set_ops_customers": 1,
    "q_rank_functions": 1,
    "q_date_functions": 1,
    "q_corr_stats": 1,
    "q_unpivot_measures": 1,
    "q_events_hourly": 1,
    "q_events_latest_per_user": 1,
    "q_events_sessionize": 1,
    "q_cdc_apply_events": 1,
    "q_events_json_props": 1,
    "q_events_funnel": 1,
    "q_events_tumbling_native": 1,
    "q_events_retention": 1,
    "q_events_value_histogram": 1,
    "q_asof_purchase_view": 1,
    "q_range_join_bands": 1,
    # twice (r01 and r02) — already hard-verified; go last
    "q1_pricing_summary": 2,
    "q3_shipping_priority": 2,
    "q5_local_supplier": 2,
    "q6_forecast_revenue": 2,
    "q10_returned_items": 2,
    "q_count_distinct": 2,
    "q_union_all": 2,
    "q_semi_anti_join": 2,
    "q_scalar_subquery": 2,
    "q_topk_parts": 2,
    "q4_order_priority": 2,
    "q12_priority_shipping": 2,
    "q14_promo_revenue": 2,
    "q18_large_orders": 2,
    "q19_disjunctive_filter": 2,
    "q7_nation_volume": 2,
    "q8_market_share": 2,
    "q13_order_distribution": 2,
    "q22_global_sales": 2,
    "q15_top_supplier": 2,
    "q17_small_quantity": 2,
    "q_supplier_scorecard": 2,
    "q_monthly_growth": 2,
    "q21_waiting_supplier": 2,
    "q_customer_order_summary": 2,
    "q_daily_order_metrics": 2,
    "q_stg_orders_enriched": 2,
    "q_window_analytics": 2,
    "q_rollup_revenue": 2,
    "q_segment_balance_stats": 2,
    "q_scalar_functions": 2,
    "q_correlated_subquery": 2,
    "q_null_semantics": 2,
    "q_events_anomaly": 2,
    "q_customer_pareto": 2,
    "q_price_percentiles": 2,
    "q_fuzzy_name_match": 2,
    "q_window_first_last": 2,
    "q_nested_types": 2,
}


def _ordered(names: list[str]) -> list[str]:
    # Stable sort: (times checked, registration index) — new/never-checked
    # queries keep their relative registration order at the front.
    return sorted(
        range(len(names)), key=lambda i: (_TIMES_DRIVER_CHECKED.get(names[i], 0), i)
    )


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (tpch, analytics, events, llmdata):
        merged.update(mod.QUERIES)
    names = list(merged)
    return {names[i]: merged[names[i]] for i in _ordered(names)}


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in (tpch, analytics, events, llmdata):
        merged.update(mod.ORACLE)
    names = list(merged)
    return {names[i]: merged[names[i]] for i in _ordered(names) if names[i] in merged}
