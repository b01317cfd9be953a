"""SQL-facade cross-validation: the oracle SQL strings are ANSI enough that
126 of them run UNMODIFIED on Spark SQL over the registered views. For each,
the SQL route and the DataFrame/operator route must produce identical rows
— two routes to one result, verified entirely inside the engine
(independent of the DuckDB gate). This generalizes the reference's
Q1(SQL)/Q2(operators) duality to the whole registry.

The dialect-blocked remainder (203 oracles) is inventoried in COVERAGE.md:
they use DuckDB-only surface (unnest/string_split lateral explosion,
list_cosine_similarity, quantile_cont, EPOCH, json_extract_string,
recursive CTE trajectories, md5-hex arithmetic) with no unmodified
Spark SQL spelling.
"""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entrymod
from apache_beam_challange_spark.sources.catalog import register_views

# Oracles that parse/execute on Spark SQL as-is (the rest use DuckDB-only
# functions: string_split, unnest, list_cosine_similarity, epoch, ...).
PORTABLE = [
    "q1_sql_top_pairs",
    "q2_top_pairs_ops",
    "q3_station_distances",
    "q4_total_distance",
    "q4_total_distance_strict",
    "q4_total_distance_by_name",
    "q4_total_distance_cogroup",
    "create_fixture_counts",
    "project_filter_nulls",
    "distinct_pairs",
    "events_group_topk",
    "pricing_summary",
    "csv_format_lines",
    "join_broadcast_revenue",
    "join_semi_active_customers",
    "join_anti_unordered_parts",
    "set_ops_customers",
    "window_rank_orders",
    "rollup_nation_revenue",
    "count_distinct_users",
    "sort_limit_offset",
    "q5_local_supplier_volume",
    "pivot_user_event_matrix",
    "argmax_order_per_customer",
    "events_hourly_counts",
    "dedup_exact_docs",
    "doc_fingerprints",
    "lang_id_confusion",
    "streaming_tumbling_counts",
    "streaming_session_windows",
    "streaming_dedup_events",
    "streaming_stateful_user_counts",
    "salted_group_count_events",
    "range_join_value_bands",
    # round-8 second wave: the TPC-H completion + the interval/PIT pair
    # and the de-MATERIALIZED histogram/prefix/basket oracles are plain
    # ANSI — every one runs unmodified on Spark SQL
    "tpch_q2_min_cost_supplier",
    "tpch_q4_priority_check",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_parts",
    "tpch_q12_shipmode_priority",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_counts",
    "tpch_q18_large_volume_customers",
    "tpch_q19_disjunctive_revenue",
    "tpch_q20_excess_share_suppliers",
    "pit_scd2_state_before_purchase",
    "batch_interval_join_binned",
    "pareto_abc_parts",
    "equi_depth_value_bins",
    "basket_part_pairs_topk",
    # third wave: the skyline oracle is the textbook ANSI NOT-EXISTS
    # dominance query — running it through spark.sql proves the
    # histogram-sweep rewrite against Spark's OWN decorrelation too
    "skyline_parts_price_size",
    # full ANSI analytic surface — one WINDOW clause, pure ANSI text
    "window_feature_pack",
    # quantile normalization: the windowed-rank + scalar-subquery text
    # parses and runs on Spark SQL as-is (the single-partition windows
    # it implies are exactly what the engine route replaces)
    "quantile_normalize_values",
    # Markov backtest: LAG + ROW_NUMBER + broadcastable join, plain ANSI
    "markov_backtest_accuracy",
    # GROUPING SETS + GROUPING() bitmask — shared ANSI
    "grouping_sets_revenue",
    "asof_join_last_event_per_order",
    "cube_orders",
    "grouped_map_best_doc",
    "batch_sessionize_events",
    "latest_event_per_user",
    "customers_without_urgent_orders",
    "q6_forecast_revenue",
    # round-5 promotions (VERDICT r4 item 8)
    "salted_join_revenue",
    "streaming_enriched_nation_counts",
    "ohlc_hourly_value_bars",
    "hourly_anomaly_zscores",
    "column_profile_rides",
    "event_funnel_counts",
    "hypertable_rollup_hourly",
    "q3_station_distances_geodesic",
    "window_rolling_order_totals",
    "scd2_event_type_history",
    # round-5 traindata members whose oracles are ANSI enough to run
    # unmodified (verified MATCH against the DataFrame route):
    "cusum_hourly_changepoints",
    "sessions_overlapping_error_hours",
    "station_grid_density",
    "daily_trend_slopes",
    "session_covisit_pmi",
    "dq_verification_report",
    "cdc_snapshot_with_deletes",
    # round-6 modern-SQL-surface members: ONE text is both the Spark
    # implementation and the DuckDB oracle (lateral correlated subquery,
    # week-batched recursive CTE)
    "lateral_top_customers_per_nation",
    "recursive_hour_spine_counts",
    # round-6 continued-session members with dialect-portable oracles
    "unpivot_returnflag_metrics",
    "tpch_q3_shipping_priority",
    "tpch_q10_returned_items",
    "event_transition_matrix",
    "shuffle_skew_report",
    "k_anonymity_audit",
    # round-7: correlated scalar subquery + NOT EXISTS (facade-portable
    # by construction — the Spark route runs the oracle text verbatim)
    "tpch_q17_small_qty_revenue",
    "tpch_q22_idle_customers",
    # round-7 wave 2: double-correlated EXISTS/NOT EXISTS (verbatim
    # oracle text) + the pure-ANSI mergeable heavy-hitter merge
    "tpch_q21_waiting_suppliers",
    "mergeable_topk_user_counts",
    # round-7 wave 3: integer-exact Benford audit (VALUES spine, CASE
    # probability map, SUBSTRING digit extraction — all dialect-shared)
    # and the zipWithIndex-shaped global numbering (plain ROW_NUMBER text)
    "benford_price_audit",
    "global_row_ids_orders",
    # exact-integer Hamilton apportionment (SQRT/FLOOR/MOD/ROW_NUMBER)
    "lang_mixing_allocation",
    # snapshot reconciliation (FULL JOIN + IS DISTINCT FROM, shared)
    "snapshot_diff_audit",
    # privacy-family completion (COUNT DISTINCT over the quasi-id agg)
    "l_diversity_audit",
    # round-8: the MERGE INTO surface's cutoff-free full-history oracle
    # (plain ROW_NUMBER text) and the SemDeDup k=32 recount-oracle row
    # (COUNT + boolean literals) both run verbatim on Spark SQL
    "merge_into_cdc_snapshot",
    "merge_full_sync_snapshot",
    "semdedup_cluster_prune_k32",
    # round-9 wave: the two rank statistics whose oracle text is pure
    # ANSI (histogram CTEs + windows) run verbatim; the other four use
    # DuckDB-only surface (ASOF JOIN, string_split unnest, //,
    # date_diff string unit)
    "mann_whitney_auc_purchase",
    "spearman_value_hour_by_type",
    # round-9 widening sweep: every blocked oracle re-probed against
    # Spark 4.1 — these fourteen now parse, execute AND return identical
    # rows. The headline unlock is WITH RECURSIVE (the EWMA/Holt walk
    # oracles run verbatim — Spark 4's recursive CTE support); the rest
    # are session_window / windowed-aggregate texts that were blocked by
    # since-resolved dialect gaps. The four streaming-sink twins that
    # also execute stay out (their DataFrame routes drive a stream per
    # comparison); stream_stream_left_semi_join's batch route compares
    # cleanly and is in.
    "session_window_native",
    "linreg_value_on_hour_by_type",
    "data_quality_expectations",
    "ewma_forecast_backtest",
    "gini_revenue_inequality",
    "mde_power_analysis",
    "chow_break_daily_revenue",
    "winsorized_mean_value",
    "clamped_ledger_balances",
    "enriched_orders_view_revenue",
    "holt_forecast_backtest",
    "kendall_tau_value_hour_by_type",
    "stream_stream_left_semi_join",
    "weekly_revenue_wow",
    # DiD: one conditional aggregate, pure shared ANSI
    "did_estimate_by_type",
    # wave5 experiment-analysis block: conditional aggregates, bounded
    # windows, fixed-point terms — pure shared ANSI (the rest of wave5
    # is dialect-blocked: isodow / `//` / string_split / generate_series
    # / epoch_us; anova/kruskal left this list in round 10 when their
    # oracles moved to exact HUGEINT arithmetic for the FLOOR->LONG
    # clamp fix — ADVICE r9 high)
    "hhi_nation_revenue_concentration",
    "theil_index_revenue",
    "loo_group_influence_on_slope",
    "average_precision_purchase_by_value",
    "fdr_bh_hourly_purchase_rate",
    "wilson_ci_purchase_by_parity",
    "sprt_purchase_rate_monitor",
]


def _canon(df):
    # PySpark collect() renders tz-typed TIMESTAMP in the *driver's* local
    # zone; cast to NTZ (via the UTC session tz) so comparisons are
    # timezone-agnostic — the SQL route's date_trunc yields TIMESTAMP while
    # the DataFrame route already emits TIMESTAMP_NTZ.
    from pyspark.sql import functions as F

    # Decimal is the other dialect type artifact: Spark SQL parses "100.0"
    # as DECIMAL, so bigint/100.0 yields decimal on the SQL route where the
    # DataFrame route's double literal yields double — same values.
    df = df.select(
        [
            F.col(c).cast("timestamp_ntz").alias(c)
            if t == "timestamp"
            else F.col(c).cast("double").alias(c)
            if t.startswith("decimal")
            else F.col(c)
            for c, t in df.dtypes
        ]
    )
    cols = sorted(df.columns)
    rows = []
    for r in df.collect():
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                v = "nan" if math.isnan(v) else round(v, 9)
            vals.append(v)
        rows.append(tuple(str(x) for x in vals))
    return sorted(rows)


@pytest.mark.parametrize("name", PORTABLE)
def test_sql_route_matches_dataframe_route(spark, sf_dir, name):
    register_views(spark, sf_dir)
    qs, oracles = entrymod.all_queries(), entrymod.all_oracle_sql()
    df_route = qs[name](spark, sf_dir)
    sql_route = spark.sql(oracles[name])
    assert sorted(df_route.columns) == sorted(sql_route.columns)
    assert _canon(df_route) == _canon(sql_route)
