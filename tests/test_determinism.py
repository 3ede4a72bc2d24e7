"""Shuffle-config invariance for the driver verification window.

The driver's hash compare is order-insensitive, so the failure mode it
can't see coming is a query whose RESULT SET depends on physical
execution — a rank/limit without a tiebreak-complete order, a float
reduction whose rounding crosses a threshold, a window keyed on
something partition-dependent. Those bugs surface exactly when the
shuffle layout changes. This probe runs every in-window query under
two different ``spark.sql.shuffle.partitions`` settings and requires
canonically-identical results — so a nondeterministic query fails HERE
(with a named diff) before it flakes a driver round.

sf0.001 keeps the sweep fast (~2 min); the scale-dependent cases are
the slow parity suite's job.
"""

from __future__ import annotations

import pandas as pd
import pytest

from data_engineer_8_final_project_spark import parity, registry

DRIVER_WINDOW = 50


def _window_names() -> list[str]:
    # +44: the round-8 additions parked just past the boundary
    # (event_type_drift, scd2_point_in_time_join, kmeans_clusters,
    # bm25_doc_ranking, table_profile, knn_bfs_hops,
    # quality_model_filter, cluster_balanced_sample,
    # maxsim_multivector_topk, attribution_last_touch,
    # ewma_user_value, value_outliers_mad, revenue_trend_by_nation,
    # rfm_segments, brand_affinity_pairs, conversion_latency_stats,
    # lang_source_contingency, quality_percentile_norm,
    # pq_reconstruction_error, session_bounce_stats, knn_kcore,
    # event_transition_matrix, time_weighted_value,
    # revenue_pareto_deciles, event_sessions_native,
    # grouping_sets_revenue, hourly_volume_spikes,
    # fd_violation_audit, revenue_trend_theilsen,
    # benford_first_digit, revenue_gini, token_prefix_completions,
    # part_price_boxplot, cohort_ltv, snapshot_reconcile,
    # ab_test_conversion, activity_heatmap, revenue_mom_growth,
    # embedding_norm_outliers, rolling_wau, weekday_seasonality,
    # user_churn_rate, brand_hhi_by_year, supplier_latency_league)
    # head the r9 window and must already hold the same invariant
    return list(registry.all_queries())[: DRIVER_WINDOW + 44]


@pytest.mark.parametrize("name", _window_names())
def test_window_query_invariant_to_shuffle_partitions(spark, sf_dir, name):
    q = registry.all_queries()[name]
    key = "spark.sql.shuffle.partitions"
    saved = spark.conf.get(key)
    frames: list[pd.DataFrame] = []
    try:
        for parts in ("3", "17"):
            spark.conf.set(key, parts)
            frames.append(parity._canon(q.fn(spark, sf_dir).toPandas()))
    finally:
        spark.conf.set(key, saved)
    a, b = frames
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), f"{name}: {len(a)} rows at 3 parts vs {len(b)} at 17"
    diff = a.compare(b) if a.shape == b.shape else None
    assert diff is not None and diff.empty, f"{name}: result depends on shuffle layout"
