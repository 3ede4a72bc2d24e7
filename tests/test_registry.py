"""Registration-order guarantees for the driver's CORRECTNESS window.

Round-1 finding (VERDICT.md): the driver verifies only the FIRST 50
queries in ``queries()`` iteration order. ``registry.DRIVER_PRIORITY``
exists to keep every never-redundant operator family inside that
window; these tests pin the invariants so a new ``@register`` call
can't silently push a critical query out of the window again.
"""

from __future__ import annotations

from data_engineer_8_final_project_spark import registry

DRIVER_WINDOW = 50

#: Queries that MUST land inside the driver's verification window.
#: Round-13 rotation (VERDICT r12 item 1): dedup_stream_watermarked
#: (registered 201st in r12, zero driver rows ever), then dedup_stream /
#: event_funnel_stream / events_by_segment_stream (code changed in r12
#: after their newest driver rows), then 46 of the 50 r9-green queries
#: (the oldest remaining driver evidence). The four deferred r9 greens
#: (event_sessions_native, grouping_sets_revenue, revenue_mom_growth,
#: weekday_seasonality) head the r14 window. Post-r13 only those four
#: have evidence older than r10.
MUST_BE_IN_WINDOW = {
    "dedup_stream_watermarked",
    "dedup_stream",
    "event_funnel_stream",
    "events_by_segment_stream",
    "matches_clean",
    "event_type_drift",
    "scd2_point_in_time_join",
    "kmeans_clusters",
    "bm25_doc_ranking",
    "table_profile",
    "knn_bfs_hops",
    "quality_model_filter",
    "cluster_balanced_sample",
    "maxsim_multivector_topk",
    "attribution_last_touch",
    "ewma_user_value",
    "value_outliers_mad",
    "revenue_trend_by_nation",
    "rfm_segments",
    "brand_affinity_pairs",
    "conversion_latency_stats",
    "lang_source_contingency",
    "quality_percentile_norm",
    "pq_reconstruction_error",
    "session_bounce_stats",
    "knn_kcore",
    "event_transition_matrix",
    "time_weighted_value",
    "revenue_pareto_deciles",
    "hourly_volume_spikes",
    "fd_violation_audit",
    "revenue_trend_theilsen",
    "benford_first_digit",
    "revenue_gini",
    "token_prefix_completions",
    "part_price_boxplot",
    "cohort_ltv",
    "snapshot_reconcile",
    "ab_test_conversion",
    "activity_heatmap",
    "embedding_norm_outliers",
    "rolling_wau",
    "user_churn_rate",
    "brand_hhi_by_year",
    "supplier_latency_league",
    "curation_pipeline",
    "embedding_covariance",
    "token_cms_heavy_hitters",
    "embedding_pca_scores",
    "revenue_bootstrap_ci",
}


def test_every_window_query_has_an_oracle():
    """A driver slot on an un-oracled query can never go green (rows-
    only check) — since round 6 every registered query carries a SQL
    oracle, so the whole window must be decidable."""
    for name, q in list(registry.all_queries().items())[:DRIVER_WINDOW]:
        assert q.oracle is not None, f"{name} would waste a driver slot (no oracle)"


def test_priority_list_is_exhaustive_and_exact():
    """Every registered query appears in DRIVER_PRIORITY, and vice versa.

    An unlisted query would sort to the end silently; a stale name in
    the list would mask a deleted query. Both should fail loudly here.
    """
    registered = set(registry.all_queries())
    listed = set(registry.DRIVER_PRIORITY)
    assert registered == listed, (
        f"unlisted: {sorted(registered - listed)}; stale: {sorted(listed - registered)}"
    )


def test_priority_list_has_no_duplicates():
    assert len(registry.DRIVER_PRIORITY) == len(set(registry.DRIVER_PRIORITY))


def test_iteration_order_follows_priority():
    names = list(registry.all_queries())
    expected = [n for n in registry.DRIVER_PRIORITY if n in set(names)]
    assert names == expected


def test_critical_queries_inside_driver_window():
    window = set(list(registry.all_queries())[:DRIVER_WINDOW])
    missing = MUST_BE_IN_WINDOW - window
    assert not missing, f"critical queries outside driver window: {sorted(missing)}"
