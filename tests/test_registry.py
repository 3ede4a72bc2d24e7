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
#: Round-11 rotation (VERDICT r10 item 1): the 49 r7-green queries (the
#: oldest driver evidence in the repo, 4 rounds stale) plus one
#: oldest-r8 fill (knn_communities, whose r8 row predates the r9
#: derived-cells knn rewrite). Head = queries whose code changed after
#: their newest driver row (semantic_dedup staged r10, knn family
#: rewritten r9). Post-r11 no query's newest green is older than r8.
MUST_BE_IN_WINDOW = {
    "semantic_dedup",
    "semantic_decontamination",
    "knn_triangle_stats",
    "knn_label_vote",
    "knn_communities",
    "jaccard_near_dup",
    "full_outer_coalesce",
    "dedup_exact",
    "embedding_topk",
    "ann_lsh_topk",
    "label_centroids",
    "html_matches_extract",
    "scalar_cleaning_suite",
    "lsh_near_dup_pairs",
    "events_json_extract",
    "large_volume_customers",
    "small_qty_part_revenue",
    "lone_late_supplier",
    "priority_order_counts",
    "customer_order_distribution",
    "idle_rich_customers",
    "events_by_segment_stream",
    "nation_pair_volume",
    "top_revenue_supplier",
    "part_supplier_counts",
    "cheapest_part_per_brand",
    "market_share_by_year",
    "product_profit_by_nation_year",
    "disjunctive_pred_revenue",
    "excess_shipped_suppliers",
    "events_hourly",
    "dup_span_stats",
    "order_chains_recursive",
    "events_props_variant",
    "dup_cluster_representatives",
    "doc_chunks",
    "forecast_revenue_change",
    "importance_weights",
    "bpe_merge_candidates",
    "event_funnel",
    "retention_cohorts",
    "session_path_topk",
    "event_funnel_stream",
    "scd2_event_history",
    "value_histogram",
    "late_shipment_priority",
    "vocab_coverage_oov",
    "bigram_logprob",
    "weighted_sample_topk",
    "weighted_sample_per_source",
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
