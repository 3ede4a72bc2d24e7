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
#: Round-8 rotation (VERDICT r7 items 2+7): the 3 round-7 additions
#: that have never had a driver CORRECTNESS row, plus the 38 queries
#: whose newest green is still r5 (the oldest evidence in the repo --
#: post-r8, no registered query's newest green is older than r6).
MUST_BE_IN_WINDOW = {
    # never driver-verified (late r7)
    "ivf2_ann_topk",
    "knn_pagerank",
    "knn_communities",
    # newest green row is r5
    "events_sliding",
    "events_hourly_gapfill",
    "latest_event_snapshot",
    "events_trailing_hour_window",
    "events_hourly_stream",
    "events_sliding_stream",
    "events_session_stream",
    "events_time_rollup",
    "event_sessions",
    "purchases_in_sessions",
    "clicks_last_error",
    "user_totals_stateful",
    "view_click_stream_join",
    "per_source_cap",
    "temperature_mixture_sample",
    "training_shuffle_order",
    "standings_stream",
    "embedding_near_dup_pairs",
    "text_stats_by_lang",
    "doc_quality_scores",
    "token_topk",
    "bpe_token_topk",
    "lang_id_heuristic",
    "doc_winnow_fingerprints",
    "corpus_clean_pipeline",
    "doc_repetition_scores",
    "stratified_sample",
    "media_manifest",
    "media_features",
    "media_frame_sample",
    "pricing_summary",
    "shipping_priority",
    "customers_without_orders",
    "high_value_customers_semi",
    "top_customers_per_nation",
    "rollup_region_nation",
    "distinct_customers_salted",
    "returned_items",
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
