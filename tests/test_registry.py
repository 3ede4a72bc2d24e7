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
#: Round-12 rotation (VERDICT r11 item 1): the 49 r8-green queries (the
#: oldest driver evidence in the repo) plus watermark_drop_audit (no
#: driver row yet). Head = queries whose code changed after their
#: newest driver row: the three streams re-sized by the r11
#: state_width_for law, then knn_pagerank (r8 row predates the r9 knn
#: rewrite). Post-r12 no query's newest green is older than r9.
MUST_BE_IN_WINDOW = {
    "events_session_stream",
    "user_totals_stateful",
    "view_click_stream_join",
    "knn_pagerank",
    "watermark_drop_audit",
    "pricing_summary",
    "customers_without_orders",
    "high_value_customers_semi",
    "top_customers_per_nation",
    "rollup_region_nation",
    "shipping_priority",
    "returned_items",
    "distinct_customers_salted",
    "text_stats_by_lang",
    "doc_quality_scores",
    "token_topk",
    "lang_id_heuristic",
    "embedding_near_dup_pairs",
    "bpe_token_topk",
    "doc_winnow_fingerprints",
    "corpus_clean_pipeline",
    "media_manifest",
    "media_features",
    "media_frame_sample",
    "events_hourly_stream",
    "events_sliding_stream",
    "standings_stream",
    "event_sessions",
    "clicks_last_error",
    "purchases_in_sessions",
    "events_time_rollup",
    "doc_repetition_scores",
    "stratified_sample",
    "events_sliding",
    "events_hourly_gapfill",
    "latest_event_snapshot",
    "events_trailing_hour_window",
    "per_source_cap",
    "temperature_mixture_sample",
    "training_shuffle_order",
    "ivfpq_ann_topk",
    "source_shingle_kmv",
    "incremental_ingest_dedup",
    "leakage_safe_split",
    "hard_negative_mining",
    "token_budget_pack",
    "source_overlap_matrix",
    "source_minhash_similarity",
    "near_dup_rate_by_source",
    "ivf2_ann_topk",
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
