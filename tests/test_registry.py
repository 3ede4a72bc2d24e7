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
#: Round-14 rotation (VERDICT r13 item 1): user_totals_stateful /
#: events_session_stream / view_click_stream_join (code changed in r13
#: after their newest r12 driver rows), then the four r9 deferrals
#: (oldest driver evidence in the repo), then 43 of the 49-query
#: r10-green cohort. The six r10 greens deferred to the r15 head each
#: have a fresh operator-family sibling (see registry.py rotation
#: comment). Post-r14 no query's newest green is older than r10, and
#: only six r10 rows remain.
MUST_BE_IN_WINDOW = {
    "user_totals_stateful",
    "events_session_stream",
    "view_click_stream_join",
    "event_sessions_native",
    "grouping_sets_revenue",
    "revenue_mom_growth",
    "weekday_seasonality",
    "group_count",
    "group_sum_multi",
    "revenue_by_nation",
    "top_orders",
    "order_gaps_lag",
    "part_price_rank",
    "custkey_set_ops",
    "cube_flag_status",
    "promo_revenue_share",
    "price_quantiles",
    "pivot_qty_by_status",
    "order_value_quartiles",
    "doc_fingerprints",
    "simhash_near_dup",
    "text_normalize",
    "unpivot_order_metrics",
    "standings",
    "media_decode_fake",
    "reference_standings",
    "orders_by_month",
    "day_name_dimension",
    "season_year_inference",
    "completed_before_cutoff",
    "minhash_native_pairs",
    "ivf_ann_topk",
    "dup_clusters",
    "training_manifest",
    "hash_split_assignments",
    "sequence_packing",
    "pii_scrub_stats",
    "doc_unigram_logprob",
    "dq_audit",
    "customer_name_fuzzy_pairs",
    "order_qty_sequences",
    "sorted_neighborhood_pairs",
    "events_winsorized_stats",
    "status_reconciliation_nullsafe",
    "doc_median_length_udaf",
    "doc_norm_length_grouped",
    "doc_tokens_udtf",
    "ngram_decontamination",
    "vocab_build",
    "skewed_user_join",
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
