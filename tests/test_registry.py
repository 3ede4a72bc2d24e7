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
#: Round-10 rotation (VERDICT r9 item 1): the 49 r6-green queries (the
#: oldest driver evidence in the repo, 3 rounds stale) plus knn_graph,
#: whose r7 driver row predates the r9 derived-cells rewrite. Post-r10
#: no registered query's newest green should be older than r7; the
#: four remaining rewritten-but-stale knn queries head the r11 window.
MUST_BE_IN_WINDOW = {
    "standings",
    "reference_standings",
    "group_count",
    "group_sum_multi",
    "top_orders",
    "media_decode_fake",
    "promo_revenue_share",
    "order_value_quartiles",
    "price_quantiles",
    "pivot_qty_by_status",
    "unpivot_order_metrics",
    "text_normalize",
    "doc_fingerprints",
    "cube_flag_status",
    "part_price_rank",
    "order_gaps_lag",
    "custkey_set_ops",
    "orders_by_month",
    "day_name_dimension",
    "season_year_inference",
    "completed_before_cutoff",
    "minhash_lsh_pairs",
    "skewed_user_join",
    "pq_adc_topk",
    "hash_split_assignments",
    "sequence_packing",
    "pii_scrub_stats",
    "doc_unigram_logprob",
    "dedup_stream",
    "dq_audit",
    "customer_name_fuzzy_pairs",
    "order_qty_sequences",
    "sorted_neighborhood_pairs",
    "events_winsorized_stats",
    "status_reconciliation_nullsafe",
    "doc_median_length_udaf",
    "doc_norm_length_grouped",
    "doc_tokens_udtf",
    "training_manifest",
    "dup_clusters",
    "dup_clusters_twostar",
    "ngram_decontamination",
    "vocab_build",
    "tfidf_topk_terms",
    "lang_mixture_weights",
    "revenue_by_nation",
    "simhash_near_dup",
    "minhash_native_pairs",
    "ivf_ann_topk",
    "knn_graph",
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
