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
#: Round-3 rotation (VERDICT r2 item 1): the 30 queries that never
#: received a driver CORRECTNESS row in rounds 1-2, plus the two whose
#: implementation changed this round and must be re-proven. Demoted
#: queries all carry green r1/r2 driver rows and stay parity-gated.
MUST_BE_IN_WINDOW = {
    # never driver-verified before round 3
    "hash_split_assignments",
    "sequence_packing",
    "pii_scrub_stats",
    "events_json_extract",
    "events_hourly",
    "events_sliding",
    "doc_unigram_logprob",
    "dedup_stream",
    "large_volume_customers",
    "small_qty_part_revenue",
    "lone_late_supplier",
    "priority_order_counts",
    "customer_order_distribution",
    "idle_rich_customers",
    "latest_event_snapshot",
    "events_by_segment_stream",
    "dq_audit",
    "customer_name_fuzzy_pairs",
    "order_qty_sequences",
    "sorted_neighborhood_pairs",
    "events_hourly_gapfill",
    "events_trailing_hour_window",
    "events_winsorized_stats",
    "status_reconciliation_nullsafe",
    "nation_pair_volume",
    "top_revenue_supplier",
    "part_supplier_counts",
    "doc_median_length_udaf",
    "doc_norm_length_grouped",
    "doc_tokens_udtf",
    # implementation changed in round 3
    "training_manifest",
    "dup_clusters",
}


def test_unoracled_query_not_in_window():
    """minhash_lsh_pairs has no SQL oracle (pyspark.ml internal hashes)
    so a driver slot on it can never go green — it must stay in the
    tail (VERDICT r2 item 3). Its recall gate lives in test_dedup.py."""
    window = set(list(registry.all_queries())[:DRIVER_WINDOW])
    assert "minhash_lsh_pairs" not in window


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
