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

#: Queries that MUST land inside the driver's verification window —
#: the round-1 tail (streaming / as-of / range / sessionization /
#: rollup) plus each family's sole representative.
MUST_BE_IN_WINDOW = {
    "standings",
    "reference_standings",
    "matches_clean",
    "html_matches_extract",
    "scalar_cleaning_suite",
    "events_hourly_stream",
    "events_sliding_stream",  # subsumes batch events_sliding (same oracle)
    "user_totals_stateful",
    "standings_stream",
    "event_sessions",
    "events_session_stream",
    "view_click_stream_join",
    "clicks_last_error",
    "purchases_in_sessions",
    "events_time_rollup",
    "dedup_exact",
    "jaccard_near_dup",
    "simhash_near_dup",
    "minhash_lsh_pairs",
    "minhash_native_pairs",
    "embedding_topk",
    "embedding_near_dup_pairs",
    "lsh_near_dup_pairs",
    "ann_lsh_topk",
    "ivf_ann_topk",
    "corpus_clean_pipeline",
    "doc_repetition_scores",
    "stratified_sample",
    "dup_clusters",
    "training_manifest",
    "media_manifest",
    "media_features",
    "media_frame_sample",
    "media_decode_fake",
}


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
