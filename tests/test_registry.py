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
#: Round-5 rotation (VERDICT r4 item 3): the events-timestamp read was
#: fixed this round, so every query whose output depends on event time
#: needs a FRESH driver row (the r1/r2 green rows for the stale-green
#: nine predate the fixture's encoding change and prove nothing), plus
#: the round-5 additions that have no driver row at all yet.
MUST_BE_IN_WINDOW = {
    # events-family: red in r4 and repaired by the ts-read fix
    "events_hourly",
    "events_sliding",
    "events_hourly_gapfill",
    "latest_event_snapshot",
    "events_trailing_hour_window",
    # events-family: stale-green (verified only against the old fixture)
    "events_hourly_stream",
    "events_sliding_stream",
    "events_session_stream",
    "events_time_rollup",
    "event_sessions",
    "purchases_in_sessions",
    "clicks_last_error",
    "user_totals_stateful",
    "view_click_stream_join",
    # new in round 5 — never driver-verified
    "per_source_cap",
    "temperature_mixture_sample",
    "training_shuffle_order",
    "dup_span_stats",
    "order_chains_recursive",
    "events_props_variant",
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
