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
#: Round-6 rotation (VERDICT r5 items 2+3): the 19 queries whose newest
#: green driver row is still r1/r2 — evidence older than the events
#: fixture regeneration — plus minhash_lsh_pairs, newly reformulated as
#: exact-verified LSH with a value-exact DuckDB oracle (its first shot
#: at a green driver row after four rounds of rows-only checks).
MUST_BE_IN_WINDOW = {
    # newest green row is r1/r2 — refresh
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
    "group_count",
    "group_sum_multi",
    "top_orders",
    "custkey_set_ops",
    "orders_by_month",
    "day_name_dimension",
    "season_year_inference",
    "completed_before_cutoff",
    # newly oracled in round 6 — never had a decidable driver row
    "minhash_lsh_pairs",
    # new in round 6 — the zipfian skew-join proof needs a driver row
    "skewed_user_join",
    # new in round 6 — PQ-ADC compressed ANN tier needs a driver row
    "pq_adc_topk",
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
