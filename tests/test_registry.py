"""Registration-order guarantees for the driver's CORRECTNESS window.

Round-1 finding (VERDICT.md): the driver verifies only the FIRST 50
queries in ``queries()`` iteration order. ``registry.DRIVER_PRIORITY``
exists to keep every never-redundant operator family inside that
window; these tests pin the invariants so a new ``@register`` call
can't silently push a critical query out of the window again.
"""

from __future__ import annotations

import glob
import json
import os
import re

from data_engineer_8_final_project_spark import registry

DRIVER_WINDOW = 50

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Queries that MUST land inside the driver's verification window.
#: Round-15 rotation (VERDICT r14 item 1): the six registrations
#: without driver rows (five from r14 + r15's ann_recall_eval), then
#: the six r10 deferrals (oldest driver evidence in the repo), then
#: 38 of the 48-query r11-green cohort. The TEN r11 greens outside
#: the window (nine deferred + weighted_sample_per_source) head the
#: r16 rotation; each has a fresh operator-family sibling (see
#: registry.py rotation comment). Post-r15 no query's newest green is
#: older than r11, and only ten r11 rows remain.
MUST_BE_IN_WINDOW = {
    # registrations without driver rows (ann_recall_eval: r15)
    "ann_recall_eval",
    "ngram_containment_pairs",
    "mmr_diverse_topk",
    "dedup_attrition_curve",
    "curriculum_order",
    "simhash_dedup_verdicts",
    # r10 deferrals
    "dup_clusters_twostar",
    "tfidf_topk_terms",
    "lang_mixture_weights",
    "minhash_lsh_pairs",
    "pq_adc_topk",
    "knn_graph",
    # 39 of the r11-green cohort
    "full_outer_coalesce",
    "dedup_exact",
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
    "scd2_event_history",
    "value_histogram",
    "late_shipment_priority",
    "vocab_coverage_oov",
    "bigram_logprob",
    "weighted_sample_topk",
    # weighted_sample_per_source ceded its slot to ann_recall_eval
    # (family sibling weighted_sample_topk stays in-window; it heads
    # the r16 rotation)
}


def newest_green_rounds() -> tuple[dict[str, int], int]:
    """(newest driver-green round per query, current round).

    A green is a CORRECTNESS row with rows+schema+hash all true. The
    current round is ``$SPARK_GRAFT_ROUND`` when it parses as an int,
    else newest CORRECTNESS_r{N}.json + 1 (the driver archives at the
    END of round N, so a live session belongs to N+1).
    """
    newest: dict[str, int] = {}
    rounds = []
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        try:
            rows = json.load(open(path))
        except (ValueError, OSError):
            continue
        for name, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                newest[name] = max(newest.get(name, 0), rnd)
    try:
        current = int(os.environ["SPARK_GRAFT_ROUND"])
    except (KeyError, ValueError):
        current = (max(rounds) + 1) if rounds else 1
    return newest, current


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


def test_no_stale_green_outside_window():
    """Freshness invariant as code (VERDICT r14 item 5).

    The r13 round target "no green older than r11" was missed silently
    because nothing machine-checked it. This gate parses the archived
    CORRECTNESS history and fails when any registered query whose
    newest driver green is OLDER than 4 rounds (or that has no green
    at all) is NOT staged inside the current driver window — i.e. the
    rotation forgot it and the staleness can only grow. Rotating the
    window head each round keeps this green by construction.
    """
    newest, current = newest_green_rounds()
    if current <= 5:  # too little history for a 4-round horizon
        return
    cutoff = current - 4
    window = set(list(registry.all_queries())[:DRIVER_WINDOW])
    stale = sorted(
        name
        for name in registry.DRIVER_PRIORITY
        if newest.get(name, 0) < cutoff and name not in window
    )
    assert not stale, (
        f"queries with newest driver green older than r{cutoff} left outside "
        f"the driver window (rotation missed them): {stale}"
    )
