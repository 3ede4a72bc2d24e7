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
#: Round-17 rotation (VERDICT r16 item 8): the eight r12 greens whose
#: rollover grace expires this round, then 42 of the 50-query
#: r13-green cohort. The EIGHT r13 greens outside the window are
#: staged immediately after the boundary for the r18 head; each has
#: a fresher operator-family sibling (see registry.py rotation
#: comment). Post-r17 no query's newest green is older than r13, and
#: only the staged defers remain at r13.
MUST_BE_IN_WINDOW = {
    # the eight r12 greens (at the freshness horizon this round)
    "latest_event_snapshot",
    "clicks_last_error",
    "customers_without_orders",
    "distinct_customers_salted",
    "doc_repetition_scores",
    "events_hourly_gapfill",
    "events_trailing_hour_window",
    "knn_pagerank",
    # 42 of the r13-green cohort
    "dedup_stream_watermarked",
    "matches_clean",
    "event_type_drift",
    "scd2_point_in_time_join",
    "table_profile",
    "quality_model_filter",
    "cluster_balanced_sample",
    "attribution_last_touch",
    "ewma_user_value",
    "value_outliers_mad",
    "revenue_trend_by_nation",
    "rfm_segments",
    "brand_affinity_pairs",
    "conversion_latency_stats",
    "lang_source_contingency",
    "quality_percentile_norm",
    "pq_reconstruction_error",
    "session_bounce_stats",
    "knn_kcore",
    "event_transition_matrix",
    "time_weighted_value",
    "revenue_pareto_deciles",
    "hourly_volume_spikes",
    "fd_violation_audit",
    "revenue_trend_theilsen",
    "benford_first_digit",
    "revenue_gini",
    "token_prefix_completions",
    "part_price_boxplot",
    "cohort_ltv",
    "ab_test_conversion",
    "activity_heatmap",
    "embedding_norm_outliers",
    "rolling_wau",
    "user_churn_rate",
    "brand_hhi_by_year",
    "supplier_latency_league",
    "curation_pipeline",
    "embedding_covariance",
    "token_cms_heavy_hitters",
    "embedding_pca_scores",
    "revenue_bootstrap_ci",
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


#: Rotation-staging grace width: positions DRIVER_WINDOW ..
#: DRIVER_WINDOW + STAGED_HEAD before the next rotation commit lands.
STAGED_HEAD = 12


def test_no_stale_green_outside_window():
    """Freshness invariant as code (VERDICT r14 item 5).

    The r13 round target "no green older than r11" was missed silently
    because nothing machine-checked it. This gate parses the archived
    CORRECTNESS history and fails when any registered query whose
    newest driver green is OLDER than 4 rounds (or that has no green
    at all) is NOT staged inside the current driver window — i.e. the
    rotation forgot it and the staleness can only grow. Rotating the
    window head each round keeps this green by construction.

    Rollover grace (ADVICE r15): between the driver archiving round N
    and the round-N+1 rotation commit, queries the PREVIOUS rotation
    deliberately staged at the next head (positions DRIVER_WINDOW ..
    DRIVER_WINDOW + STAGED_HEAD) sit exactly one round past the
    horizon. Those are "rotation pending", not forgotten — exempt, but
    ONLY for that single round (newest >= cutoff - 1): a second missed
    rotation still fails loudly.
    """
    newest, current = newest_green_rounds()
    if current <= 5:  # too little history for a 4-round horizon
        return
    cutoff = current - 4
    order = list(registry.all_queries())
    window = set(order[:DRIVER_WINDOW])
    staged = set(order[DRIVER_WINDOW : DRIVER_WINDOW + STAGED_HEAD])
    stale = sorted(
        name
        for name in registry.DRIVER_PRIORITY
        if newest.get(name, 0) < cutoff
        and name not in window
        and not (name in staged and newest.get(name, 0) >= cutoff - 1)
    )
    assert not stale, (
        f"queries with newest driver green older than r{cutoff} left outside "
        f"the driver window (rotation missed them): {stale}"
    )
