"""The SURVEY §2 coverage map must be total and every target must exist."""

from __future__ import annotations

import ast
import os

import data_engineer_8_final_project_spark.coverage as coverage_mod
from data_engineer_8_final_project_spark.coverage import EXTENDED_COVERAGE, SURVEY_COVERAGE
from data_engineer_8_final_project_spark.registry import all_queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

INVENTORY = (
    [f"S{i}" for i in range(1, 10)]
    + [f"P{i}" for i in range(1, 7)]
    + ["J1", "J2"]
    + [f"A{i}" for i in range(1, 5)]
    + ["W1", "W2", "O1", "O2", "U1"]
    + [f"F{i}" for i in range(1, 13)]
    + ["T1", "T2", "T3"]
)


def test_coverage_maps_have_no_duplicate_keys():
    """A repeated dict-literal key silently drops the earlier entry —
    which in round 5 dropped a plan test from the audit index. Parse
    the module source and reject duplicate string keys per dict."""
    with open(coverage_mod.__file__) as fh:
        tree = ast.parse(fh.read())
    for node in ast.walk(tree):
        if isinstance(node, ast.Dict):
            keys = [k.value for k in node.keys if isinstance(k, ast.Constant)]
            dupes = {k for k in keys if keys.count(k) > 1}
            assert not dupes, f"duplicate coverage keys at line {node.lineno}: {dupes}"


def test_every_inventory_id_is_covered():
    assert sorted(SURVEY_COVERAGE) == sorted(INVENTORY)
    assert all(targets for targets in SURVEY_COVERAGE.values())


def test_every_coverage_target_exists():
    queries = all_queries()
    for cov in (SURVEY_COVERAGE, EXTENDED_COVERAGE):
        for op_id, targets in cov.items():
            for target in targets:
                kind, _, ref = target.partition(":")
                if kind == "query":
                    assert ref in queries, f"{op_id}: unknown query {ref!r}"
                elif kind == "test":
                    path = ref.split("::")[0]
                    assert os.path.exists(os.path.join(REPO, path)), f"{op_id}: {path}"
                elif kind == "code":
                    assert os.path.exists(os.path.join(REPO, ref)), f"{op_id}: {ref}"
                else:
                    raise AssertionError(f"{op_id}: bad target kind {target!r}")


def test_every_oracle_gated_query_is_reachable_from_coverage():
    """Inverse direction: no orphan queries — everything registered is
    claimed by some inventory line or extended-surface line."""
    claimed: set[str] = set()
    for cov in (SURVEY_COVERAGE, EXTENDED_COVERAGE):
        for targets in cov.values():
            claimed.update(t.split(":", 1)[1] for t in targets if t.startswith("query:"))
    unclaimed = set(all_queries()) - claimed
    # join-shape widenings are §2.3 scope-note additions, not §2 lines
    widenings = {
        "revenue_by_nation",
        "customers_without_orders",
        "high_value_customers_semi",
        "shipping_priority",
        "returned_items",
        "promo_revenue_share",
        "order_gaps_lag",
        "part_price_rank",
        "distinct_customers_salted",
        "price_quantiles",
        "pivot_qty_by_status",
        "text_normalize",
        "unpivot_order_metrics",
        "bpe_token_topk",
        "doc_winnow_fingerprints",
        "label_centroids",
        "order_value_quartiles",
        "rollup_region_nation",
        "cube_flag_status",
        "events_hourly",
        "events_sliding",
        "events_sliding_stream",
        "events_json_extract",
        "orders_by_month",
        "custkey_set_ops",
        "scalar_cleaning_suite",
        "day_name_dimension",
        "season_year_inference",
        "completed_before_cutoff",
        "forecast_revenue_change",
    }
    assert unclaimed <= widenings, f"orphan queries: {unclaimed - widenings}"


def test_readme_capability_index_in_sync():
    """The README's generated capability index must match what
    scripts/gen_capability_index.py would render from coverage.py —
    adding a capability without regenerating the index fails here."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_capability_index", os.path.join(REPO, "scripts", "gen_capability_index.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    readme = open(os.path.join(REPO, "README.md")).read()
    assert mod.render() in readme, (
        "README capability index out of date — run scripts/gen_capability_index.py"
    )
