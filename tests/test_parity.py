"""Differential-oracle parity: every registered query vs DuckDB.

The default suite runs at sf0.001 (fast CI mirror of the driver's t2
gate); ``pytest -m slow tests/test_parity.py`` re-runs every query at
the driver's own sf0.01 scale — the same data the grading driver
hashes, so a query that passes here cannot fail the driver on scale-
dependent behavior (rounding at bigger sums, empty-at-small-sf edge
cases). Any query registered without an oracle gets a weaker rows-only
smoke, same as the driver.
"""

from __future__ import annotations

import pytest

from data_engineer_8_final_project_spark.parity import check_query
from data_engineer_8_final_project_spark.registry import all_queries

SF_CORRECTNESS = "/root/testdata/sf0.01"  # conftest.SF_CORRECTNESS (tests/ is not a package)


def _names() -> list[str]:
    return sorted(all_queries())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, sf_dir, name):
    res = check_query(spark, name, sf_dir)
    assert res.ok, f"{name}: {res.detail}"


@pytest.mark.slow
@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle_at_driver_scale(spark, name):
    res = check_query(spark, name, SF_CORRECTNESS)
    assert res.ok, f"{name}: {res.detail}"
