"""Differential-oracle parity: every registered query vs DuckDB at sf0.001.

This mirrors the driver's t2 gate (which runs at sf0.01); sf0.001 keeps
the suite fast. Any query registered without an oracle gets a weaker
rows-only smoke here, same as the driver.
"""

from __future__ import annotations

import pytest

from data_engineer_8_final_project_spark.parity import check_query
from data_engineer_8_final_project_spark.registry import all_queries


def _names() -> list[str]:
    return sorted(all_queries())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, sf_dir, name):
    res = check_query(spark, name, sf_dir)
    assert res.ok, f"{name}: {res.detail}"
