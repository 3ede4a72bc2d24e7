"""Derived-cell policy for the corpus-wide knn family (VERDICT r8
item 3: the benched shape must be the production shape).

Pins three load-bearing facts:

- the derivation is the linear-cells rule ``max(16, n // 128)`` — the
  within-cell pair volume at any corpus size stays ~n·128;
- every fixture SF derives the FLOOR (16 cells, flat assignment), so
  the registered knn-family values are bit-identical to every green
  driver row recorded before the policy landed;
- hierarchical routing engages exactly at ROUTING_MIN_CELLS with
  isqrt parents — the knob scripts/knn_routing_ab.py proved at 1.76×.
"""

from __future__ import annotations

import os

from data_engineer_8_final_project_spark.operators import similarity
from data_engineer_8_final_project_spark.queries.extended import _knn_cells

FIXTURES = "/root/testdata"


def test_derivation_is_linear_cells_rule():
    assert similarity.derived_n_cells(0) == similarity.CELL_FLOOR
    assert similarity.derived_n_cells(500) == 16
    assert similarity.derived_n_cells(2000) == 16
    assert similarity.derived_n_cells(16_000) == 125
    assert similarity.derived_n_cells(128_000) == 1000
    # linearity: doubling the corpus doubles the cells (above the floor)
    assert similarity.derived_n_cells(256_000) == 2 * similarity.derived_n_cells(128_000)


def test_routing_engages_at_threshold_with_isqrt_parents():
    assert similarity.routing_parents(16) is None
    assert similarity.routing_parents(63) is None
    assert similarity.routing_parents(64) == 8
    assert similarity.routing_parents(125) == 11
    assert similarity.routing_parents(1000) == 31


def test_all_fixture_sfs_derive_the_floor_flat_shape():
    """The oracle-replay guarantee: no fixture SF can reach the
    routing arm, so strict-hash driver rows see exactly the shape
    every prior green row was recorded against."""
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = os.path.join(FIXTURES, sf)
        if not os.path.isdir(sf_dir):
            continue
        nc, npar = _knn_cells(sf_dir)
        assert nc == similarity.CELL_FLOOR, (sf, nc)
        assert npar is None, (sf, npar)


def test_oracle_replays_the_same_constants():
    """The SQL-side derivation (GREATEST(floor, n // target)) is
    generated from the SAME constants the Spark side uses — a drifted
    literal would silently fork the two engines."""
    from data_engineer_8_final_project_spark.queries.extended import _knn_ctes

    ctes = _knn_ctes(d2="1")
    assert f"GREATEST({similarity.CELL_FLOOR}, " in ctes
    assert f"// {similarity.CELL_TARGET} " in ctes
