"""Property tests (SURVEY.md §5 item 4): standings invariants.

For ANY match table — including NULL scores (the reference's
malformed-score quirk) and clubs appearing only home or only away —
the standings aggregation must satisfy the conservation laws of the
double-entry bookkeeping it implements.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_engineer_8_final_project_spark.operators.cleaning import league_standings

CLUBS = [f"CLUB_{i}" for i in range(6)]

match_row = st.tuples(
    st.sampled_from(CLUBS),
    st.sampled_from(CLUBS),
    st.one_of(st.none(), st.integers(0, 5)),
    st.one_of(st.none(), st.integers(0, 5)),
)


def _clean_df(spark, rows):
    data = [
        ("league_x", h, a, hs, a_s, "2025-03-01 09:00:00")
        for h, a, hs, a_s in rows
    ]
    return spark.createDataFrame(
        data,
        "league string, home_team string, away_team string, "
        "home_score int, away_score int, created_at string",
    )


@pytest.mark.usefixtures("spark")
@given(rows=st.lists(match_row, min_size=1, max_size=30))
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_standings_conservation_laws(spark, rows):
    out = league_standings(_clean_df(spark, rows)).collect()

    n_matches = len(rows)
    n_null = sum(1 for _, _, hs, a_s in rows if hs is None or a_s is None)
    decisive = sum(
        1 for _, _, hs, a_s in rows if hs is not None and a_s is not None and hs != a_s
    )
    drawn = sum(
        1 for _, _, hs, a_s in rows if hs is not None and a_s is not None and hs == a_s
    )

    # every match contributes exactly two legs
    assert sum(r.match for r in out) == 2 * n_matches
    # per-row bookkeeping
    for r in out:
        assert r.match == r.win + r.draw + r.loss
        assert r.points == 3 * r.win + r.draw
        assert r.goal_diff == r.goal_for - r.goal_against
    # decisive matches pair one win with one loss; NULL matches are a
    # loss for BOTH sides (reference quirk); draws pair up
    assert sum(r.win for r in out) == decisive
    assert sum(r.draw for r in out) == 2 * drawn
    assert sum(r.loss for r in out) == decisive + 2 * n_null
    # goals are conserved across the unpivot
    assert sum(r.goal_for for r in out) == sum(r.goal_against for r in out)
    # rank ids are exactly 1..n within the league
    assert sorted(r.id for r in out) == list(range(1, len(out) + 1))
    # output is ordered by the reference's 6-key DESC sort (incl. the
    # goal_against-DESC quirk), club ASC as the determinism tiebreak
    keys = [
        (-r.points, -r.goal_for, -r.goal_against, -r.win, -r.draw, -r.loss, r.club)
        for r in sorted(out, key=lambda r: r.id)
    ]
    assert keys == sorted(keys)
