"""Golden tests for the reference-native cleaning pipeline.

Inputs/expectations hand-computed to pin the reference's semantics
(reference dags/projectde_dag.py:60-131, 159-248): junk-row drops,
day-code map with passthrough, month-based year inference, date-parse
drops, future-match drop, NULL-score fallthrough-to-loss for both legs,
goal_against-DESC tiebreak, deterministic ids.
"""

from __future__ import annotations

import datetime

import pytest

from data_engineer_8_final_project_spark.operators.cleaning import (
    clean_matches,
    league_standings,
)
from data_engineer_8_final_project_spark.schemas import MATCH_RAW

RAW_ROWS = [
    # (date, home_team, score, away_team, league)
    ("Sa 25 Jan", "Arsenal", "2 - 1", "Chelsea", "england"),   # home win, later year
    ("We 14 Aug", "Chelsea", "0 - 0", "Arsenal", "england"),   # draw, earlier year
    ("Su 2 Feb", "Arsenal", "pp.", "Leeds", "england"),        # malformed -> NULL scores
    ("Zz 5 Oct", "Leeds", "2 - 0", "Chelsea", "england"),      # unknown day code passthrough
    ("Averages", "x", "x", "x", "england"),                    # junk date row
    ("Sa 25 Jan", "Totals", "9 - 9", "x", "england"),          # junk team row
    ("Mo 31 Mar", "Leeds", "1 - 3", "Chelsea", "england"),     # after as_of-1 -> dropped
    ("Xx 99 Foo", "Leeds", "1 - 0", "Arsenal", "england"),     # unparseable date -> dropped
]


@pytest.fixture(scope="module")
def cleaned(spark):
    raw = spark.createDataFrame(RAW_ROWS, MATCH_RAW)
    return clean_matches(
        raw, season_start_year=2024, as_of_date="2025-03-01",
        created_at="2025-03-01 09:00:00",
    ).collect()


def test_junk_future_unparseable_dropped(cleaned):
    assert len(cleaned) == 4  # 8 raw - 2 junk - 1 future - 1 unparseable


def test_day_map_and_passthrough(cleaned):
    by_date = {r["date"]: r for r in cleaned}
    assert by_date["25 Jan 2025"]["day"] == "Saturday"
    assert by_date["5 Oct 2024"]["day"] == "Zz"  # passthrough default


def test_year_inference(cleaned):
    dates = {r["match_date"] for r in cleaned}
    assert datetime.date(2025, 1, 25) in dates  # Jan -> later year
    assert datetime.date(2024, 8, 14) in dates  # Aug -> earlier year


def test_null_scores_and_points(cleaned):
    by_date = {r["date"]: r for r in cleaned}
    m = by_date["2 Feb 2025"]
    assert m["home_score"] is None and m["away_score"] is None
    assert m["result_home"] == 0 and m["result_away"] == 0  # NULL -> loss both
    w = by_date["25 Jan 2025"]
    assert (w["result_home"], w["result_away"]) == (3, 0)
    d = by_date["14 Aug 2024"]
    assert (d["result_home"], d["result_away"]) == (1, 1)


def test_sequential_ids_deterministic(cleaned):
    ordered = sorted(cleaned, key=lambda r: r["id"])
    assert [r["id"] for r in ordered] == [1, 2, 3, 4]
    # order: match_date asc, home_team asc
    assert [r["date"] for r in ordered] == [
        "14 Aug 2024", "5 Oct 2024", "25 Jan 2025", "2 Feb 2025",
    ]


def test_league_standings_golden(spark):
    raw = spark.createDataFrame(RAW_ROWS, MATCH_RAW)
    clean = clean_matches(raw, 2024, "2025-03-01", "2025-03-01 09:00:00")
    rows = {r["club"]: r for r in league_standings(clean).collect()}

    a = rows["Arsenal"]  # win + draw + NULL-loss
    assert (a["match"], a["win"], a["draw"], a["loss"]) == (3, 1, 1, 1)
    assert (a["goal_for"], a["goal_against"], a["points"], a["goal_diff"]) == (2, 1, 4, 1)

    l = rows["Leeds"]  # NULL-loss + win
    assert (l["match"], l["win"], l["draw"], l["loss"]) == (2, 1, 0, 1)
    assert (l["goal_for"], l["goal_against"], l["points"]) == (2, 0, 3)

    c = rows["Chelsea"]
    assert (c["match"], c["win"], c["draw"], c["loss"]) == (3, 0, 1, 2)
    assert (c["points"], c["goal_diff"]) == (1, -3)

    # rank ids: points DESC -> Arsenal(4), Leeds(3), Chelsea(1)
    assert (rows["Arsenal"]["id"], rows["Leeds"]["id"], rows["Chelsea"]["id"]) == (1, 2, 3)
    assert all(r["created_at"] == "2025-03-01 09:00:00" for r in rows.values())


def test_goal_against_desc_tiebreak(spark):
    """Reference quirk: equal points/goal_for -> HIGHER goal_against ranks first."""
    rows = [
        ("Sa 1 Feb", "A", "1 - 0", "B", "l1"),  # A: win 1-0
        ("Sa 8 Feb", "C", "1 - 0", "D", "l1"),  # C: win 1-0
        ("Sa 15 Feb", "B", "1 - 1", "A", "l1"), # A draw, ga+=1
        ("Sa 22 Feb", "D", "0 - 0", "C", "l1"), # C draw, ga+=0
    ]
    # A: win+draw, gf=2, ga=1, pts=4 | C: win+draw, gf=1, ga=0, pts=4
    # goal_for DESC decides here (A first); make goal_for equal instead:
    rows[2] = ("Sa 15 Feb", "B", "0 - 0", "A", "l1")  # A: gf=1, ga=0
    rows[3] = ("Sa 22 Feb", "D", "1 - 1", "C", "l1")  # C: gf=2, ga=1
    # now A: gf=1 ga=0 pts=4; C: gf=2 ga=1 pts=4 -> goal_for DESC: C first.
    # Equalize goal_for, differ goal_against:
    rows = [
        ("Sa 1 Feb", "A", "2 - 1", "B", "l1"),  # A win, gf2 ga1
        ("Sa 8 Feb", "C", "2 - 0", "D", "l1"),  # C win, gf2 ga0
    ]
    raw = spark.createDataFrame(rows, MATCH_RAW)
    clean = clean_matches(raw, 2024, "2025-03-01", "x")
    ranked = {r["club"]: r["id"] for r in league_standings(clean).collect()}
    # A and C: pts=3, gf=2; goal_against 1 vs 0 -> DESC puts A (ga=1) first
    assert ranked["A"] < ranked["C"]
