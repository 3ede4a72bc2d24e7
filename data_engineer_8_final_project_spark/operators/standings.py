"""Flagship operator: league-standings conditional aggregation.

Re-hosts the reference's standings pipeline (the imperative accumulator
at reference dags/projectde_dag.py:159-229: per-club match/win/draw/
loss/goal_for/goal_against/points rollup over the union of home-leg and
away-leg appearances, 6-key descending sort at :224-225, sequential id
at :226-228) onto the driver fixture star schema:

- a *match* is a lineitem row: home club = the ordering customer's
  nation, away club = the supplying supplier's nation;
- *league* = the region of the club's nation (the reference's per-league
  fan-out, reference dags/projectde_dag.py:275-286, becomes a partition
  column — SURVEY.md §3.1);
- *scores* are deterministic small ints derived from keys; ~2.7% of
  matches (``l_orderkey % 37 == 0``) get NULL scores, modelling the
  reference's unparseable ``'pp.'`` score strings
  (reference dags/projectde_dag.py:100-102).

Reference-quirk fidelity (SURVEY.md §4):

- a NULL-score match falls through to the *loss* branch for BOTH clubs
  (pandas NaN comparisons are all False → ``else: loss += 1``,
  reference dags/projectde_dag.py:180-181,207-208); NULL goals add 0;
- the tiebreak sorts ``goal_against`` DESCENDING too (the reference's
  semantic quirk at dags/projectde_dag.py:224-225);
- one deviation, required for determinism under shuffles: ``club ASC``
  is appended as the final tiebreak so ``row_number`` is reproducible
  (the reference inherited pandas insertion order — non-reproducible).

Scale design (the part that must survive 100 TB):

- The naive formulation (unpivot home/away legs with a UNION, then
  aggregate) makes Catalyst execute the scan+join tree TWICE — once per
  leg. Instead we aggregate FIRST on the (home_nation, away_nation)
  integer key pair — at most 25×25 = 625 groups, so the map-side
  partial aggregation collapses ~everything and the shuffle moves a few
  hundred rows regardless of input size — and unpivot/re-aggregate the
  tiny pair-level aggregate. One pass over lineitem, one micro-shuffle.
- Win/draw/loss survive the two-level split because per pair we keep
  (n, n_home_win, n_draw, n_null): home leg derives loss =
  n − win − draw (NULL rows land there, matching the quirk), away leg
  symmetrically with away wins = n − n_home_win − n_draw − n_null.
- Only the genuinely-bounded dims (nation 25, region 5) get broadcast
  hints; customer/supplier join strategy is left to Catalyst/AQE (they
  grow with SF — hinting them broadcast would be a 100 TB lie).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Matches whose orderkey hits this modulus get NULL scores (malformed-score analogue).
NULL_SCORE_MOD = 37
#: Scores are key-derived ints in [0, SCORE_MOD).
SCORE_MOD = 7


def matches(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,  # noqa: ARG001  (kept for API symmetry; names join later)
) -> DataFrame:
    """Synthesize the match table keyed by nation ids (names joined post-agg).

    Columns: home_key, away_key (nationkeys), home_score, away_score
    (scores nullable — the malformed-score analogue).
    """
    malformed = (F.col("l_orderkey") % NULL_SCORE_MOD) == 0
    return (
        lineitem.select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            customer.select("c_custkey", F.col("c_nationkey").alias("home_key")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            supplier.select("s_suppkey", F.col("s_nationkey").alias("away_key")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "home_key",
            "away_key",
            F.when(malformed, F.lit(None).cast("long"))
            .otherwise((F.col("l_orderkey") + F.col("l_linenumber")) % SCORE_MOD)
            .alias("home_score"),
            F.when(malformed, F.lit(None).cast("long"))
            .otherwise((F.col("l_partkey") + F.col("l_suppkey")) % SCORE_MOD)
            .alias("away_score"),
        )
    )


def pair_rollup(match_df: DataFrame) -> DataFrame:
    """Level 1: per (home_key, away_key) partial rollup.

    ≤ n_nations² groups — the shuffle is tiny at any scale, and the
    same aggregation runs unchanged as a streaming stateful aggregation
    (state = one fixed-width row per nation pair), which is how
    ``standings_stream`` keeps running standings over the replay.
    """
    hs, aw = F.col("home_score"), F.col("away_score")
    pair = match_df.groupBy("home_key", "away_key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(hs > aw, 1).otherwise(0)).alias("n_home_win"),
        F.sum(F.when(hs == aw, 1).otherwise(0)).alias("n_draw"),
        F.sum(F.when(hs.isNull(), 1).otherwise(0)).alias("n_null"),
        F.coalesce(F.sum(hs), F.lit(0)).alias("sum_hs"),
        F.coalesce(F.sum(aw), F.lit(0)).alias("sum_as"),
    )
    # away wins = non-null matches that are neither home wins nor draws
    return pair.withColumn(
        "n_away_win", F.col("n") - F.col("n_home_win") - F.col("n_draw") - F.col("n_null")
    )


def standings_from_pairs(pair: DataFrame, nation: DataFrame, region: DataFrame) -> DataFrame:
    """Level 2: pair aggregate → legs → per-club rollup → rank.

    Input is :func:`pair_rollup` output (a few hundred rows at most),
    from either the batch path or a drained streaming sink.
    """
    home_leg = pair.select(
        F.col("home_key").alias("club_key"),
        F.col("n"),
        F.col("n_home_win").alias("win"),
        F.col("n_draw").alias("draw"),
        # loss = everything else incl. NULL-score matches (reference quirk)
        (F.col("n") - F.col("n_home_win") - F.col("n_draw")).alias("loss"),
        F.col("sum_hs").alias("gf"),
        F.col("sum_as").alias("ga"),
    )
    away_leg = pair.select(
        F.col("away_key").alias("club_key"),
        F.col("n"),
        F.col("n_away_win").alias("win"),
        F.col("n_draw").alias("draw"),
        (F.col("n") - F.col("n_away_win") - F.col("n_draw")).alias("loss"),
        F.col("sum_as").alias("gf"),
        F.col("sum_hs").alias("ga"),
    )
    agg = (
        home_leg.unionByName(away_leg)
        .groupBy("club_key")
        .agg(
            F.sum("n").alias("played"),
            F.sum("win").alias("win"),
            F.sum("draw").alias("draw"),
            F.sum("loss").alias("loss"),
            F.sum("gf").alias("goal_for"),
            F.sum("ga").alias("goal_against"),
        )
        .withColumn("points", F.lit(3) * F.col("win") + F.col("draw"))
    )

    league = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(
        F.col("n_nationkey").alias("club_key2"),
        F.col("n_name").alias("club"),
        F.col("r_name").alias("league"),
    )

    ranked_w = Window.partitionBy("league").orderBy(
        F.desc("points"),
        F.desc("goal_for"),
        F.desc("goal_against"),  # reference quirk: DESC, not ASC
        F.desc("win"),
        F.desc("draw"),
        F.desc("loss"),
        F.asc("club"),  # determinism tiebreak (engine addition)
    )
    return (
        agg.join(F.broadcast(league), F.col("club_key") == F.col("club_key2"))
        .select(
            "league",
            F.row_number().over(ranked_w).cast("long").alias("id"),
            "club",
            "points",
            "played",
            "win",
            "draw",
            "loss",
            "goal_for",
            "goal_against",
            (F.col("goal_for") - F.col("goal_against")).alias("goal_diff"),
        )
        .orderBy("league", "id")
    )


def standings_from_matches(match_df: DataFrame, nation: DataFrame, region: DataFrame) -> DataFrame:
    """Standings from a keyed match table — the A3+O1+W2 core, two-level."""
    return standings_from_pairs(pair_rollup(match_df), nation, region)


def standings(tables: dict[str, DataFrame]) -> DataFrame:
    """End-to-end flagship: fixture tables → standings."""
    m = matches(
        tables["lineitem"],
        tables["orders"],
        tables["customer"],
        tables["supplier"],
        tables["nation"],
    )
    return standings_from_matches(m, tables["nation"], tables["region"])
