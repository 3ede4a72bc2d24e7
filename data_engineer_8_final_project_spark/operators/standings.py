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

Spark-first shape: the O(n²) Python accumulator becomes unpivot →
partial+final hash aggregation with whole-stage codegen; the six serial
league chains become one DataFrame partitioned by league. Dimension
joins (nation, region, supplier) are broadcast — they stay small at any
scale factor; the orders/customer joins shuffle on their keys and AQE
picks strategy at runtime.
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
    nation: DataFrame,
) -> DataFrame:
    """Synthesize the match table: one row per lineitem.

    Columns: home_club, away_club, home_score, away_score (scores
    nullable — the malformed-score analogue).
    """
    cust_nation = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("home_club")
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("away_club")
    )
    malformed = (F.col("l_orderkey") % NULL_SCORE_MOD) == 0
    return (
        lineitem.select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn_key"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            "home_club",
            "away_club",
            F.when(malformed, F.lit(None).cast("long"))
            .otherwise((F.col("l_orderkey") + F.col("l_linenumber")) % SCORE_MOD)
            .alias("home_score"),
            F.when(malformed, F.lit(None).cast("long"))
            .otherwise((F.col("l_partkey") + F.col("l_suppkey")) % SCORE_MOD)
            .alias("away_score"),
        )
    )


def standings_from_matches(match_df: DataFrame, nation: DataFrame, region: DataFrame) -> DataFrame:
    """Standings table from a match table — the A3+O1+W2 core.

    Unpivot (home leg ∪ away leg) → conditional hash agg → points →
    league join → 6-key DESC sort → row_number id per league.
    """
    home_leg = match_df.select(
        F.col("home_club").alias("club"),
        F.col("home_score").alias("gf"),
        F.col("away_score").alias("ga"),
    )
    away_leg = match_df.select(
        F.col("away_club").alias("club"),
        F.col("away_score").alias("gf"),
        F.col("home_score").alias("ga"),
    )
    legs = home_leg.unionByName(away_leg)

    gf, ga = F.col("gf"), F.col("ga")
    agg = legs.groupBy("club").agg(
        F.count(F.lit(1)).alias("played"),
        F.sum(F.when(gf > ga, 1).otherwise(0)).alias("win"),
        F.sum(F.when(gf == ga, 1).otherwise(0)).alias("draw"),
        # NULL comparisons are not-true → falls to the loss branch for
        # both clubs (reference quirk, dags/projectde_dag.py:180-181).
        F.sum(F.when(gf > ga, 0).when(gf == ga, 0).otherwise(1)).alias("loss"),
        F.coalesce(F.sum("gf"), F.lit(0)).alias("goal_for"),
        F.coalesce(F.sum("ga"), F.lit(0)).alias("goal_against"),
    )
    agg = agg.withColumn("points", F.lit(3) * F.col("win") + F.col("draw"))

    league = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_name").alias("club_name"), F.col("r_name").alias("league"))

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
        agg.join(F.broadcast(league), F.col("club") == F.col("club_name"))
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
