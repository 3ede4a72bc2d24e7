"""The reference's scalar-function surface as named Column builders.

One builder per SURVEY.md §2.8 entry (F1–F12), each a pure
``Column → Column`` expression over ``pyspark.sql.functions`` — JVM-side,
whole-stage-codegen friendly, zero Python UDFs (§2.10 design rule).
The cleaning pipeline (operators/cleaning.py) composes these; the
scalar query set (queries/scalar.py) exposes them to the oracle harness.

Reference citations: dags/projectde_dag.py lines noted per function.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: F2 — day-code → full day name (reference :68-76).
DAY_NAMES = {
    "Sa": "Saturday",
    "Su": "Sunday",
    "Mo": "Monday",
    "Tu": "Tuesday",
    "We": "Wednesday",
    "Th": "Thursday",
    "Fr": "Friday",
}

#: F4 — months belonging to the season's later calendar year (reference :82-83).
LATER_YEAR_MONTHS = ("Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul")


def day_code(date_col: Column | str) -> Column:
    """F1: leading day code of ``'Sa 25 Jan'`` → ``'Sa'`` (reference :67)."""
    return F.substring_index(date_col, " ", 1)


def date_remainder(date_col: Column | str) -> Column:
    """F1+F3: rest of the split, stripped → ``'25 Jan'`` (reference :67,79)."""
    return F.trim(F.substring_index(date_col, " ", -2))


def day_name(code: Column | str) -> Column:
    """F2: dictionary map with passthrough default (reference :68-76)."""
    day_map = F.create_map(*[F.lit(x) for kv in DAY_NAMES.items() for x in kv])
    return F.coalesce(day_map[F.col(code) if isinstance(code, str) else code], F.col(code) if isinstance(code, str) else code)


def season_year(month: Column | str, season_start_year: int) -> Column:
    """F4: Jan–Jul → later season year, else start year (reference :82-83)."""
    m = F.col(month) if isinstance(month, str) else month
    return F.when(m.isin(*LATER_YEAR_MONTHS), F.lit(season_start_year + 1)).otherwise(
        F.lit(season_start_year)
    )


def compose_date_str(rest: Column, year: Column) -> Column:
    """F5: ``'{d} {Mon} {yyyy}'`` concat (reference :86)."""
    return F.concat_ws(" ", rest, year)


def parse_match_date(date_str: Column | str) -> Column:
    """F6+P4: ``'d MMM yyyy'`` parse, NULL on failure (reference :90)."""
    c = F.col(date_str) if isinstance(date_str, str) else date_str
    return F.try_to_timestamp(c, F.lit("d MMM yyyy")).cast("date")


def score_part(score: Column | str, idx: int) -> Column:
    """F7: ``'2 - 1'`` → int at ``idx``, NULL when malformed (reference :100-102)."""
    return F.get(F.split(score, " - "), idx).try_cast("int")


def match_points(gf: Column, ga: Column) -> Column:
    """F8/A4: 3/1/0 points; NULL comparisons fall through to 0 (reference :128-129)."""
    return F.when(gf > ga, 3).when(gf == ga, 1).otherwise(0).cast("int")


def goal_diff(gf: Column, ga: Column) -> Column:
    """F11: goal difference (reference :229)."""
    return gf - ga


def frozen_created_at(created_at: str) -> Column:
    """F10 made deterministic: the reference stamps now() in Asia/Jakarta
    (reference :120-122); the engine takes the timestamp as a parameter
    so verified queries never read the wall clock (FIXTURES.md rules)."""
    return F.lit(created_at)
