"""Skew-mitigation operators (SURVEY.md §4 scale rules: salting).

AQE's skew-join splitting (enabled by the session factory) covers
joins; this module covers the aggregation side. The motivating case:
``COUNT(DISTINCT v) GROUP BY k`` where one hot key holds a large share
of all rows. Partial aggregation cannot collapse distinct-counting
map-side (every distinct value must survive to the reducer), so the hot
key's reducer receives ~all of its rows — the classic straggler.

``salted_count_distinct`` two-levels it: salt = ``hash(v) % n_salts``
sends each DISTINCT VALUE of the hot key to exactly one of n buckets,
so per-bucket distinct counts are disjoint and their SUM is the exact
answer — correctness by construction, no approximation — while the hot
key's work spreads over ``n_salts`` reducers. The salt derives from the
value (deterministic), never ``rand()`` (FIXTURES.md determinism rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    n_salts: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per group, skew-spread over n_salts.

    Level 1 shuffles on (group..., salt) — the hot group fans out over
    ``n_salts`` partitions; level 2 shuffles ``groups × n_salts`` tiny
    rows. Identical result to the direct distinct count at any data.
    """
    salt: Column = F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts))
    per_bucket = (
        df.select(*group_cols, F.col(value_col), salt.alias("_salt"))
        .groupBy(*group_cols, "_salt")
        .agg(F.countDistinct(value_col).alias("_bucket_distinct"))
    )
    return (
        per_bucket.groupBy(*group_cols)
        .agg(F.sum("_bucket_distinct").cast("long").alias(out_col))
    )
