"""One-pass table profiling: per-column null / distinct / min / max.

The ``ANALYZE``-shaped primitive every warehouse exposes and every
ingest pipeline runs before trusting a new drop: one row per column
with row count, null count, exact distinct count, and canonicalized
min/max. The whole profile is ONE aggregation over ONE scan — adding a
column adds expressions to the existing agg, never another pass — and
the wide 1-row result unpivots to (column, stats) rows with ``stack``
(driver-side-free, though at one row it hardly matters).

Exact ``COUNT(DISTINCT)`` over k columns plans as Spark's Expand (k
rows emitted per input row, partial-aggregated map-side before the
shuffle) — the standard one-pass multi-distinct trade. At 100 TB the
profile swaps to ``approx_count_distinct`` (HLL, one pass, no Expand;
accuracy path covered by tests/test_approx.py) — the exact form is
registered because the oracle can replay it value-for-value.

Min/max are canonicalized to strings per declared kind so the profile
of a heterogeneous table fits one schema AND two engines render the
same bytes: ints plainly, money via DECIMAL(18,2) (fixed scale →
'1234.50' on both), timestamps via DATE, strings as-is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: kind -> SQL template canonicalizing a min/max value to VARCHAR;
#: identical text on the Spark and DuckDB sides.
CANON = {
    "int": "CAST({v} AS STRING)",
    "str": "{v}",
    "money": "CAST(CAST(ROUND({v}, 2) AS DECIMAL(18,2)) AS STRING)",
    "ts": "CAST(CAST({v} AS DATE) AS STRING)",
}


def profile(df: DataFrame, cols: list[tuple[str, str]]) -> DataFrame:
    """Profile ``cols`` = [(column, kind)] → one row per column:
    (column_name, n_rows, n_null, n_distinct, min_value, max_value)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in cols:
        canon = CANON[kind]
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"null__{c}"),
            F.countDistinct(F.col(c)).alias(f"dist__{c}"),
            F.expr(canon.format(v=f"MIN({c})")).alias(f"min__{c}"),
            F.expr(canon.format(v=f"MAX({c})")).alias(f"max__{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', null__{c}, dist__{c}, min__{c}, max__{c}" for c, _ in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, n_null, n_distinct, min_value, max_value)",
        "n_rows",
    ).select("column_name", "n_rows", "n_null", "n_distinct", "min_value", "max_value")
