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


def mad_outlier_stats(events: DataFrame, k_mad: str = "4.4478") -> DataFrame:
    """Robust per-type outlier screen → (event_type, n_events, med,
    mad, n_outliers): median / median-absolute-deviation and the count
    of values beyond ``k_mad``·MAD (4.4478 ≈ 3σ under normality via the
    1.4826 consistency constant) — the quarantine gate a pipeline runs
    on numeric feeds before trusting aggregates, immune to the very
    outliers it hunts (unlike mean/stddev z-scores).

    Medians are EXPLICIT RANK SELECTIONS, not an engine quantile
    function: row_number over (value, event_id) picks the middle one
    or two rows and averages them — addition of two doubles is
    commutative-exact, so the result is bit-identical everywhere,
    whereas interpolating quantile implementations differ in formula
    ((1−g)·lo + g·hi vs lo + g·(hi−lo)) in the last ulp across
    engines. ``k_mad`` stays a string so both sides parse the SAME
    literal.

    Scale shape: two window passes + one aggregate, all keyed on
    event_type. The key is LOW-CARDINALITY by nature (a handful of
    types), so per-type sort-window work is the bottleneck at 100 TB —
    the documented swap is approx_percentile(0.5) per type (one pass,
    mergeable sketches, no per-type total sort; accuracy path covered
    by tests/test_approx.py); the exact rank form is registered
    because the oracle replays it value-for-value.
    """
    from pyspark.sql import Window

    e = events.select("event_type", "event_id", "value")
    wv = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(wv).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    # middle one (odd n) or two (even n) ranks: (n+1)//2 and (n+2)//2
    med = (
        ranked.filter(
            (F.col("rn") == F.floor((F.col("n") + 1) / 2))
            | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
        )
        .groupBy("event_type")
        .agg(F.avg("value").alias("med"))
    )
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("value") - F.col("med"))
    )
    wa = Window.partitionBy("event_type").orderBy("ad", "event_id")
    dranked = dev.select(
        "event_type",
        "ad",
        F.row_number().over(wa).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    mad = (
        dranked.filter(
            (F.col("rn") == F.floor((F.col("n") + 1) / 2))
            | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
        )
        .groupBy("event_type")
        .agg(F.avg("ad").alias("mad"))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (F.round(F.min("med"), 4) + 0.0).alias("med"),
            (F.round(F.min("mad"), 4) + 0.0).alias("mad"),
            F.sum(
                F.when(F.col("ad") > F.expr(f"{k_mad} * mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )
