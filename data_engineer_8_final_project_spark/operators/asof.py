"""As-of (backward) join — an operator Spark lacks natively.

``asof_backward_join(left, right, key, ts)``: for every left row, the
latest right row of the same key with ``right.ts <= left.ts`` (DuckDB's
``ASOF LEFT JOIN``, pandas' ``merge_asof`` with direction='backward').

Spark-first formulation — NOT a per-group ``merge_asof`` pandas UDF:
tag both inputs, union them, and carry the most recent right-side
payload forward with ``last(ignorenulls)`` over a (key, time)-ordered
running window; left rows then read the carried struct. Cost is ONE
shuffle on the key (the window sort) over |L|+|R| rows — no join
explosion, no range-bucketing heuristics, and skew follows the same
AQE story as any windowed aggregation. At equal timestamps the right
row sorts first (side 0 < side 1), giving inclusive ``<=`` semantics
identical to DuckDB ASOF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_backward_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    order_col: str,
    carry_prefix: str = "asof_",
) -> DataFrame:
    """Left rows + the carried columns of the latest right row at-or-
    before their timestamp (NULL struct fields when none exists).

    ``order_col`` must totally order rows within (key, ts, side) — any
    unique id; required so the carried row is deterministic even if a
    side ever has timestamp ties. Right columns come back prefixed with
    ``carry_prefix``.
    """
    r_struct = F.struct(*[F.col(c) for c in right.columns])
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.col(order_col).alias("_ord"),
        F.lit(0).alias("_side"),
        r_struct.alias("_r"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{left.schema[c].dataType.simpleString()}" for c in left.columns) + ">"
        ).alias("_l"),
    )
    l_struct = F.struct(*[F.col(c) for c in left.columns])
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.col(order_col).alias("_ord"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in right.columns) + ">"
        ).alias("_r"),
        l_struct.alias("_l"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_ord")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        r_tagged.unionByName(l_tagged)
        .withColumn("_last_r", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns] + [
        F.col(f"_last_r.{c}").alias(f"{carry_prefix}{c}") for c in right.columns
    ]
    return carried.select(*out_cols)
