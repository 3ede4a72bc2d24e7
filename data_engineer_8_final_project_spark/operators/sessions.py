"""Gap-based sessionization + bucketed range join.

``sessionize`` turns an event stream into per-user sessions (a new
session starts after ``gap_minutes`` of inactivity). ``bucketed_range
_join`` is the scale-path point-in-interval join Spark lacks natively:
bucketize time into fixed steps, explode each interval over the buckets
it overlaps, equi-join points on (key, bucket), then filter the exact
containment predicate. Each point has exactly ONE bucket, so a point
matches an interval at most once — no post-join dedup. Shuffle volume
is |points| + |intervals| × avg-buckets-per-interval, vs. the
unbounded fallback of a broadcast-nested-loop theta join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_sessions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-EVENT session numbering: input rows + a ``session_no``
    column (1-based per user, new session after ``gap_minutes`` of
    inactivity). One shuffle on user_id; (ts, event_id) is the
    tiebreak-complete ordering. Shared by the session rollup and the
    path miner."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap_us = us - F.lag(us).over(w)
    new_s = F.when(gap_us.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    return events.withColumn(
        "session_no", F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Events → (user_id, session_no, session_start, session_end,
    n_events, sum_value) with integer-cents value totals.

    One shuffle on user_id shared by the lag window, the running-sum
    numbering, and the session rollup; (ts, event_id) is the
    tiebreak-complete ordering.
    """
    sessioned = assign_sessions(events, gap_minutes)
    return (
        sessioned.groupBy("user_id", F.col("session_no").cast("long").alias("session_no"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.expr("CAST(round(value * 100) AS LONG)")) / F.lit(100.0)).alias(
                "sum_value"
            ),
        )
    )


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    ts: str,
    start: str,
    end: str,
    step_minutes: int = 30,
    closed: str = "both",
) -> DataFrame:
    """Rows of ``points`` joined to every same-key interval containing
    their timestamp. Columns of both inputs survive; name collisions
    other than ``key`` must be resolved by the caller.

    ``closed="both"`` keeps the inclusive ``[start, end]`` bounds (the
    session-containment semantics); ``closed="left"`` gives half-open
    ``[start, end)`` — the SCD2 / validity-interval semantics where a
    point landing exactly on a boundary belongs to the NEXT interval,
    never to two.
    """
    if closed not in ("both", "left"):
        raise ValueError(f"closed must be 'both' or 'left', got {closed!r}")
    step_us = step_minutes * 60 * 1_000_000
    # integral div (not float / + cast): epoch-micros exceed 2^53 ÷
    # nothing, but the bucket math must be exact, not rounded
    p = points.withColumn("_b", F.expr(f"unix_micros({ts}) div {step_us}"))
    i = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros({start}) div {step_us}"),
                F.expr(f"unix_micros({end}) div {step_us}"),
            )
        ),
    )
    upper = (
        F.col(ts) <= F.col(end) if closed == "both" else F.col(ts) < F.col(end)
    )
    return (
        p.join(i, [key, "_b"])
        .filter((F.col(ts) >= F.col(start)) & upper)
        .drop("_b")
    )
