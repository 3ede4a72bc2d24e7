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


def profile(
    df: DataFrame, cols: list[tuple[str, str]], approx: bool = False, rsd: float = 0.05
) -> DataFrame:
    """Profile ``cols`` = [(column, kind)] → one row per column:
    (column_name, n_rows, n_null, n_distinct, min_value, max_value).

    ``approx=True`` is the 100 TB arm: ``n_distinct`` comes from
    HyperLogLog++ (``approx_count_distinct`` at ``rsd``) — one pass,
    mergeable sketches, NO Expand fan-out — instead of the exact
    multi-distinct. Everything else (nulls, min/max, canonicalization)
    is identical. Error bound pinned by
    tests/test_approx_arms.py::test_profile_approx_distinct_within_rsd.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in cols:
        canon = CANON[kind]
        dist = (
            F.approx_count_distinct(F.col(c), rsd=rsd)
            if approx
            else F.countDistinct(F.col(c))
        )
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"null__{c}"),
            dist.alias(f"dist__{c}"),
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


def mad_outlier_stats(
    events: DataFrame,
    k_mad: str = "4.4478",
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
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
    ``approx=True`` is that swap, EXECUTED: both medians come from
    ``percentile_approx`` at ``accuracy`` (KLL-style mergeable
    sketches, one aggregation pass each, no per-type total sort; rank
    error ≤ n/accuracy, bound pinned by
    tests/test_approx_arms.py::test_mad_approx_within_rank_band). The
    exact rank form stays registered because the oracle replays it
    value-for-value.
    """
    from pyspark.sql import Window

    e = events.select("event_type", "event_id", "value")
    if approx:
        med = e.groupBy("event_type").agg(
            F.percentile_approx("value", 0.5, accuracy).alias("med")
        )
        dev = e.join(F.broadcast(med), "event_type").withColumn(
            "ad", F.abs(F.col("value") - F.col("med"))
        )
        mad = dev.groupBy("event_type").agg(
            F.percentile_approx("ad", 0.5, accuracy).alias("mad")
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


def conversion_latency_stats(
    events: DataFrame, approx: bool = False, accuracy: int = 10000
) -> DataFrame:
    """View→purchase conversion latency distribution per first-touch
    channel → (first_channel, n_users, p50_s, p90_s).

    Exact arm (the registered/oracled form): latencies are exact
    integer microseconds; p50/p90 are NEAREST-RANK selections
    ((lat_us, user_id) tiebreak, one picked row, zero interpolation)
    so the strict hash replays on any engine.

    ``approx=True`` is the 100 TB swap, EXECUTED: the channel-keyed
    rank window (a per-channel total sort over every converting user)
    is replaced by ``percentile_approx`` sketches — one aggregation,
    mergeable, rank error ≤ n/accuracy (bound pinned by
    tests/test_approx_arms.py::test_conversion_latency_approx_within_rank_band).

    Scale shape either way: two user-keyed aggregations (firsts +
    first event) joined on user_id; only the final percentile step
    differs.
    """
    from pyspark.sql import Window

    e = events.select("user_id", "ts", "event_id", "event_type")
    us = F.unix_micros(F.col("ts"))
    # r16: first-view/first-purchase times AND the first-touch channel
    # in ONE user-keyed hash aggregation — the separate row_number
    # window (exchange + sort) and the firsts⋈chan join are gone.
    # ``min_by`` over the (ts, event_id) key is the window's exact
    # order; event_id is tiebreak-complete, so the key has no ties.
    # NULL-key note (ADVICE r16): min_by SKIPS rows whose ordering key
    # is NULL, where the replaced NULLS-FIRST window ranked them first
    # — equivalent only because events.ts is generated NOT NULL
    # (FIXTURES.md; verified 0 NULL ts at every SF). A nullable-ts
    # source needs an explicit coalesce/filter decision here.
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("v_us"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("p_us"),
        F.min_by(
            "event_type", F.struct(F.col("ts").alias("t"), F.col("event_id").alias("e"))
        ).alias("first_channel"),
    )
    lat = (
        firsts
        .filter(
            F.col("v_us").isNotNull()
            & F.col("p_us").isNotNull()
            & (F.col("p_us") > F.col("v_us"))
        )
        .select(
            "first_channel",
            "user_id",
            (F.col("p_us") - F.col("v_us")).cast("long").alias("lat_us"),
        )
    )
    if approx:
        return (
            lat.groupBy("first_channel")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_users"),
                (
                    F.round(F.percentile_approx("lat_us", 0.5, accuracy) / 1000000.0, 3)
                    + 0.0
                ).alias("p50_s"),
                (
                    F.round(F.percentile_approx("lat_us", 0.9, accuracy) / 1000000.0, 3)
                    + 0.0
                ).alias("p90_s"),
            )
            .orderBy("first_channel")
        )
    wr = Window.partitionBy("first_channel").orderBy("lat_us", "user_id")
    wn = Window.partitionBy("first_channel")
    ranked = lat.select(
        "first_channel",
        "lat_us",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def near_rank(p: str):
        sel = F.when(
            F.col("rn") == F.ceil(F.lit(p).cast("double") * F.col("n")),
            F.col("lat_us"),
        )
        return F.round(F.min(sel) / 1000000.0, 3) + 0.0

    return (
        ranked.groupBy("first_channel")
        .agg(
            F.min("n").cast("long").alias("n_users"),
            near_rank("0.5").alias("p50_s"),
            near_rank("0.9").alias("p90_s"),
        )
        .orderBy("first_channel")
    )


def rolling_wau(events: DataFrame, approx: bool = False, rsd: float = 0.05) -> DataFrame:
    """DAU + TRUE rolling 7-day active users → (day, dau, wau).

    Exact arm (the registered/oracled form): each distinct (user, day)
    fans out to the ≤7 window ends it belongs to and each window end
    takes an exact COUNT(DISTINCT) — bounded fan-out, never the
    double-counting of a rolling SUM of DAU.

    ``approx=True`` is the 100 TB swap, EXECUTED: the per-window-end
    distinct becomes an HLL++ sketch (``approx_count_distinct`` at
    ``rsd``) — mergeable, one pass over the same bounded fan-out, no
    exact-distinct shuffle of user ids per window (error bound pinned
    by tests/test_approx_arms.py::test_rolling_wau_approx_within_rsd).
    """
    ud = (
        events.select(
            "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
        )
        .distinct()
    )
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 6))).alias("win_end"),
    )
    wau_agg = (
        F.approx_count_distinct("user_id", rsd=rsd)
        if approx
        else F.countDistinct("user_id")
    )
    wau = contrib.groupBy("win_end").agg(wau_agg.cast("long").alias("wau"))
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    return (
        dau.join(wau, dau["d"] == wau["win_end"])
        .select(F.col("d").cast("timestamp").alias("day"), "dau", "wau")
        .orderBy("day")
    )
