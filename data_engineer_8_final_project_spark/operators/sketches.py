"""Mergeable cardinality sketches (KMV / k-minimum-values).

At 100 TB an exact ``COUNT(DISTINCT x)`` per group shuffles every
distinct value; a KMV sketch bounds per-group state to the ``k``
smallest 60-bit hashes, is MERGEABLE (the union of two groups' sketches
contains the sketch of the union — the property that lets per-partition
or per-day sketches roll up without rescanning the data), and estimates
the cardinality as ``(k-1) / h_(k)`` with ~1/sqrt(k) relative error
(Bar-Yossef et al., RANDOM 2002; Beyer et al., SIGMOD 2007 "On synopses
for distinct-value estimation").

Everything is deterministic and engine-portable: the hash is the repo's
60-bit md5 idiom, the sketch is the ``k`` smallest DISTINCT hashes (a
pure function of the value SET, independent of row order, duplication,
and partitioning), and the estimator is plain IEEE-double math — so a
DuckDB oracle replays the estimates value-exact. Scale shape: the
``row_number() <= k`` rank filter is pushed map-side by Spark's
WindowGroupLimit, so only ~k rows per group per partition ride the one
group-keyed exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Hash domain: 15 md5 hex chars = 60 bits, exact in a signed int64 and
#: in an IEEE double (2^60 is a power of two), in BOTH engines.
HASH_SPACE = float(1 << 60)


def hash60(col: Column | str) -> Column:
    """Portable 60-bit integer hash (md5-prefix idiom of the dedup and
    sampling tiers)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def kmv_sketch(df: DataFrame, group: str, value: Column | str, k: int = 64) -> DataFrame:
    """The per-group KMV sketch: the ``k`` smallest distinct 60-bit
    hashes of ``value``, as rows ``(group, h)``.

    Distinct-before-rank is the scale rule: duplicates collapse on the
    (group, h) grouped exchange first, then the rank-``k`` window prunes
    map-side (WindowGroupLimit), so the sketch shuffle carries at most
    ~k rows per group per upstream partition.
    """
    hashed = (
        df.select(F.col(group).alias("g"), hash60(value).alias("h")).distinct()
    )
    w = Window.partitionBy("g").orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(F.col("g").alias(group), "h")
    )


def kmv_estimate(sketch: DataFrame, group: str, k: int = 64) -> DataFrame:
    """Distinct-count estimates from sketch rows ``(group, h)``.

    ``est = n`` when the group holds fewer than ``k`` distinct values
    (the sketch IS the value set), else ``floor((k-1) / (h_(k)/2^60))``
    — the classic KMV estimator on the normalized k-th minimum.
    """
    agg = sketch.groupBy(group).agg(
        F.count("h").alias("sketch_n"), F.max("h").alias("max_h")
    )
    est = F.when(F.col("sketch_n") < k, F.col("sketch_n")).otherwise(
        F.floor(
            F.lit(float(k - 1)) / (F.col("max_h").cast("double") / F.lit(HASH_SPACE))
        )
    )
    return agg.select(
        group,
        F.col("sketch_n").cast("long").alias("sketch_n"),
        est.cast("long").alias("est_distinct"),
    )


def kmv_merge(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Merge all groups' sketches into the global sketch (rows ``(h)``).

    Any hash among the k smallest of the union is among the k smallest
    of its own group, so the union of per-group sketches contains the
    global sketch — take the k smallest distinct hashes of the tiny
    (|groups|·k)-row union. ``orderBy().limit()`` is a TakeOrdered, not
    a global sort.
    """
    return sketch.select("h").distinct().orderBy("h").limit(k)
