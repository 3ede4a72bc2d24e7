"""Skew handling proven with skewed DATA, not a conf reference.

VERDICT r5 item 7: the 100 TB claims leaned on
``spark.sql.adaptive.skewJoin.enabled`` without ever feeding a
genuinely skewed key. These tests generate a zipfian fact table
(~30% of a million rows on one key, queries/skew_q.py) and pin:

1. the AQE skew-join split ENGAGES on the hot partition of a big-big
   sort-merge join (thresholds lowered to make the production rule
   fire at test bytes — the same test-scale trick as the runtime
   bloom-filter plan test), with results exactly equal to an
   independently computed expectation;
2. hot-key AGGREGATION needs no split at all: map-side partial
   aggregation bounds every map task's shuffle output by |keys|,
   which is the standings/per-source-cap story.

The third skew shape — dedup band self-joins, where a hot bucket is
quadratic in OUTPUT and no partition split can save it — is bounded
upstream by exact-dedup-first plus the ``max_df``/``max_bucket`` caps,
pinned in tests/test_dedup.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineer_8_final_project_spark.queries import skew_q


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture
def skew_confs(spark):
    """Scale the AQE skew thresholds down to test bytes, restore after.

    At the defaults the split needs a >256 MB partition — correct at
    cluster scale, unreachable in a test. Execution happens INSIDE the
    pinned window (the test forces its actions before restore), so
    nothing leaks to later tests."""
    confs = {
        # hot partition (~300k rows with 32-byte payloads ≈ 13 MB
        # shuffled) must clear this…
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2097152",
        # …and get carved into advisory-sized chunks
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1048576",
        # the test session runs 4 shuffle partitions (speed); at 4 the
        # hot key shares a partition with a quarter of the cold keys
        # and the skew RATIO (5x median) never trips — production-width
        # partitioning is part of the scenario being modeled
        "spark.sql.shuffle.partitions": "32",
        # both broadcast paths off: the point is the shuffle-join shape
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_big_join(skew_confs):
    spark = skew_confs
    fact = skew_q.zipf_fact(spark)  # 1e6 rows, ~30% on user_key 0
    dim = skew_q.user_dim(spark, 2_000_000)
    agg = fact.join(dim, "user_key").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("w").alias("w_sum"),
        F.sum(F.length("payload")).alias("payload_bytes"),
    )
    # collect() executes THIS frame's queryExecution (first() would run
    # a separate limit-plan and leave agg's adaptive plan unfinalized)
    row = agg.collect()[0]

    # every fact key exists in the dim → the join is row-preserving,
    # and every payload crossed the shuffle intact
    assert row["n_rows"] == skew_q.N_FACT
    assert row["payload_bytes"] == 32 * skew_q.N_FACT
    # w is a pure function of user_key, so the expected sum is
    # computable WITHOUT the join — an independent oracle for the result
    expected = fact.select(
        F.sum((F.col("user_key") * skew_q._WEIGHT_MULT) % 1000).alias("s")
    ).first()["s"]
    assert row["w_sum"] == expected

    plan = _executed(agg)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    # AQEShuffleRead marks split partitions as "skewed" in the final
    # adaptive plan; the join node itself also flags isSkewJoin
    assert "skewed" in plan, plan


def test_hot_key_aggregation_bounded_by_partial_agg(spark):
    """The standings/per-source shape: groupBy on a 30%-hot key. No
    split needed — partial aggregation means each map task ships at
    most |keys| rows, so the hot key costs the reduce side ONE row per
    map task, not 30% of the table."""
    fact = skew_q.zipf_fact(spark)
    agg = fact.groupBy("user_key").agg(F.count(F.lit(1)).alias("n"))
    rows = {r["user_key"]: r["n"] for r in agg.collect()}

    assert sum(rows.values()) == skew_q.N_FACT
    # the hot key really is hot: ~30% of mass within binomial noise
    assert abs(rows[0] / skew_q.N_FACT - skew_q.HOT_PCT / 100) < 0.01
    # every cold key carries ~1/1000 of the remainder — no second mode
    cold = [n for k, n in rows.items() if k != 0]
    assert max(cold) < 2 * min(cold)

    plan = _executed(agg)
    # map-side combine: a partial_count aggregate BELOW the exchange
    assert "partial_count" in plan, plan
    exchange_pos = plan.find("Exchange hashpartitioning(user_key")
    partial_pos = plan.find("partial_count")
    assert exchange_pos != -1 and partial_pos > exchange_pos, plan
