"""Streaming ingest + windowed aggregation over the ``events`` table.

The reference *declares* a Kafka → Spark streaming leg but ships no
consumer (reference Makefile:149-179 creates topics, runs a Faker
producer and a spark-submit consumer whose scripts are absent; the
Kafka jars are baked into the image at reference
docker/Dockerfile.spark:7-11). Semantics are therefore OUR choice
(SURVEY.md §2.9 T3): JSON payload decode → event-time tumbling-window
aggregation, mirroring the batch aggregation surface.

Determinism rules (SURVEY.md §7 risk c): tests and registered queries
replay the parquet fixture with ``availableNow`` — never wall-clock
triggers; the windowed aggregation runs in ``complete`` output mode so
every window emits at end-of-replay and the result equals the batch
``groupBy(window(...))`` over the same rows — giving the streaming
query a full-strength DuckDB oracle.

Kafka wiring (T1): the same pipeline runs against a live topic by
swapping the source — ``spark.readStream.format("kafka")`` + the JSON
decode below; gated behind an option since the test container has no
broker.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import EVENT_PROPS, EVENTS, EVENTS_RAW_NANOS

_sink_ids = itertools.count()


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming source over the events fixture (explicit schema, 1-file micro-batches)."""
    # The streaming file source requires a directory; glob-filter the
    # events file out of the fixture dir. ts arrives as INT64 nanos
    # (schemas.EVENTS_RAW_NANOS) → truncate to µs.
    raw = (
        spark.readStream.schema(EVENTS_RAW_NANOS)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # integral div — float division drifts ±1µs on epoch-nanos > 2^53
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def from_kafka(spark: SparkSession, bootstrap: str, topic: str) -> DataFrame:
    """Kafka source variant (T1): value is the JSON-encoded event row.

    Requires the spark-sql-kafka package on the classpath; not used in
    tests (no broker in the container) — the parquet replay above
    exercises identical downstream logic.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), EVENTS).alias("e")
    ).select("e.*")


def hourly_window_agg(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type (T3 semantics).

    Works identically on a batch or streaming DataFrame — the batch
    form is the oracle for the streaming form.
    """
    k = F.from_json("props", EVENT_PROPS).getField("k").cast("long")
    return (
        events.withColumn("k", k)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.sum("k").alias("sum_k"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "sum_k",
        )
    )


def sliding_window_agg(events: DataFrame) -> DataFrame:
    """1-hour windows sliding every 30 minutes per event_type.

    Each event lands in exactly two windows (window length / slide);
    Spark materializes the duplication inside the window operator —
    shuffle volume is rows × overlap, the standard sliding cost. Works
    on batch and streaming inputs alike.
    """
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def run_available_now(agg: DataFrame, output_mode: str = "complete") -> DataFrame:
    """Drive a streaming aggregation to completion; return the batch result.

    ``availableNow`` processes every pending file then terminates —
    deterministic replay, no wall clock. The memory sink holds the
    final state; a fresh sink name per call keeps reruns independent.
    """
    spark = agg.sparkSession
    name = f"stream_sink_{next(_sink_ids)}"
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def streaming_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: stream replay → windowed agg → final table."""
    agg = hourly_window_agg(read_events_stream(spark, sf_dir))
    return run_available_now(agg).orderBy("window_start", "event_type")


def stream_to_parquet_exactly_once(
    stream_df: DataFrame, path: str, checkpoint_dir: str
) -> None:
    """foreachBatch parquet sink with replay-safe (exactly-once) writes.

    Each micro-batch lands in its own ``_epoch=<id>`` partition with
    dynamic partition overwrite, so a batch replayed after a crash
    overwrites its own partition instead of appending duplicates; the
    checkpoint tracks which source files each epoch consumed. This is
    the durable-sink counterpart of the memory sink used by tests —
    same pipeline, exactly-once into the lake.
    """

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        (
            df.withColumn("_epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .partitionBy("_epoch")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(path)
        )

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
