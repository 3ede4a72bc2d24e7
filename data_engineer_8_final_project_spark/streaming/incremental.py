"""Incremental materialized-view maintenance (foreachBatch + partition overwrite).

The 100 TB pattern this encodes: a rollup (here: hourly event counts)
that is far too expensive to recompute from the full log on every
refresh. Structured Streaming's ``update`` output mode emits ONLY the
windows changed by each micro-batch; ``foreachBatch`` lands those rows
with dynamic partition overwrite, so each refresh rewrites just the
touched hour partitions of the materialized view — cost proportional
to the new data, not the table.

Idempotence comes from the partition-overwrite write mode itself: a
replayed micro-batch rewrites the same partitions with the same
content (counts are over checkpointed state, not the landed files), so
crash/retry cannot double-count — the same exactly-once argument as
the epoch-tagged parquet sink (events.stream_to_parquet_exactly_once),
but for an *aggregated* sink where blind append would be wrong.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import events as ev


def maintain_hourly_counts(
    spark: SparkSession, sf_dir: str, view_path: str, checkpoint: str
) -> None:
    """One incremental refresh of the hourly-counts materialized view.

    Reads whatever files are new since the checkpoint (availableNow),
    updates the windowed aggregation state, and overwrites exactly the
    hour partitions the new rows touched. Calling this again after more
    files arrive refreshes the view incrementally.
    """
    # No watermark, deliberately: with one the state for closed windows
    # is evicted and a later refresh carrying late rows would silently
    # under-count them. Here the state IS the materialized view — one
    # row per (hour, event_type), growing with the rollup's own
    # cardinality, not with event volume — so unbounded retention is
    # the correct (and cheap) choice; arbitrarily late data always
    # folds into its window.
    agg = (
        ev.read_events_stream(spark, sf_dir, path_glob=None)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # round-then-cast: the repo-wide cents convention (a bare
            # cast truncates, e.g. 1.13*100 = 112.999... -> 112)
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd-HH").alias("hour"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )

    def land(batch: DataFrame, epoch_id: int) -> None:
        # update-mode batches carry only changed (hour, event_type)
        # rows with their new cumulative values. The overwrite unit
        # MUST equal the aggregation key: partitioning by hour alone
        # would wipe an hour's untouched event_types when one type
        # updates. Partitions touched per batch are bounded by the
        # watermark horizon x event-type cardinality.
        (
            batch.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("hour", "event_type")
            .parquet(view_path)
        )

    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(land)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_view(spark: SparkSession, view_path: str) -> DataFrame:
    """Read the materialized view back (hour partition column restored)."""
    return spark.read.parquet(view_path)
