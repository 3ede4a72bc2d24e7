"""Streaming leg: availableNow replay must equal the batch aggregation."""

from __future__ import annotations

from data_engineer_8_final_project_spark import catalog
from data_engineer_8_final_project_spark.streaming import events as ev


def test_stream_equals_batch(spark, sf_dir):
    batch = (
        ev.hourly_window_agg(catalog.load(spark, sf_dir)["events"])
        .orderBy("window_start", "event_type")
        .collect()
    )
    streamed = ev.streaming_hourly(spark, sf_dir).collect()
    assert streamed == batch
    assert len(batch) > 0


def test_watermark_append_mode_drops_open_windows(spark, sf_dir):
    """Append mode + watermark: windows newer than (max_ts - delay) stay open
    at end-of-replay and are withheld — fewer or equal rows vs complete mode."""
    agg = ev.hourly_window_agg(
        ev.read_events_stream(spark, sf_dir).withWatermark("ts", "30 minutes")
    )
    appended = ev.run_available_now(agg, output_mode="append")
    complete = ev.streaming_hourly(spark, sf_dir)
    assert appended.count() <= complete.count()
