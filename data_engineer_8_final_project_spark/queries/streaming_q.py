"""Streaming-leg query registrations (SURVEY.md §2.9 T1-T3).

``events_hourly`` is the batch form of the windowed aggregation;
``events_hourly_stream`` replays the same fixture through Structured
Streaming (availableNow, complete mode) and must produce the identical
table — both share one DuckDB oracle, making the streaming path fully
correctness-gated rather than rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register, tables_for
from ..streaming import events as ev

HOURLY_ORACLE = """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


@register(
    "events_hourly",
    oracle=HOURLY_ORACLE,
    survey_ref="§2.9 T3 (windowed agg, batch form — oracle for the stream)",
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables_for(spark, sf_dir)
    return ev.hourly_window_agg(t["events"]).orderBy("window_start", "event_type")


@register(
    "events_hourly_stream",
    oracle=HOURLY_ORACLE,
    survey_ref="§2.9 T1-T3 (Structured Streaming replay, availableNow)",
)
def q_events_hourly_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ev.streaming_hourly(spark, sf_dir)
