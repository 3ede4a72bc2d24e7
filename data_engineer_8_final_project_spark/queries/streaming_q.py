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


#: Batch equivalent of the stateful running totals — the shared oracle.
#: sum_value accumulates as integer cents on both sides (see
#: streaming/stateful.py determinism contract) so micro-batch float
#: order can never drift the hash.
USER_TOTALS_ORACLE = """
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value,
       MIN(ts) AS first_ts,
       MAX(ts) AS last_ts
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@register(
    "user_totals_stateful",
    oracle=USER_TOTALS_ORACLE,
    survey_ref="§2.9 T3 extended: custom stateful operator (applyInPandasWithState)",
)
def q_user_totals_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import stateful

    stream = stateful.user_running_totals(ev.read_events_stream(spark, sf_dir))
    sink = ev.run_available_now(stream, output_mode="update")
    return stateful.finalize_totals(sink).orderBy("user_id")
