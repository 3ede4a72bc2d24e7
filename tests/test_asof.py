"""Unit semantics of the as-of backward join (inclusive <=, NULLs, ties)."""

from __future__ import annotations

from data_engineer_8_final_project_spark.operators.asof import asof_backward_join


from datetime import datetime


def _df(spark, rows):
    rows = [(e, u, datetime.fromisoformat(ts)) for e, u, ts in rows]
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")


def test_asof_backward_semantics(spark):
    left = _df(spark, [
        (1, 7, "2024-01-01 10:00:00"),   # before any right row → NULL
        (2, 7, "2024-01-01 12:00:00"),   # equal ts → inclusive match
        (3, 7, "2024-01-01 15:00:00"),   # latest prior of several
        (4, 9, "2024-01-01 12:00:00"),   # other key, no right rows → NULL
    ])
    right = _df(spark, [
        (100, 7, "2024-01-01 12:00:00"),
        (101, 7, "2024-01-01 13:00:00"),
        (102, 7, "2024-01-01 16:00:00"),  # after every left row
    ])
    out = {
        r.event_id: r.asof_event_id
        for r in asof_backward_join(left, right, "user_id", "ts", "event_id").collect()
    }
    assert out == {1: None, 2: 100, 3: 101, 4: None}


def test_asof_is_deterministic_across_partitioning(spark):
    left = _df(spark, [(i, i % 3, f"2024-01-01 10:{i:02d}:00") for i in range(40)])
    right = _df(spark, [(100 + i, i % 3, f"2024-01-01 10:{i:02d}:30") for i in range(40)])
    a = sorted(
        (r.event_id, r.asof_event_id)
        for r in asof_backward_join(left, right, "user_id", "ts", "event_id").collect()
    )
    b = sorted(
        (r.event_id, r.asof_event_id)
        for r in asof_backward_join(
            left.repartition(7), right.repartition(5), "user_id", "ts", "event_id"
        ).collect()
    )
    assert a == b
