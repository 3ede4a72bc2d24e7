"""operators/funnel.funnel — the bounded-vs-streaming plan dispatch
(VERDICT r7 item 8): a bounded replay must get the batch min-chaining
plan (0.74x at 64x), a streaming frame the GroupState twin (≈9x at
64x, the price of incremental emission)."""

from __future__ import annotations

from data_engineer_8_final_project_spark.operators import funnel as fu
from data_engineer_8_final_project_spark.registry import all_queries
from data_engineer_8_final_project_spark.schemas import EVENTS


def test_dispatch_bounded_matches_registered_batch_query(spark, sf_dir):
    """Bounded input → batch arm, row-identical to the oracle-green
    registered event_funnel query."""
    from data_engineer_8_final_project_spark import catalog

    events = catalog.load_table(spark, sf_dir, "events")
    got = fu.funnel(events)
    assert not got.isStreaming
    a = got.orderBy("user_id").toPandas()
    b = all_queries()["event_funnel"].fn(spark, sf_dir).toPandas()
    assert a.equals(b[a.columns.tolist()])


def test_dispatch_streaming_routes_to_groupstate_twin(spark, sf_dir):
    """Streaming input → the stateful twin: the dispatch result is a
    streaming frame whose plan carries the GroupState operator (plan
    inspection only — the replay execution is event_funnel_stream's
    driver-gated job)."""
    stream = spark.readStream.schema(EVENTS).parquet(f"{sf_dir}/events.parquet")
    got = fu.funnel(stream)
    assert got.isStreaming
    plan = got._jdf.queryExecution().analyzed().toString()
    assert "FlatMapGroupsInPandasWithState" in plan, plan
