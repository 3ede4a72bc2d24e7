"""Custom stateful streaming operator: per-user running totals.

The reference's declared streaming leg (SURVEY.md §2.9) has no shipped
consumer, so windowed aggregation (events.py) covers the declared
surface; this module adds the *custom stateful operator* shape a real
event pipeline needs — state that outlives any window:
``applyInPandasWithState`` keyed by user, maintaining
(event count, value total, first/last seen) across micro-batches and
emitting the running totals in update mode.

Determinism contract (what makes this oracle-verifiable):

- Replay is ``availableNow`` over the events fixture — no wall clock,
  no watermark-dropped rows, so after the final batch every user's
  state has absorbed every event and the LAST emission per user equals
  the batch ``groupBy(user_id)`` aggregate — the DuckDB oracle.
- Value totals accumulate as integer cents (``round(value*100)``), not
  floats: micro-batch boundaries change float summation order, and an
  exact integer sum is immune to the resulting ulp drift. The final
  ``sum_value`` is ``cents / 100.0`` computed identically on both
  sides.
- Timestamps ride through state as epoch-micros longs (the state
  schema is flat scalars), converted back on output.

Scale shape: state is one small fixed-width row per user key,
hash-partitioned by the shuffle — the standard Structured Streaming
state-store story (RocksDB-backed on a real cluster). Each micro-batch
touches only keys present in that batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:
    import pandas as pd

STATE_SCHEMA = "n long, cents long, first_us long, last_us long"
OUTPUT_SCHEMA = "user_id long, n_events long, cents long, first_us long, last_us long"


def _update_user_totals(
    key: tuple[Any, ...], pdfs: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    import numpy as np
    import pandas as pd

    n, cents, first_us, last_us = state.get if state.exists else (0, 0, None, None)
    for pdf in pdfs:
        if pdf.empty:
            continue
        n += len(pdf)
        cents += int(np.rint(pdf["value"].to_numpy() * 100).astype("int64").sum())
        us = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        lo, hi = int(us.min()), int(us.max())
        first_us = lo if first_us is None else min(first_us, lo)
        last_us = hi if last_us is None else max(last_us, hi)
    state.update((n, cents, first_us, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "cents": [cents],
            "first_us": [first_us],
            "last_us": [last_us],
        }
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Stateful per-user running totals (streaming DataFrame in, update mode).

    Emits one row per user per micro-batch that touched that user; the
    emission after the final batch carries the complete totals.

    Only the three consumed columns cross the Arrow boundary: the
    Python worker is the operator's bottleneck (~1M pandas groups per
    batch at 64x), and shipping the full event row — props is a JSON
    string wider than the rest combined — pays serialization for bytes
    the UDF never reads. The projection also prunes the parquet scan
    (ReadSchema drops event_id/event_type/props).
    """
    return events.select("user_id", "ts", "value").groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def finalize_totals(sink: DataFrame) -> DataFrame:
    """Final totals from an update-mode sink: last emission per user.

    ``n_events`` grows strictly per emission, so max(n_events) marks the
    final row; the whole reduction is one small aggregation over the
    sink table (rows ≈ users × batches).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        sink.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "n_events",
            (F.col("cents") / F.lit(100.0)).alias("sum_value"),
            F.timestamp_micros("first_us").alias("first_ts"),
            F.timestamp_micros("last_us").alias("last_ts"),
        )
    )


from pyspark.sql.streaming.stateful_processor import StatefulProcessor


class _UserTotalsProcessor(StatefulProcessor):
    """transformWithStateInPandas processor: the Spark 4 arbitrary-state
    API expression of the same per-user running totals.

    Same determinism contract as ``_update_user_totals`` above (integer
    cents, epoch-micros longs, last emission = batch aggregate); the
    difference is the state surface: a typed ValueState managed by the
    operator (RocksDB-backed, with per-state-variable schemas and TTL
    support) instead of one opaque GroupState tuple. This is the API a
    new stateful operator should target — GroupState/applyInPandasWithState
    is the legacy shape.
    """

    def init(self, handle) -> None:  # StatefulProcessorHandle
        self._totals = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        import numpy as np
        import pandas as pd

        prior = self._totals.get() if self._totals.exists() else None
        n, cents, first_us, last_us = prior or (0, 0, None, None)
        for pdf in rows:
            if pdf.empty:
                continue
            n += len(pdf)
            cents += int(np.rint(pdf["value"].to_numpy() * 100).astype("int64").sum())
            us = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            lo, hi = int(us.min()), int(us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        self._totals.update((n, cents, first_us, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "cents": [cents],
                "first_us": [first_us],
                "last_us": [last_us],
            }
        )

    def close(self) -> None:
        pass


def user_running_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running totals via transformWithStateInPandas (Spark 4).

    Emits the running row for every user each micro-batch that touched
    them (update mode); after an availableNow replay the last emission
    per user equals the batch groupBy aggregate — the same oracle as
    the GroupState twin. Requires the RocksDB state store provider
    (the only provider transformWithState supports, and the right one
    for 100 TB keyspaces anyway) — the caller pins it for the query.
    """
    # same consumed-columns projection as the GroupState twin: only
    # (user_id, ts, value) cross the Arrow boundary
    return events.select("user_id", "ts", "value").groupBy("user_id").transformWithStateInPandas(
        _UserTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )


# ---------------------------------------------------------------------------
# Stateful conversion funnel (streaming twin of queries/streaming_q
# event_funnel)
# ---------------------------------------------------------------------------

FUNNEL_STATE_SCHEMA = "n long, view_us long, click_us long, purch_us long"
FUNNEL_OUTPUT_SCHEMA = (
    "user_id long, n long, view_us long, click_us long, purch_us long"
)


def _update_funnel(
    key: tuple[Any, ...], pdfs: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    """Greedy per-user funnel state: first view, first click strictly
    after it, first purchase strictly after that. EXACT against the
    batch min-chaining oracle because events are processed in event-time
    order — the replay stages time-ascending micro-batches and each
    batch is sorted here; a timestamp can only be set once, so state
    transitions are monotone and replay-deterministic. ``n`` counts
    absorbed events (strictly grows per emission → max n marks the
    final row, same finalize contract as the totals operator).

    A key's micro-batch data can arrive as SEVERAL Arrow chunks
    (default 10k-row batches), so all chunks are concatenated and
    sorted ONCE before the greedy loop — sorting each chunk
    independently would process events out of event-time order whenever
    a key spans chunks, silently diverging from the min-chaining
    oracle (advisor finding, round 6)."""
    import pandas as pd

    n, view_us, click_us, purch_us = (
        state.get if state.exists else (0, None, None, None)
    )
    before = (view_us, click_us, purch_us)
    frames = [pdf for pdf in pdfs if not pdf.empty]
    if frames:
        batch = frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)
        n += len(batch)
        batch = batch.sort_values("ts", kind="mergesort")
        us = batch["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        for t, et in zip(us.tolist(), batch["event_type"].tolist()):
            if et == "view" and view_us is None:
                view_us = t
            elif et == "click" and click_us is None and view_us is not None and t > view_us:
                click_us = t
            elif et == "purchase" and purch_us is None and click_us is not None and t > click_us:
                purch_us = t
    state.update((n, view_us, click_us, purch_us))
    # Emit only when a funnel timestamp CHANGED this batch. Under
    # ordered replay the timestamps are monotone (set-once), so the
    # max-n finalize row still carries the final values; skipping
    # no-change batches cuts the per-key output construction + Arrow
    # transfer — at 64x events that is the dominant term of the
    # GroupState scaling law (one Python call per key per batch).
    if (view_us, click_us, purch_us) != before:
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n": [n],
                "view_us": [view_us],
                "click_us": [click_us],
                "purch_us": [purch_us],
            }
        )


def user_funnel_stream(events: DataFrame) -> DataFrame:
    """Stateful streaming funnel (update mode): per-user funnel
    timestamps that survive micro-batch boundaries. State is one
    4-long row per user, hash-partitioned — the standard state-store
    story; per batch only touched keys update.

    Scale design: the funnel reads ONLY view/click/purchase events, so
    that predicate is applied here, BEFORE the stateful shuffle — rows
    of other types never shuffle, and users with no funnel activity in
    a batch never touch their state store (GroupState cost scales with
    touched-keys-per-batch, not rows)."""
    events = events.filter(F.col("event_type").isin("view", "click", "purchase"))
    # only the consumed columns cross the Arrow boundary (same
    # projection rationale as user_running_totals)
    return events.select("user_id", "ts", "event_type").groupBy("user_id").applyInPandasWithState(
        _update_funnel,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def finalize_funnel(sink: DataFrame) -> DataFrame:
    """Batch-shaped funnel table from the update-mode sink: last
    emission per user (max n), users with no view dropped (the batch
    funnel anchors on the view stage)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n"))
    return (
        sink.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .filter(F.col("view_us").isNotNull())
        .select(
            "user_id",
            F.timestamp_micros("view_us").alias("first_view_ts"),
            F.timestamp_micros("click_us").alias("first_click_ts"),
            F.timestamp_micros("purch_us").alias("first_purchase_ts"),
            (
                F.lit(1)
                + F.col("click_us").isNotNull().cast("int")
                + F.col("purch_us").isNotNull().cast("int")
            )
            .cast("long")
            .alias("funnel_stage"),
        )
    )
