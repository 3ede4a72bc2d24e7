"""Synthetic event producer as a Spark 4 Python DataSource.

The reference declares a Faker-based event producer feeding its Kafka
topic (reference Makefile:149-179 runs ``/scripts/event_producer.py``,
absent from the snapshot) — the produce side of its streaming leg.
This is that producer re-expressed Spark-natively: a registered Python
``DataSource`` (``spark.read.format("synthetic_events")``) that
generates event rows with the same shape as the ``events`` fixture
(schemas.EVENTS), DETERMINISTICALLY — a seeded counter-based hash per
row, no RNG state — so tests can assert exact equality between reads
and any two clusters generate identical data from the same options.

Scale shape: generation is embarrassingly parallel — the driver plans
``numPartitions`` partitions, each worker derives its rows purely from
(partition index, row index, seed), so a 1000-executor cluster
generates a trillion rows with no coordination, no shuffle, and no
skew. This is the standard benchmark-data pattern (dbgen/tpch-gen) on
the Spark 4 DataSource API.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from ..schemas import EVENTS

EVENT_TYPES = ("view", "click", "purchase", "error", "signup")
FORMAT_NAME = "synthetic_events"


def _h(seed: int, i: int, field: str) -> int:
    """Deterministic 60-bit value for row i / field — md5 counter hash
    (same portable-hash idiom as the sampling/dedup operators)."""
    digest = hashlib.md5(f"{seed}:{i}:{field}".encode()).hexdigest()
    return int(digest[:15], 16)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 1000))
        self.seed = int(options.get("seed", 0))
        self.n_parts = int(options.get("numPartitions", 4))

    def partitions(self):  # -> list of planner tokens, one per split
        from pyspark.sql.datasource import InputPartition

        # contiguous row ranges; the LAST partition absorbs the remainder
        per = self.n_rows // self.n_parts or 1
        bounds = []
        start = 0
        for p in range(self.n_parts):
            end = self.n_rows if p == self.n_parts - 1 else min(start + per, self.n_rows)
            bounds.append(InputPartition((start, end)))
            start = end
            if start >= self.n_rows:
                break
        return bounds

    def read(self, partition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield _row(self.seed, i)


class SyntheticEventsSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        return EVENTS

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        return SyntheticEventsStreamReader(self.options)


def register_source(spark) -> None:
    """Idempotently register the format with a SparkSession."""
    spark.dataSource.register(SyntheticEventsSource)


def _row(seed: int, i: int):
    """One deterministic event row — shared by batch and stream readers."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    ts = base + dt.timedelta(microseconds=_h(seed, i, "ts") % (30 * 24 * 3600 * 10**6))
    return (
        i,
        ts,
        _h(seed, i, "user") % 1000,
        EVENT_TYPES[_h(seed, i, "type") % len(EVENT_TYPES)],
        round((_h(seed, i, "value") % 10**6) / 100.0, 2),
        '{"k": %d}' % (_h(seed, i, "k") % 100),
    )


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the producer (SimpleDataSourceStreamReader):
    offsets are plain row indices, so replay between any two committed
    offsets regenerates EXACTLY the rows of the original micro-batch —
    the reader is replayable by construction, which is the property
    exactly-once sinks need from a source. ``maxRows`` bounds the feed
    for deterministic tests; a production feed would leave it unbounded.
    """

    def __init__(self, options: dict):
        self.seed = int(options.get("seed", 0))
        self.batch_rows = int(options.get("batchRows", 100))
        self.max_rows = int(options.get("maxRows", 1000))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        lo = start["i"]
        hi = min(lo + self.batch_rows, self.max_rows)
        return iter([_row(self.seed, i) for i in range(lo, hi)]), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(self.seed, i) for i in range(start["i"], end["i"])])

    def commit(self, end: dict) -> None:
        pass
