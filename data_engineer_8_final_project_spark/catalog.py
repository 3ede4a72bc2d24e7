"""Fixture catalog: load the driver parquet tables, register temp views.

This is the engine's equivalent of the reference's warehouse database
(reference sql/warehouse-ddl.sql:1-2 — ``CREATE DATABASE warehouse``):
a named-table surface that both the DataFrame API and ``spark.sql``
queries resolve against.

Scans stay lazy — registering 10 views costs nothing; Catalyst prunes
columns and pushes predicates into each parquet scan per-query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .schemas import FIXTURE_SCHEMAS

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLE_NAMES = tuple(FIXTURE_SCHEMAS)

#: (resolved path, mtime_ns) pairs already footer-checked this process.
_format_checked: set[tuple[str, int]] = set()

#: (resolved path, mtime_ns) -> footer row count, memoized per process.
_row_counts: dict[tuple[str, int], int] = {}


def _parquet_parts(path: str) -> list[str]:
    """Resolve a fixture path (single file or directory-of-parts) to
    the list of physical parquet files backing it."""
    if os.path.isdir(path):
        return [
            os.path.join(path, f)
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        ]
    return [path]


def parquet_row_count(path: str) -> int:
    """Exact row count from parquet footer metadata — no Spark job.

    Queries that only need a row-count BOUND (e.g. sizing the
    recursive-CTE governor) must not pay an eager full-table count():
    at 100 TB that is a whole extra stage per call, while every footer
    already records its row group counts exactly. Memoized on
    (path, mtime) so repeated calls within a process are free.
    """
    import pyarrow.parquet as pq

    key = (os.path.abspath(path), os.stat(path).st_mtime_ns)
    if key not in _row_counts:
        _row_counts[key] = sum(
            pq.ParquetFile(p).metadata.num_rows for p in _parquet_parts(path)
        )
    return _row_counts[key]


def _assert_events_ts_format(path: str) -> None:
    """Tripwire: fail LOUDLY if the events fixture's physical ``ts``
    encoding ever changes again.

    The fixture encoding silently moved from INT64-nanoseconds to
    parquet TIMESTAMP(µs) between driver rounds, and the then-current
    nanos read path kept "working" while collapsing every event onto
    1970-01-20 — wrong answers, no error. A footer-read assertion over
    EVERY part file (a directory-of-parts fixture could mix encodings)
    converts that failure mode into an immediate, explained crash.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    key = (os.path.abspath(path), os.stat(path).st_mtime_ns)
    if key in _format_checked:
        return
    for target in _parquet_parts(path):
        try:
            ts_type = pq.ParquetFile(target).schema_arrow.field("ts").type
        except KeyError:
            raise RuntimeError(
                f"events fixture {target!r} has no `ts` column in its parquet "
                "footer — the fixture schema has changed; update "
                "catalog.load_table/schemas.EVENTS deliberately."
            ) from None
        if ts_type not in (pa.timestamp("us"), pa.timestamp("us", "UTC")):
            raise RuntimeError(
                f"events fixture {target!r} stores ts as {ts_type} — this engine "
                "expects parquet TIMESTAMP(us) (read as TimestampType under the "
                "UTC session-timezone pin). The fixture encoding has changed; "
                "update catalog.load_table/schemas.EVENTS deliberately instead "
                "of letting a stale read path produce silently wrong timestamps "
                "(pre-round-5 the fixture was INT64-nanos and a leftover "
                "`ts div 1000` read collapsed all events onto 1970-01-20)."
            )
    _format_checked.add(key)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table with its explicit schema (no inference)."""
    if name not in FIXTURE_SCHEMAS:
        raise KeyError(f"unknown fixture table {name!r}; have {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        _assert_events_ts_format(path)
    return spark.read.schema(FIXTURE_SCHEMAS[name]).parquet(path)


def load(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every fixture table and register each as a temp view.

    Returns name → DataFrame. Idempotent — re-registering replaces the
    previous view, so tests can call this freely per scale factor.
    """
    tables: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        tables[name] = df
    return tables
