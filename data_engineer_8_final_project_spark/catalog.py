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
from pyspark.sql import functions as F

from .schemas import EVENTS_RAW_NANOS, FIXTURE_SCHEMAS

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLE_NAMES = tuple(FIXTURE_SCHEMAS)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table with its explicit schema (no inference)."""
    if name not in FIXTURE_SCHEMAS:
        raise KeyError(f"unknown fixture table {name!r}; have {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # ts is stored as INT64 nanos (schemas.EVENTS_RAW_NANOS) — read
        # raw and truncate to µs, matching DuckDB's timestamp precision.
        # Integral `div`, NOT float `/`: epoch-nanos exceed 2^53, so
        # double division drifts the low microsecond (±1µs off-by-one).
        raw = spark.read.schema(EVENTS_RAW_NANOS).parquet(path)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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
