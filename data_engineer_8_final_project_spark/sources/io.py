"""Readers and writers (SURVEY.md §2.1 S1-S9), Spark-first.

Replaces the reference's source/sink zoo — Postgres COPY
(reference sql/ingest-retail.sql:1), SQLAlchemy drop-and-replace
``to_sql`` (reference dags/projectde_dag.py:134-155), driver-side
``toPandas().to_csv`` (reference spark-scripts/spark-project.py:98-113)
— with distributed, schema-explicit equivalents:

- every read takes an explicit StructType (no inference — §1.3 rule);
- the CSV sink writes distributed (no collect); ``single_file=True``
  coalesces to one partition only when a one-file artifact is required;
- the JDBC sink reproduces drop-and-replace with ``mode("overwrite")``;
  partitioned-parquet is the engine-internal persistence format with
  dynamic partition overwrite for per-league idempotent refresh
  (SURVEY.md §4).

No JDBC driver jars ship in the test container, so JDBC paths are
exercised by signature/unit tests only (wiring is standard Spark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# ---- scans (S2, S3, S7) --------------------------------------------------


def read_csv(spark: SparkSession, path: str, schema: T.StructType, **options) -> DataFrame:
    """CSV bulk ingest (S2): header, comma-delimited, explicit schema."""
    opts = {"header": "true", "mode": "PERMISSIVE"} | options
    return spark.read.options(**opts).schema(schema).csv(path)


def read_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read if schema is None else spark.read.schema(schema)
    return reader.parquet(path)


def read_jdbc(
    spark: SparkSession, url: str, table: str, properties: dict[str, str] | None = None
) -> DataFrame:
    """JDBC scan (S7) — Metabase/warehouse-style reads."""
    return spark.read.jdbc(url, table, properties=properties or {})


# ---- sinks (S5, S6) ------------------------------------------------------


def write_parquet_partitioned(
    df: DataFrame, path: str, partition_by: str | list[str], mode: str = "overwrite"
) -> None:
    """Engine-internal persistence: partitioned parquet.

    With ``spark.sql.sources.partitionOverwriteMode=dynamic`` (set by
    the session factory) an overwrite only replaces the partitions
    present in ``df`` — the idempotent per-league refresh that the
    reference emulated with DROP TABLE CASCADE per league table.
    """
    cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    df.write.mode(mode).partitionBy(*cols).parquet(path)


def write_csv(df: DataFrame, path: str, single_file: bool = False, mode: str = "overwrite") -> None:
    """CSV sink (S6) — distributed by default; ``single_file`` coalesces
    to 1 partition (the reference's toPandas().to_csv without the
    driver-memory bottleneck)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", "true").csv(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    properties: dict[str, str] | None = None,
) -> None:
    """JDBC full-refresh sink (S5): drop-and-replace semantics via
    mode('overwrite') (DROP+recreate unless option('truncate'))."""
    df.write.jdbc(url, table, mode=mode, properties=properties or {})


# ---- DDL helpers (S3, S4) ------------------------------------------------


def create_database(spark: SparkSession, name: str) -> None:
    """Idempotent database create (S4; reference sql/warehouse-ddl.sql:1-2)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def create_table_as(
    spark: SparkSession, name: str, df: DataFrame, mode: str = "overwrite"
) -> None:
    """Declared-schema managed table (S3) — saveAsTable USING parquet."""
    df.write.mode(mode).format("parquet").saveAsTable(name)


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: str | list[str],
    n_buckets: int,
    sort_cols: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table — the co-located-join persistence path.

    At 100 TB, repeatedly joining/aggregating big facts on the same key
    pays a full shuffle per query. Bucketing pays that shuffle ONCE at
    write: both sides bucketed by the join key into the same bucket
    count join with zero exchanges (and zero sorts when also
    sort-bucketed) — the plan check lives in tests/test_plans.py.
    Bucket count is a layout decision: size buckets so one bucket of
    the bigger fact fits an executor's memory (e.g. 100 TB lineitem at
    ~128 MB/bucket target → thousands of buckets; must be fixed across
    co-bucketed tables).
    """
    b = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *b)
    if sort_cols:
        s = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*s)
    writer.saveAsTable(name)


def read_json(spark: SparkSession, path: str, schema: T.StructType, **options) -> DataFrame:
    """JSON-lines scan with explicit schema (no sampling inference pass —
    at 100 TB, schema inference is a full extra read of the dataset)."""
    return spark.read.options(**options).schema(schema).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (built into Spark) — the columnar alternative when the
    downstream consumer is Hive/Trino-based; same pushdown/pruning
    behavior as parquet from Spark's side."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Opaque-blob ingest (images/audio/video) via Spark's binaryFile
    source → (path, modificationTime, length, content binary).

    The ingestion edge of the multimodal pipeline: blob bytes land in a
    ``binary`` column exactly like the media fixtures expect
    (operators/multimodal.py consumes the same shape). Driver lists
    files but content is read in executors — scales to millions of
    objects; pair with maxPartitionBytes to keep task sizes sane.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
