"""Sources/sinks: schema-explicit CSV, partitioned parquet with dynamic
partition overwrite, DDL helpers."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_engineer_8_final_project_spark.sources import io as eio

SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("league", T.StringType(), True),
    ]
)


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a", "x"), (2, "b", "y")], SCHEMA)
    path = str(tmp_path / "csv_out")
    eio.write_csv(df, path, single_file=True)
    back = eio.read_csv(spark, path, SCHEMA)
    assert sorted(back.collect()) == sorted(df.collect())
    # single_file=True -> exactly one part file
    parts = [f for f in os.listdir(path) if f.startswith("part-")]
    assert len(parts) == 1


def test_partitioned_parquet_dynamic_overwrite(spark, tmp_path):
    path = str(tmp_path / "pq")
    df1 = spark.createDataFrame([(1, "a", "x"), (2, "b", "y")], SCHEMA)
    eio.write_parquet_partitioned(df1, path, "league")
    # overwrite ONLY league=x; league=y must survive (dynamic mode)
    df2 = spark.createDataFrame([(9, "z", "x")], SCHEMA)
    eio.write_parquet_partitioned(df2, path, "league")
    back = eio.read_parquet(spark, path)
    got = {(r["k"], r["league"]) for r in back.collect()}
    assert got == {(9, "x"), (2, "y")}


def test_ddl_helpers(spark, tmp_path):
    eio.create_database(spark, "warehouse_test")
    df = spark.createDataFrame([(1, "a", "x")], SCHEMA)
    eio.create_table_as(spark, "warehouse_test.t1", df)
    assert spark.table("warehouse_test.t1").count() == 1
    # idempotent overwrite
    eio.create_table_as(spark, "warehouse_test.t1", df)
    assert spark.table("warehouse_test.t1").count() == 1
    spark.sql("DROP TABLE warehouse_test.t1")
    spark.sql("DROP DATABASE warehouse_test")
