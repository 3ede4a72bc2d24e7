"""SparkSession factory.

Design notes (scale-first):

- AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  dynamic join-strategy switching — the knobs that keep one static plan
  viable from sf0.001 up to a 1000-executor cluster.
- ``spark.sql.shuffle.partitions`` defaults to the local core count; on
  a real cluster this is overridden (2-3× total cores) and AQE coalesces
  down after the fact.
- Session timezone pinned to UTC so timestamp semantics match the
  DuckDB oracle (DuckDB timestamps are UTC-naive).
- Arrow enabled for any pandas-interop boundary (the sanctioned slow
  path for non-relational operators).

The reference ran Spark 3.3.2 standalone with a 1-core/1 GB worker
(reference docker/docker-compose-spark.yml:26-27); this engine assumes
Spark 4.x local[N] for tests and a YARN/K8s cluster in production.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4)))


def get_spark(
    app_name: str = "data_engineer_8_final_project_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``cpus`` controls local parallelism; ``shuffle_partitions`` defaults
    to the same value (right-sized for local mode — AQE coalesces
    further when partitions come out tiny).
    """
    n = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # HotSpot never JIT-compiles methods past ~8000 bytecodes
        # (-XX:DontCompileHugeMethods): a whole-stage method between
        # 8 KB and Janino's 64 KB limit compiles but runs in the
        # bytecode INTERPRETER — measured 7x slower than the row path
        # on the unrolled pair-cosine stages, whose per-expression
        # codegen splits into small JIT-able methods. Cap generated
        # methods at the JIT limit so such stages take the fast split
        # path automatically; fused stages under 8 KB are untouched.
        # Env override exists for isolated A/Bs only (r14 VERDICT item
        # 2 asked to rule this session-wide conf in/out as the cause
        # of the uniform r14 driver-run drift): 65535 = Spark default.
        .config(
            "spark.sql.codegen.hugeMethodLimit",
            os.environ.get("SPARK_GRAFT_HUGE_METHOD_LIMIT", "8000"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
