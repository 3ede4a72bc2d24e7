"""Table maintenance: small-file compaction.

Streaming sinks, partition overwrites, and high-parallelism writes all
leak small files; at 100 TB the cost is real — every scan pays task
scheduling, footer reads, and row-group overhead per file, and the
NameNode/object-store pays per-object metadata. Compaction rewrites a
table (or a partition of one) into size-targeted files.

Spark-first shape: one distributed read → ``repartitionByRange`` on
the requested sort columns (or a round-robin ``repartition`` when no
clustering is asked for) → one distributed write. Ranged compaction
doubles as 1-D clustering, tightening footer min/max for later pruning
(the multi-dimensional variant is ``layout.write_zordered``).

Parquet has no atomic directory swap on a plain filesystem, so
compaction lands in a caller-supplied destination; production tables
front this with a metastore/manifest pointer flip.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession


def plan_file_count(path: str, target_bytes: int = 128 * 1024 * 1024) -> int:
    """Output file count for compacting ``path`` to ``target_bytes`` files.

    Sizes come from the filesystem listing (local/HDFS-style dirs); at
    least one file is always planned. 128 MiB default matches the
    classic HDFS-block / row-group sweet spot.
    """
    total = sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(path, "*.parquet"))
    )
    return max(1, -(-total // target_bytes))


def compact(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> int:
    """Rewrite ``src_path`` into ``dst_path`` as ~``target_bytes`` files.

    Returns the planned file count. With ``sort_by``, output files get
    disjoint key ranges (repartitionByRange + in-file sort) so the
    compaction also re-clusters; without, a round-robin repartition
    balances bytes evenly.
    """
    n = plan_file_count(src_path, target_bytes)
    df: DataFrame = spark.read.parquet(src_path)
    if sort_by:
        df = df.repartitionByRange(n, *sort_by).sortWithinPartitions(*sort_by)
    else:
        df = df.repartition(n)
    df.write.mode("overwrite").parquet(dst_path)
    return n
