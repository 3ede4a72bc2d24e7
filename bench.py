"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes fully (noop sink — no collect-to-driver, measuring
the distributed plan, not Arrow transfer). ``value`` is the sum of
per-query wall times after a JVM/session warmup query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineer_8_final_project_spark.registry import all_queries
from data_engineer_8_final_project_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_label(sf_dir: str) -> float | str:
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return base


def main() -> None:
    spark = get_spark(app_name="bench")
    queries = all_queries()
    # Headline set: everything tagged for bench, else all oracle-backed queries.
    names = [n for n, q in queries.items() if "bench" in q.tags] or sorted(queries)

    # Warmup: run the flagship once to absorb JVM/codegen startup cost.
    warm = queries.get("standings") or queries[names[0]]
    warm.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    # Timed region covers plan construction AND execution (streaming
    # queries do their work inside fn(); ivf's bounded centroid collect
    # is part of the query). Best-of-2 reports steady state — single
    # runs on a 32-thread shared JVM jitter up to 3x on GC alignment.
    timings: dict[str, float] = {}
    for name in sorted(names):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            queries[name].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": _sf_label(SF_DIR),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
