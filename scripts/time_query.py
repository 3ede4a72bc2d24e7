"""Quick in-process repeat timer for registry queries (noop sink).

Usage::

    python scripts/time_query.py <query> [...] [--reps 3]

Times each named query with the bench methodology (warmup standings,
host+shuffle probes, noop sink) in ONE process — faster turnaround than
isolated_query_ab.py for the tight optimize/measure loop; final
adjudication still uses the bench / isolated protocol.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from bench import (
        PROBE_REFERENCE_SEC,
        SHUFFLE_REFERENCE_SEC,
        _host_probe,
        _shuffle_probe,
    )
    from data_engineer_8_final_project_spark.registry import all_queries
    from data_engineer_8_final_project_spark.session import get_spark

    spark = get_spark(app_name="time-query")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    queries["standings"].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    hp, _ = _host_probe(spark)
    sp, _ = _shuffle_probe(spark)
    print(
        f"host_factor {hp / PROBE_REFERENCE_SEC:.3f} "
        f"shuffle_factor {sp / SHUFFLE_REFERENCE_SEC:.3f}"
    )
    for name in args.queries:
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            queries[name].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
        print(
            f"{name}: median {statistics.median(ts):.3f}  "
            f"reps {[round(t, 3) for t in ts]}"
        )
    hp2, _ = _host_probe(spark)
    sp2, _ = _shuffle_probe(spark)
    print(
        f"end host_factor {hp2 / PROBE_REFERENCE_SEC:.3f} "
        f"shuffle_factor {sp2 / SHUFFLE_REFERENCE_SEC:.3f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
