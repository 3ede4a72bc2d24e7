"""Dump ``explain('formatted')`` for named registry queries to files.

Usage::

    python scripts/dump_plan.py <query> [...] --out plans/r16 --suffix before

Writes ``<out>/<query>_<suffix>.txt`` per query. The plan is captured
from the same session shape the bench uses (local[$SPARK_GRAFT_CPUS]),
at $SPARK_GRAFT_SF_DIR (default sf0.1) — plan shape (Exchange count,
join strategy, PushedFilters/ReadSchema) is what the optimization round
argues from, so the files are committed as evidence.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--out", default="plans/r16")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    from data_engineer_8_final_project_spark.registry import all_queries
    from data_engineer_8_final_project_spark.session import get_spark

    spark = get_spark(app_name="dump-plan")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    os.makedirs(os.path.join(REPO, args.out), exist_ok=True)
    for name in args.queries:
        df = queries[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(REPO, args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_exchange = plan.count("Exchange")
        print(f"{name}: {len(plan)} chars, {n_exchange} Exchange -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
