"""Deep-scaling curve for the round-5 operators: 1x / 8x / 64x.

The round-5 build log recorded 8x scale-ups for `per_source_cap`,
`temperature_mixture_sample`, `training_shuffle_order`,
`dup_span_stats`, and `order_chains_recursive`; the round-5 verdict
asked for the same 64x treatment round 2 gave Q1/standings — 64x is
where the prefix-sum, two-phase-rank, and recursion-governor designs
actually earn their keep (a hidden O(n^2) or single-task sort term
that hides inside overhead at 8x shows up unmistakably at 64x).

Method: replicate sf0.1's `documents` (and `orders` for the recursive
CTE) k times with disjoint id spaces (id + replica * stride, stride =
1e9 > any fixture id) into a temp fixture dir whose other tables are
hard-linked from sf0.1 unchanged, then run each registered query
end-to-end (scan -> count) `REPS` times and report the median. Run:

    python scripts/scale_curve.py [--factors 1 8 64] [--reps 3]

Prints one JSON line per (query, factor) and a final summary table.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_engineer_8_final_project_spark import catalog, registry  # noqa: E402
from data_engineer_8_final_project_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ID_STRIDE = 1_000_000_000  # > any fixture id at sf0.1
QUERIES = (
    "per_source_cap",
    "temperature_mixture_sample",
    "training_shuffle_order",
    "dup_span_stats",
    "order_chains_recursive",
)
#: ANN top-k tier (--queries ann): replicating embeddings multiplies
#: the scanned vectors while k stays fixed, isolating scan/encode
#: scaling. Replica vec_ids sit above ID_STRIDE, so the seeded
#: codebooks/centroids (lowest vec_ids) and query_vec_id=0 are
#: unchanged — the same model parameters search a 64x corpus.
ANN_QUERIES = (
    "embedding_topk",
    "ann_lsh_topk",
    "ivf_ann_topk",
    "pq_adc_topk",
)
#: table each query actually scales with (the others stay 1x links)
REPLICATED = {"documents", "orders", "embeddings", "events"}


def _link_or_copy(src: str, dst: str) -> None:
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


def build_scaled_dir(
    spark, base: str, factor: int, root: str, replicated: set[str] | None = None
) -> str:
    """``base`` with the ``replicated`` tables replicated `factor` x
    (ids disjoint); every other table hard-linked (copy fallback).
    ``replicated`` defaults to the full REPLICATED set; harnesses that
    scale a single table pass a subset (e.g. {"events"} for the
    stateful-replay A/B) so both stagings share one implementation —
    stride, part count, timestamp pinning, and the _DONE marker can
    never silently diverge between harnesses (review r13)."""
    repl = REPLICATED if replicated is None else replicated
    # subset stagings get their own dir: a root shared between
    # harnesses must never reuse a _DONE dir staged with a different
    # replicated set
    suffix = "" if repl == REPLICATED else "_" + "-".join(sorted(repl))
    out = os.path.join(root, f"x{factor}{suffix}")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    os.makedirs(out, exist_ok=True)
    for name in catalog.TABLE_NAMES:
        src = os.path.join(base, f"{name}.parquet")
        dst = os.path.join(out, f"{name}.parquet")
        if name not in repl:
            if os.path.isdir(src):
                shutil.copytree(src, dst, copy_function=_link_or_copy,
                                dirs_exist_ok=True)
            else:
                _link_or_copy(src, dst)
            continue
        df = spark.read.schema(catalog.FIXTURE_SCHEMAS[name]).parquet(src)
        reps = spark.range(factor).withColumnRenamed("id", "_rep")
        id_cols = {"documents": ("doc_id",),
                   "orders": ("o_orderkey", "o_custkey"),
                   "embeddings": ("vec_id",),
                   "events": ("event_id", "user_id")}[name]
        scaled = df.crossJoin(F.broadcast(reps))
        for c in id_cols:
            scaled = scaled.withColumn(
                c, (F.col(c) + F.col("_rep") * F.lit(ID_STRIDE)).cast("long")
            )
        # events carries the catalog's TIMESTAMP(us) tripwire: Spark's
        # default INT96 output reads back as ns — pin micros for the copy
        prev_ts = spark.conf.get("spark.sql.parquet.outputTimestampType")
        spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        try:
            (scaled.drop("_rep")
             .repartition(32)
             .write.mode("overwrite").parquet(dst))
        finally:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prev_ts)
    open(os.path.join(out, "_DONE"), "w").close()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", nargs="+", type=int, default=[1, 8, 64])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--queries", nargs="+", default=list(QUERIES),
                    help='query names, or the shorthand "ann" for the ANN tier')
    ap.add_argument("--keep", default=None,
                    help="reuse/keep scaled fixtures at this dir")
    args = ap.parse_args()
    if args.queries == ["ann"]:
        args.queries = list(ANN_QUERIES)

    spark = get_spark()
    root = args.keep or tempfile.mkdtemp(prefix="scale_curve_")
    os.makedirs(root, exist_ok=True)
    qs = registry.all_queries()
    results: dict[str, dict[int, float]] = {q: {} for q in args.queries}
    try:
        for factor in args.factors:
            sf = build_scaled_dir(spark, SF_DIR, factor, root)
            for qname in args.queries:
                ts = []
                for _ in range(args.reps):
                    # localCheckpoint blocks from the PREVIOUS run are
                    # dead weight (their results are already consumed)
                    # but stay pinned in storage memory — a 3-query x
                    # 3-factor session OOMed the 8g driver at 128x
                    # before this reap (r11 finding).
                    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                        rdd.unpersist()
                    spark.sparkContext._jvm.System.gc()
                    t0 = time.perf_counter()
                    qs[qname].fn(spark, sf).count()
                    ts.append(time.perf_counter() - t0)
                med = statistics.median(ts)
                results[qname][factor] = med
                print(json.dumps({"query": qname, "factor": factor,
                                  "median_s": round(med, 3),
                                  "spread": [round(min(ts), 3),
                                             round(max(ts), 3)]}),
                      flush=True)
        base_factor = args.factors[0]
        print("\n| query | " +
              " | ".join(f"{f}x s (rel)" for f in args.factors) + " |")
        print("|---" * (len(args.factors) + 1) + "|")
        for qname in args.queries:
            row = [qname]
            b = results[qname][base_factor]
            for f in args.factors:
                v = results[qname][f]
                row.append(f"{v:.2f} ({v / b:.2f}x)")
            print("| " + " | ".join(row) + " |")
    finally:
        if not args.keep:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
