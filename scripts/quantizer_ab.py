"""Flat vs two-level quantizer A/B at replicated scale.

VERDICT r6 stretch item 8's "done" check: the hierarchical assignment
must hold recall at equal leaf count / probe budget while cutting the
per-row assignment cost that dominates past ~1024 cells.

Method: replicate sf0.1 embeddings k times with disjoint id spaces
(the scale_curve fixture builder — seeds = lowest vec_ids stay
unchanged, so both quantizers search a kx corpus with the same
centroid model), then for each (n_cells, probe) configuration time
flat ivf_topk vs ivf2_topk (median of reps) and measure recall@k vs
the brute-force exact top-k.

Usage: python scripts/quantizer_ab.py [--factor 64] [--cells 256]
           [--reps 3] [--keep /tmp/scale_fix]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineer_8_final_project_spark.operators import similarity  # noqa: E402
from data_engineer_8_final_project_spark.session import get_spark  # noqa: E402
from scale_curve import SF_DIR, build_scaled_dir  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=64)
    ap.add_argument("--cells", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--keep", default="/tmp/scale_fix")
    args = ap.parse_args()

    spark = get_spark(app_name="quantizer-ab")
    sf = build_scaled_dir(spark, SF_DIR, args.factor, args.keep)
    emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    n_parents = max(2, int(args.cells**0.5))
    n_probe = max(4, args.cells // 16)

    exact = set(
        similarity.brute_force_topk(emb, query_vec_id=0, k=args.k)
        .toPandas()["vec_id"]
    )

    def run(tag, fn):
        ids, ts = None, []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            ids = set(fn().toPandas()["vec_id"])
            ts.append(time.perf_counter() - t0)
        rec = len(exact & ids) / len(exact)
        print(
            json.dumps(
                {
                    "variant": tag,
                    "factor": args.factor,
                    "n_cells": args.cells,
                    "n_probe": n_probe,
                    "median_s": round(statistics.median(ts), 3),
                    "spread": [round(min(ts), 3), round(max(ts), 3)],
                    "recall": round(rec, 3),
                }
            ),
            flush=True,
        )
        return rec

    r_flat = run(
        "flat",
        lambda: similarity.ivf_topk(
            emb, query_vec_id=0, n_cells=args.cells, n_probe=n_probe, k=args.k
        ),
    )
    r_two = run(
        "two-level",
        lambda: similarity.ivf2_topk(
            emb,
            query_vec_id=0,
            n_cells=args.cells,
            n_parents=n_parents,
            n_probe_l1=max(2, n_parents // 4),
            n_probe=n_probe,
            k=args.k,
        ),
    )
    print("recall two-level >= flat:", r_two >= r_flat)
    spark.stop()


if __name__ == "__main__":
    main()
