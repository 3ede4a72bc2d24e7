"""Flat vs hierarchical routing A/B INSIDE a cell-blocked consumer.

VERDICT r7 item 6's "done" check: `quantizer_ab.py` proved the
two-level assignment 2.2x cheaper standalone; this script proves it
inside the batch k-NN graph builder (`knn_graph(n_parents=...)`), the
cell-blocked pipeline the quantizer exists for.

Method: replicate sf0.1 embeddings `factor`x with disjoint vec_ids
(seeds = lowest vec_ids stay unchanged, so both routings share the
same leaf-centroid model), then time knn_graph flat vs hierarchical at
equal leaf count. Quality at corpus scale can't use brute-force kNN
(O(n^2)); instead we report

- edge agreement (how much the routing changed the graph), and
- mean edge cosine per arm (did neighbor QUALITY drop — the metric
  that matters for the SemDeDup/label-vote consumers; equal-or-higher
  mean cosine at lower assignment cost is the win condition),

plus the per-vector row-count integrity both arms must keep.

Usage: python scripts/knn_routing_ab.py [--factor 64] [--cells 256]
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
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--keep", default="/tmp/scale_fix")
    args = ap.parse_args()

    spark = get_spark(app_name="knn-routing-ab")
    sf = build_scaled_dir(spark, SF_DIR, args.factor, args.keep)
    emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    n_parents = max(2, int(args.cells**0.5))

    def run(tag: str, n_par: int | None):
        ts, pdf = [], None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            pdf = similarity.knn_graph(
                emb, n_cells=args.cells, k=args.k, n_parents=n_par
            ).toPandas()
            ts.append(time.perf_counter() - t0)
        assert pdf.groupby("src").size().eq(args.k).all(), f"{tag}: ragged graph"
        rec = {
            "variant": tag,
            "factor": args.factor,
            "n_cells": args.cells,
            "n_parents": n_par,
            "median_s": round(statistics.median(ts), 3),
            "spread": [round(min(ts), 3), round(max(ts), 3)],
            "edges": len(pdf),
            "mean_cosine": round(float(pdf["cosine"].mean()), 6),
        }
        print(json.dumps(rec), flush=True)
        return pdf, rec

    flat_pdf, flat_rec = run("flat", None)
    two_pdf, two_rec = run("two-level", n_parents)

    fe = set(map(tuple, flat_pdf[["src", "dst"]].values.tolist()))
    te = set(map(tuple, two_pdf[["src", "dst"]].values.tolist()))
    print(
        json.dumps(
            {
                "edge_agreement": round(len(fe & te) / len(fe), 4),
                "speedup": round(flat_rec["median_s"] / two_rec["median_s"], 3),
                "cosine_ratio": round(
                    two_rec["mean_cosine"] / flat_rec["mean_cosine"], 6
                ),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
