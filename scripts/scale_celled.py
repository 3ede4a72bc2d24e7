"""Deep-scaling experiment for the cell-blocked pair operators
(semantic_dedup_verdicts, knn_graph): scale data AND the cell count.

The registered queries pin n_cells=16 for oracle replay; at fixed
n_cells the within-cell pair stage is O((n/cells)^2) per cell — the
documented quadratic that SemDeDup controls by growing the cluster
count with the corpus (~100k clusters at production scale). This
experiment proves the knob: replicate embeddings k-fold (disjoint ids
above the stride so the seeded-medoid centroids change — that is the
point: the quantizer must re-fit at scale) and raise n_cells
linearly with k, holding per-cell population ~constant. Expected:
pair-stage wall ~linear in data; assignment wall linear in
n_cells * n (the flat-IVF assignment term — production systems cut it
with hierarchical coarse quantizers, out of scope here and recorded
as such in the build log).

Reuses the fixtures built by scale_curve.py (--keep dir). Run AFTER
scale_curve.py has populated the dir:

    python scripts/scale_celled.py --keep /tmp/scale_fx_r6 --factors 1 8
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_engineer_8_final_project_spark import catalog  # noqa: E402
from data_engineer_8_final_project_spark.operators import clusters, similarity  # noqa: E402
from data_engineer_8_final_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", nargs="+", type=int, default=[1, 8])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--base-cells", type=int, default=16)
    ap.add_argument("--keep", default="/tmp/scale_fx_r6")
    args = ap.parse_args()

    spark = get_spark()
    for factor in args.factors:
        sf = os.path.join(args.keep, f"x{factor}")
        if not os.path.exists(os.path.join(sf, "_DONE")):
            raise SystemExit(f"fixture dir {sf} not built — run scale_curve.py first")
        emb = spark.read.schema(catalog.FIXTURE_SCHEMAS["embeddings"]).parquet(
            os.path.join(sf, "embeddings.parquet")
        )
        n_cells = args.base_cells * factor
        for opname, run in (
            ("semantic_dedup", lambda: similarity.semantic_dedup_verdicts(
                emb, n_cells=n_cells, threshold=0.45).count()),
            ("knn_graph", lambda: similarity.knn_graph(
                emb, n_cells=n_cells, k=3).count()),
            # the round-7 graph consumers: at fixed cells they inherit
            # the pair-stage quadratic via the knn build; cells-scaled
            # they ride its linear form plus their own per-round joins
            ("knn_triangle_stats", lambda: similarity.knn_triangle_stats(
                emb, n_cells=n_cells, k=3).count()),
            ("knn_pagerank", lambda: clusters.pagerank_fixed_point(
                emb.select(F.col("vec_id").alias("id")),
                similarity.knn_graph(emb, n_cells=n_cells, k=3).select("src", "dst"),
                iters=3).count()),
            ("knn_communities", lambda: clusters.label_propagation_fixed(
                emb.select(F.col("vec_id").alias("id")),
                similarity.knn_graph(emb, n_cells=n_cells, k=3).select("src", "dst"),
                iters=3).count()),
        ):
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                n = run()
                ts.append(time.perf_counter() - t0)
            print(json.dumps({
                "op": opname, "factor": factor, "n_cells": n_cells, "rows": n,
                "median_s": round(statistics.median(ts), 3),
                "spread": [round(min(ts), 3), round(max(ts), 3)],
            }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
