"""Micro-batch-size A/B for the Python-worker-bound stateful stream.

VERDICT r12 item 2: `user_totals_stateful` is the engine's slowest
scale curve (679.8 s at 128x, 323.8 s at 64x post-projection), and its
documented cost law — per-group pandas invocation x touched keys per
batch — names "fewer, larger micro-batches" as the structural fix,
never measured. This harness measures it: stage a k-replicated events
corpus (32 part files, the scale_curve shape), then replay the SAME
pipeline as the registered query (read_events_stream ->
user_running_totals -> spilled update-mode drain -> finalize) once per
``maxFilesPerTrigger`` setting, ONE LEG PER FRESH JVM (the r12
scale-leg protocol), pinning the order-insensitive value hash of the
finalized table unchanged across legs — batch count must never change
the answer, only the wall clock.

Run:  python scripts/stateful_batch_ab.py --factor 64 --mft 1 4 8 32
Each leg prints one JSON line; the parent prints a summary table.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

ID_STRIDE = 1_000_000_000  # scale_curve's disjoint-id stride
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def stage(factor: int, root: str) -> str:
    """sf0.1 with ONLY events replicated factor-x (other tables linked).

    Same replication as scale_curve.build_scaled_dir (disjoint
    event_id/user_id spaces, TIMESTAMP_MICROS pinned, 32 part files)
    but skips the tables this query never reads at scale.
    """
    from pyspark.sql import functions as F

    from data_engineer_8_final_project_spark import catalog
    from data_engineer_8_final_project_spark.session import get_spark

    out = os.path.join(root, f"x{factor}")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    os.makedirs(out, exist_ok=True)
    spark = get_spark(app_name="stateful_ab_stage")
    for name in catalog.TABLE_NAMES:
        src = os.path.join(SF_DIR, f"{name}.parquet")
        dst = os.path.join(out, f"{name}.parquet")
        if name != "events":
            if os.path.isdir(src):
                shutil.copytree(src, dst, copy_function=os.link, dirs_exist_ok=True)
            else:
                os.link(src, dst)
            continue
        df = spark.read.schema(catalog.FIXTURE_SCHEMAS[name]).parquet(src)
        reps = spark.range(factor).withColumnRenamed("id", "_rep")
        scaled = df.crossJoin(F.broadcast(reps))
        for c in ("event_id", "user_id"):
            scaled = scaled.withColumn(
                c, (F.col(c) + F.col("_rep") * F.lit(ID_STRIDE)).cast("long")
            )
        prev_ts = spark.conf.get("spark.sql.parquet.outputTimestampType")
        spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        try:
            scaled.drop("_rep").repartition(32).write.mode("overwrite").parquet(dst)
        finally:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prev_ts)
    spark.stop()
    open(os.path.join(out, "_DONE"), "w").close()
    return out


def run_leg(mft: int, scaled_dir: str) -> None:
    """One fresh-JVM leg: the registered query's exact pipeline at the
    given maxFilesPerTrigger. Prints one JSON line on stdout."""
    from data_engineer_8_final_project_spark.session import get_spark
    from data_engineer_8_final_project_spark.streaming import events as ev
    from data_engineer_8_final_project_spark.streaming import stateful

    spark = get_spark(app_name=f"stateful_ab_mft{mft}")
    spark.sparkContext.setLogLevel("ERROR")
    width = ev.state_width_for(os.path.join(scaled_dir, "events.parquet"))
    progress: list = []
    t0 = time.perf_counter()
    stream = stateful.user_running_totals(
        ev.read_events_stream(spark, scaled_dir, max_files_per_trigger=mft)
    )
    sink = ev.run_available_now_spilled(
        stream, output_mode="update", state_partitions=width, progress_out=progress
    )
    pdf = stateful.finalize_totals(sink).orderBy("user_id").toPandas()
    wall = time.perf_counter() - t0
    cols = sorted(pdf.columns)
    canon = pdf[cols].astype(str).sort_values(by=cols, ignore_index=True)
    print(
        json.dumps(
            {
                "mft": mft,
                "wall_s": round(wall, 1),
                "n_batches": len(progress),
                "rows": len(pdf),
                "hash": hashlib.md5(canon.to_csv(index=False).encode()).hexdigest(),
                "state_width": width,
            }
        ),
        flush=True,
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=64)
    ap.add_argument("--mft", nargs="+", type=int, default=[1, 4, 8, 32])
    ap.add_argument("--keep", default=None, help="reuse/keep staged corpus here")
    ap.add_argument("--one", type=int, default=None, help="(internal) run one leg")
    ap.add_argument("--dir", default=None, help="(internal) staged corpus dir")
    args = ap.parse_args()

    if args.one is not None:
        run_leg(args.one, args.dir)
        return

    root = args.keep or tempfile.mkdtemp(prefix="stateful_ab_")
    os.makedirs(root, exist_ok=True)
    legs = []
    try:
        scaled = stage(args.factor, root)
        for mft in args.mft:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", str(mft), "--dir", scaled],
                capture_output=True,
                text=True,
            )
            line = next(
                (ln for ln in proc.stdout.splitlines() if ln.startswith("{")), None
            )
            if proc.returncode != 0 or line is None:
                print(f"leg mft={mft} FAILED\n{proc.stderr[-2000:]}", file=sys.stderr)
                continue
            rec = json.loads(line)
            legs.append(rec)
            print(json.dumps(rec), flush=True)
        if legs:
            h0 = legs[0]["hash"]
            ok = all(r["hash"] == h0 for r in legs)
            print("\n| maxFilesPerTrigger | batches | wall s | rel | hash |")
            print("|---|---|---|---|---|")
            base = legs[0]["wall_s"]
            for r in legs:
                print(
                    f"| {r['mft']} | {r['n_batches']} | {r['wall_s']} "
                    f"| {r['wall_s'] / base:.2f}x | {r['hash'][:10]} |"
                )
            print(f"\nhashes {'ALL EQUAL' if ok else 'DIVERGED -- A/B INVALID'}")
    finally:
        if not args.keep:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
