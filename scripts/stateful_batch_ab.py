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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def stage(factor: int, root: str) -> str:
    """sf0.1 with ONLY events replicated factor-x (other tables linked).

    Delegates to scale_curve.build_scaled_dir (review r13: the A/B's
    validity depends on matching that staging bit-for-bit — stride,
    disjoint event_id/user_id spaces, TIMESTAMP_MICROS pin, 32 part
    files, link-with-copy-fallback, partial-staging recovery — so it
    must BE that staging, restricted to the one table this query
    scales with)."""
    import importlib.util

    from data_engineer_8_final_project_spark.session import get_spark

    spec = importlib.util.spec_from_file_location(
        "scale_curve", os.path.join(ROOT, "scripts", "scale_curve.py")
    )
    scale_curve = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(scale_curve)
    spark = get_spark(app_name="stateful_ab_stage")
    try:
        return scale_curve.build_scaled_dir(
            spark, SF_DIR, factor, root, replicated={"events"}
        )
    finally:
        spark.stop()


def run_leg(mft: int, scaled_dir: str, query: str = "user_totals") -> None:
    """One fresh-JVM leg: the registered query's exact pipeline at the
    given batch-count knob. Prints one JSON line on stdout.

    The knob's meaning is per-query: ``user_totals`` replays the raw
    part files, so it is maxFilesPerTrigger; ``session`` /``vcjoin``
    replay FIXED-CHUNK time-ordered stagings (their batch count is set
    by construction, not by the file count), so there the knob is the
    staging's n_chunks — 32 vs 4 compares a many-small-batch replay
    against the shipped default on the same corpus, hashes pinned.
    These two are JVM-side consumers (native session_window agg /
    stream-stream join): the r13 cost law (per-batch pandas call per
    touched key) does NOT apply; what batch count costs them is
    per-batch state-store commit + shuffle rounds, measured here
    (VERDICT r13 item 4)."""
    from data_engineer_8_final_project_spark.session import get_spark
    from data_engineer_8_final_project_spark.streaming import events as ev
    from data_engineer_8_final_project_spark.streaming import stateful

    spark = get_spark(app_name=f"stateful_ab_{query}_{mft}")
    spark.sparkContext.setLogLevel("ERROR")
    width = ev.state_width_for(os.path.join(scaled_dir, "events.parquet"))
    progress: list = []
    t0 = time.perf_counter()
    if query == "user_totals":
        stream = stateful.user_running_totals(
            ev.read_events_stream(spark, scaled_dir, max_files_per_trigger=mft)
        )
        sink = ev.run_available_now_spilled(
            stream, output_mode="update", state_partitions=width, progress_out=progress
        )
        pdf = stateful.finalize_totals(sink).orderBy("user_id").toPandas()
    elif query == "session":
        out = ev.session_window_stream(spark, scaled_dir, n_chunks=mft)
        pdf = out.orderBy("user_id", "session_start").toPandas()
    elif query == "vcjoin":
        out = ev.view_click_stream_join(spark, scaled_dir, n_chunks=mft)
        pdf = out.orderBy("v_event_id", "c_event_id").toPandas()
    else:
        raise SystemExit(f"unknown query {query!r}")
    wall = time.perf_counter() - t0
    cols = sorted(pdf.columns)
    canon = pdf[cols].astype(str).sort_values(by=cols, ignore_index=True)
    print(
        json.dumps(
            {
                "mft": mft,
                "wall_s": round(wall, 1),
                # session/vcjoin drain inside their pipeline (no
                # progress hook) and read maxFilesPerTrigger=1, so the
                # TRUE micro-batch count is the staged FILE count:
                # session's staging appends a watermark-drain sentinel
                # (n_chunks + 1 files; reporting the bare knob
                # undercounted by one, r14 ADVICE), while vcjoin's
                # time-ordered replay writes exactly n_chunks files
                # with NO sentinel (r15 review: a blanket +1 would
                # over-correct that leg by the same one batch).
                "n_batches": (
                    len(progress)
                    if query == "user_totals"
                    else mft + 1
                    if query == "session"
                    else mft
                ),
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
    ap.add_argument(
        "--query",
        default="user_totals",
        choices=["user_totals", "session", "vcjoin"],
        help="pipeline to A/B (knob = maxFilesPerTrigger for "
        "user_totals, staging n_chunks for session/vcjoin)",
    )
    ap.add_argument("--one", type=int, default=None, help="(internal) run one leg")
    ap.add_argument("--dir", default=None, help="(internal) staged corpus dir")
    args = ap.parse_args()

    if args.one is not None:
        run_leg(args.one, args.dir, args.query)
        return

    root = args.keep or tempfile.mkdtemp(prefix="stateful_ab_")
    os.makedirs(root, exist_ok=True)
    legs = []
    failed = []
    ok = True
    try:
        scaled = stage(args.factor, root)
        for mft in args.mft:
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--one",
                    str(mft),
                    "--dir",
                    scaled,
                    "--query",
                    args.query,
                ],
                capture_output=True,
                text=True,
            )
            line = next(
                (ln for ln in proc.stdout.splitlines() if ln.startswith("{")), None
            )
            if proc.returncode != 0 or line is None:
                print(f"leg mft={mft} FAILED\n{proc.stderr[-2000:]}", file=sys.stderr)
                failed.append(mft)
                continue
            rec = json.loads(line)
            legs.append(rec)
            print(json.dumps(rec), flush=True)
        if legs:
            h0 = legs[0]["hash"]
            ok = all(r["hash"] == h0 for r in legs)
            print("\n| maxFilesPerTrigger | batches | wall s | rel | hash |")
            print("|---|---|---|---|---|")
            # rel is meaningful only against the FIRST REQUESTED leg;
            # if that leg failed (it is the slowest, most timeout-
            # prone), renormalizing silently would understate every
            # ratio — label the column's true base instead.
            base = legs[0]["wall_s"]
            if failed and args.mft and legs[0]["mft"] != args.mft[0]:
                print(f"(rel is vs mft={legs[0]['mft']} — the mft={args.mft[0]} leg failed)")
            for r in legs:
                print(
                    f"| {r['mft']} | {r['n_batches']} | {r['wall_s']} "
                    f"| {r['wall_s'] / base:.2f}x | {r['hash'][:10]} |"
                )
            print(f"\nhashes {'ALL EQUAL' if ok else 'DIVERGED -- A/B INVALID'}")
    finally:
        if not args.keep:
            shutil.rmtree(root, ignore_errors=True)
    # a scripted caller must not mistake a broken A/B for a measurement
    if failed:
        sys.exit(2)
    if not ok:
        sys.exit(3)


if __name__ == "__main__":
    main()
