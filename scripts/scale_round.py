"""Per-round deep-scaling artifact: SCALE_r{N}.md.

Round-6 verdict item 6: the flat sf0.1 bench cannot see a hidden
O(n^2) term (the PQ-encode 10.1x defect was only visible at 8x/64x),
so every round runs the 1x/8x/64x curve over the FIVE slowest bench
queries (from the newest BENCH_r*.json medians) plus any names passed
explicitly, and commits the table.

Usage:
    python scripts/scale_round.py --round 7 [--extra q1 q2] \
        [--factors 1 8 64] [--reps 2]

Writes SCALE_r{N}.md at the repo root and prints the table.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_bench_medians() -> dict[str, float]:
    """Per-query medians: bench_spread.json first, BENCH_r*.json fallback.

    Since round 9 the bench line printed for the driver is bounded
    (no per-query map — it overflowed the driver's tail buffer twice)
    and the medians live in bench_spread.json; older rounds carried
    them inline under 'parsed'.
    """
    spread_path = os.path.join(ROOT, "bench_spread.json")
    # r9 ADVICE: an ad-hoc bench run at a different SF leaves a
    # bench_spread.json whose medians would silently skew the
    # slowest-five pick — trust it only when its recorded 'sf' matches
    # the bench default scale, else fall back to the round-archived
    # BENCH_r*.json.
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        expected_sf = float(base[2:]) if base.startswith("sf") else base
    except ValueError:
        expected_sf = base
    if os.path.exists(spread_path):
        try:
            rec = json.load(open(spread_path))
            if (
                isinstance(rec.get("medians"), dict)
                and rec["medians"]
                and rec.get("sf") == expected_sf
            ):
                return rec["medians"]
            if rec.get("sf") != expected_sf:
                print(
                    f"bench_spread.json sf={rec.get('sf')!r} != expected "
                    f"{expected_sf!r}; falling back to BENCH_r*.json",
                    file=sys.stderr,
                )
        except ValueError:
            pass
    paths = sorted(
        glob.glob(os.path.join(ROOT, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
        reverse=True,
    )
    for p in paths:
        try:
            rec = json.load(open(p))
        except ValueError:
            continue
        parsed = rec.get("parsed") if isinstance(rec, dict) else None
        if parsed and isinstance(parsed.get("queries"), dict):
            return parsed["queries"]
        # driver tail capture: try to recover a queries map from 'tail'
        tail = rec.get("tail", "") if isinstance(rec, dict) else ""
        m = re.search(r'"queries": (\{[^}]*\})', tail)
        if m:
            try:
                return json.loads(m.group(1))
            except ValueError:
                pass
    return {}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--extra", nargs="*", default=[])
    ap.add_argument("--factors", nargs="+", type=int, default=[1, 8, 64])
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--keep", default=None)
    args = ap.parse_args()

    medians = newest_bench_medians()
    slowest = [n for n, _ in sorted(medians.items(), key=lambda kv: -kv[1])[:5]]
    queries = list(dict.fromkeys(slowest + args.extra))
    if not queries:
        sys.exit("no bench medians found and no --extra queries given")

    cmd = [
        sys.executable,
        os.path.join(ROOT, "scripts", "scale_curve.py"),
        "--queries",
        *queries,
        "--factors",
        *[str(f) for f in args.factors],
        "--reps",
        str(args.reps),
    ]
    if args.keep:
        cmd += ["--keep", args.keep]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        sys.exit(f"scale_curve failed with exit {proc.returncode} (stderr above)")
    out = proc.stdout

    rows: dict[str, dict[int, float]] = {}
    for m in re.finditer(r'\{"query[^}]*\}', out):
        rec = json.loads(m.group(0))
        rows.setdefault(rec["query"], {})[rec["factor"]] = rec["median_s"]

    lines = [
        f"# SCALE_r{args.round} — 1x/8x/64x deep-scaling curve",
        "",
        f"Queries = five slowest by BENCH median (+ extras: {args.extra or 'none'}).",
        f"Replicated tables get disjoint id spaces; reps = {args.reps}, medians in seconds.",
        "",
        "| query | " + " | ".join(f"{f}x s (rel)" for f in args.factors) + " |",
        "|---" * (len(args.factors) + 1) + "|",
    ]
    for q in queries:
        if q not in rows:
            continue
        base = rows[q][args.factors[0]]
        cells = [f"{rows[q][f]:.2f} ({rows[q][f] / base:.2f}x)" for f in args.factors]
        lines.append("| " + " | ".join([q, *cells]) + " |")
    text = "\n".join(lines) + "\n"
    dest = os.path.join(ROOT, f"SCALE_r{args.round}.md")
    open(dest, "w").write(text)
    print(text)
    print("wrote", dest)


if __name__ == "__main__":
    main()
