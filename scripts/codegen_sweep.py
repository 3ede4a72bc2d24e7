"""Registry-wide codegen health sweep.

Two silent performance failure modes hide behind green correctness
(both found in r13/r14, VERDICT r13 item 2):

1. **Janino 64 KB blowout** — a fused whole-stage method too large to
   COMPILE logs `ERROR CodeGenerator: Code grows beyond 64 KB` and the
   stage runs off the whole-stage path. Under
   ``spark.sql.codegen.fallback=false`` this RAISES instead, so the
   sweep turns a silent regression into a loud per-query failure.
   (r14 found four such stages this way; all fixed by hoisting
   per-side norms below the shuffle — operators/similarity.py.)

2. **JIT huge-method fallback** — a method that compiles but exceeds
   the session's ``spark.sql.codegen.hugeMethodLimit`` (pinned to
   HotSpot's 8000-bytecode JIT ceiling in session.py) makes Spark run
   the stage on the split-expression row path. That is the intended
   fast behavior for giant-arithmetic stages, but WHICH stages take it
   should be visible, not guessed: the sweep attributes the
   `bytecode size ... exceeded` / huge-method WARNs to the query that
   triggered them.

Run (one fresh JVM, ~15 min at sf0.01):

    python scripts/codegen_sweep.py [--sf /root/testdata/sf0.01]

Prints one JSON line per query with {janino_error, huge_method} and a
final summary. Exit 1 if any query fails outright (Janino blowout or
execution error), 0 otherwise — huge-method fallbacks are informational.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

HUGE_RE = re.compile(
    r"too long generated codes|bytecode size .* exceeded|hugeMethodLimit", re.I
)


def child(sf: str) -> None:
    """Run every registered query under fallback=false, emitting a
    BEGIN marker per query on stderr so the parent can attribute the
    JVM's codegen warnings that follow it."""
    from data_engineer_8_final_project_spark.registry import all_queries
    from data_engineer_8_final_project_spark.session import get_spark

    spark = get_spark(app_name="codegen_sweep", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("WARN")
    # the huge-method fallback message ("Found too long generated
    # codes ... whole-stage codegen was disabled for this plan") logs
    # at INFO on WholeStageCodegenExec — enable just that logger so the
    # parent can attribute fallbacks without drowning in global INFO
    jvm = spark.sparkContext._jvm
    jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.WholeStageCodegenExec",
        jvm.org.apache.logging.log4j.Level.INFO,
    )
    spark.conf.set("spark.sql.codegen.fallback", "false")
    for name, q in all_queries().items():
        print(f"SWEEP-BEGIN {name}", file=sys.stderr, flush=True)
        try:
            q.fn(spark, sf).count()
            print(f"SWEEP-OK {name}", flush=True)
        except Exception as ex:  # noqa: BLE001 — classified by the parent
            kind = "janino" if "64 KB" in str(ex) or "grows beyond" in str(ex) else "error"
            print(f"SWEEP-FAIL {name} {kind}", flush=True)
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--child", action="store_true")
    args = ap.parse_args()
    if args.child:
        child(args.sf)
        return

    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", "--sf", args.sf],
        capture_output=True,
        text=True,
    )
    status = {}
    for ln in proc.stdout.splitlines():
        if ln.startswith("SWEEP-OK "):
            status[ln.split()[1]] = "ok"
        elif ln.startswith("SWEEP-FAIL "):
            _, name, kind = ln.split()
            status[name] = kind
    # attribute huge-method WARNs to the query whose marker precedes them
    huge: dict[str, int] = {}
    current = None
    for ln in proc.stderr.splitlines():
        if ln.startswith("SWEEP-BEGIN "):
            current = ln.split()[1]
        elif current and HUGE_RE.search(ln):
            huge[current] = huge.get(current, 0) + 1

    failed = sorted(n for n, s in status.items() if s != "ok")
    for name in sorted(status):
        print(
            json.dumps(
                {
                    "query": name,
                    "status": status[name],
                    "huge_method_fallbacks": huge.get(name, 0),
                }
            )
        )
    print(
        f"\n{len(status)} queries swept; {len(failed)} failed "
        f"({failed or 'none'}); huge-method fallback queries: "
        f"{sorted(huge) or 'none'}"
    )
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
