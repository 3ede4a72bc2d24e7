"""The one-line bench JSON must carry per-query detail to the driver.

VERDICT r16 item 2: the old emission dropped the whole ``queries`` map
whenever the serialized line passed 1500 chars — with 77 headline queries
that was always, so the driver's PERF comparison saw ``per_query: {}``.
These tests pin the replacement: compact encoding, slowest-first
truncation with a reconstructible residual, and a hard length budget.

Pure-python: no Spark session.
"""

from __future__ import annotations

import importlib.util
import json
import os

_spec = importlib.util.spec_from_file_location(
    "bench",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


HEADER = {
    "metric": "headline_queries_total_sec",
    "value": 123.45,
    "unit": "sec",
    "queries_n": 77,
    "queries_detail": "bench_spread.json",
    "passes": 3,
    "sf": 0.1,
    "host_factor": 0.939,
    "host_factor_start": 0.947,
    "host_factor_end": 0.93,
    "probe_drift": 1.231,
    "shuffle_factor": 1.164,
    "probe_parallelism": 32,
    "run_id": "0123456789ab",
}


def test_small_map_emitted_whole():
    timings = {"a": 1.234, "b": 0.5}
    line = json.loads(bench.format_bench_line(HEADER, timings))
    assert line["queries"] == {"a": 1.23, "b": 0.5}
    assert "queries_rest_n" not in line


def test_line_fits_budget_and_keeps_slowest():
    # 120 long-named queries cannot all fit; the slowest must survive.
    timings = {f"query_with_a_rather_long_name_{i:03d}": 0.1 + i * 0.05 for i in range(120)}
    payload = bench.format_bench_line(HEADER, timings)
    assert len(payload) <= bench.LINE_BUDGET
    line = json.loads(payload)
    slowest = max(timings, key=timings.get)
    assert slowest in line["queries"]
    kept = set(line["queries"])
    # truncation is slowest-first: every kept entry >= every dropped entry
    dropped = set(timings) - kept
    assert min(timings[k] for k in kept) >= max(timings[k] for k in dropped)
    # residual makes the headline total reconstructible
    assert line["queries_rest_n"] == len(dropped)
    rest = sum(timings[k] for k in dropped)
    assert abs(line["queries_rest_total"] - rest) < 0.01 * len(dropped) + 0.01


def test_committed_r16_spread_reaches_driver():
    """With the real 77-query medians, most of the map (incl. every query
    slower than ~1 s) must make it into the line."""
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench_spread.json")
    med = json.load(open(path))["medians"]
    payload = bench.format_bench_line(HEADER, med)
    assert len(payload) <= bench.LINE_BUDGET
    line = json.loads(payload)
    assert len(line["queries"]) >= 50
    for name, sec in med.items():
        if sec >= 1.0:
            assert name in line["queries"], name
