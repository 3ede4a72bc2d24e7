"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes fully (noop sink — no collect-to-driver, measuring
the distributed plan, not Arrow transfer). ``value`` is the sum of
per-query MEDIAN wall times over three interleaved passes after a
JVM/session warmup query.

Measurement design (round-4 verdict: the shared-JVM single-pass
numbers had a noise band wider than most judged deltas): each pass
runs the whole query set, and the set is repeated three times — so one
query's repetitions are separated by minutes of other work, which
decorrelates the GC/codegen-alignment jitter that back-to-back reps
share. The reported per-query value is the MEDIAN of the three; the
``spread`` map carries [min, max] so a regression verdict can check
whether a delta clears the noise band before it counts.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineer_8_final_project_spark.registry import all_queries
from data_engineer_8_final_project_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Host-speed calibration (r9 VERDICT item 2): the r9 bench drifted a
#: uniform ~1.17× vs r8 with ZERO plan changes — consistent with
#: sandbox host throughput variance, but the artifact had no way to
#: prove it. The probe is a fixed synthetic scan+agg with a PINNED
#: plan (range → xxhash64 → sum: pure whole-stage-codegen CPU work,
#: no data dependence, no shuffle beyond the final single-row agg),
#: run three times after warmup; the median divided by the reference
#: constant below is the printed ``host_factor``. Cross-round
#: comparisons divide per-query medians by their round's host_factor
#: before judging a delta. Reference = median probe time measured in
#: the round-10 session (local[32], 128 GiB sandbox).
PROBE_ROWS = 8_000_000_000
PROBE_REFERENCE_SEC = 1.75

#: Second calibration dimension (r15): the r14 driver run AND the r15
#: builder run both showed UNIFORM wall drift (~1.2x across all 77
#: queries) while the pure-CPU probe read FAST (0.88-0.99) — the
#: drifting dimension was scan/shuffle throughput (page-cache reads,
#: exchange serialization, spill path), which a register-resident
#: xxhash loop cannot see. This probe forces every row of a pinned
#: range through a full exchange (repartition on a modulo key — no
#: map-side combine), so its wall tracks shuffle machinery throughput.
#: Reference = median measured in the round-15 session (local[32]);
#: factors are comparable across rounds only at matching parallelism,
#: same contract as the CPU probe. Diagnostic: find_regressions does
#: NOT divide by it — a CPU-vs-shuffle factor disagreement flags "host
#: drifted in a non-CPU dimension" for the adjudication protocol
#: instead of leaving a uniform swing unexplained (PROBES.md r15).
SHUFFLE_PROBE_ROWS = 100_000_000
SHUFFLE_REFERENCE_SEC = 2.17


def _shuffle_probe(spark) -> tuple[float, int]:
    """Median wall of the pinned full-shuffle plan over 3 runs."""
    import pyspark.sql.functions as F

    par = spark.sparkContext.defaultParallelism
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        (
            spark.range(0, SHUFFLE_PROBE_ROWS, 1, par)
            .repartition(par, (F.col("id") % 9973).alias("k"))
            .select(F.sum(F.xxhash64("id") % 1024).alias("h"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts), par


def _host_probe(spark) -> tuple[float, int]:
    """Median wall time of the pinned calibration plan over 3 runs.

    Probe partitions = ``sc.defaultParallelism`` so every core gets
    work on any host shape (r10 ADVICE: a pinned 32 conflated core
    count with per-core speed). Returns ``(median_sec, parallelism)``;
    the factor is only comparable across rounds at MATCHING
    parallelism, which is why the parallelism is recorded alongside
    (PROBE_REFERENCE_SEC was measured at 32).
    """
    import pyspark.sql.functions as F

    par = spark.sparkContext.defaultParallelism
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        (
            spark.range(0, PROBE_ROWS, 1, par)
            # % keeps the ANSI-mode sum far from long overflow
            .select(F.sum(F.xxhash64("id") % 1024).alias("h"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts), par


def _current_round(repo_dir: str) -> int | None:
    """The round this bench run belongs to: ``$SPARK_GRAFT_ROUND`` when
    set (authoritative — archive-file timing can misattribute, r13
    ADVICE), else newest BENCH_r{N}.json + 1.

    The driver archives BENCH_r{N}.json at the END of round N, so a
    live run normally belongs to max(N)+1. Used only to stale-tag
    carried isolated_median adjudications (ADVICE r12 #2); None when
    no archive exists (fresh clone) — nothing is tagged.
    """
    import re

    explicit = os.environ.get("SPARK_GRAFT_ROUND")
    if explicit:
        try:
            return int(explicit)
        except ValueError:
            # Malformed value (e.g. "r14") must not abort the whole
            # bench run at the stale-tag step (r14 ADVICE) — fall
            # through to archive inference.
            print(
                f"WARNING: SPARK_GRAFT_ROUND={explicit!r} is not an integer; "
                "inferring the round from BENCH archives instead",
                file=sys.stderr,
            )
    rounds = [
        int(m.group(1))
        for p in os.listdir(repo_dir)
        for m in [re.match(r"BENCH_r(\d+)\.json$", p)]
        if m
    ]
    return max(rounds) + 1 if rounds else None


def _stale_tag_isolated(prior: dict | None, current_round: int | None) -> dict | None:
    """Tag carried isolated_median entries from earlier rounds stale.

    ADVICE r12 #2: bench.py carries baked adjudications forward across
    re-runs, so without this a new round's fresh live spread presents
    an old round's isolated medians as current, distinguishable only
    by a per-entry stamp downstream consumers must remember to check.
    Entries stamped with the current round OR NEWER pass through
    untouched; only strictly-older stamps (or no stamp) get ``stale:
    True``. The >= comparison (r13 ADVICE) keeps round attribution
    robust to archive-file timing: a bench re-run after BENCH_r{N}
    lands but while same-round isolated bakes are still current would
    otherwise stale-tag them, and an entry stamped NEWER than the
    inferred round (archive deleted) is plainly not stale.
    """
    if not prior or current_round is None:
        return prior
    return {
        name: (
            entry
            if isinstance(entry, dict)
            and isinstance(entry.get("round"), int)
            and entry["round"] >= current_round
            else {**entry, "stale": True}
            if isinstance(entry, dict)
            else entry
        )
        for name, entry in prior.items()
    }


def _sf_label(sf_dir: str) -> float | str:
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return base


#: Max chars for the one-line JSON the driver reads. Its tail buffer is
#: ~2000 chars; 1800 leaves headroom for field growth between rounds.
LINE_BUDGET = 1800


def format_bench_line(line: dict, timings: dict, budget: int = LINE_BUDGET) -> str:
    """Serialize the one-line bench JSON with per-query detail that fits.

    The old guard dropped the whole ``queries`` map whenever the line
    passed 1500 chars — with 77 queries that was always, so the driver's
    PERF comparison saw ``per_query: {}`` every round. Emit the map
    compactly (tight separators, 2-decimal values); if the full map still
    doesn't fit, keep the slowest N entries and report the dropped tail as
    ``queries_rest_n``/``queries_rest_total`` so the headline total stays
    reconstructible. Full-precision per-query numbers remain in
    bench_spread.json either way.
    """

    def _emit(entries: list, rest: list) -> str:
        out = dict(line)
        out["queries"] = {k: round(v, 2) for k, v in entries}
        if rest:
            out["queries_rest_n"] = len(rest)
            out["queries_rest_total"] = round(sum(v for _, v in rest), 2)
        return json.dumps(out, separators=(",", ":"))

    ranked = sorted(timings.items(), key=lambda kv: (-kv[1], kv[0]))
    keep = len(ranked)
    payload = _emit(ranked, [])
    while len(payload) > budget and keep > 1:
        keep -= 1
        payload = _emit(ranked[:keep], ranked[keep:])
    return payload


def main() -> None:
    spark = get_spark(app_name="bench")
    queries = all_queries()
    # Headline set: everything tagged for bench, else all oracle-backed queries.
    names = [n for n, q in queries.items() if "bench" in q.tags] or sorted(queries)

    # Warmup: run the flagship once to absorb JVM/codegen startup cost.
    warm = queries.get("standings") or queries[names[0]]
    warm.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    # Calibration probe (excluded from the headline total): pins the
    # host's current throughput so a uniform cross-round drift is
    # measured, not argued (see PROBE_REFERENCE_SEC note). Since r15
    # the probe ALSO runs after every pass (VERDICT r14 item 3): the
    # r14 driver run's probe drifted 0.994 → 0.865 WITHIN one run, so
    # a single averaged host_factor could not adjudicate a 1.3× swing.
    # Each pass's timings are normalized by their own probe BRACKET
    # (mean of the probes immediately before/after the pass), and the
    # bracket series is recorded so find_regressions can take the
    # conservative bound over every factor the run exhibited.
    probe_sec, probe_parallelism = _host_probe(spark)
    probes = [probe_sec]
    host_factor_start = round(probe_sec / PROBE_REFERENCE_SEC, 3)
    shuffle_sec_start, _ = _shuffle_probe(spark)
    shuffle_factor_start = round(shuffle_sec_start / SHUFFLE_REFERENCE_SEC, 3)
    shuffle_probes = [shuffle_sec_start]

    # Timed region covers plan construction AND execution (streaming
    # queries do their work inside fn(); ivf's bounded centroid collect
    # is part of the query). Three INTERLEAVED passes over the set:
    # query A's reps are separated by every other query's work, not
    # back-to-back, so shared-JVM jitter decorrelates across reps.
    # Wall-clock guard: pass 1 always completes (every query gets a
    # number); later passes start only while the elapsed time is under
    # the budget — so a slow machine or a driver-side timeout still
    # gets a full single-pass result instead of a killed process and
    # no BENCH record at all.
    reps: dict[str, list[float]] = {name: [] for name in sorted(names)}
    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "420"))
    bench_t0 = time.perf_counter()
    passes_done = 0
    for p in range(n_passes):
        if p > 0 and time.perf_counter() - bench_t0 > budget:
            break
        for name in sorted(names):
            t0 = time.perf_counter()
            queries[name].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            reps[name].append(time.perf_counter() - t0)
        passes_done += 1
        # Reap dead localCheckpoint blocks between passes (ADVICE r13
        # #2): the spilled streaming drain returns eager-checkpointed
        # frames whose blocks stay pinned in block-manager storage
        # after the noop write consumes them — 3+ interleaved passes
        # over all streaming queries accumulate the emitted-row sets
        # in spark.local.dir for the whole session. Every rep rebuilds
        # its frames from scratch, so nothing live is dropped; outside
        # the timed region, same pattern as scale_curve's per-rep reap.
        #
        # CONTRACT (r14 ADVICE #5): this blanket unpersist — which
        # includes eager localCheckpoint blocks whose lineage is
        # truncated and therefore unrecoverable once dropped — is safe
        # ONLY because no frame is cached/checkpointed ACROSS query
        # invocations: every registered query builds its frames from
        # scratch inside fn() and the noop write fully consumes them
        # before the reap runs. A future cross-pass cache (e.g. a
        # shared dimension frame persisted once for the whole bench)
        # would be silently destroyed here; if one is ever introduced,
        # scope this reap to the frames the pass created instead.
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
        # Pass-boundary probe: closes pass p's bracket and opens
        # pass p+1's. Outside the timed region (per-query timers have
        # already been recorded); counts toward the wall budget, which
        # is correct — probes are part of the run's cost.
        probes.append(_host_probe(spark)[0])
        # r16: the shuffle dimension gets the same per-pass bracket
        # treatment (the r16 attempt-1 window showed a 6.39x shuffle
        # spike inside an otherwise CPU-clean window — without a
        # per-pass series the spike's blast radius inside a run is
        # unattributable). Diagnostic: queries vary in shuffle
        # intensity, so no normalization divides by these.
        shuffle_probes.append(_shuffle_probe(spark)[0])

    # Micro-query noise taming (VERDICT r10 item 6): sub-2 s queries
    # showed +-0.4 s spreads in the 77-query interleaved run — wide
    # enough to fake a regression (the r10 ANN false positives). Give
    # every query whose provisional median is under 2 s two extra
    # interleaved passes over just that light subset: 5 reps instead
    # of 3, separated by only light work, tightens the median and the
    # recorded band at a cost of a few seconds total. The threshold is
    # HOST-NORMALIZED (r11 ADVICE): a raw 2.0 s cut would shift the
    # micro-set membership with host speed, so the same query could be
    # 5-rep light-contention sampled one round and 3-rep full-
    # interleave sampled the next — a regime change that biases
    # cross-round sub-2 s ratios (PROBES.md).
    # (the start factor is the only estimate available mid-run; the
    # recorded host_factor below folds in the end probe too)
    micro_cut = 2.0 * (host_factor_start if host_factor_start > 0 else 1.0)
    micro = [n for n, ts in reps.items() if ts and statistics.median(ts) < micro_cut]
    micro_passes_done = 0
    for _ in range(int(os.environ.get("SPARK_GRAFT_BENCH_MICRO_PASSES", "2"))):
        if time.perf_counter() - bench_t0 > budget or passes_done < n_passes:
            break
        for name in sorted(micro):
            t0 = time.perf_counter()
            queries[name].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            reps[name].append(time.perf_counter() - t0)
        micro_passes_done += 1

    # End-of-run probe (r11 finding: the host's throughput drifted
    # 0.94x -> 1.22x of reference WITHIN one session hour, so a single
    # start-of-run snapshot can misstate the factor for the whole
    # bench; r12 finding: the recorded factor was 0.862 from the start
    # probe while the end probe read 1.83 s — a ~1.2x swing inside one
    # run, normalized by the wrong number). Since r13 ``host_factor``
    # is the MEAN of the start and end factors — the least-biased
    # single summary of the run window — and both one-sided factors
    # are recorded as host_factor_start/host_factor_end so
    # find_regressions can use the CONSERVATIVE bound per side
    # (PROBES.md r13 entry). Pre-r13 records carry only host_factor
    # (start-probe semantics); consumers treat it as both bounds.
    # Since r15 probes also run at every pass boundary; the extra end
    # probe here closes the micro-pass bracket (when micro passes ran
    # — otherwise the last pass-boundary probe already IS the end).
    if micro_passes_done:
        probes.append(_host_probe(spark)[0])
    probe_sec_end = probes[-1]
    host_factor_end = round(probe_sec_end / PROBE_REFERENCE_SEC, 3)
    host_factor = round((host_factor_start + host_factor_end) / 2, 3)
    shuffle_sec_end, _ = _shuffle_probe(spark)
    shuffle_probes.append(shuffle_sec_end)
    shuffle_factor_end = round(shuffle_sec_end / SHUFFLE_REFERENCE_SEC, 3)
    shuffle_factor = round((shuffle_factor_start + shuffle_factor_end) / 2, 3)
    shuffle_pass_factors = [
        round(((shuffle_probes[p] + shuffle_probes[p + 1]) / 2) / SHUFFLE_REFERENCE_SEC, 3)
        for p in range(min(passes_done, len(shuffle_probes) - 1))
    ]

    # Per-pass bracket factors (VERDICT r14 item 3): pass p's factor is
    # the mean of the probes immediately before and after it — the
    # closest available estimate of the host's speed DURING that pass.
    # Rep i of any query maps to main pass i (one rep per pass, pass
    # order) for i < passes_done; later reps are micro-pass reps and
    # share the micro bracket (last pass-boundary probe → end probe).
    pass_factors = [
        round(((probes[p] + probes[p + 1]) / 2) / PROBE_REFERENCE_SEC, 3)
        for p in range(passes_done)
    ]
    micro_factor = (
        round(((probes[passes_done] + probes[-1]) / 2) / PROBE_REFERENCE_SEC, 3)
        if micro_passes_done
        else None
    )
    # Within-bracket residual: the factor can sit anywhere between a
    # bracket's two endpoints, so a pass-normalized median carries at
    # most this multiplicative uncertainty. find_regressions widens
    # the prior noise band by it when brackets disagree >10%.
    bracket_pairs = [(probes[p], probes[p + 1]) for p in range(passes_done)]
    if micro_passes_done:
        bracket_pairs.append((probes[passes_done], probes[-1]))
    max_bracket_spread = round(
        max((max(a, b) / min(a, b)) for a, b in bracket_pairs), 3
    )
    probe_drift = round(max(probes) / min(probes), 3)

    # Structural invariant behind the rep→bracket mapping (ADVICE r15):
    # rep i is main-pass i ONLY because the budget break sits at the
    # top of the pass loop (a pass is never partially recorded) and no
    # per-query skip exists. If either changes, fail loudly here
    # instead of silently normalizing reps by the wrong bracket.
    assert len(probes) == passes_done + 1 + (1 if micro_passes_done else 0), (
        f"probe count {len(probes)} != passes_done {passes_done} + 1"
        f"{' + 1 micro' if micro_passes_done else ''} — rep→bracket mapping broken"
    )
    assert all(len(ts) >= passes_done for ts in reps.values()), (
        "a query has fewer reps than completed passes — a mid-pass skip "
        "would mis-bracket every later rep"
    )

    def _rep_factor(i: int) -> float:
        return pass_factors[i] if i < passes_done else (micro_factor or 1.0)

    norm_reps = {
        n: [t / _rep_factor(i) for i, t in enumerate(ts)] for n, ts in reps.items()
    }

    # statistics.median interpolates even-count reps (a budget-truncated
    # 2-pass run would otherwise report the UPPER of the two timings,
    # biasing the headline sum upward vs the 3-pass median semantics)
    timings = {n: round(statistics.median(ts), 4) for n, ts in reps.items()}
    spread = {n: [round(min(ts), 4), round(max(ts), 4)] for n, ts in reps.items()}
    # Quartile band: on sub-2 s queries the [min, max] band inherently
    # catches contention spikes (the r10 ANN false-regression source);
    # with 5 reps the IQR is the band regression adjudication reads.
    quart = {
        n: [round(q[0], 4), round(q[2], 4)]
        for n, ts in reps.items()
        if len(ts) >= 4
        for q in [statistics.quantiles(ts, n=4)]
    }
    # Pass-normalized twins of the three per-query maps: each rep is
    # divided by ITS OWN bracket factor before the median/band is
    # taken, so intra-run host drift is corrected per pass instead of
    # averaged away. find_regressions prefers these when both rounds
    # carry them.
    timings_norm = {n: round(statistics.median(ts), 4) for n, ts in norm_reps.items()}
    spread_norm = {
        n: [round(min(ts), 4), round(max(ts), 4)] for n, ts in norm_reps.items()
    }
    quart_norm = {
        n: [round(q[0], 4), round(q[2], 4)]
        for n, ts in norm_reps.items()
        if len(ts) >= 4
        for q in [statistics.quantiles(ts, n=4)]
    }

    # Driver contract: ONE compact JSON line of BOUNDED size. The
    # driver's tail-capture buffer is ~2000 chars; inlining per-query
    # data broke the parse twice as the headline set grew (r6: full
    # spread map at 43 queries; r8: medians-only at 72 queries — both
    # rounds recorded ``parsed: null``). Permanent fix (VERDICT r8
    # item 2): the printed line carries ONLY fields whose size does
    # not grow with the query count, and the per-query MEDIANS and
    # [min, max] spreads both live in bench_spread.json, which the
    # judge reads from the repo. The per-query map is inlined only
    # when the whole line still fits comfortably under the buffer, so
    # small ad-hoc runs keep the original self-contained shape.
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    spread_path = os.path.join(repo_dir, "bench_spread.json")
    # Carry the adjudication forward: scale_round bakes isolated
    # fresh-process medians into this file (r12); a bench re-run must
    # not silently drop them — they describe the same round until the
    # round rolls over and the archive snapshots them. Entries whose
    # round stamp predates the CURRENT round (or that have no stamp)
    # are tagged stale at write time (ADVICE r12 #2) so a new round's
    # fresh live spread never presents an old adjudication as current;
    # downstream consumers no longer have to remember to check the
    # stamp themselves.
    try:
        prior_isolated = json.load(open(spread_path)).get("isolated_median")
    except (ValueError, OSError):
        prior_isolated = None
    prior_isolated = _stale_tag_isolated(prior_isolated, _current_round(repo_dir))
    # One run_id stamped into BOTH artifacts this run writes (the
    # printed line -> BENCH_r{N}.json, and bench_spread.json): the two
    # same-round archives can come from DIFFERENT runs (the builder's
    # in-round spread vs the driver's end-of-round line), and their
    # host factors are only interchangeable when the run_id matches —
    # scale_round.same_run() is the guard (VERDICT r13 item 5).
    import uuid

    run_id = uuid.uuid4().hex[:12]
    with open(spread_path, "w") as f:
        json.dump(
            {
                **({"isolated_median": prior_isolated} if prior_isolated else {}),
                "run_id": run_id,
                "medians": timings,
                "spread": spread,
                "total_sec": round(sum(timings.values()), 4),
                "total_pass_norm_sec": round(sum(timings_norm.values()), 4),
                "passes": passes_done,
                "sf": _sf_label(SF_DIR),
                "iqr": quart,
                "probe_sec": round(probe_sec, 4),
                "probe_sec_end": round(probe_sec_end, 4),
                "probe_parallelism": probe_parallelism,
                "host_factor": host_factor,
                "host_factor_start": host_factor_start,
                "host_factor_end": host_factor_end,
                # r15 second probe dimension (scan/shuffle throughput)
                "shuffle_probe_sec": round(shuffle_sec_start, 4),
                "shuffle_probe_sec_end": round(shuffle_sec_end, 4),
                "shuffle_factor": shuffle_factor,
                "shuffle_factor_start": shuffle_factor_start,
                "shuffle_factor_end": shuffle_factor_end,
                # r16 per-pass shuffle brackets (diagnostic attribution)
                "shuffle_series": [round(s, 4) for s in shuffle_probes],
                "shuffle_pass_factors": shuffle_pass_factors,
                # r15 per-pass normalization (VERDICT r14 item 3)
                "probe_series": [round(s, 4) for s in probes],
                "pass_factors": pass_factors,
                "micro_factor": micro_factor,
                "probe_drift": probe_drift,
                "max_bracket_spread": max_bracket_spread,
                "medians_pass_norm": timings_norm,
                "spread_pass_norm": spread_norm,
                "iqr_pass_norm": quart_norm,
            },
            f,
            indent=1,
        )

    line = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries_n": len(timings),
        "queries_detail": "bench_spread.json",
        "passes": passes_done,
        "sf": _sf_label(SF_DIR),
        "host_factor": host_factor,
        "host_factor_start": host_factor_start,
        "host_factor_end": host_factor_end,
        "probe_drift": probe_drift,
        "shuffle_factor": shuffle_factor,
        "probe_parallelism": probe_parallelism,
        "run_id": run_id,
    }
    print(format_bench_line(line, timings))
    spark.stop()


if __name__ == "__main__":
    main()
