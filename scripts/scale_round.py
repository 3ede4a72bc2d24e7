"""Per-round deep-scaling artifact: SCALE_r{N}.md.

Round-6 verdict item 6: the flat sf0.1 bench cannot see a hidden
O(n^2) term (the PQ-encode 10.1x defect was only visible at 8x/64x),
so every round runs the 1x/8x/64x curve over the FIVE slowest bench
queries (from the newest bench spread's medians) plus any names passed
explicitly, and commits the table.

Round-10 verdict item 3 made the host-speed probe load-bearing here:
per-query medians are divided by their round's ``host_factor`` (the
pinned-plan calibration probe in bench.py) before the slowest-five
pick and before any cross-round regression comparison, so a uniformly
slow sandbox round can no longer masquerade as a per-query regression.
The cross-round comparison reads the previous round's archived
``bench_spread_r{N}.json`` (this script archives the current one),
fixing the r10 ADVICE gap where the BENCH_r*.json fallback went stale
once the driver line stopped inlining per-query medians.

Usage:
    python scripts/scale_round.py --round 11 [--extra q1 q2] \
        [--factors 1 8 64] [--reps 2]

Writes SCALE_r{N}.md at the repo root and prints the table.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import shutil
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: The scale the per-round driver bench runs at. The spread-file trust
#: guard compares against THIS constant, not the caller's env (r10
#: ADVICE: deriving the expectation from $SPARK_GRAFT_SF_DIR both
#: rejected a valid default-scale spread when the caller exported a
#: non-default SF and accepted an ad-hoc non-default one).
BENCH_DEFAULT_SF = 0.1


def load_spread(path: str) -> dict | None:
    """Parse one bench spread record; None when unusable or off-scale."""
    try:
        rec = json.load(open(path))
    except (ValueError, OSError):
        return None
    if not isinstance(rec, dict) or not isinstance(rec.get("medians"), dict):
        return None
    if not rec["medians"] or rec.get("sf") != BENCH_DEFAULT_SF:
        return None
    return rec


def same_run(a: dict | None, b: dict | None) -> bool | None:
    """Whether two bench artifacts came from the SAME bench run.

    VERDICT r13 item 5 (host_factor bookkeeping): BENCH_r{N}.json (the
    driver's end-of-round run) and bench_spread_r{N}.json (the
    builder's archived in-round run) can be DIFFERENT runs with
    different host factors (r13: 0.878 vs 0.904). A factor is canonical
    ONLY for the medians recorded by its own run — mixing one
    artifact's medians with the other's factor manufactures phantom
    deltas. Since r14 bench.py stamps one ``run_id`` into both
    artifacts it writes; this helper is the guard: True/False when both
    records carry a run_id, None when either predates the stamp (treat
    as NOT interchangeable).
    """
    ra = a.get("run_id") if isinstance(a, dict) else None
    rb = b.get("run_id") if isinstance(b, dict) else None
    if ra is None or rb is None:
        return None
    return ra == rb


def normalized_medians(rec: dict) -> dict[str, float]:
    """Per-query medians divided by the round's host_factor.

    host_factor = probe_sec / PROBE_REFERENCE_SEC (bench.py); missing
    (pre-r10 records) means "assume reference speed" — factor 1.0.
    Since r13 the recorded host_factor is the MEAN of the start/end
    probes (best single estimate, used for reporting); the regression
    GATES use the one-sided bounds from :func:`host_factor_bounds`.
    """
    factor = rec.get("host_factor") or 1.0
    return {name: sec / factor for name, sec in rec["medians"].items()}


def host_factor_bounds(rec: dict) -> tuple[float, float]:
    """(low, high) host-factor bounds for a spread record's run window.

    r12 finding: the recorded factor came from the START probe alone
    (0.862) while the same run's END probe read 1.046 — a ~1.2x swing
    inside one bench that normalized every median by the wrong number.
    Since r13 bench.py records host_factor_start / host_factor_end;
    the gates in find_regressions / iqr_vetoes pick the CONSERVATIVE
    bound per side (current medians divided by the HIGH bound, prior
    medians and bands by the LOW bound) so a regression verdict holds
    under every factor the run actually exhibited. Pre-r13 records
    carry only host_factor: both bounds collapse to it.

    Since r15 bench.py also records per-pass bracket factors
    (``pass_factors`` + ``micro_factor``); when present they join the
    candidate set, so the bounds cover every factor the run exhibited
    at any pass boundary, not just its two endpoints.
    """
    fs = [
        f
        for f in (rec.get("host_factor_start"), rec.get("host_factor_end"))
        if f
    ]
    fs += [f for f in rec.get("pass_factors") or [] if f]
    if rec.get("micro_factor"):
        fs.append(rec["micro_factor"])
    if not fs:
        f = rec.get("host_factor") or 1.0
        return f, f
    return min(fs), max(fs)


def _force_raw(rec: dict) -> dict:
    """Copy of ``rec`` with every host factor forced to 1.0 (the
    parallelism-mismatch fallback must neutralize the start/end bounds
    too, or host_factor_bounds would resurrect the incomparable
    factors the fallback exists to discard)."""
    return {
        **rec,
        "host_factor": 1.0,
        "host_factor_start": None,
        "host_factor_end": None,
        "pass_factors": None,
        "micro_factor": None,
        # pass-normalized maps were computed with the incomparable
        # factors — drop them so the raw fallback stays raw
        "medians_pass_norm": None,
        "spread_pass_norm": None,
        "iqr_pass_norm": None,
    }


def _has_pass_norm(rec: dict) -> bool:
    """True when the record carries the r15 per-pass normalized maps
    (medians + spread; iqr_pass_norm may be sparse on 3-rep queries)."""
    return bool(rec.get("medians_pass_norm")) and bool(rec.get("spread_pass_norm"))


def _bracket_residual(rec: dict) -> float:
    """Multiplicative uncertainty left AFTER per-pass normalization:
    the worst disagreement between any bracket's two probe endpoints
    (bench.py ``max_bracket_spread``). A pass's true factor lies
    between its endpoints while the bracket uses their mean, so a
    pass-normalized median is trustworthy only to within this ratio.
    1.0 for records without the field (pre-r15)."""
    return max(1.0, rec.get("max_bracket_spread") or 1.0)


def pick_slowest(medians: dict[str, float], n: int = 5) -> list[str]:
    return [name for name, _ in sorted(medians.items(), key=lambda kv: -kv[1])[:n]]


def parallelism_mismatch(cur: dict, prev: dict) -> bool:
    """True when both records carry probe_parallelism and they differ.

    The host probe is 'only comparable across rounds at MATCHING
    parallelism' (bench.py docstring, PROBES.md): PROBE_REFERENCE_SEC
    was measured at 32 threads, so a factor probed at a different
    defaultParallelism silently skews every normalized verdict (r11
    ADVICE). Missing on either side (pre-r10 records) is treated as
    compatible — there is nothing to compare. The in-round slowest-five
    pick is unaffected either way: dividing every median by one
    constant cannot change their order.
    """
    cp, pp = cur.get("probe_parallelism"), prev.get("probe_parallelism")
    return cp is not None and pp is not None and cp != pp


def iqr_vetoes(name: str, cur: dict, prev: dict) -> bool:
    """The third gate as a standalone predicate: the current run's own
    (normalized) IQR low still reaches into the prior round's
    normalized band — a contention-skewed sample, not a move. Shared
    by find_regressions and main's flagged→surviving filter so the
    gate has one definition. Under a parallelism mismatch both sides
    fall back to raw (idempotent with find_regressions' own forcing).
    """
    if parallelism_mismatch(cur, prev):
        cur, prev = _force_raw(cur), _force_raw(prev)
    # Pass-normalized path (r15): when both runs carry per-bracket
    # normalized bands, compare those directly — each rep was already
    # divided by its own pass's probe bracket, so no further factor
    # division applies (residual within-bracket uncertainty is handled
    # by find_regressions' band widening, not here — the veto erring
    # toward firing is the conservative direction).
    if _has_pass_norm(cur) and _has_pass_norm(prev):
        band_hi = prev["spread_pass_norm"].get(name, [None, None])[1]
        iqr_lo = (cur.get("iqr_pass_norm") or {}).get(name, [None, None])[0]
        if band_hi is None or iqr_lo is None:
            return False
        return iqr_lo <= band_hi
    # conservative bounds (see host_factor_bounds): the veto fires if
    # the current IQR low reaches the prior band under ANY factor the
    # two runs exhibited — current side divided by its HIGH bound,
    # prior side by its LOW bound.
    _, cur_hi = host_factor_bounds(cur)
    prev_lo, _ = host_factor_bounds(prev)
    band_hi_raw = prev.get("spread", {}).get(name, [None, None])[1]
    iqr_lo_raw = cur.get("iqr", {}).get(name, [None, None])[0]
    if band_hi_raw is None or iqr_lo_raw is None:
        return False
    return iqr_lo_raw / cur_hi <= band_hi_raw / prev_lo


def find_regressions(
    cur: dict, prev: dict, threshold: float = 1.25, iqr_veto: bool = True
) -> list[dict]:
    """Host-normalized cross-round regression candidates.

    A query regresses when its current normalized median exceeds
    ``threshold`` x its previous normalized median AND its normalized
    median sits above the previous round's HOST-NORMALIZED noise band
    (a delta inside the old band is jitter, not a regression — the r10
    ANN false-positive lesson). Bands are divided by their own round's
    host_factor before comparison, same as the medians — comparing raw
    bands across hosts would let the drift this module exists to
    correct mask a true move. Since r11 the CURRENT side also gets an
    IQR veto — a current median whose own (normalized) interquartile
    band still reaches down into the prior band is a contention-skewed
    sample, not a move. ``iqr_veto=False`` skips that third gate: the
    two-gate set is what scale_round routes to the isolated fresh-
    process A/B, so the bench artifact carries the adjudication instead
    of owing it (VERDICT r11 item 4).

    When the two rounds were probed at DIFFERENT parallelism the host
    factors are not comparable (r11 ADVICE): the comparison falls back
    to RAW medians/bands (factors forced to 1.0), every finding is
    tagged ``"parallelism_mismatch": True``, and the caller must route
    the result to the isolated A/B instead of reporting it as a
    normalization-based verdict.

    Since r13 the normalization is CONSERVATIVE against intra-run host
    drift (VERDICT r12 item 3): each record's start/end probes give a
    factor band (:func:`host_factor_bounds`), and a query is flagged
    only if the regression holds under the least-favorable combination
    — current medians divided by the HIGH bound, prior medians and
    bands by the LOW bound. The r12 record's 0.862-start/1.046-end
    swing could previously manufacture or mask a 1.2x "move" by itself.
    """
    mismatch = parallelism_mismatch(cur, prev)
    if mismatch:
        print(
            "WARNING: probe_parallelism differs between rounds "
            f"(cur={cur.get('probe_parallelism')} prev={prev.get('probe_parallelism')}) "
            "— host factors are NOT comparable; falling back to raw medians "
            "and deferring every verdict to the isolated A/B protocol",
            file=sys.stderr,
        )
        cur, prev = _force_raw(cur), _force_raw(prev)
    # Pass-normalized path (r15, VERDICT r14 item 3): when both runs
    # carry per-bracket normalized medians, use them directly — each
    # pass was normalized by its own probe bracket, so intra-run drift
    # (the r14 0.994→0.865 in-run swing) is corrected per pass instead
    # of averaged into one untrustworthy factor. Residual uncertainty
    # (a pass's true factor lies between its bracket endpoints) widens
    # the prior noise band when brackets disagree >10%.
    use_pass_norm = _has_pass_norm(cur) and _has_pass_norm(prev)
    if use_pass_norm:
        cur_norm = dict(cur["medians_pass_norm"])
        prev_norm = dict(prev["medians_pass_norm"])
        prev_spread = prev["spread_pass_norm"]
        prev_f = 1.0
        widen = max(
            (
                r
                for r in (_bracket_residual(cur), _bracket_residual(prev))
                if r > 1.10
            ),
            default=1.0,
        )
    else:
        _, cur_hi_f = host_factor_bounds(cur)
        prev_lo_f, _ = host_factor_bounds(prev)
        cur_norm = {n: s / cur_hi_f for n, s in cur["medians"].items()}
        prev_norm = {n: s / prev_lo_f for n, s in prev["medians"].items()}
        prev_f = prev_lo_f
        prev_spread = prev.get("spread", {})
        widen = 1.0
    # r16 (VERDICT r15 item 3): cross-round shuffle-machinery ratio.
    # The CPU-probe normalization is blind to shuffle-side degradation
    # (r15 graded window: CPU probe 0.917 "fast" while the shuffle
    # probe read 1.161); a flag whose ratio is within the shuffle
    # ratio x threshold envelope is annotated shuffle_suspect — it
    # still routes to the isolated A/B, but a confirmation must come
    # from a window whose own shuffle probe is clean.
    csf, psf = cur.get("shuffle_factor"), prev.get("shuffle_factor")
    shuffle_ratio = round(csf / psf, 3) if csf and psf else None
    out = []
    for name, cur_n in cur_norm.items():
        prev_n = prev_norm.get(name)
        if prev_n is None or prev_n <= 0:
            continue
        ratio = cur_n / prev_n
        if ratio < threshold:
            continue
        band_hi_raw = prev_spread.get(name, [None, None])[1]
        band_hi = band_hi_raw / prev_f if band_hi_raw is not None else None
        if band_hi is not None and cur_n <= band_hi * widen:
            continue
        if iqr_veto and iqr_vetoes(name, cur, prev):
            continue
        rec = {
            "query": name,
            "prev_norm_s": round(prev_n, 4),
            # mean-factor baseline for the ISOLATED adjudication gate
            # (r13 ADVICE): prev_norm_s is deliberately inflated by the
            # LOW host-factor bound so the FLAG errs conservative, but
            # stacking that inflation under the clearance's own 1.25x
            # slack would let a real regression in a drifty prior
            # window clear as contention/JIT. The adjudication compares
            # against the prior round's best single estimate instead.
            # On the pass-norm path prev_norm_s IS the best estimate
            # (no one-sided inflation), so the two coincide.
            "prev_mean_norm_s": round(
                prev_n
                if use_pass_norm
                else prev["medians"][name] / (prev.get("host_factor") or 1.0),
                4,
            ),
            "cur_norm_s": round(cur_n, 4),
            "ratio": round(ratio, 3),
        }
        if use_pass_norm:
            rec["pass_normalized"] = True
            if widen > 1.0:
                rec["band_widened_by"] = round(widen, 3)
        if mismatch:
            rec["parallelism_mismatch"] = True
        if shuffle_ratio is not None:
            rec["shuffle_ratio"] = shuffle_ratio
            if shuffle_ratio >= 1.15 and ratio <= shuffle_ratio * threshold:
                rec["shuffle_suspect"] = True
        out.append(rec)
    return sorted(out, key=lambda r: -r["ratio"])


def newest_spread_record() -> tuple[dict, str] | tuple[None, None]:
    """(record, source_path): bench_spread.json, else the newest archive.

    Falling back to an archive is WARNED — it means no current-round
    bench has run (or an off-scale ad-hoc run clobbered the live file)
    and whatever "current" numbers we report are really that archive's.
    """
    live = os.path.join(ROOT, "bench_spread.json")
    rec = load_spread(live)
    if rec is not None:
        return rec, live
    print(
        "bench_spread.json missing or off-scale; falling back to the "
        "newest bench_spread_r*.json archive",
        file=sys.stderr,
    )
    for path in sorted(
        glob.glob(os.path.join(ROOT, "bench_spread_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
        reverse=True,
    ):
        rec = load_spread(path)
        if rec is not None:
            return rec, path
    return None, None


def previous_spread_record(
    before_round: int, exclude_path: str | None = None
) -> dict | None:
    """Newest archived spread from a round strictly before ``before_round``.

    ``exclude_path`` guards the degenerate case where the "current"
    record itself came from an archive fallback: comparing a record
    against itself would report every ratio as exactly 1.0 and print a
    confident (and meaningless) "no regressions".
    """
    for path in sorted(
        glob.glob(os.path.join(ROOT, "bench_spread_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
        reverse=True,
    ):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        if rnd >= before_round:
            continue
        if exclude_path and os.path.abspath(path) == os.path.abspath(exclude_path):
            continue
        rec = load_spread(path)
        if rec is not None:
            return rec
    return None


#: Stable CONTROL queries for the isolated adjudication: cheap,
#: code-stable paths run alongside every flagged set. If the controls
#: inflate with the flagged queries, the host degraded in a way the
#: calibration probe does not measure — r12 finding: child probes read
#: 0.92-1.04 while EVERY query (flagged and control alike, all
#: byte-identical to r11) ran 1.4-1.7x its r11 normalized median — and
#: no isolated verdict from that window is trustworthy.
CONTROL_QUERIES = ("ivf2_ann_topk", "rfm_segments")
CONTROL_VETO_RATIO = 1.25
#: r13 finding: with two controls the median is the mean, so one
#: not-yet-degraded control can drag a 1.416x inflated one to 1.2405 —
#: a hair under the veto — and four code-stable queries got REGRESSION
#: CONFIRMED from a window whose re-check 25 minutes later showed BOTH
#: controls inflated (1.49x/1.06x same-regime, median 1.27). Drift can
#: hit asymmetrically (the ANN-profile control inflated first), so a
#: SINGLE code-stable control at >= this bar is itself inconsistent
#: with a comparable window, regardless of the median.
CONTROL_VETO_MAX = 1.4

#: Shuffle-dimension window veto (r16, VERDICT r15 item 3: fold the
#: shuffle factor into the adjudication instead of carrying it as a
#: diagnostic). The r16 attempt-1 window showed the failure mode the
#: CPU-probe controls can miss entirely: one child JVM's shuffle probe
#: read 6.39x reference while its CPU probe read 1.26 — the host's
#: shuffle machinery degrades intermittently and ~severalfold between
#: JVMs minutes apart. Clean sessions read 0.90-1.16 across r15/r16
#: evidence, so a child median past 1.25 or ANY child past 2.0 marks
#: the window's timing evidence unsound regardless of what the
#: control QUERIES read (a control can land in the window's clean
#: minutes while a flagged query lands in its degraded ones).
SHUFFLE_VETO_MEDIAN = 1.25
SHUFFLE_VETO_MAX = 2.0


def shuffle_window_veto(isolated: dict[str, dict]) -> tuple[float | None, bool]:
    """(median child shuffle factor, vetoed?) across the whole window.

    Pools every adjudicated child's ``shuffle_factors`` reading (each
    fresh JVM probes once) — per-QUERY attribution is impossible from
    a window-level probe, so a dirty pool vetoes the WINDOW, same
    semantics as the control veto. Records without shuffle readings
    (pre-r15 children) contribute nothing and never veto.
    """
    pool = [
        f
        for rec in isolated.values()
        for f in rec.get("shuffle_factors") or []
        if f and f > 0
    ]
    if not pool:
        return None, False
    med = round(statistics.median(pool), 3)
    return med, med >= SHUFFLE_VETO_MEDIAN or max(pool) >= SHUFFLE_VETO_MAX


def control_inflation(
    isolated: dict[str, dict], prev: dict | None
) -> tuple[dict[str, float], bool]:
    """(per-control normalized ratio vs prev round, vetoed?).

    Vetoed when the median control ratio clears CONTROL_VETO_RATIO:
    the environment shifted under the probe, so flagged-query
    confirmations from the same window are unsound.

    Baseline regime (ADVICE r12 #3): the controls run ISOLATED
    (fresh-process, no interleave contention), so comparing them
    against the prior round's INTERLEAVED medians biases their ratios
    low and blunts the veto. When the prior record carries a baked
    ``isolated_median`` for a control (same regime, not stale-tagged),
    that is the baseline; the interleaved median is the fallback — and
    the VETO median is computed over the same-regime subset alone when
    one exists (review r13: blending a regime-biased-low fallback
    ratio into the median would let one control suppress a genuine
    same-regime inflation signal).
    """
    if not prev:
        return {}, False
    prev_norm = normalized_medians(prev)
    prev_isolated = prev.get("isolated_median") or {}
    ratios = {}
    same_regime = []
    for c in CONTROL_QUERIES:
        r = isolated.get(c)
        iso = prev_isolated.get(c)
        if (
            isinstance(iso, dict)
            and not iso.get("stale")
            and not iso.get("vetoed")  # degraded-window bake (r13): not a baseline
            and iso.get("norm_s")
        ):
            p = iso["norm_s"]
            regime_matched = True
        else:
            p = prev_norm.get(c)
            regime_matched = False
        if r and p and p > 0:
            ratios[c] = round(r["median_norm_s"] / p, 3)
            if regime_matched:
                same_regime.append(ratios[c])
    pool = same_regime or list(ratios.values())
    vetoed = bool(pool) and (
        statistics.median(pool) >= CONTROL_VETO_RATIO
        or max(pool) >= CONTROL_VETO_MAX
    )
    return ratios, vetoed


def adjudicate_isolated(
    names: list[str], sf_dir: str | None = None, skip: bool = False
) -> dict[str, dict]:
    """Fresh-process isolated medians for the two-gate flagged queries.

    Runs scripts/isolated_query_ab.py (2 procs x 2 reps per query — the
    committed adjudication protocol) and returns its per-query results;
    empty when nothing is flagged, the harness fails, or ``skip``.
    """
    if not names or skip:
        return {}
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
        json_out = tf.name
    # sf pinned to the bench default, NOT inherited from the caller's
    # $SPARK_GRAFT_SF_DIR (code-review r12): the cur/prev records this
    # adjudication compares against are strictly sf0.1, and an
    # env-exported scale dir would measure the flagged queries at the
    # wrong scale and bake those medians into the sf0.1 record — the
    # caller-env failure class BENCH_DEFAULT_SF exists to prevent.
    cmd = [
        sys.executable,
        os.path.join(ROOT, "scripts", "isolated_query_ab.py"),
        *names,
        "--procs",
        "2",
        "--reps",
        "2",
        "--json-out",
        json_out,
        "--sf",
        sf_dir or f"/root/testdata/sf{BENCH_DEFAULT_SF}",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            print(
                f"isolated A/B failed (exit {proc.returncode}); flagged queries "
                f"stay unadjudicated this round\n{proc.stderr[-2000:]}",
                file=sys.stderr,
            )
            return {}
        try:
            return json.load(open(json_out)).get("results", {})
        except (ValueError, OSError):
            return {}
    finally:
        # covers the subprocess-failure path too (review: the early
        # return leaked the temp file)
        try:
            os.unlink(json_out)
        except OSError:
            pass


def bake_isolated_medians(
    results: dict[str, dict],
    paths: list[str],
    round_no: int | None = None,
    vetoed: bool = False,
) -> None:
    """Merge ``isolated_median`` per query into each spread file.

    ``vetoed=True`` stamps every written entry: the window's control
    queries showed the host degraded during the measurement, so these
    medians describe the DEGRADED window, not the code — downstream
    baselines (control_inflation) must skip them. Before r15 the stamp
    existed in archives but nothing set it at bake time, so a vetoed
    window's medians could silently become a later round's baseline.

    The key sits beside ``spread``/``iqr`` so cross-round consumers see
    the adjudicated steady-state, not just the contended interleaved
    sample. Each entry carries the round it was measured in (``round``)
    because bench.py carries the key forward across re-runs — without
    the stamp, a later round's archive would present stale
    adjudications as current (code-review r12). Files that are missing
    or unparsable are skipped — baking must never corrupt a good
    archive with a half-write.
    """
    for path in paths:
        rec = load_spread(path)
        if rec is None:
            continue
        slot = rec.setdefault("isolated_median", {})
        for name, r in results.items():
            slot[name] = {
                "raw_s": r["median_raw_s"],
                "norm_s": r["median_norm_s"],
                "n": r["n"],
                # rep-1-excluded medians (r13: compile throughput can
                # drift independently of execution; see PROBES.md)
                **(
                    {"steady_raw_s": r["steady_raw_s"], "steady_norm_s": r["steady_norm_s"]}
                    if "steady_raw_s" in r
                    else {}
                ),
                # r15: shuffle-dimension context for drift attribution
                **(
                    {"shuffle_factors": r["shuffle_factors"]}
                    if r.get("shuffle_factors")
                    else {}
                ),
                **({"round": round_no} if round_no is not None else {}),
                **({"vetoed": True} if vetoed else {}),
            }
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f, indent=1, sort_keys=True)
        os.replace(tmp, path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--extra", nargs="*", default=[])
    ap.add_argument("--factors", nargs="+", type=int, default=[1, 8, 64])
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--keep", default=None)
    ap.add_argument(
        "--skip-isolated",
        action="store_true",
        help="skip the automatic isolated A/B for gate-flagged queries",
    )
    args = ap.parse_args()

    cur, cur_path = newest_spread_record()
    if cur is None and not args.extra:
        sys.exit("no usable bench spread found and no --extra queries given")

    # Archive this round's spread so future rounds can host-normalize
    # against it even after bench_spread.json is overwritten. Only a
    # live spread that is a NEW measurement is archived: if its content
    # matches an existing archive byte-for-byte it's a prior round's
    # committed leftover (e.g. scale_round ran before this round's
    # bench), and stamping it with this round's number would poison
    # every later cross-round comparison.
    live = os.path.join(ROOT, "bench_spread.json")
    archive = os.path.join(ROOT, f"bench_spread_r{args.round}.json")
    if load_spread(live) is not None and not os.path.exists(archive):
        live_bytes = open(live, "rb").read()
        already = any(
            open(p, "rb").read() == live_bytes
            for p in glob.glob(os.path.join(ROOT, "bench_spread_r*.json"))
        )
        if already:
            print(
                f"bench_spread.json matches an existing archive — not "
                f"stamping it as round {args.round} (run bench.py first)",
                file=sys.stderr,
            )
        else:
            shutil.copyfile(live, archive)

    norm = normalized_medians(cur) if cur else {}
    slowest = pick_slowest(norm)
    queries = list(dict.fromkeys(slowest + args.extra))

    prev = previous_spread_record(args.round, exclude_path=cur_path) if cur else None
    # ONE comparison pass (review: two passes duplicated the work and
    # the parallelism warning): the two-gate flagged set, with the IQR
    # veto applied afterwards as a filter to derive the surviving
    # regressions (the three-gate set is a strict subset). Every
    # flagged member gets an automatic isolated fresh-process A/B and
    # the isolated median is baked into the spread files, so BENCH_r{N}
    # carries the adjudication instead of owing it (VERDICT r11 item 4).
    flagged = (
        find_regressions(cur, prev, iqr_veto=False) if cur and prev else []
    )
    regressions = [f for f in flagged if not iqr_vetoes(f["query"], cur, prev)]
    # controls ride along with every flagged set (dedup: a control that
    # is itself flagged still runs once)
    to_isolate = list(
        dict.fromkeys([f["query"] for f in flagged] + list(CONTROL_QUERIES))
    ) if flagged else []
    isolated = adjudicate_isolated(to_isolate, sf_dir=None, skip=args.skip_isolated)
    control_ratios, controls_vetoed = control_inflation(isolated, prev)
    # r16: the shuffle probe is adjudication-grade, not diagnostic —
    # either dirty dimension (control queries OR child shuffle
    # factors) vetoes the window's confirmations.
    shuffle_med, shuffle_vetoed = shuffle_window_veto(isolated)
    window_vetoed = controls_vetoed or shuffle_vetoed
    if isolated:
        bake_isolated_medians(
            isolated, [live, archive], round_no=args.round, vetoed=window_vetoed
        )

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

    hf = (cur or {}).get("host_factor", 1.0)
    lines = [
        f"# SCALE_r{args.round} — 1x/8x/64x deep-scaling curve",
        "",
        f"Queries = five slowest by HOST-NORMALIZED bench median "
        f"(host_factor {hf}; + extras: {args.extra or 'none'}).",
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
    lines += ["", "## Host-normalized cross-round regression check", ""]
    if prev is None:
        lines.append("No archived prior-round spread to compare against.")
    else:
        if cur and parallelism_mismatch(cur, prev):
            lines.append(
                f"**probe_parallelism mismatch** (cur "
                f"{cur.get('probe_parallelism')} vs prev "
                f"{prev.get('probe_parallelism')}): host factors not "
                "comparable — verdicts below are raw-median candidates "
                "deferred to the isolated A/B, not normalized findings."
            )
        if not regressions:
            lines.append(
                f"No query's normalized median is >=1.25x its prior-round value "
                f"outside the prior noise band (prev host_factor "
                f"{prev.get('host_factor', 1.0)})."
            )
        else:
            lines += [
                "| query | prev norm s | cur norm s | ratio |",
                "|---|---|---|---|",
                *[
                    f"| {r['query']} | {r['prev_norm_s']} | {r['cur_norm_s']} | {r['ratio']} |"
                    for r in regressions
                ],
            ]
    lines += ["", "## Gate-flagged isolated adjudication", ""]
    if not flagged:
        lines.append("No query cleared the two raw gates (ratio + prior-band exit).")
    elif not isolated:
        lines.append(
            f"Flagged but NOT adjudicated this run "
            f"({'--skip-isolated' if args.skip_isolated else 'isolated A/B failed'}): "
            + ", ".join(f["query"] for f in flagged)
        )
    else:
        lines += [
            "Isolated fresh-process medians (2 procs x 2 reps, baked into "
            "bench_spread.json as `isolated_median`):",
            "",
        ]
        if control_ratios:
            lines += [
                "Control queries (code-stable, run alongside the flagged "
                "set): "
                + ", ".join(f"{c} {r}x" for c, r in control_ratios.items())
                + (
                    f" — **median control inflation >= {CONTROL_VETO_RATIO}x: "
                    "the environment shifted under the probe, all "
                    "confirmations from this window are VETOED** (re-run "
                    "the A/B in a clean window before believing any)."
                    if controls_vetoed
                    else " — controls stable."
                ),
                "",
            ]
        if shuffle_med is not None:
            lines += [
                f"Window shuffle probe (per-child, median {shuffle_med}x "
                "reference): "
                + (
                    f"**>= {SHUFFLE_VETO_MEDIAN}x median or "
                    f"{SHUFFLE_VETO_MAX}x single-child — shuffle machinery "
                    "degraded under the window, all confirmations VETOED** "
                    "(the CPU-probe controls cannot see this dimension)."
                    if shuffle_vetoed
                    else "clean."
                ),
                "",
            ]
        if not window_vetoed and isolated:
            lines += ["Both window dimensions clean — verdicts below stand.", ""]
        lines += [
            "| query | ratio (interleaved) | isolated norm s | prev norm s (mean-f baseline) | verdict |",
            "|---|---|---|---|---|",
        ]
        for f in flagged:
            iso = isolated.get(f["query"])
            if iso is None:
                lines.append(f"| {f['query']} | {f['ratio']} | — | {f['prev_norm_s']} | no isolated data |")
                continue
            # Regime note (r13): prev_norm_s is an INTERLEAVED median,
            # while the isolated run is fresh-process — for sub-second
            # JIT-heavy queries the fresh-process regime is
            # structurally slower (the query's own codegen/JIT tail
            # spans 3+ reps; r13 measured weighted_sample_topk rep3 at
            # ~2x its interleaved steady). Judge on the rep-1-excluded
            # steady median when available — the closest fresh-process
            # proxy for the interleaved regime — and treat a residual
            # small-query confirmation as suspect until the interleaved
            # band check agrees (SCALE_r13.md).
            metric = iso.get("steady_norm_s", iso["median_norm_s"])
            # clearance bar uses the MEAN-factor baseline (r13 ADVICE):
            # the low-bound prev_norm_s stays in the flag/veto gates
            # only — stacked with the 1.25x slack it would clear real
            # regressions measured against a drifty prior window
            baseline = f.get("prev_mean_norm_s", f["prev_norm_s"])
            cleared = metric <= baseline * 1.25
            if f.get("parallelism_mismatch"):
                # review r12: under a mismatch prev_norm_s is RAW while
                # the isolated median is probe-normalized — comparing
                # them confirms/clears in mixed units. No automatic
                # verdict is sound here.
                verdict = (
                    "INDETERMINATE (parallelism mismatch — prev is raw, "
                    "isolated is normalized; compare raw reps manually)"
                )
            elif cleared:
                verdict = "cleared (contention/JIT)"
            elif controls_vetoed:
                verdict = "VETOED (control inflation — host drift the probe missed)"
            elif shuffle_vetoed:
                verdict = "VETOED (shuffle-degraded window — child shuffle probe dirty)"
            else:
                verdict = "REGRESSION CONFIRMED"
            ratio_cell = f"{f['ratio']}" + (
                " (shuffle_suspect)" if f.get("shuffle_suspect") else ""
            )
            lines.append(
                f"| {f['query']} | {ratio_cell} | {iso['median_norm_s']} "
                f"| {baseline} | {verdict} |"
            )
    text = "\n".join(lines) + "\n"
    dest = os.path.join(ROOT, f"SCALE_r{args.round}.md")
    open(dest, "w").write(text)
    print(text)
    print("wrote", dest)


if __name__ == "__main__":
    main()
