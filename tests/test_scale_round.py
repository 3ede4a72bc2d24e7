"""scale_round's host-factor normalization is load-bearing (VERDICT r10 item 3).

Pure-python tests over synthetic spread records: no Spark session.
"""

from __future__ import annotations

import importlib.util
import json
import os

_spec = importlib.util.spec_from_file_location(
    "scale_round",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts", "scale_round.py"),
)
scale_round = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(scale_round)


def _rec(medians, host_factor=1.0, spread=None, sf=0.1):
    return {
        "medians": medians,
        "spread": spread or {n: [v, v] for n, v in medians.items()},
        "host_factor": host_factor,
        "sf": sf,
    }


def test_normalized_medians_divides_by_host_factor():
    rec = _rec({"a": 2.0, "b": 4.0}, host_factor=2.0)
    assert scale_round.normalized_medians(rec) == {"a": 1.0, "b": 2.0}


def test_normalized_medians_defaults_factor_to_one():
    rec = {"medians": {"a": 3.0}, "sf": 0.1}
    assert scale_round.normalized_medians(rec) == {"a": 3.0}


def test_slowest_pick_uses_normalized_numbers():
    # Raw medians rank b first, but b's round ran on a 2x-slow host:
    # normalized, a is the slowest. The pick must read normalized.
    rec = _rec({"a": 3.0, "b": 4.0}, host_factor=1.0)
    slow_host = scale_round.normalized_medians(_rec({"a": 3.0, "b": 4.0}, host_factor=2.0))
    assert scale_round.pick_slowest(slow_host, n=1) == ["b"]  # order preserved in-round
    mixed = {"a": 3.0, "b": 4.0 / 2.0}  # b normalized from a 2x-slow round
    assert scale_round.pick_slowest(mixed, n=1) == ["a"]
    assert scale_round.pick_slowest(scale_round.normalized_medians(rec), n=1) == ["b"]


def test_find_regressions_host_normalizes_before_judging():
    # Raw delta is 1.4x, but the current round's host is 1.4x slower:
    # normalized, nothing moved -> no regression.
    prev = _rec({"q": 1.0}, host_factor=1.0)
    cur = _rec({"q": 1.4}, host_factor=1.4)
    assert scale_round.find_regressions(cur, prev) == []


def test_find_regressions_flags_true_normalized_move():
    prev = _rec({"q": 1.0}, host_factor=1.0, spread={"q": [0.9, 1.1]})
    cur = _rec({"q": 1.5}, host_factor=1.0)
    regs = scale_round.find_regressions(cur, prev)
    assert [r["query"] for r in regs] == ["q"]
    assert regs[0]["ratio"] == 1.5


def test_find_regressions_respects_prior_noise_band():
    # 1.3x normalized move whose raw median is still inside the prior
    # [min, max] spread: the r10 ANN lesson — jitter, not regression.
    prev = _rec({"q": 1.0}, host_factor=1.0, spread={"q": [0.8, 1.8]})
    cur = _rec({"q": 1.3}, host_factor=1.0)
    assert scale_round.find_regressions(cur, prev) == []


def test_load_spread_rejects_off_scale_records(tmp_path):
    p = tmp_path / "bench_spread.json"
    p.write_text(json.dumps(_rec({"a": 1.0}, sf=0.01)))
    assert scale_round.load_spread(str(p)) is None
    p.write_text(json.dumps(_rec({"a": 1.0}, sf=0.1)))
    assert scale_round.load_spread(str(p)) is not None


def test_archived_r10_spread_exists_and_parses():
    rec = scale_round.load_spread(os.path.join(scale_round.ROOT, "bench_spread_r10.json"))
    assert rec is not None and rec.get("host_factor") == 1.063


def test_find_regressions_current_iqr_veto():
    # Current median is 1.5x up and above the prior max, but the
    # current run's own IQR reaches back into the prior band — a
    # contention-skewed sample, vetoed. Without the IQR key (or with a
    # genuinely shifted IQR) the regression stands.
    prev = _rec({"q": 1.0}, host_factor=1.0, spread={"q": [0.9, 1.1]})
    cur = _rec({"q": 1.5}, host_factor=1.0)
    cur["iqr"] = {"q": [1.05, 1.7]}
    assert scale_round.find_regressions(cur, prev) == []
    cur["iqr"] = {"q": [1.4, 1.7]}
    assert [r["query"] for r in scale_round.find_regressions(cur, prev)] == ["q"]
    del cur["iqr"]
    assert [r["query"] for r in scale_round.find_regressions(cur, prev)] == ["q"]


def test_committed_spread_schema_invariants():
    """The committed bench_spread.json must satisfy what the tooling
    chain assumes: iqr/spread keys subset of medians, bands ordered and
    containing their median, both probes recorded, factor consistent."""
    rec = scale_round.load_spread(os.path.join(scale_round.ROOT, "bench_spread.json"))
    assert rec is not None
    med = rec["medians"]
    assert set(rec["spread"]) == set(med)
    assert set(rec.get("iqr", {})) <= set(med)
    for n, (lo, hi) in rec["spread"].items():
        assert lo <= med[n] <= hi, n
    for n, (lo, hi) in rec.get("iqr", {}).items():
        s_lo, s_hi = rec["spread"][n]
        assert s_lo <= lo <= hi <= s_hi, n
    assert rec["probe_sec"] > 0 and rec.get("probe_sec_end", 1) > 0
    if "host_factor_start" in rec:
        # r13+: host_factor is the MEAN of the start/end probe factors
        assert abs(rec["host_factor_start"] - rec["probe_sec"] / 1.75) < 0.01
        assert abs(rec["host_factor_end"] - rec["probe_sec_end"] / 1.75) < 0.01
        assert (
            abs(rec["host_factor"] - (rec["host_factor_start"] + rec["host_factor_end"]) / 2)
            < 0.01
        )
    else:
        # pre-r13 records: start-probe semantics
        assert abs(rec["host_factor"] - rec["probe_sec"] / 1.75) < 0.01
    if "shuffle_series" in rec:
        # r16+: per-pass shuffle brackets — one probe per pass boundary
        # (start + each completed pass + end), factors derived from
        # consecutive-pair means at SHUFFLE_REFERENCE_SEC = 2.17
        series = rec["shuffle_series"]
        assert len(series) >= 2 and all(s > 0 for s in series)
        assert len(rec.get("shuffle_pass_factors", [])) <= len(series) - 1
        for p, f in enumerate(rec["shuffle_pass_factors"]):
            expect = ((series[p] + series[p + 1]) / 2) / 2.17
            assert abs(f - expect) < 0.01, (p, f, expect)


def test_find_regressions_normalizes_prior_band_across_hosts():
    # Review finding (r11): a genuine 1.4x regression measured on a
    # fast host (0.9) must not hide inside a slow prior host's (1.2)
    # RAW band. prev normalized median 1.0, band_hi 1.3/1.2=1.083;
    # cur normalized 1.26/0.9=1.4 > 1.083 -> flagged.
    prev = _rec({"q": 1.2}, host_factor=1.2, spread={"q": [1.1, 1.3]})
    cur = _rec({"q": 1.26}, host_factor=0.9)
    regs = scale_round.find_regressions(cur, prev)
    assert [r["query"] for r in regs] == ["q"]
    assert regs[0]["ratio"] == 1.4


def test_previous_spread_record_excludes_current_source(tmp_path, monkeypatch):
    # Review finding (r11): when the "current" record is itself an
    # archive fallback, the prior-round lookup must not return the
    # SAME file (self-comparison -> every ratio 1.0, vacuous verdict).
    monkeypatch.setattr(scale_round, "ROOT", str(tmp_path))
    a10 = tmp_path / "bench_spread_r10.json"
    a11 = tmp_path / "bench_spread_r11.json"
    a10.write_text(json.dumps(_rec({"q": 1.0})))
    a11.write_text(json.dumps(_rec({"q": 2.0})))
    cur, cur_path = scale_round.newest_spread_record()  # falls back to r11
    assert cur["medians"] == {"q": 2.0}
    prev = scale_round.previous_spread_record(12, exclude_path=cur_path)
    assert prev["medians"] == {"q": 1.0}
    # and with only the one archive present, no self-comparison happens
    a10.unlink()
    assert scale_round.previous_spread_record(12, exclude_path=cur_path) is None


def test_find_regressions_invariant_under_uniform_host_rescale():
    """The defining property of correct host normalization: multiplying
    EVERY raw number of one round (medians, spread, iqr, host_factor)
    by the same constant — i.e. the same plans on a uniformly
    slower/faster host — must not change any verdict. The r11 review
    found the band comparison violating exactly this (raw bands vs
    normalized ratios); property-pinned so it cannot regress."""
    from hypothesis import given, strategies as st

    def scale(rec, c):
        out = {
            "medians": {k: v * c for k, v in rec["medians"].items()},
            "spread": {k: [lo * c, hi * c] for k, (lo, hi) in rec["spread"].items()},
            "host_factor": rec["host_factor"] * c,
            "sf": rec["sf"],
        }
        if "iqr" in rec:
            out["iqr"] = {k: [lo * c, hi * c] for k, (lo, hi) in rec["iqr"].items()}
        return out

    @given(
        prev_med=st.floats(0.1, 10),
        band_w=st.floats(0.0, 2),
        cur_med=st.floats(0.1, 20),
        iqr_lo_off=st.floats(0.0, 1),
        c_cur=st.floats(0.25, 4),
        c_prev=st.floats(0.25, 4),
    )
    def check(prev_med, band_w, cur_med, iqr_lo_off, c_cur, c_prev):
        prev = _rec({"q": prev_med}, spread={"q": [prev_med - band_w / 2, prev_med + band_w / 2]})
        cur = _rec({"q": cur_med})
        cur["iqr"] = {"q": [max(0.01, cur_med - iqr_lo_off), cur_med + iqr_lo_off]}
        base = [r["query"] for r in scale_round.find_regressions(cur, prev)]
        rescaled = [
            r["query"]
            for r in scale_round.find_regressions(scale(cur, c_cur), scale(prev, c_prev))
        ]
        assert base == rescaled

    check()


def test_parallelism_mismatch_detection():
    # Present-and-unequal -> mismatch; missing on either side (pre-r10
    # records) -> nothing to compare, treated as compatible.
    a = _rec({"q": 1.0})
    b = _rec({"q": 1.0})
    assert not scale_round.parallelism_mismatch(a, b)
    a["probe_parallelism"] = 32
    assert not scale_round.parallelism_mismatch(a, b)
    b["probe_parallelism"] = 16
    assert scale_round.parallelism_mismatch(a, b)
    b["probe_parallelism"] = 32
    assert not scale_round.parallelism_mismatch(a, b)


def test_find_regressions_defers_on_parallelism_mismatch(capsys):
    # r11 ADVICE: a round probed at different parallelism must not get
    # normalization-based verdicts. Factors are forced to 1.0 (raw
    # compare), findings are tagged for isolated-A/B routing, and a
    # loud warning lands on stderr. Here the 1.4x raw move would be
    # fully explained by the slow host IF the factors were comparable —
    # under mismatch it must surface as a deferred candidate instead of
    # being silently normalized away.
    prev = _rec({"q": 1.0}, host_factor=1.0, spread={"q": [0.9, 1.1]})
    cur = _rec({"q": 1.4}, host_factor=1.4)
    prev["probe_parallelism"] = 32
    cur["probe_parallelism"] = 8
    regs = scale_round.find_regressions(cur, prev)
    assert [r["query"] for r in regs] == ["q"]
    assert regs[0]["parallelism_mismatch"] is True
    assert regs[0]["ratio"] == 1.4  # raw, not normalized
    assert "probe_parallelism differs" in capsys.readouterr().err
    # matching parallelism: normalized away as before, no tag
    cur["probe_parallelism"] = 32
    assert scale_round.find_regressions(cur, prev) == []


def test_find_regressions_iqr_veto_switch():
    # The two-gate set (iqr_veto=False) is what gets routed to the
    # isolated A/B: a current-IQR-vetoed query must still appear there.
    prev = _rec({"q": 1.0}, host_factor=1.0, spread={"q": [0.9, 1.1]})
    cur = _rec({"q": 1.5}, host_factor=1.0)
    cur["iqr"] = {"q": [1.05, 1.7]}  # reaches into the prior band
    assert scale_round.find_regressions(cur, prev) == []
    flagged = scale_round.find_regressions(cur, prev, iqr_veto=False)
    assert [r["query"] for r in flagged] == ["q"]


def test_bake_isolated_medians_merges_without_corruption(tmp_path):
    p = tmp_path / "bench_spread.json"
    rec = _rec({"q": 1.5, "r": 0.5})
    p.write_text(json.dumps(rec))
    missing = tmp_path / "nope.json"
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    scale_round.bake_isolated_medians(
        {"q": {"median_raw_s": 1.1, "median_norm_s": 1.0, "n": 4}},
        [str(p), str(missing), str(bad)],
    )
    out = json.load(open(p))
    assert out["isolated_median"]["q"] == {"raw_s": 1.1, "norm_s": 1.0, "n": 4}
    assert out["medians"] == {"q": 1.5, "r": 0.5}  # untouched
    assert not missing.exists()
    assert bad.read_text() == "{not json"  # unparsable file left alone


def test_adjudicate_isolated_skip_and_empty():
    assert scale_round.adjudicate_isolated([], skip=False) == {}
    assert scale_round.adjudicate_isolated(["q"], skip=True) == {}


def test_control_inflation_veto():
    # Controls inflated alongside the flagged set -> environment moved
    # under the probe, confirmations vetoed. Stable controls -> stand.
    prev = _rec({"ivf2_ann_topk": 1.0, "rfm_segments": 1.5, "q": 1.0})
    inflated = {
        "ivf2_ann_topk": {"median_norm_s": 1.7, "median_raw_s": 1.7, "n": 4},
        "rfm_segments": {"median_norm_s": 2.2, "median_raw_s": 2.2, "n": 4},
    }
    ratios, vetoed = scale_round.control_inflation(inflated, prev)
    assert vetoed and ratios == {"ivf2_ann_topk": 1.7, "rfm_segments": 1.467}
    stable = {
        "ivf2_ann_topk": {"median_norm_s": 1.05, "median_raw_s": 1.05, "n": 4},
        "rfm_segments": {"median_norm_s": 1.4, "median_raw_s": 1.4, "n": 4},
    }
    ratios, vetoed = scale_round.control_inflation(stable, prev)
    assert not vetoed
    # no prior record / no control data -> never vetoes
    assert scale_round.control_inflation(inflated, None) == ({}, False)
    assert scale_round.control_inflation({}, prev) == ({}, False)


def test_host_factor_bounds_from_start_end_probes():
    # r13: start/end probes give a factor band; pre-r13 records (no
    # start/end fields) collapse both bounds to host_factor.
    rec = _rec({"q": 1.0}, host_factor=0.954)
    rec.update(host_factor_start=0.862, host_factor_end=1.046)
    assert scale_round.host_factor_bounds(rec) == (0.862, 1.046)
    assert scale_round.host_factor_bounds(_rec({"q": 1.0}, host_factor=1.3)) == (1.3, 1.3)
    assert scale_round.host_factor_bounds({"medians": {}}) == (1.0, 1.0)


def test_find_regressions_conservative_under_asymmetric_probes():
    """VERDICT r12 item 3: the r12 record's 0.862-start/1.046-end probe
    swing could manufacture a 1.2x 'move' when only the start factor
    normalized. A raw 1.3x delta that disappears under the conservative
    bound combination (cur / high, prev / low) must not flag; a move
    that survives even the least-favorable factors must still flag."""
    prev = _rec({"q": 1.0}, host_factor=1.0, spread={"q": [0.95, 1.05]})
    # current round drifted mid-run: start probe fast, end probe slow.
    cur = _rec({"q": 1.3}, host_factor=1.04)
    cur.update(host_factor_start=0.862, host_factor_end=1.3)
    # conservative: 1.3 / 1.3 = 1.0 vs prev 1.0 -> no regression,
    # even though 1.3 / 0.862 = 1.51x would have flagged under the
    # old start-probe-only normalization.
    assert scale_round.find_regressions(cur, prev) == []
    # a true move survives the conservative bounds
    big = _rec({"q": 2.6}, host_factor=1.04)
    big.update(host_factor_start=0.862, host_factor_end=1.3)
    regs = scale_round.find_regressions(big, prev)
    assert [r["query"] for r in regs] == ["q"]
    # ... and the prior side uses its LOW bound (raising prev_norm):
    prev_drifty = _rec({"q": 1.0}, host_factor=1.0, spread={"q": [0.95, 1.05]})
    prev_drifty.update(host_factor_start=0.8, host_factor_end=1.2)
    # prev_norm = 1.0/0.8 = 1.25; cur_norm = 1.3/1.0 = 1.3 -> 1.04x, no flag
    cur_flat = _rec({"q": 1.3}, host_factor=1.0)
    assert scale_round.find_regressions(cur_flat, prev_drifty) == []


def test_force_raw_neutralizes_probe_bounds_on_mismatch(capsys):
    # parallelism mismatch must discard the start/end bounds too, not
    # just host_factor — otherwise the raw fallback re-normalizes.
    prev = _rec({"q": 1.0}, host_factor=1.0, spread={"q": [0.95, 1.05]})
    prev["probe_parallelism"] = 32
    cur = _rec({"q": 1.5}, host_factor=3.0)
    cur.update(host_factor_start=3.0, host_factor_end=3.0, probe_parallelism=16)
    regs = scale_round.find_regressions(cur, prev)
    assert [r["query"] for r in regs] == ["q"]  # raw 1.5x, factors ignored
    assert regs[0]["parallelism_mismatch"] is True


def test_control_inflation_prefers_same_regime_isolated_baseline():
    """ADVICE r12 #3: isolated control runs must baseline against the
    prior round's ISOLATED medians when baked (same regime); the
    interleaved median is only the fallback, and stale-tagged entries
    don't count."""
    prev = _rec({"ivf2_ann_topk": 2.0, "rfm_segments": 2.0})
    # isolated runs are typically faster than interleaved ones:
    prev["isolated_median"] = {
        "ivf2_ann_topk": {"raw_s": 1.0, "norm_s": 1.0, "n": 4, "round": 12},
        "rfm_segments": {"raw_s": 1.0, "norm_s": 1.0, "n": 4, "stale": True},
    }
    fresh = {
        "ivf2_ann_topk": {"median_norm_s": 1.3, "median_raw_s": 1.3, "n": 4},
        "rfm_segments": {"median_norm_s": 1.3, "median_raw_s": 1.3, "n": 4},
    }
    ratios, vetoed = scale_round.control_inflation(fresh, prev)
    # ivf2: same-regime baseline 1.0 -> 1.3x (the true inflation);
    # rfm: stale isolated entry skipped -> interleaved 2.0 -> 0.65x.
    assert ratios == {"ivf2_ann_topk": 1.3, "rfm_segments": 0.65}
    # review r13: the veto pool is the SAME-REGIME subset when one
    # exists — rfm's regime-biased-low fallback ratio must not blend
    # into the median and suppress ivf2's genuine 1.3x inflation.
    assert vetoed
    # with no same-regime baseline anywhere, the pool is all ratios
    prev_fallback_only = _rec({"ivf2_ann_topk": 2.0, "rfm_segments": 2.0})
    ratios2, vetoed2 = scale_round.control_inflation(fresh, prev_fallback_only)
    assert ratios2 == {"ivf2_ann_topk": 0.65, "rfm_segments": 0.65}
    assert not vetoed2


def test_bench_stale_tags_carried_isolated_medians(tmp_path):
    """ADVICE r12 #2: bench.py tags carried isolated_median entries
    from earlier rounds stale at write time; current-round entries and
    absent stamps behave as documented."""
    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "bench_mod",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
        ),
    )
    bench = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)

    prior = {
        "fresh_q": {"raw_s": 1.0, "norm_s": 1.0, "n": 4, "round": 13},
        "old_q": {"raw_s": 1.0, "norm_s": 1.0, "n": 4, "round": 12},
        "unstamped_q": {"raw_s": 1.0, "norm_s": 1.0, "n": 4},
    }
    out = bench._stale_tag_isolated(prior, 13)
    assert "stale" not in out["fresh_q"]
    assert out["old_q"]["stale"] is True
    assert out["unstamped_q"]["stale"] is True
    # no round context -> passthrough; empty prior -> passthrough
    assert bench._stale_tag_isolated(prior, None) == prior
    assert bench._stale_tag_isolated(None, 13) is None

    # _current_round derives from the newest BENCH archive
    (tmp_path / "BENCH_r07.json").write_text("{}")
    (tmp_path / "BENCH_r12.json").write_text("{}")
    assert bench._current_round(str(tmp_path)) == 13
    assert bench._current_round(str(tmp_path / "..")) in (None, 13)  # robust


def test_control_veto_fires_on_single_extreme_control():
    """r13 finding: one not-yet-degraded control must not drag an
    extreme (>= CONTROL_VETO_MAX) code-stable control under the median
    cut — the exact escape that confirmed four code-stable queries
    from a degraded window (median 1.2405 with ivf2 at 1.416x)."""
    prev = _rec({"ivf2_ann_topk": 1.0, "rfm_segments": 1.0})
    prev["isolated_median"] = {
        "ivf2_ann_topk": {"raw_s": 1.0, "norm_s": 1.0, "n": 4, "round": 12},
        "rfm_segments": {"raw_s": 1.0, "norm_s": 1.0, "n": 4, "round": 12},
    }
    asymmetric = {
        "ivf2_ann_topk": {"median_norm_s": 1.45, "median_raw_s": 1.45, "n": 4},
        "rfm_segments": {"median_norm_s": 1.02, "median_raw_s": 1.02, "n": 4},
    }
    ratios, vetoed = scale_round.control_inflation(asymmetric, prev)
    assert ratios == {"ivf2_ann_topk": 1.45, "rfm_segments": 1.02}
    assert vetoed  # median 1.235 < 1.25, but max 1.45 >= CONTROL_VETO_MAX
    mild = {
        "ivf2_ann_topk": {"median_norm_s": 1.3, "median_raw_s": 1.3, "n": 4},
        "rfm_segments": {"median_norm_s": 1.02, "median_raw_s": 1.02, "n": 4},
    }
    _, vetoed = scale_round.control_inflation(mild, prev)
    assert not vetoed  # median 1.16, max 1.3 — below both bars


def test_bake_isolated_medians_carries_steady_fields(tmp_path):
    """r13: the baked record carries the rep-1-excluded steady medians
    when the harness produced them, and omits them cleanly otherwise
    (pre-r13 result shapes must keep baking)."""
    p = tmp_path / "bench_spread.json"
    p.write_text(json.dumps(_rec({"q": 1.0, "q2": 1.0})))
    scale_round.bake_isolated_medians(
        {
            "q": {
                "median_raw_s": 1.7, "median_norm_s": 1.9, "n": 4,
                "steady_raw_s": 0.95, "steady_norm_s": 1.05,
            },
            "q2": {"median_raw_s": 1.1, "median_norm_s": 1.0, "n": 4},
        },
        [str(p)],
        round_no=13,
    )
    out = json.loads(p.read_text())["isolated_median"]
    assert out["q"] == {
        "raw_s": 1.7, "norm_s": 1.9, "n": 4,
        "steady_raw_s": 0.95, "steady_norm_s": 1.05, "round": 13,
    }
    assert out["q2"] == {"raw_s": 1.1, "norm_s": 1.0, "n": 4, "round": 13}


def test_control_inflation_skips_vetoed_isolated_baselines():
    """r13: isolated medians baked from a window later adjudicated
    degraded are marked vetoed; using one as a same-regime control
    baseline would make the next round's ratios read artificially low
    and under-fire the veto. Vetoed entries fall back to interleaved."""
    prev = _rec({"ivf2_ann_topk": 1.0, "rfm_segments": 1.0})
    prev["isolated_median"] = {
        # degraded-window bake: 1.8x the true level, vetoed
        "ivf2_ann_topk": {"raw_s": 1.8, "norm_s": 1.8, "n": 4, "round": 13, "vetoed": True},
    }
    fresh = {
        "ivf2_ann_topk": {"median_norm_s": 1.45, "median_raw_s": 1.45, "n": 4},
    }
    ratios, vetoed = scale_round.control_inflation(fresh, prev)
    # against the vetoed 1.8 baseline the ratio would read 0.81 (clean);
    # against the interleaved 1.0 fallback it reads the true 1.45 -> veto
    assert ratios == {"ivf2_ann_topk": 1.45}
    assert vetoed


def test_bench_stale_tag_keeps_future_and_current_stamps_fresh():
    """ADVICE r13 #3: round attribution must not depend on archive-file
    timing — an entry stamped with the current round or NEWER (archive
    deleted, or the round was inferred low) is fresh; only strictly
    older stamps go stale."""
    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "bench_mod2",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
        ),
    )
    bench = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)

    prior = {
        "current_q": {"raw_s": 1.0, "norm_s": 1.0, "n": 4, "round": 14},
        "future_q": {"raw_s": 1.0, "norm_s": 1.0, "n": 4, "round": 15},
        "old_q": {"raw_s": 1.0, "norm_s": 1.0, "n": 4, "round": 13},
    }
    out = bench._stale_tag_isolated(prior, 14)
    assert "stale" not in out["current_q"]
    assert "stale" not in out["future_q"]
    assert out["old_q"]["stale"] is True


def test_bench_current_round_env_override(tmp_path, monkeypatch):
    """ADVICE r13 #3: $SPARK_GRAFT_ROUND beats archive inference."""
    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "bench_mod3",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
        ),
    )
    bench = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)

    (tmp_path / "BENCH_r12.json").write_text("{}")
    monkeypatch.delenv("SPARK_GRAFT_ROUND", raising=False)
    assert bench._current_round(str(tmp_path)) == 13
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "14")
    assert bench._current_round(str(tmp_path)) == 14


def test_same_run_rejects_mixed_run_factors():
    """VERDICT r13 item 5: BENCH_r{N}.json and bench_spread_r{N}.json
    can be different runs with different host factors (r13: 0.878 vs
    0.904); a factor is canonical only for its own run's medians.
    same_run() is the guard consumers must pass before treating the
    factors as interchangeable; records predating the run_id stamp are
    never interchangeable (None)."""
    a = _rec({"q": 1.0})
    b = _rec({"q": 1.1}, host_factor=0.9)
    # pre-r14 records carry no run_id -> not interchangeable
    assert scale_round.same_run(a, b) is None
    a["run_id"], b["run_id"] = "abc123", "abc123"
    assert scale_round.same_run(a, b) is True
    b["run_id"] = "def456"
    assert scale_round.same_run(a, b) is False
    assert scale_round.same_run(None, b) is None


def test_find_regressions_adjudication_baseline_uses_mean_factor():
    """ADVICE r13 #1: the FLAG stays conservative (prev normalized by
    the LOW factor bound), but the isolated-adjudication baseline
    (prev_mean_norm_s) uses the prior round's MEAN factor — otherwise
    the low-bound inflation stacks under the clearance's 1.25x slack
    and a real regression in a drifty prior window clears as
    contention/JIT."""
    prev = _rec({"q": 1.0}, host_factor=1.0)
    prev["host_factor_start"], prev["host_factor_end"] = 0.8, 1.2
    cur = _rec({"q": 2.0}, host_factor=1.0)
    cur["host_factor_start"], cur["host_factor_end"] = 1.0, 1.0
    out = scale_round.find_regressions(cur, prev, threshold=1.2)
    assert len(out) == 1
    rec = out[0]
    # flag baseline: prev median / LOW bound = 1.0 / 0.8 = 1.25
    assert abs(rec["prev_norm_s"] - 1.25) < 1e-9
    # adjudication baseline: prev median / MEAN factor = 1.0 / 1.0
    assert abs(rec["prev_mean_norm_s"] - 1.0) < 1e-9


# ---- r15 per-pass probe normalization (VERDICT r14 item 3) ----


def _pn_rec(medians_norm, spread_norm=None, bracket_spread=1.0, **extra):
    """Spread record carrying the r15 pass-normalized maps. Raw medians
    deliberately DIFFER from the normalized ones so a test fails loudly
    if the consumer falls back to the raw path."""
    rec = {
        "medians": {n: v * 7.0 for n, v in medians_norm.items()},
        "spread": {n: [v * 7.0, v * 7.0] for n, v in medians_norm.items()},
        "host_factor": 1.0,
        "sf": 0.1,
        "medians_pass_norm": medians_norm,
        "spread_pass_norm": spread_norm
        or {n: [v, v] for n, v in medians_norm.items()},
        "max_bracket_spread": bracket_spread,
    }
    rec.update(extra)
    return rec


def test_host_factor_bounds_include_pass_factors():
    rec = _rec({"q": 1.0}, host_factor=1.0)
    rec.update(
        host_factor_start=0.95,
        host_factor_end=1.0,
        pass_factors=[0.95, 1.2, 0.9],
        micro_factor=1.25,
    )
    assert scale_round.host_factor_bounds(rec) == (0.9, 1.25)


def test_find_regressions_prefers_pass_normalized_medians():
    """A raw delta that the per-pass brackets fully explain must not
    flag (the r14 driver-run signature: uniform raw drift, flat after
    per-pass normalization); a real pass-normalized move must flag and
    be tagged pass_normalized."""
    prev = _pn_rec({"q": 1.0}, spread_norm={"q": [0.95, 1.05]})
    flat = _pn_rec({"q": 1.02})  # raw medians differ 7x; norm flat
    assert scale_round.find_regressions(flat, prev) == []
    moved = _pn_rec({"q": 1.6})
    regs = scale_round.find_regressions(moved, prev)
    assert [r["query"] for r in regs] == ["q"]
    assert regs[0]["pass_normalized"] is True
    assert regs[0]["prev_norm_s"] == 1.0 and regs[0]["cur_norm_s"] == 1.6


def test_find_regressions_widens_band_on_bracket_disagreement():
    """Brackets disagreeing >10% widen the prior noise band by the
    worst within-bracket residual: a 1.35x 'move' inside that widened
    band is measurement uncertainty, not a regression."""
    prev = _pn_rec({"q": 1.0}, spread_norm={"q": [0.9, 1.1]})
    cur = _pn_rec({"q": 1.35}, bracket_spread=1.3)
    assert scale_round.find_regressions(cur, prev) == []  # 1.35 <= 1.1*1.3
    cur_tight = _pn_rec({"q": 1.35}, bracket_spread=1.05)
    regs = scale_round.find_regressions(cur_tight, prev)
    assert [r["query"] for r in regs] == ["q"]
    assert "band_widened_by" not in regs[0]  # <=1.10 residual: no widening


def test_find_regressions_pass_norm_iqr_veto():
    """The IQR veto reads the pass-normalized bands when both records
    carry them: a current median whose own normalized IQR low reaches
    the prior normalized band is contention, not a move."""
    prev = _pn_rec({"q": 1.0}, spread_norm={"q": [0.9, 1.1]})
    cur = _pn_rec({"q": 1.5})
    cur["iqr_pass_norm"] = {"q": [1.05, 1.55]}  # low reaches prior band
    assert scale_round.find_regressions(cur, prev) == []
    cur["iqr_pass_norm"] = {"q": [1.45, 1.55]}
    assert [r["query"] for r in scale_round.find_regressions(cur, prev)] == ["q"]


def test_parallelism_mismatch_drops_pass_norm(capsys):
    """Pass factors from different probe parallelism are incomparable:
    the mismatch fallback must strip the pass-normalized maps and judge
    raw — otherwise force_raw would resurrect them."""
    prev = _pn_rec({"q": 1.0}, probe_parallelism=32)
    cur = _pn_rec({"q": 1.02}, probe_parallelism=16)  # raw: 7.14 vs 7.0, flat
    regs = scale_round.find_regressions(cur, prev)
    assert regs == []
    cur_big = _pn_rec({"q": 2.0}, probe_parallelism=16)
    regs = scale_round.find_regressions(cur_big, prev)
    assert [r["query"] for r in regs] == ["q"]
    assert regs[0].get("parallelism_mismatch") is True
    assert "pass_normalized" not in regs[0]


def test_bake_isolated_medians_stamps_vetoed_windows(tmp_path):
    """r15: when the window's controls vetoed the measurement, every
    baked entry must carry the vetoed stamp — control_inflation skips
    vetoed entries as baselines, so an unstamped degraded-window bake
    would silently become a later round's control baseline."""
    p = tmp_path / "bench_spread.json"
    p.write_text(json.dumps(_rec({"q": 1.0})))
    scale_round.bake_isolated_medians(
        {"q": {"median_raw_s": 2.0, "median_norm_s": 2.2, "n": 4}},
        [str(p)],
        round_no=15,
        vetoed=True,
    )
    out = json.loads(p.read_text())["isolated_median"]
    assert out["q"]["vetoed"] is True and out["q"]["round"] == 15
    # default stays unstamped (a clean window's bake is a valid baseline)
    scale_round.bake_isolated_medians(
        {"q2": {"median_raw_s": 1.0, "median_norm_s": 1.0, "n": 9}},
        [str(p)],
        round_no=15,
    )
    out = json.loads(p.read_text())["isolated_median"]
    assert "vetoed" not in out["q2"]


def test_shuffle_window_veto_pools_child_probes():
    """r16 (VERDICT r15 item 3): the shuffle probe is adjudication-
    grade. A dirty child pool (median >= 1.25 or any child >= 2.0)
    vetoes the window even when the CPU-probe controls look clean —
    the r16 attempt-1 failure mode (one child at 6.39x shuffle while
    its CPU probe read 1.26)."""
    clean = {
        "a": {"median_norm_s": 1.0, "shuffle_factors": [0.95, 1.05]},
        "b": {"median_norm_s": 1.0, "shuffle_factors": [1.1, 0.9]},
    }
    med, vetoed = scale_round.shuffle_window_veto(clean)
    assert not vetoed and med is not None and med < 1.25

    single_spike = {
        "a": {"median_norm_s": 1.0, "shuffle_factors": [0.95, 6.39]},
        "b": {"median_norm_s": 1.0, "shuffle_factors": [1.0, 1.0]},
    }
    med, vetoed = scale_round.shuffle_window_veto(single_spike)
    assert vetoed, "one child past SHUFFLE_VETO_MAX must veto"

    uniformly_dirty = {
        "a": {"median_norm_s": 1.0, "shuffle_factors": [1.3, 1.4]},
    }
    assert scale_round.shuffle_window_veto(uniformly_dirty)[1]

    # pre-r15 children without shuffle readings never veto
    assert scale_round.shuffle_window_veto(
        {"a": {"median_norm_s": 1.0}}
    ) == (None, False)
    assert scale_round.shuffle_window_veto({}) == (None, False)


def test_find_regressions_annotates_shuffle_suspects():
    """A flag whose ratio is inside the cross-round shuffle-ratio x
    threshold envelope is tagged shuffle_suspect (still flagged — the
    isolated A/B adjudicates — but a confirmation must come from a
    shuffle-clean window). Flags beyond the envelope are not tagged."""
    prev = _pn_rec({"q_near": 1.0, "q_far": 1.0}, shuffle_factor=1.0)
    cur = _pn_rec(
        {"q_near": 1.4, "q_far": 2.5},
        spread_norm={"q_near": [1.4, 1.4], "q_far": [2.5, 2.5]},
        shuffle_factor=1.2,
    )
    cur["iqr_pass_norm"] = {"q_near": [1.4, 1.4], "q_far": [2.5, 2.5]}
    found = {f["query"]: f for f in scale_round.find_regressions(cur, prev)}
    # 1.4 <= 1.2 * 1.25 = 1.5 -> suspect; 2.5 > 1.5 -> genuine candidate
    assert found["q_near"].get("shuffle_suspect") is True
    assert "shuffle_suspect" not in found["q_far"]
    assert found["q_near"]["shuffle_ratio"] == 1.2

    # no shuffle readings on either side -> no annotation at all
    prev2 = _pn_rec({"q": 1.0})
    cur2 = _pn_rec({"q": 2.0}, spread_norm={"q": [2.0, 2.0]})
    cur2["iqr_pass_norm"] = {"q": [2.0, 2.0]}
    (f,) = scale_round.find_regressions(cur2, prev2)
    assert "shuffle_ratio" not in f and "shuffle_suspect" not in f


def test_shuffle_stable_cross_round_never_tags():
    """Equal shuffle factors across rounds (ratio 1.0 < 1.15) leave
    every flag untagged — the annotation only fires when the shuffle
    dimension actually moved."""
    prev = _pn_rec({"q": 1.0}, shuffle_factor=1.1)
    cur = _pn_rec({"q": 1.4}, spread_norm={"q": [1.4, 1.4]}, shuffle_factor=1.1)
    cur["iqr_pass_norm"] = {"q": [1.4, 1.4]}
    (f,) = scale_round.find_regressions(cur, prev)
    assert f["shuffle_ratio"] == 1.0 and "shuffle_suspect" not in f
