"""The bench artifact's ONE emitted JSON line must stay under the round
driver's ~2,000-char stdout-tail capture — round 4's line overflowed it
(11 verbose dropped-pair dicts) and the round recorded no throughput and
no per-query times at all.  These tests pin the bound on the worst case
the protocol can produce, without running any subprocess chains."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _mkrun(cores: int, full_time: float) -> dict:
    return {
        "cores": cores,
        "phases": {
            "redimension_time": 3.14,
            "rasterize_time": 2.13,
            "join_time": 0.41,
            "pip_time": 2.51,
            "full_time": full_time,
        },
        "throughput": 123456.7,
    }


def _mkpair(eff: float, ctrl: float) -> dict:
    n = _mkrun(1, 10.512)
    f = _mkrun(4, round(10.512 / (4 * eff), 3))
    return {
        "n": n,
        "4n": f,
        "efficiency": eff,
        "membw_efficiency": ctrl,
        "vs_ceiling": round(eff / ctrl, 3) if ctrl else None,
    }


def _emit_line(slim: dict) -> str:
    out = {
        "metric": "tiles_pages_per_sec",
        "value": 2454.12,
        "unit": "sec",
        "queries": {q: 11.234 for q in bench.HEADLINE},
        "sf": "/root/testdata/sf0.1",
        "host": {"control": 0.512, "waited_s": 300.1, "storm_bound": True},
        "scaling": slim,
    }
    return json.dumps(out)


def test_worst_case_line_fits_driver_capture():
    """Max pairs on both sides (12 kept + 12 dropped, every float at full
    width, storm-bound preflight) must emit under 1,800 chars — margin
    below the ~2,000-char capture."""
    pairs = [_mkpair(0.812, 0.612) for _ in range(12)] + [
        _mkpair(0.476, 0.024) for _ in range(6)
    ] + [_mkpair(1.683, 0.512) for _ in range(6)]  # both drop reasons
    runs = [
        {"side": "n" if i % 2 == 0 else "4n", "res": _mkrun(1, 10.0), "control": 0.512}
        for i in range(25)
    ]
    preflight = {
        "n_probes": 16,
        "controls": [0.112] * 16,
        "start_control": 0.412,
        "waited_s": 240.1,
        "storm_bound_start": True,
        "regate": {"n_probes": 18, "controls": [0.112] * 18},
    }
    ceiling = {
        "raycast_1proc_sec": 0.72,
        "raycast_4proc_wall_sec": 0.8,
        "efficiency": 0.901,
    }
    slim, detail = bench.summarize_scaling(pairs, runs, preflight, ceiling)
    line = _emit_line(slim)
    assert len(line) < 1800, f"emitted line {len(line)} chars"
    # the summaries still carry the story the full detail holds
    assert slim["dropped_pairs"]["n"] == 12
    assert set(slim["dropped_pairs"]["reasons"]) == {"cratered", "impossible"}
    assert len(detail["dropped_pairs"]) == 12
    assert len(detail["pairs"]) == 24
    assert slim["preflight"]["storm_bound_start"] is True
    assert slim["stop_rule"] == "quorum+budget"


def test_all_insane_fallback_still_bounded_and_disclosed():
    """Every pair dropped (the r4 storm shape): the median falls back to
    all pairs, all_pairs_insane flags it, and the line still fits."""
    pairs = [_mkpair(0.461, 0.024) for _ in range(12)]
    runs = [
        {"side": "n" if i % 2 == 0 else "4n", "res": _mkrun(1, 10.0), "control": 0.024}
        for i in range(13)
    ]
    preflight = {
        "n_probes": 16,
        "controls": [0.024] * 16,
        "start_control": 0.024,
        "waited_s": 240.1,
        "storm_bound_start": True,
    }
    ceiling = {"raycast_1proc_sec": 0.72, "raycast_4proc_wall_sec": 0.8, "efficiency": 0.901}
    slim, _ = bench.summarize_scaling(pairs, runs, preflight, ceiling)
    assert slim["all_pairs_insane"] is True
    assert slim["median_efficiency"] == 0.461
    assert slim["clean_window"]["n_pairs"] == 0
    assert len(_emit_line(slim)) < 1800


def test_stop_rule_is_outcome_blind():
    """No code path may condition the chain stop on the median reaching
    the 0.8 target (the removed early exit biased recorded medians
    upward).  Source-level pin: SCALE_TARGET_EFF appears only in its
    definition, never in a comparison."""
    src = open(bench.__file__).read()
    uses = [
        ln
        for ln in src.splitlines()
        if "SCALE_TARGET_EFF" in ln and not ln.strip().startswith("#")
    ]
    assert uses == ["SCALE_TARGET_EFF = 0.8"], uses


def test_preflight_gate_needs_consecutive_probes(monkeypatch):
    """A single lucky probe inside a storm must NOT open the gate; two
    consecutive good probes must.  (A stalled 1-proc triad side once
    fabricated a 0.64 control mid-storm — consecutive probes are the
    guard.)"""
    seq = iter([0.1, 0.62, 0.05, 0.61, 0.59])
    monkeypatch.setattr(bench, "membw_control", lambda: {"efficiency": next(seq)})
    slept = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))
    g = bench.preflight_gate(wall_s=10_000, need=2)
    # consumed the whole sequence: 0.62 alone didn't open it, 0.61+0.59 did
    assert g["n_probes"] == 5
    assert g["storm_bound_start"] is False
    assert g["start_control"] == 0.59
    # slept only after BAD probes (good probes re-probe immediately)
    assert len(slept) == 2


def test_preflight_gate_storm_bound_after_wall(monkeypatch):
    monkeypatch.setattr(bench, "membw_control", lambda: {"efficiency": 0.05})
    t = [0.0]

    def fake_sleep(s):
        t[0] += s

    monkeypatch.setattr(bench.time, "sleep", fake_sleep)
    real_time = bench.time.time
    base = real_time()
    monkeypatch.setattr(bench.time, "time", lambda: base + t[0])
    g = bench.preflight_gate(wall_s=60, need=2)
    assert g["storm_bound_start"] is True
    assert g["waited_s"] <= 60
    assert all(c == 0.05 for c in g["controls"])
