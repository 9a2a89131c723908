"""Pins the bench.py stdout contract the driver depends on.

Round 12 regression (VERDICT r12 #1): adding per-query ``task_sec``
pushed the single stdout JSON line past the driver's ~2000-char tail
capture — BENCH_r12.json lost the headline total and most per-query
walls. The contract now: bulky attribution on an EARLIER line, the
FINAL line compact and parseable. These tests rebuild the final line
exactly as bench.main() does, from the REAL catalog keys at
worst-case value widths, and assert it fits with margin — so any
future catalog growth or field addition that would overflow the
window fails HERE, not in the round artifact.
"""

from __future__ import annotations

import json

from real_time_video_streaming_analytics_lakehouse_spark.plans import CATALOG

# Imported from bench.py (ADVICE r13): the test and the runtime share
# ONE line builder and ONE budget constant, so a field added to the
# real final line is budget-checked here automatically instead of
# drifting past a hand-mirrored copy and raising mid-bench.
from bench import FINAL_LINE_BUDGET, build_final_line


def _final_line(n_queries_extra: int = 0, streaming: bool = False) -> str:
    """bench.main()'s final JSON line at worst-case value widths."""
    timings = {k: 999.999 for k in sorted(CATALOG)}
    for i in range(n_queries_extra):
        timings[f"future_query_with_a_long_name_{i:02d}"] = 999.999
    rates = (
        {
            "user_activity": 99999.9,
            "content_popularity": 99999.9,
            "anomaly": 99999.9,
        }
        if streaming
        else None
    )
    return build_final_line(
        timings,
        runs=33,
        load_start=99.99,
        load_end=99.99,
        task_total=99999.999,
        sf=0.1,
        streaming_rates=rates,
        degraded_passes=99,
        retries=99,
        min_degraded=99,
        wall_norm=99999.999,
        cpus=9999,
        parallelism=9999,
    )


def test_final_line_fits_driver_window():
    line = _final_line()
    assert len(line) < FINAL_LINE_BUDGET, (
        f"bench final line would be {len(line)} chars at worst-case "
        f"widths — shrink it (move fields to the detail line) before "
        f"the driver's tail capture truncates it"
    )
    parsed = json.loads(line)
    assert parsed["metric"] == "catalog_total_wall_clock"
    assert set(parsed["queries"]) == set(CATALOG)


def test_final_line_headroom_for_streaming_keys():
    # SPARK_GRAFT_BENCH_STREAMING adds the per-pipeline rate map (one
    # compact key since round 16 — the old duplicated single-pipeline
    # key was retired to fund the provenance fields; no driver
    # artifact ever carried it, the flag is opt-in); the budget must
    # absorb it too — built by the REAL builder.
    line = _final_line(streaming=True)
    assert len(line) < FINAL_LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["streaming_ev_s"]["user_activity"] == 99999.9


def test_detail_line_carries_task_attribution():
    # the detail line is free-size but must be valid single-line JSON
    # with the fields the final line dropped.
    detail = {
        "detail": "bench_attribution",
        "task_sec": {k: 999.999 for k in sorted(CATALOG)},
        "top10_runs": 5,
        "loadavg_1min": {"start": 1.0, "passes": [1.0] * 5},
        "rest_degraded": False,
    }
    line = json.dumps(detail)
    assert "\n" not in line
    assert json.loads(line)["detail"] == "bench_attribution"


def test_final_line_headroom_for_catalog_growth():
    # future queries with long names must not overflow either — this
    # is the early warning that fires BEFORE real growth does. Two
    # since round 16 (was three): the catalog is pinned at exactly 50
    # by the driver contract (VERDICT r15 #7 — do not grow it), and
    # the provenance fields bought down the spare headroom
    # deliberately; any real growth must first retire final-line
    # fields to the detail line.
    line = _final_line(n_queries_extra=2)
    assert len(line) < FINAL_LINE_BUDGET, (
        "catalog growth headroom exhausted — move more fields to the "
        "detail line before adding queries"
    )


def test_bench_source_pins_contract():
    # the runtime guard and the two-line emit must stay in bench.py
    # (path derived from this file so pytest may run from any cwd)
    import os

    bench_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "bench.py"
    )
    src = open(bench_path).read()
    assert "bench_attribution" in src
    assert "1950" in src  # runtime length guard
    # the guard must be an explicit raise, not an assert (python -O
    # strips asserts and the r12 silent-truncation mode would return)
    assert "raise RuntimeError(f\"final bench line too long" in src
    # task_total must be guarded against partial REST attribution
    assert "task_complete" in src


def test_final_line_carries_degraded_passes():
    # round 15: the contention gate's self-report must reach the
    # driver artifact — and at worst-case width still fit the budget
    line = _final_line()
    parsed = json.loads(line)
    assert parsed["degraded_passes"] == 99


def test_degraded_pass_detection_and_band():
    """Pins the contention gate's semantics (VERDICT r14 #1): pass i
    is bracketed by samples i and i+1; EITHER bracket above the
    committed quiet band flags it. The band itself must separate the
    two observed round-14 populations (quiet 0.025-0.047, contended
    0.114-0.197)."""
    from bench import MEM_REF_MT_QUIET_MAX, degraded_pass_indices

    assert 0.047 < MEM_REF_MT_QUIET_MAX < 0.114
    quiet = [0.03, 0.04, 0.028, 0.047]
    assert degraded_pass_indices(quiet) == []
    # spike after pass 1 degrades passes 1 AND 2 (both brackets touch)
    spiked = [0.03, 0.04, 0.197, 0.03]
    assert degraded_pass_indices(spiked) == [1, 2]
    # all-degraded run self-reports fully
    stormy = [0.15, 0.2, 0.18]
    assert degraded_pass_indices(stormy) == [0, 1]
    # degenerate inputs never crash
    assert degraded_pass_indices([]) == []
    assert degraded_pass_indices([0.2]) == []


def test_final_line_carries_round16_provenance_fields():
    # round 16 (VERDICT r15 #3 + ADVICE r15): retry disclosure, per-
    # query min provenance count, and the yardstick-normalized wall
    # must reach the driver artifact — at worst-case widths, in budget
    line = _final_line()
    parsed = json.loads(line)
    assert parsed["retries"] == 99
    assert parsed["min_degraded"] == 99
    assert parsed["wall_norm"] == 99999.999


def test_final_line_carries_scaling_self_witness():
    # round 17 (VERDICT r16 #2): the artifact must witness the honored
    # core count and the session's defaultParallelism so a
    # low-core-count sweep whose walls barely move (overhead-bound SF)
    # is distinguishable from a bench that ignored $SPARK_GRAFT_CPUS
    line = _final_line()
    parsed = json.loads(line)
    assert parsed["cpus"] == 9999
    assert parsed["parallelism"] == 9999


def test_master_cores_parses_local_masters_only():
    from bench import _master_cores

    assert _master_cores("local[32]") == 32
    assert _master_cores("local[8]") == 8
    assert _master_cores("local[*]") is None
    assert _master_cores("spark://host:7077") is None


def test_yardstick_is_a_catalog_query_with_committed_quiet_value():
    # the sustained in-band reference must stay a real catalog query
    # (it is timed in every pass for free) and its committed quiet
    # value must be positive and below any plausible contended value
    from bench import YARDSTICK_QUERY, YARDSTICK_QUIET_SEC

    assert YARDSTICK_QUERY in CATALOG
    assert 0 < YARDSTICK_QUIET_SEC < 10


def test_min_provenance_and_yardstick_are_wired():
    """The per-query min-pass tracking, the degraded-min count, and
    the sustained references must stay in bench.main() — a refactor
    dropping any of them silently reverts the round-16
    self-certification (VERDICT r15 #1/#3)."""
    import os

    bench_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "bench.py"
    )
    src = open(bench_path).read()
    assert "min_pass[name] = pass_idx" in src
    assert "min_degraded_queries" in src
    assert "min_degraded=len(min_degraded_queries)" in src
    assert "sustained_ref()" in src
    assert "yardstick.append" in src
    assert "wall_norm=wall_norm" in src


def test_yardstick_quiet_min_prefers_quiet_passes():
    """The wall_norm normalizer must not use a contention-inflated
    yardstick when a quiet observation exists (r16 attempt 3 showed a
    degraded-pass min under-correcting by ~4 s)."""
    from bench import yardstick_quiet_min

    obs = [[0, 2.2], [1, 1.9], [2, 1.7]]
    # pass 2 degraded: its 1.7 (global min) must NOT win
    assert yardstick_quiet_min(obs, {2}) == 1.9
    # no degraded passes: plain min
    assert yardstick_quiet_min(obs, set()) == 1.7
    # all degraded: fall back to overall min rather than None
    assert yardstick_quiet_min(obs, {0, 1, 2}) == 1.7
    # no observations at all: None (wall_norm goes null)
    assert yardstick_quiet_min([], set()) is None
    # round 17: pass 0 pays the yardstick's own codegen — it must be
    # excluded whenever later observations exist, even when it is the
    # ONLY quiet pass (the observed failure: quiet cold 2.99 beat the
    # degraded-but-warm 1.79 and wall_norm over-corrected 2x)
    cold = [[0, 2.99], [1, 1.9], [2, 1.79]]
    assert yardstick_quiet_min(cold, {1, 2}) == 1.79
    assert yardstick_quiet_min(cold, set()) == 1.79
    # a single pass-0-only run still yields a value, never None
    assert yardstick_quiet_min([[0, 2.99]], set()) == 2.99


def test_sustained_ref_reports_median_and_p90():
    # cheap smoke: a short window must yield ordered, positive stats
    from bench import sustained_ref

    s = sustained_ref(duration_sec=0.05, n_threads=2)
    assert s["iters"] >= 1
    assert 0 < s["med_sec"] <= s["p90_sec"]


def test_bench_contention_gate_is_wired():
    """The retry loop and the degraded count must stay in bench.main()
    — a refactor that drops either silently reverts the round-15
    contention defense."""
    import os

    bench_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "bench.py"
    )
    src = open(bench_path).read()
    assert "MAX_CONTENTION_RETRIES" in src
    assert "degraded_pass_indices(_mem_mt())" in src
    assert "degraded_passes=len(degraded)" in src
