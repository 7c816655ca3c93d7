"""Contract tests for bench.py's driver-facing surface.

The round driver parses bench stdout from a BOUNDED tail capture; the r6
artifact lost its leading warm rows to that bound and the r8 artifact
overflowed it entirely (`"parsed": null`). The contract: stdout is ONE
compact JSON line whose worst-case size stays far inside the bound, with
everything bulky relegated to BENCH_SUMMARY.json.

Round 11 adds the contention contract (VERDICT r10 top_next): the headline
`value` is MIN-of-reps (the least-contended observation — host load
produced phantom regressions in r8, r9, and the r10 driver artifact when
medians were headlined), and every artifact self-labels `contended` so a
contaminated run is identifiable without forensics. The verdict detects
EXTERNAL load only: a raw loadavg threshold flags the bench's own
local[32] work on every healthy run (the first r11 artifact: env_start
0.06 yet contended=true at timed loadavg 5.95), so mid-run contention is
judged by loadavg minus the bench process tree's own achieved CPU cores.
"""

from __future__ import annotations

import json
import os
import time

from bench import (BENCH_QUERIES, CONTENTION_LOADAVG, EXTERNAL_CORES,
                   WAVE_RATIO, WAVE_RETRIES, contention_verdict,
                   external_cores_estimate, load_floors, max_loadavg,
                   needs_wave_retry, proc_tree_cpu_seconds, stdout_line)

# the observed r6 capture held ~1.5 KB of tail; r8's ~4.6 KB line was lost
# entirely. Keep worst case comfortably under the smallest observed bound.
TAIL_BOUND = 1500


def test_stdout_line_fits_tail_bound_at_worst_case():
    # worst plausible widths: 3-digit seconds at 2dp for every query
    times = {n: 999.99 for n in BENCH_QUERIES}
    line = stdout_line(times, sf=0.1, contended=True)
    assert len(line) <= TAIL_BOUND, (len(line), TAIL_BOUND)
    parsed = json.loads(line)
    assert parsed["metric"] == "bench_total_wall"
    assert set(parsed["queries"]) == set(BENCH_QUERIES)
    assert "queries_cold" not in parsed  # bulk stays in BENCH_SUMMARY.json
    assert "\n" not in line


def test_stdout_headlines_min_of_reps_and_self_labels_contention():
    """The driver-facing line must say WHAT it aggregated (agg) and WHETHER
    the host was loaded (contended) — the two bits whose absence cost
    rounds 8-10 a forensic round-trip each."""
    times_min = {"q1": 1.0, "q2": 2.0, "failed": -1.0}
    line = stdout_line(times_min, sf=0.01, contended=False)
    parsed = json.loads(line)
    assert parsed["agg"] == "min"
    assert parsed["value"] == 3.0  # sum of non-negative minima only
    assert parsed["contended"] is False
    line2 = stdout_line(times_min, 0.01, contended=True)
    assert json.loads(line2)["contended"] is True


def test_stdout_line_prefix_mode_is_self_identifying():
    """A prefix-mode run (SPARK_GRAFT_BENCH_THROUGH) sums only a slice of
    the workload; its stdout line must carry an in-band marker so a stray
    env var can't record a phantom ~20x speedup in a captured BENCH_r{N}.
    The normal-mode line must NOT carry the key — the driver channel's
    shape is pinned."""
    times = {"q1": 1.0, "q2": 2.0}
    full = json.loads(stdout_line(times, 0.1, contended=False))
    assert "prefix_through" not in full
    prefix = json.loads(stdout_line(times, 0.1, False, through="q2"))
    assert prefix["prefix_through"] == "q2"


def test_contention_threshold_and_loadavg_fold():
    """The threshold is the PLANS.md-documented ~3 for this box (env
    override allowed); max_loadavg folds 1-min loads across snapshots and
    tolerates platforms without getloadavg."""
    assert CONTENTION_LOADAVG >= 1.0
    assert max_loadavg({"loadavg": [2.0, 1.0, 0.5]},
                       {"loadavg": [6.6, 5.0, 4.0]},
                       {"loadavg": None}) == 6.6
    assert max_loadavg({"loadavg": None}) is None
    assert max_loadavg() is None


def test_contention_verdict_ignores_own_load():
    """The failure mode that motivated the r11 rework: a quiet host whose
    loadavg is entirely the bench's own Spark work must NOT be contended,
    while pre-Spark load or a genuine external-core surplus must be."""
    # quiet start, timed loadavg fully explained by own achieved cores
    assert contention_verdict(0.06, external_cores_estimate(5.95, 5.4)) is False
    # r10 driver artifact shape: host loaded before Spark existed
    assert contention_verdict(6.6, None) is True
    # mid-run co-tenant arrival: loadavg far above own achieved cores
    assert contention_verdict(1.0, external_cores_estimate(9.0, 3.0)) is True
    # no /proc and no loadavg: cannot conclude contention
    assert contention_verdict(None, None) is False
    # estimate clamps at zero (1-min damping can lag own ramp-down)
    assert external_cores_estimate(2.0, 6.0) == 0.0
    assert external_cores_estimate(None, 1.0) is None
    assert external_cores_estimate(1.0, None) is None
    assert EXTERNAL_CORES > 0


def test_proc_tree_cpu_meter_counts_own_work():
    """proc_tree_cpu_seconds must see this process's own CPU (the bench
    subtracts its delta over the timed window); on a /proc-less platform it
    degrades to None and the verdict falls back to the env_start gate."""
    c0 = proc_tree_cpu_seconds()
    if c0 is None:
        assert not os.path.isdir("/proc")
        return
    t0 = time.monotonic()
    x = 0
    while time.monotonic() - t0 < 0.3:
        x += 1
    c1 = proc_tree_cpu_seconds()
    assert c1 is not None and c1 - c0 >= 0.1, (c0, c1)


def test_wave_retry_trigger_is_floor_gated_and_bounded():
    """r11 verdict directive #1b: a row whose whole rep window lands above
    WAVE_RATIO x its committed floor gets re-run (a sub-minute co-tenant
    wave can inflate every rep while even the row's own loadavg stamp
    stays quiet — r11: profile_orders min 6.52 at stamp 3.72, floor 3.36);
    rows without a floor, and rows at/under the ratio, never retry."""
    assert WAVE_RATIO > 1.0 and WAVE_RETRIES >= 1
    assert needs_wave_retry([6.52, 7.1], 3.36) is True        # the r11 case
    assert needs_wave_retry([3.4, 9.9], 3.36) is False        # one rep dodged it
    assert needs_wave_retry([6.52], None) is False            # no floor, no trigger
    assert needs_wave_retry([], 3.36) is False                # all reps failed
    assert needs_wave_retry([3.36 * WAVE_RATIO], 3.36) is False  # at ratio, not over


def test_bench_floors_file_matches_contract(tmp_path):
    """BENCH_FLOORS.json: sf-keyed committed floors; load_floors must
    ignore a floors file from another scale (a sf0.1 floor gating a sf1
    run would retry every row) and degrade to {} when the file is absent
    or malformed."""
    with open("BENCH_FLOORS.json") as fh:
        doc = json.load(fh)
    assert doc["sf"] == 0.1
    assert doc["floors"] and all(v > 0 for v in doc["floors"].values())
    # floors describe bench rows — a floor for an unbenched query is inert
    # at runtime but means the committed file went stale (renamed/removed
    # bench row), so fail here rather than let it rot (ADVICE r12: the
    # previous form of this assert was a tautology)
    assert set(doc["floors"]) <= set(BENCH_QUERIES), (
        set(doc["floors"]) - set(BENCH_QUERIES)
    )
    loaded = load_floors(os.getcwd(), 0.1)
    assert loaded == {k: float(v) for k, v in doc["floors"].items()}
    assert load_floors(os.getcwd(), 1.0) == {}   # scale mismatch -> no gating
    assert load_floors(str(tmp_path), 0.1) == {}  # absent file -> no gating


def test_summary_artifact_carries_min_and_env_telemetry():
    """BENCH_SUMMARY.json (committed per round) must keep the fields the
    contention analysis relies on: min-of-reps, loadavg snapshots, and —
    from round 11 — the self-labeling contention verdict."""
    with open("BENCH_SUMMARY.json") as fh:
        s = json.load(fh)
    for key in ("queries", "queries_min", "min_total", "queries_cold",
                "env_start", "env_timed", "env_end", "reps", "sf"):
        assert key in s, key
    assert set(s["queries_min"]) == set(s["queries"])
    # round-11+ artifacts self-label; pre-r11 committed artifacts are
    # grandfathered until the next bench run overwrites the file
    if "contended" in s:
        assert isinstance(s["contended"], bool)
        assert s["agg"] == "min_of_reps"
        assert s["value"] == s["min_total"]
        assert "median_total" in s and "load_max" in s
        assert set(s["queries_median"]) == set(s["queries_min"])
    if "external_cores_threshold" in s:
        # r11 external-load verdict: the artifact must carry the inputs the
        # verdict was computed from, so it can be audited without re-running
        # per-query loadavg attribution (late r11): a co-tenant wave can
        # inflate individual heavy rows while the run-level average stays
        # under threshold — the per-row stamps make that auditable
        assert "queries_loadavg" in s
        assert set(s["queries_loadavg"]) <= set(s["queries_min"])
        for key in ("loadavg_avg_timed", "own_cpu_cores_timed",
                    "external_cores_est"):
            assert key in s, key
    if "queries_retried" in s:
        # r12 wave retry: the artifact says which rows got extra reps and
        # under what policy, so a reader can tell a dodged wave (retried,
        # min recovered) from a real regression (retried, min still high)
        assert isinstance(s["queries_retried"], dict)
        assert set(s["queries_retried"]) <= set(s["queries_min"])
        assert all(1 <= v <= s["wave_retries_cap"]
                   for v in s["queries_retried"].values())
        assert s["wave_ratio"] > 1.0
