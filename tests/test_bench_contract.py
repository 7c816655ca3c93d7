"""Contract tests for bench.py's driver-facing surface.

The round driver parses bench stdout from a BOUNDED tail capture; the r6
artifact lost its leading warm rows to that bound and the r8 artifact
overflowed it entirely (`"parsed": null`). The contract: stdout is ONE
compact JSON line whose worst-case size stays far inside the bound, with
everything bulky relegated to BENCH_SUMMARY.json.

Round 11 adds the contention contract (VERDICT r10 top_next): the headline
`value` is MIN-of-reps (the least-contended observation — host load
produced phantom regressions in r8, r9, and the r10 driver artifact when
medians were headlined), and every artifact self-labels `contended` from
loadavg telemetry so a contaminated run is identifiable without forensics.
"""

from __future__ import annotations

import json

from bench import BENCH_QUERIES, CONTENTION_LOADAVG, max_loadavg, stdout_line

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
