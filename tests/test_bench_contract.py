"""Contract tests for bench.py's driver-facing surface.

The round driver parses bench stdout from a BOUNDED tail capture; the r6
artifact lost its leading warm rows to that bound and the r8 artifact
overflowed it entirely (`"parsed": null`). The contract: stdout is ONE
compact JSON line whose worst-case size stays far inside the bound, with
everything bulky relegated to BENCH_SUMMARY.json."""

from __future__ import annotations

import json

from bench import BENCH_QUERIES, stdout_line

# the observed r6 capture held ~1.5 KB of tail; r8's ~4.6 KB line was lost
# entirely. Keep worst case comfortably under the smallest observed bound.
TAIL_BOUND = 1500


def test_stdout_line_fits_tail_bound_at_worst_case():
    # worst plausible widths: 3-digit seconds at 2dp for every query
    times = {n: 999.99 for n in BENCH_QUERIES}
    line = stdout_line(times, cold_total=99999.999, sf=0.1)
    assert len(line) <= TAIL_BOUND, (len(line), TAIL_BOUND)
    parsed = json.loads(line)
    assert parsed["metric"] == "bench_total_wall"
    assert set(parsed["queries"]) == set(BENCH_QUERIES)
    assert "queries_cold" not in parsed  # bulk stays in BENCH_SUMMARY.json
    assert "\n" not in line


def test_summary_artifact_carries_min_and_env_telemetry():
    """BENCH_SUMMARY.json (committed per round) must keep the fields the
    contention analysis relies on: min-of-reps and loadavg snapshots."""
    with open("BENCH_SUMMARY.json") as fh:
        s = json.load(fh)
    for key in ("queries", "queries_min", "min_total", "queries_cold",
                "env_start", "env_timed", "env_end", "reps", "sf"):
        assert key in s, key
    assert set(s["queries_min"]) == set(s["queries"])
