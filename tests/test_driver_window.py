"""DRIVER_WINDOW vs the coverage ledger — one source of truth, test-enforced.

The 50-slot gate window is hand-pinned in registry.DRIVER_WINDOW (the driver
checks the first 50 names ``queries()`` yields); the rotation LEDGER lives in
the CORRECTNESS_r*.json artifacts, computed by tools/coverage_rotation.py.
Before this test the two could silently diverge — a new oracled query could
land without a window slot and stay never-driver-green forever (exactly the
38-row backlog r8/r9 had to drain). These assertions import the SAME ledger
functions the CLI tool uses, so the composition rule is enforced at pytest
time, not by convention (r9 verdict directive #6).

No SparkSession needed: registration is an import side effect.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from coverage_rotation import (  # noqa: E402
    emit_window, last_green_rounds, never_green,
)

from quatrain_mapreduce_spark.registry import (  # noqa: E402
    DRIVER_WINDOW, WINDOW_LEDGER_THROUGH, all_queries,
)


def test_window_is_50_unique_registered_oracled_names():
    qs = all_queries()
    assert len(DRIVER_WINDOW) == 50, "driver checks exactly the first 50 — use every slot"
    assert len(set(DRIVER_WINDOW)) == 50, "duplicate window names waste gate slots"
    for n in DRIVER_WINDOW:
        assert n in qs, f"window names unregistered query: {n}"
        assert qs[n].oracle is not None, (
            f"{n} is rows-only — a window slot only buys a weak rows-only "
            "check; spend slots on oracled queries"
        )
    # the window must be the PREFIX of queries() order — that is what the
    # driver actually samples
    assert tuple(qs)[:50] == DRIVER_WINDOW


def test_every_never_green_oracled_query_has_a_window_slot():
    """The standing rotation rule: attestation debt drains before anything
    else gets a slot. A query that is never-driver-green and not in the
    window would stay unattested forever."""
    qs = all_queries()
    missing = [n for n in never_green(REPO, qs) if n not in DRIVER_WINDOW]
    assert not missing, f"never-driver-green oracled queries without a window slot: {missing}"


def test_every_plan_module_is_represented():
    """Module coverage invariant: each plan module keeps >=1 window row, so
    a module-wide breakage (import error, shared helper regression) is
    visible to the driver gate every round."""
    qs = all_queries()
    want = {q.fn.__module__.rsplit(".", 1)[-1] for q in qs.values()}
    got = {qs[n].fn.__module__.rsplit(".", 1)[-1] for n in DRIVER_WINDOW}
    assert got == want, f"modules with no window representative: {sorted(want - got)}"


def test_emit_window_agrees_with_ledger():
    """The CLI's --emit-window output is built from the same functions these
    tests use; sanity-pin its contract (never-green queue, then per-module
    most-stale reps, then oldest-last-green fill, trimmed to 50) so a
    harness consuming it gets what README promises."""
    qs = all_queries()
    out = emit_window(REPO, qs)
    assert out["window"] == (out["never_green"] + out["module_reps"]
                             + out["staleness_fill"])[:50]
    assert set(out["never_green"]) == set(never_green(REPO, qs))
    rep_mods = [qs[n].fn.__module__.rsplit(".", 1)[-1] for n in out["module_reps"]]
    assert len(rep_mods) == len(set(rep_mods)), "one rep per module"
    # the fill must be staleness-ordered: no query outside the window may
    # be MORE stale than one occupying a fill slot
    last = last_green_rounds(REPO)
    outside = [n for n, q in qs.items()
               if q.oracle is not None and n in last
               and n not in out["window"]]
    if out["staleness_fill"] and outside:
        newest_filled = max((last[n], n) for n in out["staleness_fill"])
        oldest_outside = min((last[n], n) for n in outside)
        assert newest_filled <= oldest_outside, (
            "a staler query was left outside the window", newest_filled,
            oldest_outside)


def test_window_is_the_generated_proposal_not_hand_curated():
    """r11 verdict directive #4: DRIVER_WINDOW must equal the rotation
    tool's proposal for the ledger prefix recorded in
    WINDOW_LEDGER_THROUGH — the tuple is regenerated, never hand-edited,
    so window composition can't silently diverge from the staleness rule.
    The prefix pin keeps this reproducible while the current round's
    CORRECTNESS artifact is being written."""
    qs = all_queries()
    proposal = emit_window(REPO, qs, through=WINDOW_LEDGER_THROUGH)["window"]
    assert tuple(proposal) == DRIVER_WINDOW


def test_window_ledger_prefix_is_fresh():
    """The recorded generation prefix may lag the newest CORRECTNESS
    artifact by at most one round — the mechanism that forces every
    session to regenerate the window, which is what makes max
    driver-green staleness strictly decrease round over round."""
    import glob

    rounds = sorted(
        os.path.basename(f)[len("CORRECTNESS_"):-len(".json")]
        for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    )
    assert WINDOW_LEDGER_THROUGH in rounds, (
        "WINDOW_LEDGER_THROUGH names a round with no artifact")
    newer = [r for r in rounds if r > WINDOW_LEDGER_THROUGH]
    assert len(newer) <= 1, (
        f"window generated from {WINDOW_LEDGER_THROUGH} but artifacts exist "
        f"through {rounds[-1]} — regenerate DRIVER_WINDOW "
        "(python tools/coverage_rotation.py --emit-window --through "
        f"{rounds[-1]})")
