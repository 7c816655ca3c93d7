"""Driver-gate coverage ledger: which registered queries have ever been
driver-green, and which still need a turn in the 50-slot DRIVER_WINDOW.

The driver's correctness gate only checks the first 50 queries yielded by
``__spark_entry__.queries()`` (registry.DRIVER_WINDOW pins that window).
This tool reads every CORRECTNESS_r*.json the driver has produced and
reports, per registered query: the first round it went green, or that it
has never been checked — the input for each round's window rotation
(round-6 rule: every never-green oracled query gets promoted until the
whole registry has >=1 historical green row; ledger kept in COVERAGE.md).

``first_green_rounds`` / ``never_green`` are the ONE implementation of the
ledger — tests/test_driver_window.py imports them to enforce that the
hand-pinned DRIVER_WINDOW tuple satisfies the composition rule (every
never-green oracled query in the window; every plan module represented),
so the tuple and the ledger cannot silently diverge (r9 verdict #6).

Usage: python tools/coverage_rotation.py [--repo /root/repo] [--emit-window]

--emit-window prints ONE machine-readable JSON line instead of the human
report: {"window": [...], "never_green": [...], "module_reps": [...]} — the
never-green queue first, then one green representative per plan module, the
exact composition rule DRIVER_WINDOW follows. A harness that reads this line
needs no hand-staged rotation (see README "Proposal to the harness owner").
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _ledger_files(repo: str, through: str | None = None) -> list[str]:
    """CORRECTNESS_r*.json paths in round order, optionally truncated at
    round label ``through`` (inclusive). The truncation makes a window
    proposal REPRODUCIBLE after newer artifacts land: the registry records
    which ledger prefix generated DRIVER_WINDOW, so the enforcement test
    recomputes the same proposal even while the current round's artifact
    is being written (labels are zero-padded — lexicographic order is
    round order)."""
    files = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    if through is not None:
        files = [f for f in files
                 if os.path.basename(f)[len("CORRECTNESS_"):-len(".json")] <= through]
    return files


def first_green_rounds(repo: str, through: str | None = None) -> dict[str, str]:
    """name -> first round label with a fully-green CORRECTNESS row."""
    out: dict[str, str] = {}
    for f in _ledger_files(repo, through):
        rnd = os.path.basename(f)[len("CORRECTNESS_"):-len(".json")]
        for name, row in json.load(open(f)).items():
            ok = row.get("rows_match") and row.get("schema_match") and row.get("hash_match", True)
            if ok and name not in out:
                out[name] = rnd
    return out


def last_green_rounds(repo: str, through: str | None = None) -> dict[str, str]:
    """name -> most recent round label with a fully-green CORRECTNESS row —
    the staleness signal: a query whose last green row is rounds old relies
    on an aging attestation even though lifetime coverage is complete."""
    out: dict[str, str] = {}
    for f in _ledger_files(repo, through):
        rnd = os.path.basename(f)[len("CORRECTNESS_"):-len(".json")]
        for name, row in json.load(open(f)).items():
            ok = row.get("rows_match") and row.get("schema_match") and row.get("hash_match", True)
            if ok:
                out[name] = rnd
    return out


def never_green(repo: str, qs) -> list[str]:
    """Oracled registered queries with no driver-green row in any round."""
    green = first_green_rounds(repo)
    return [n for n, q in qs.items() if q.oracle is not None and n not in green]


def emit_window(repo: str, qs, size: int = 50,
                through: str | None = None) -> dict:
    """The composition rule DRIVER_WINDOW follows (r11 verdict directive
    #4 — staleness rotation): the never-green queue first (attestation
    debt drains before anything else), then one green oracled
    representative per plan module — choosing each module's MOST STALE
    query (oldest last-green) so module slots do double duty — then the
    remaining slots filled with the oldest-last-green oracled queries
    repo-wide. Every slot therefore refreshes the oldest attestations,
    and max staleness strictly decreases round over round. ``through``
    pins the ledger prefix (see _ledger_files) so the proposal that
    generated a committed DRIVER_WINDOW is recomputable forever."""
    first = first_green_rounds(repo, through)
    last = last_green_rounds(repo, through)

    def mod_of(n: str) -> str:
        return qs[n].fn.__module__.rsplit(".", 1)[-1]

    never = [n for n, q in qs.items() if q.oracle is not None and n not in first]
    covered_mods = {mod_of(n) for n in never}
    greens = sorted(
        (n for n, q in qs.items() if q.oracle is not None and n in last),
        key=lambda n: (last[n], n),   # oldest last-green first; name tiebreak
    )
    reps: list[str] = []
    for n in greens:
        if mod_of(n) not in covered_mods:
            covered_mods.add(mod_of(n))
            reps.append(n)
    chosen = set(never) | set(reps)
    fill = [n for n in greens if n not in chosen][: max(0, size - len(chosen))]
    window = (never + reps + fill)[:size]
    return {"window": window, "never_green": never, "module_reps": reps,
            "staleness_fill": fill, "through": through,
            "last_green": {n: last.get(n) for n in window}}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default="/root/repo")
    ap.add_argument("--emit-window", action="store_true",
                    help="print one JSON line with the computed gate window")
    ap.add_argument("--through", default=None,
                    help="only use CORRECTNESS artifacts up to this round "
                         "label (e.g. r11) — reproduces the proposal a "
                         "committed DRIVER_WINDOW was generated from")
    args = ap.parse_args()
    sys.path.insert(0, args.repo)

    from quatrain_mapreduce_spark.registry import DRIVER_WINDOW, all_queries

    qs = all_queries()
    first_green = first_green_rounds(args.repo)
    oracled = [n for n, q in qs.items() if q.oracle is not None]
    rows_only = [n for n, q in qs.items() if q.oracle is None]
    never = never_green(args.repo, qs)
    in_window_now = [n for n in never if n in DRIVER_WINDOW]

    if args.emit_window:
        print(json.dumps(emit_window(args.repo, qs, through=args.through),
                         separators=(",", ":")))
        return 0

    print(f"registered: {len(qs)}  oracled: {len(oracled)}  rows-only: {len(rows_only)}")
    print(f"ever driver-green: {len(first_green)}")
    last = last_green_rounds(args.repo)
    if last:
        stalest = sorted((n for n in oracled if n in last),
                         key=lambda n: (last[n], n))[:10]
        print("stalest oracled attestations (last green round):")
        for n in stalest:
            print(f"  {n:32s} {last[n]}")
    print(f"never driver-green (oracled): {len(never)}")
    for n in never:
        mark = "in current window" if n in DRIVER_WINDOW else "STILL IN TAIL"
        print(f"  {n:32s} {mark}")
    if len(in_window_now) == len(never):
        print("OK: every never-green oracled query is in the current window")
        return 0
    print(f"WARN: {len(never) - len(in_window_now)} never-green queries not in window")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
