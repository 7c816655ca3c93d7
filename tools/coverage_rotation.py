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


def first_green_rounds(repo: str) -> dict[str, str]:
    """name -> first round label with a fully-green CORRECTNESS row."""
    out: dict[str, str] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(f)[len("CORRECTNESS_"):-len(".json")]
        for name, row in json.load(open(f)).items():
            ok = row.get("rows_match") and row.get("schema_match") and row.get("hash_match", True)
            if ok and name not in out:
                out[name] = rnd
    return out


def never_green(repo: str, qs) -> list[str]:
    """Oracled registered queries with no driver-green row in any round."""
    green = first_green_rounds(repo)
    return [n for n, q in qs.items() if q.oracle is not None and n not in green]


def emit_window(repo: str, qs) -> dict:
    """The composition rule DRIVER_WINDOW follows: never-green queue first,
    then one green oracled representative per plan module (prefer the
    earliest-green = most battle-tested row)."""
    green = first_green_rounds(repo)
    never = [n for n, q in qs.items() if q.oracle is not None and n not in green]
    never_mods = {qs[n].fn.__module__.rsplit(".", 1)[-1] for n in never}
    reps: list[str] = []
    for n in sorted(green, key=lambda n: green[n]):
        if n not in qs or qs[n].oracle is None:
            continue
        mod = qs[n].fn.__module__.rsplit(".", 1)[-1]
        if mod not in never_mods and mod not in {
            qs[r].fn.__module__.rsplit(".", 1)[-1] for r in reps
        }:
            reps.append(n)
    return {"window": never + reps, "never_green": never, "module_reps": reps}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default="/root/repo")
    ap.add_argument("--emit-window", action="store_true",
                    help="print one JSON line with the computed gate window")
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
        print(json.dumps(emit_window(args.repo, qs), separators=(",", ":")))
        return 0

    print(f"registered: {len(qs)}  oracled: {len(oracled)}  rows-only: {len(rows_only)}")
    print(f"ever driver-green: {len(first_green)}")
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
