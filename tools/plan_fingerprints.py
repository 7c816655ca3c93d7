"""Refresh PLAN_FINGERPRINTS.json — the versioned plan-shape snapshot.

Usage:
    python tools/plan_fingerprints.py            # diff current plans vs snapshot
    python tools/plan_fingerprints.py --refresh  # rewrite the snapshot

The snapshot pins, per registered query, the movement/strategy counts of its
physical plan at sf0.001 (the same fixture scale the test suite lints at).
``tests/test_plan_lint.py`` fails when a query's current fingerprint differs
from the snapshot, so any plan-shape change — intended or not — must land
with a refreshed, reviewable snapshot in the same commit.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SNAPSHOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "PLAN_FINGERPRINTS.json")
SF_DIR = "/root/testdata/sf0.001"

def current_fingerprints(spark) -> dict[str, dict[str, int]]:
    from quatrain_mapreduce_spark.planaudit import (
        PLAN_BUILD_SKIP as SKIP,
        fingerprint_query,
    )
    from quatrain_mapreduce_spark.registry import all_queries

    out: dict[str, dict[str, int]] = {}
    for name, q in sorted(all_queries().items()):
        if name in SKIP:
            continue
        # Catalyst substitutes any still-registered persisted fragment from a
        # PREVIOUS query into this plan (InMemoryTableScan replaces the
        # parquet scans), making fingerprints depend on iteration order —
        # drop the cache so every plan is built from a clean catalog.
        spark.catalog.clearCache()
        out[name] = fingerprint_query(q.fn(spark, SF_DIR))
    return out


def main() -> int:
    # The ONE session builder shared with tests/conftest.py — the snapshot
    # must be taken under the exact session the suite lints with, or
    # config-dependent join strategy choices would make the test flaky.
    from quatrain_mapreduce_spark.planaudit import lint_session

    spark = lint_session()
    cur = current_fingerprints(spark)
    if "--refresh" in sys.argv:
        with open(SNAPSHOT, "w") as fh:
            json.dump(cur, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"wrote {SNAPSHOT}: {len(cur)} queries")
        return 0
    try:
        with open(SNAPSHOT) as fh:
            snap = json.load(fh)
    except FileNotFoundError:
        print("no snapshot; run with --refresh first")
        return 2
    bad = 0
    for name, fp in cur.items():
        old = snap.get(name)
        if old != fp:
            bad += 1
            print(f"{name}:\n  snapshot {old}\n  current  {fp}")
    for name in set(snap) - set(cur):
        bad += 1
        print(f"{name}: in snapshot but no longer registered")
    print(f"{bad} drifted / {len(cur)} checked")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
