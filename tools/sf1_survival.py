"""Full-registry survival sweep at sf1 (10x bench scale).

Runs EVERY registered query once against the synthetic sf1 staging dir
(``tools/make_sf1.py``) with the noop sink and records per-query wall
seconds as one JSON line — the "does the whole surface still run one decade
up?" check, complementing SCALING.md's per-operator slope tables.

Skips only the documented exact-mode walls whose production twins run
instead (each pair measured in SCALING.md):

- ``graph_summary`` / ``triangle_count`` — exact wedge enumeration is the
  oracle ground truth; >10 min on the sf1-densified graph by measurement.
  ``graph_summary_sampled`` / ``triangle_count_sampled`` run here.
- ``doc_similarity_pairs`` / ``user_similarity_knn`` — deliberate
  quadratic ground-truth formulations (verification math); the LSH/ANN
  scale paths run here.

Usage: python tools/sf1_survival.py [--sf-dir /tmp/qms_sf1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SKIP_WALLS = {
    "graph_summary": "exact wedge enumeration, >10 min at sf1 (ground truth; sampled twin runs)",
    "triangle_count": "exact wedge enumeration, >10 min at sf1 (ground truth; sampled twin runs)",
    "doc_similarity_pairs": "deliberate quadratic ground truth (LSH path runs)",
    "user_similarity_knn": "deliberate quadratic ground truth (ANN path runs)",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/qms_sf1")
    ap.add_argument("--only", default=None,
                    help="comma-separated query names: sweep just these "
                         "(targeted re-check of a round's new queries)")
    args = ap.parse_args()

    from quatrain_mapreduce_spark import get_spark
    from quatrain_mapreduce_spark.registry import all_queries

    spark = get_spark(app_name="qms-sf1-survival")
    qs = all_queries()
    walls: dict[str, float] = {}
    failed: dict[str, str] = {}
    only = set(args.only.split(",")) if args.only else None
    if only:
        unknown = only - set(qs)
        if unknown:
            raise SystemExit(f"--only names not registered: {sorted(unknown)}")
        # an explicit request to run a documented-wall query must be loud,
        # not silently dropped (review finding) — name what was skipped so
        # an empty sweep can't read as "ran with nothing to report"
        walled = sorted(only & SKIP_WALLS)
        if walled:
            print(f"SKIPPED (documented exact-mode walls, see SKIP_WALLS): "
                  f"{walled}", file=sys.stderr, flush=True)
    for name, q in qs.items():
        if name in SKIP_WALLS or (only and name not in only):
            continue
        spark.catalog.clearCache()
        t0 = time.monotonic()
        try:
            q.fn(spark, args.sf_dir).write.mode("overwrite").format("noop").save()
            walls[name] = round(time.monotonic() - t0, 2)
        except Exception as exc:  # noqa: BLE001 — survival means "it ran"
            failed[name] = f"{type(exc).__name__}: {exc}"[:200]
        print(f"{name}: {walls.get(name, 'FAIL')}", file=sys.stderr, flush=True)
    out = {
        "sf_dir": args.sf_dir,
        "n_ran": len(walls),
        "n_failed": len(failed),
        "n_skipped_walls": len(SKIP_WALLS),
        "total_wall_s": round(sum(walls.values()), 1),
        "slowest": dict(sorted(walls.items(), key=lambda kv: -kv[1])[:10]),
        "failed": failed,
    }
    print(json.dumps(out, separators=(",", ":")))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
