"""Targeted per-query scale probe: warm + N timed reps at one SF dir.

The SCALING.md slope tables are built from runs like this: one process,
per query one untimed warm pass (staging artifacts, JIT) then N timed
reps with the cache cleared between reps, reporting min/median — min is
the least-contended observation (see bench.py's contention contract).
Prints one JSON line per query plus a trailing summary line, and stamps
loadavg telemetry so a contaminated probe is self-evident.

Usage:
  python tools/scale_probe.py --sf-dir /tmp/qms_sf10 \
      --queries profile_orders,profile_orders_hll --reps 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--queries", required=True,
                    help="comma-separated registered query names")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--wait-quiet", type=float, default=0.0,
                    help="poll up to this many seconds for 1-min loadavg "
                         "to drop below --quiet-load before EACH query's "
                         "timed reps (the co-tenant load on this host "
                         "arrives in waves — bench.py's contention notes); "
                         "proceeds regardless at the deadline, the stamped "
                         "loadavg tells the reader which case happened")
    ap.add_argument("--quiet-load", type=float, default=1.5)
    args = ap.parse_args()

    def wait_quiet() -> float:
        waited = 0.0
        while waited < args.wait_quiet:
            try:
                if os.getloadavg()[0] < args.quiet_load:
                    break
            except OSError:
                break
            time.sleep(15.0)
            waited += 15.0
        return waited

    from quatrain_mapreduce_spark import get_spark
    from quatrain_mapreduce_spark.registry import all_queries

    spark = get_spark(app_name="qms-scale-probe")
    qs = all_queries()
    names = args.queries.split(",")
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"not registered: {unknown}")

    def loadavg():
        try:
            return [round(x, 2) for x in os.getloadavg()]
        except OSError:
            return None

    results = {}
    for name in names:
        spark.catalog.clearCache()
        t0 = time.monotonic()
        try:
            qs[name].fn(spark, args.sf_dir).write.mode("overwrite").format("noop").save()
        except Exception as exc:
            print(json.dumps({"query": name, "error": f"{type(exc).__name__}: {exc}"[:400]}),
                  flush=True)
            continue
        warm_s = round(time.monotonic() - t0, 3)
        waited = wait_quiet()  # the warm pass itself inflates 1-min loadavg;
        # let it (and any co-tenant wave) decay before the timed reps
        reps = []
        for _ in range(args.reps):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            qs[name].fn(spark, args.sf_dir).write.mode("overwrite").format("noop").save()
            reps.append(round(time.monotonic() - t0, 3))
        results[name] = {"cold": warm_s, "reps": reps, "min": min(reps),
                         "loadavg": loadavg(), "waited_quiet_s": waited}
        print(json.dumps({"query": name, **results[name]}), flush=True)
    print(json.dumps({"sf_dir": args.sf_dir, "reps": args.reps,
                      "mins": {n: r["min"] for n, r in results.items()},
                      "loadavg_end": loadavg()}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
