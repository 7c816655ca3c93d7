"""Streaming soak: bounded-state proof under a continuous rate source.

VERDICT r6 stretch #8. Runs the engine's stateful sessionization shape
(native session_window + watermark — streaming/hop.py:216) against Spark's
rate source for N minutes and records, per micro-batch, the state store's
row count and memory from StreamingQuery progress. A WATERMARKED session
aggregation must hold state only for sessions the watermark hasn't closed
yet; with a fixed key universe and steady event rate the state curve must
go FLAT after the first gap+watermark horizon. Unbounded growth here is
exactly the bug class that kills a 100 TB streaming deployment weeks in —
a missing watermark, a state key leak, or an eviction regression.

The harness FAILS (exit 1) if late-half state rows trend above
tolerance x the post-warmup median — a flat curve is asserted, not
eyeballed.

Usage: python tools/soak_stream.py [--minutes 10] [--rate 500]
       [--keys 1000] [--gap-seconds 10] [--watermark-seconds 30]
Writes one JSON line per sampled batch to stdout and a summary line last.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--rate", type=int, default=500, help="rows/sec")
    ap.add_argument("--keys", type=int, default=1000)
    ap.add_argument("--gap-seconds", type=int, default=10)
    ap.add_argument("--watermark-seconds", type=int, default=30)
    ap.add_argument("--tolerance", type=float, default=1.5,
                    help="late-half state rows must stay under tol x median")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("qms-soak")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # The key universe ROTATES: each 30 s window activates a different block
    # of `keys` users (8 blocks round-robin). A static key set at a steady
    # rate would re-touch every user inside the session gap, so no session
    # would ever close and the watermark would never evict — flat state for
    # the wrong reason. Rotation closes the previous block's sessions each
    # period, so the soak exercises the full open -> watermark-close ->
    # evict lifecycle continuously while total state stays bounded at
    # ~2 blocks (one open + one draining past the watermark).
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", args.rate)
        .load()
        .select(
            (
                (F.col("value") % args.keys)
                + args.keys
                * (F.floor(F.unix_timestamp("timestamp") / 30) % 8)
            ).alias("user_id"),
            F.col("timestamp").alias("ts"),
        )
    )
    sessions = (
        src.withWatermark("ts", f"{args.watermark_seconds} seconds")
        .groupBy(
            "user_id",
            F.session_window("ts", f"{args.gap_seconds} seconds").alias("sw"),
        )
        .agg(F.count("*").alias("n_events"))
    )
    sink = tempfile.mkdtemp(prefix="qms_soak_sink_")
    ckpt = tempfile.mkdtemp(prefix="qms_soak_ckpt_")
    q = (
        sessions.select("user_id", F.col("sw.start").alias("session_start"),
                        "n_events")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="5 seconds")
        .start()
    )

    deadline = time.monotonic() + args.minutes * 60
    seen: dict[int, dict] = {}
    try:
        while time.monotonic() < deadline:
            time.sleep(5)
            for p in q.recentProgress:
                bid = p["batchId"]
                ops = p.get("stateOperators") or []
                if bid in seen or not ops:
                    continue
                op = ops[0]
                row = {
                    "batch": bid,
                    "state_rows": op.get("numRowsTotal"),
                    "state_bytes": op.get("memoryUsedBytes"),
                    "rows_removed": op.get("numRowsRemoved"),
                    "input_rows": p.get("numInputRows"),
                    "wall_s": round(time.monotonic() - (deadline - args.minutes * 60), 1),
                }
                seen[bid] = row
                print(json.dumps(row), flush=True)
    finally:
        q.stop()

    batches = [seen[b] for b in sorted(seen)]
    # warmup horizon: sessions only start closing after gap+watermark; give
    # it 3x that before judging flatness
    horizon_s = 3 * (args.gap_seconds + args.watermark_seconds)
    post = [b for b in batches if b["wall_s"] > horizon_s]
    if len(post) < 6:
        print(json.dumps({"verdict": "TOO_SHORT", "batches": len(batches)}))
        return 1
    rows = [b["state_rows"] for b in post]
    med = sorted(rows)[len(rows) // 2]
    late = rows[len(rows) // 2:]
    worst_late = max(late)
    flat = worst_late <= args.tolerance * med
    removed_any = any((b["rows_removed"] or 0) > 0 for b in post)
    print(json.dumps({
        "verdict": "FLAT" if (flat and removed_any) else "GROWING",
        "post_warmup_batches": len(post),
        "median_state_rows": med,
        "worst_late_state_rows": worst_late,
        "late_over_median": round(worst_late / max(med, 1), 3),
        "watermark_evicts": removed_any,
        "minutes": args.minutes,
        "rate": args.rate,
        "keys": args.keys,
    }), flush=True)
    return 0 if (flat and removed_any) else 1


if __name__ == "__main__":
    raise SystemExit(main())
