"""HOP streaming layer: stream/batch parity, online-aggregation convergence."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from quatrain_mapreduce_spark.catalog import load_table
from quatrain_mapreduce_spark.streaming.hop import (
    OnlineAggregator, read_events_stream, run_available_now, tumbling_window_agg,
)


def test_stream_batch_parity(spark, sf_dir):
    """The same window expression over the events table as a stream and as a
    batch frame must agree exactly (the point of Structured Streaming)."""
    stream = read_events_stream(spark, sf_dir)
    agg = tumbling_window_agg(
        stream, "ts", ["event_type"], [F.count("*").alias("cnt")],
        window_duration="1 hour", watermark=None,
    )
    streamed = {
        (r["win"]["start"], r["event_type"]): r["cnt"]
        for r in run_available_now(agg, "qms_test_parity").collect()
    }
    ev = load_table(spark, sf_dir, "events")
    batch = {
        (r["win"]["start"], r["event_type"]): r["cnt"]
        for r in ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
                   .agg(F.count("*").alias("cnt")).collect()
    }
    assert streamed == batch


def test_online_aggregator_converges(spark, sf_dir):
    """Snapshots: monotonically increasing progress, final snapshot == exact
    batch answer (EX/TopK.java:259-262 snapshot semantics)."""
    ev = load_table(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="qms_test_online_src_")
    ev.repartitionByRange(4, "event_id").write.mode("overwrite").parquet(src)

    def agg_fn(df):
        return df.groupBy("event_type").agg(F.count("*").alias("cnt"))

    total = ev.count()
    runner = OnlineAggregator(spark, src, spark.read.parquet(src).schema, agg_fn, total_rows=total)
    final = runner.run()

    progresses = [p for p, _ in runner.snapshots]
    assert len(progresses) >= 2, "multi-file source must produce multiple snapshots"
    assert progresses == sorted(progresses)
    assert abs(progresses[-1] - 1.0) < 1e-9

    exact = {r["event_type"]: r["cnt"] for r in agg_fn(ev).collect()}
    got_final = {r["event_type"]: r["cnt"] for r in final.collect()}
    assert got_final == exact
    # last written snapshot equals the returned final aggregate
    last_snap = {r["event_type"]: r["cnt"] for r in runner.snapshot_df(-1).collect()}
    assert last_snap == exact
    # early snapshots are partial: counts never exceed the exact answer
    first_snap = {r["event_type"]: r["cnt"] for r in runner.snapshot_df(0).collect()}
    assert all(first_snap[k] <= exact[k] for k in first_snap)


def test_online_aggregator_rerun_not_poisoned_by_checkpoint(spark, sf_dir):
    """Fresh checkpoint per run: a second run must produce snapshots again
    (the id()-reuse bug from round 1 silently produced none)."""
    ev = load_table(spark, sf_dir, "events").limit(100)
    src = tempfile.mkdtemp(prefix="qms_test_online_src2_")
    ev.repartition(2).write.mode("overwrite").parquet(src)

    def agg_fn(df):
        return df.agg(F.count("*").alias("n"))

    for _ in range(2):
        runner = OnlineAggregator(spark, src, spark.read.parquet(src).schema, agg_fn, total_rows=100)
        final = runner.run()
        assert final is not None and runner.snapshots, "run produced no snapshots"


def test_sessionize_stream_batch_parity(spark, sf_dir):
    """session_window over the same events as a stream and as a batch frame
    agree (native gap-window sessionization — the stateful streaming twin of
    the batch lag/cumsum form)."""
    from quatrain_mapreduce_spark.streaming.hop import sessionize_stream

    ev = load_table(spark, sf_dir, "events")
    batch = {
        (r["user_id"], r["sw"]["start"], r["sw"]["end"]): r["n_events"]
        for r in sessionize_stream(ev, "user_id", "ts", gap_minutes=30).collect()
    }
    stream = read_events_stream(spark, sf_dir)
    agg = sessionize_stream(stream.withWatermark("ts", "10 minutes"), "user_id", "ts", gap_minutes=30)
    streamed = {
        (r["user_id"], r["sw"]["start"], r["sw"]["end"]): r["n_events"]
        for r in run_available_now(agg, "qms_test_sessions").collect()
    }
    assert streamed == batch


def test_sessionize_batch_matches_window_form(spark, sf_dir):
    """The lag/cumsum sessionization and session_window produce the same
    session count per user (independent formulations of the same gap rule)."""
    from quatrain_mapreduce_spark.streaming.hop import sessionize, sessionize_stream
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    a = sessionize(ev, "user_id", "ts", 30).groupBy("user_id").agg(F.count("*").alias("n"))
    b = sessionize_stream(ev, "user_id", "ts", 30).groupBy("user_id").agg(F.count("*").alias("n"))
    assert {(r["user_id"], r["n"]) for r in a.collect()} == {(r["user_id"], r["n"]) for r in b.collect()}


def test_sessionize_exact_gap_boundary(spark):
    """An event arriving EXACTLY gap after its predecessor MERGES into the
    session in BOTH formulations: session_window extends a session to
    last+gap INCLUSIVE (verified empirically), so the lag/cumsum form uses a
    strict > comparison to match. Data-independent lock on the boundary
    convention — fixture agreement alone (9549/9549 at sf0.01) would not
    survive a regenerated exact-gap pair."""
    import datetime

    from quatrain_mapreduce_spark.streaming.hop import sessionize, sessionize_stream

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    gap_min = 30
    rows = [
        # u1: second event exactly 30:00.000000 later -> MERGES (1 session)
        ("u1", t0), ("u1", t0 + datetime.timedelta(minutes=gap_min)),
        # u2: second event 1 microsecond past the gap -> 2 sessions
        ("u2", t0), ("u2", t0 + datetime.timedelta(minutes=gap_min, microseconds=1)),
    ]
    ev = spark.createDataFrame(rows, "user_id string, ts timestamp")
    a = {(r["user_id"], r["n"]) for r in sessionize(ev, "user_id", "ts", gap_min)
         .groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    b = {(r["user_id"], r["n"]) for r in sessionize_stream(ev, "user_id", "ts", gap_min)
         .groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    assert a == b == {("u1", 1), ("u2", 2)}


def test_monitor_job_windows_ticks(spark):
    """Monitor framework (ClockInputFormat + MonitorClient parity): the
    continuous clock job emits windowed tick counts."""
    from quatrain_mapreduce_spark.streaming.hop import monitor_job

    agg = monitor_job(spark, rows_per_second=50, window="1 second")
    q = (agg.writeStream.format("memory").queryName("qms_test_monitor")
         .outputMode("complete").start())
    import time

    # poll-with-deadline, not a fixed sleep: under host contention (see
    # PLANS.md round-9 note) stream startup + first trigger can exceed any
    # fixed small sleep — wait until at least one window lands, bounded
    rows = []
    deadline = time.monotonic() + 45
    while time.monotonic() < deadline:
        rows = spark.table("qms_test_monitor").collect()
        if rows:
            break
        time.sleep(0.5)
    q.stop()
    assert rows, "no monitor windows produced within 45s"
    assert all(r["last_seq"] >= r["first_seq"] for r in rows)


def test_moving_avg_state_carries_across_batches(spark, sf_dir):
    """applyInPandasWithState: the per-key last-k buffer must survive batch
    boundaries. Replay events as 3 ordered slices (one per micro-batch); the
    streamed result must equal the batch window twin row-for-row — any state
    loss at a boundary would reset the average for every key mid-stream."""
    import glob
    import os
    import tempfile
    import time

    from quatrain_mapreduce_spark.streaming.stateful import (
        moving_avg_batch, moving_avg_stream,
    )

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    src = tempfile.mkdtemp(prefix="qms_test_ma_src_")
    ev.repartitionByRange(3, "event_id").write.mode("overwrite").parquet(src)
    base = time.time() - 3600
    files = sorted(glob.glob(os.path.join(src, "part-*.parquet")))
    assert len(files) == 3
    for i, f in enumerate(files):
        os.utime(f, (base + i * 10, base + i * 10))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    ma = moving_avg_stream(stream, "user_id", "event_id", "value", k=5)
    q = (
        ma.writeStream.format("memory").queryName("qms_test_ma")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, "slices must arrive in separate micro-batches"

    streamed = {
        (r["user_id"], r["event_id"]): r["avg_last_k"]
        for r in spark.table("qms_test_ma").collect()
    }
    batch = {
        (r["user_id"], r["event_id"]): r["avg_last_k"]
        for r in moving_avg_batch(ev, "user_id", "event_id", "value", k=5).collect()
    }
    assert streamed == batch


def test_watermark_finalizes_windows_exactly_once(spark):
    """Event-time watermark semantics (the engine's documented SUPERSET —
    the reference has no event time, SURVEY §2.8). The append-mode
    contract: a window is emitted EXACTLY ONCE, after the watermark passes
    its end, containing its on-time rows; rows arriving after the window
    was finalized and evicted never cause a duplicate emission. (Dropping
    late rows before finalization is best-effort in Spark, so that is
    deliberately not asserted.)"""
    import glob
    import os
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F

    src = tempfile.mkdtemp(prefix="qms_test_wm_src_")
    base = 1_700_000_000  # fixed epoch origin
    now = time.time()

    def put(rows, name, mt):
        d = tempfile.mkdtemp()
        spark.createDataFrame(rows, "event_id long, ep long") \
            .coalesce(1).write.mode("overwrite").parquet(d)
        dst = os.path.join(src, name)
        shutil.copy(glob.glob(os.path.join(d, "part-*.parquet"))[0], dst)
        os.utime(dst, (mt, mt))

    put([(1, base + 10), (2, base + 20)], "a.parquet", now - 400)  # old window
    put([(3, base + 7200)], "b.parquet", now - 300)  # advances watermark
    put([(4, base + 7260)], "c.parquet", now - 200)  # old window finalizes here
    put([(5, base + 30)], "d.parquet", now - 100)    # after finalization: must not re-emit

    stream = (
        spark.readStream.schema("event_id long, ep long")
        .option("maxFilesPerTrigger", 1).parquet(src)
        .withColumn("ts", F.timestamp_seconds("ep"))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute").alias("win"))
        .agg(F.count("*").alias("cnt"))
    )
    q = (
        agg.writeStream.format("memory").queryName("qms_test_wm")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = spark.table("qms_test_wm").collect()
    old_win = float(base - base % 60)
    emissions = [r["cnt"] for r in rows if r["win"]["start"].timestamp() == old_win]
    # exactly one finalized emission of the old window, with its 2 on-time
    # rows — the post-finalization row 5 produced no duplicate emission
    assert emissions == [2], f"expected one emission of 2 on-time rows, got {emissions}"
    # the far-future windows never finalized (watermark never passed them)
    assert all(r["win"]["start"].timestamp() == old_win for r in rows)


def test_online_aggregator_incremental_matches_reaggregation(spark, sf_dir):
    """The stateful incremental mode must produce the same final answer and
    a converging snapshot sequence, like the re-aggregation mode — but with
    per-batch work O(batch+groups) instead of O(data-so-far)."""
    ev = load_table(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="qms_test_online_inc_src_")
    ev.repartitionByRange(4, "event_id").write.mode("overwrite").parquet(src)

    def agg_fn(df):
        return df.groupBy("event_type").agg(F.count("*").alias("cnt"))

    total = ev.count()
    schema = spark.read.parquet(src).schema
    inc = OnlineAggregator(spark, src, schema, agg_fn, total_rows=total)
    final = inc.run_incremental()

    progresses = [p for p, _ in inc.snapshots]
    assert len(progresses) >= 2, "multi-file source must produce multiple snapshots"
    assert progresses == sorted(progresses)
    assert abs(progresses[-1] - 1.0) < 1e-9

    exact = {r["event_type"]: r["cnt"] for r in agg_fn(ev).collect()}
    assert {r["event_type"]: r["cnt"] for r in final.collect()} == exact

    # snapshot counts are monotonically non-decreasing per key (counts only grow)
    prev: dict = {}
    for _, path in inc.snapshots:
        snap = {r["event_type"]: r["cnt"] for r in spark.read.parquet(path).collect()}
        for k, v in prev.items():
            assert snap.get(k, 0) >= v
        prev = snap


def test_checkpoint_restart_is_exactly_once(spark):
    """HOP's job-recovery analogue, Structured-Streaming-native: a file
    stream drained availableNow with a checkpoint, then RESTARTED from the
    same checkpoint after new files arrive — the resumed query must process
    only the new files (source offsets) and the parquet sink's commit log
    must yield every row exactly once across both runs."""
    import os

    work = tempfile.mkdtemp(prefix="qms_test_ckpt_")
    src, out, ckpt = (os.path.join(work, d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)

    def add_file(name, lo, hi):
        spark.range(lo, hi).coalesce(1).write.mode("overwrite") \
            .parquet(os.path.join(src, name))

    def drain():
        q = (
            spark.readStream.schema("id long")
            .option("maxFilesPerTrigger", 1).parquet(os.path.join(src, "*"))
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return q

    add_file("a", 0, 50)
    add_file("b", 50, 100)
    drain()
    assert spark.read.parquet(out).count() == 100
    add_file("c", 100, 150)
    q2 = drain()
    got = [r["id"] for r in spark.read.parquet(out).collect()]
    assert len(got) == 150 and set(got) == set(range(150))
    # the restart really resumed: only file c was read in the second run
    assert sum(p["numInputRows"] for p in q2.recentProgress) == 50


def test_stream_dedup_drops_duplicate_across_batches(spark):
    """Streaming dropDuplicates state must span micro-batches: a row
    re-arriving in a LATER file slice (batch) is dropped, not re-emitted."""
    import os
    import time

    src = tempfile.mkdtemp(prefix="qms_test_sdedup_")
    base = time.time() - 600
    spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int") \
        .coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "f1"))
    spark.createDataFrame([("a", 1), ("c", 3)], "k string, v int") \
        .coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "f2"))
    for i, sub in enumerate(["f1", "f2"]):
        for f in os.listdir(os.path.join(src, sub)):
            os.utime(os.path.join(src, sub, f), (base + i * 10, base + i * 10))
    stream = (
        spark.readStream.schema("k string, v int")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
        .dropDuplicates(["k"])
    )
    q = (stream.writeStream.format("memory").queryName("qms_test_sdedup")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = {r["k"]: r["v"] for r in spark.table("qms_test_sdedup").collect()}
    assert rows == {"a": 1, "b": 2, "c": 3}
    # more than one batch actually ran (the cross-batch claim is meaningful)
    assert len(q.recentProgress) >= 2


def test_online_aggregator_incremental_survives_progress_retention(spark, sf_dir):
    """recentProgress retains only numRecentProgressUpdates entries; the
    listener-based bookkeeping must still reach progress 1.0 when the run has
    more micro-batches than the retention window (simulated by shrinking the
    retention to 2 — a 100-batch run is the same failure mode, slower)."""
    ev = load_table(spark, sf_dir, "events").limit(200)
    src = tempfile.mkdtemp(prefix="qms_test_online_ret_src_")
    # 8 files, 1 file per trigger => 8 micro-batches >> retention of 2
    ev.repartition(8).write.mode("overwrite").parquet(src)

    def agg_fn(df):
        return df.groupBy("event_type").agg(F.count("*").alias("cnt"))

    total = ev.count()
    prev_conf = spark.conf.get("spark.sql.streaming.numRecentProgressUpdates")
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "2")
    try:
        inc = OnlineAggregator(
            spark, src, spark.read.parquet(src).schema, agg_fn, total_rows=total
        )
        final = inc.run_incremental()
    finally:
        spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", prev_conf)

    progresses = [p for p, _ in inc.snapshots]
    assert len(progresses) >= 4, progresses
    assert abs(progresses[-1] - 1.0) < 1e-9, progresses
    exact = {r["event_type"]: r["cnt"] for r in agg_fn(ev).collect()}
    assert {r["event_type"]: r["cnt"] for r in final.collect()} == exact


def test_late_data_is_genuinely_dropped(spark, sf_dir):
    """stream_late_data's third slice must be dropped by the watermark —
    numRowsDroppedByWatermark > 0 across the run, and the emitted windows
    must exclude every old-odd row (counts equal the evens + recent-odds
    batch aggregate on closed windows only)."""
    from pyspark.sql import functions as F

    from quatrain_mapreduce_spark.catalog import load_table, normalize_event_ts
    from quatrain_mapreduce_spark.staging import stage_late_slices

    src = stage_late_slices(spark, sf_dir)
    schema = spark.read.parquet(src).schema
    stream = normalize_event_ts(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
    )
    q = (
        agg.writeStream.format("memory").queryName("qms_test_late")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    ev = load_table(spark, sf_dir, "events")
    even = F.col("event_id") % 2 == 0
    max_even = ev.where(even).agg(F.max(F.unix_micros("ts"))).first()[0]
    n_old_odds = ev.where(
        (~even) & (F.unix_micros("ts") < max_even - 6 * 3_600_000_000)
    ).count()
    assert n_old_odds > 0, "fixture degenerate: no old odd rows at this SF"
    # the state operator's counter can miss a handful of rows that the
    # pre-operator event-time filter removes first; the exactness assertion
    # below is the strict check that ALL old odds stayed out of the output
    assert 0 < dropped <= n_old_odds
    assert dropped >= int(0.9 * n_old_odds)
    # emitted totals exclude exactly the dropped rows and the open tail
    kept = ev.where(even | (F.unix_micros("ts") >= max_even - 6 * 3_600_000_000))
    cut = kept.agg(F.max(F.unix_micros("ts"))).first()[0] - 1_800_000_000
    expected = (
        kept.withColumn("ws", (F.floor(F.unix_micros("ts") / 600_000_000) * 600_000_000))
        .where(F.col("ws") + 600_000_000 <= cut)
        .count()
    )
    got = spark.table("qms_test_late").agg(F.sum("n_events")).first()[0]
    assert got == expected


def test_incremental_sessionize_handles_bridging_late_event(spark):
    """A late increment event BETWEEN two stored sessions must merge them —
    recompute-affected-users handles it where append-merge could not."""
    import pyspark.sql.functions as SF
    from quatrain_mapreduce_spark.streaming.hop import sessionize

    m = 60 * 1_000_000
    rows = [  # u1: two 30-min-gap-separated stored events, late bridge at 25m
        (0, "u1", 0 * m), (1, "u1", 50 * m),
        (2, "u2", 0 * m),
        (3, "u1", 25 * m),  # the late increment event
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id string, us long"
    ).select("event_id", "user_id", SF.timestamp_micros("us").alias("ts"))

    stored = sessionize(ev.where("event_id < 3"), "user_id", "ts")
    assert stored.where("user_id = 'u1'").count() == 2  # two sessions stored

    inc_users = ev.where("event_id >= 3").select("user_id").distinct()
    updated = sessionize(
        ev.join(SF.broadcast(inc_users), "user_id", "left_semi"),
        "user_id", "ts",
    )
    merged = stored.join(
        SF.broadcast(inc_users), "user_id", "left_anti"
    ).unionByName(updated)

    full = sessionize(ev, "user_id", "ts")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )
    assert merged.where("user_id = 'u1'").count() == 1  # bridged into one


def test_stream_auc_monitor_matches_batch_twin(spark):
    import glob
    import os
    from quatrain_mapreduce_spark.registry import all_queries
    from quatrain_mapreduce_spark.staging import stage_dir

    sf = "/root/testdata/sf0.001"
    qs = all_queries()
    stream_rows = sorted(
        tuple(r) for r in qs["stream_auc_monitor"].fn(spark, sf).collect())
    batch_rows = sorted(
        tuple(r) for r in qs["auc_mann_whitney"].fn(spark, sf).collect())
    assert stream_rows == batch_rows and len(stream_rows) == 1
    # incremental evidence: one versioned counts snapshot per micro-batch
    vers = sorted(glob.glob(os.path.join(stage_dir(sf, "auccounts"), "v*")))
    assert len(vers) == 4


def test_online_agg_ci_converges_and_final_is_exact(spark, sf_dir):
    """Online-aggregation acceptance: the k=4 (full-data) estimate must
    equal the exact batch total with zero interval, and the halfwidth
    must shrink monotonically as prefixes grow."""
    import pyspark.sql.functions as F
    from quatrain_mapreduce_spark.catalog import load_table
    from quatrain_mapreduce_spark.registry import all_queries

    rows = all_queries()["online_agg_ci"].fn(spark, sf_dir).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], {})[r["k"]] = r
    truth = {
        r["event_type"]: r["t"]
        for r in load_table(spark, sf_dir, "events").groupBy("event_type")
        .agg(F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))
                   .cast("bigint")).alias("t")).collect()
    }
    for t, ks in by_type.items():
        assert set(ks) == {1, 2, 3, 4}
        # final prefix is the whole population: estimate == exact truth
        assert ks[4]["est_sum_cents"] == truth[t]
        # CLT halfwidth shrinks as n grows (monotone over nested prefixes)
        hw = [ks[k]["ci_halfwidth_cents"] for k in (1, 2, 3, 4)]
        assert hw[0] > hw[1] > hw[2] > hw[3] > 0
        # every running estimate lands within ~4 sigma of the truth
        for k in (1, 2, 3):
            assert abs(ks[k]["est_sum_cents"] - truth[t]) < 2.1 * hw[k - 1]


def test_stream_staging_handles_nested_tables_and_fails_loud():
    """ADVICE r9 + r13 review: a partitionBy-written (nested) table must
    stage its leaf data files PRESERVING the hive-style directory
    components — `day=1/` carries the partition column's VALUE, and
    flattening it into the link name made the stream read that column as
    NULL for every row while the batch twin was correct. A directory with
    NO data files must still raise instead of silently producing a
    zero-micro-batch stream."""
    import os

    import pytest as _pytest

    from quatrain_mapreduce_spark.streaming.hop import _stage_stream_dir

    sf = tempfile.mkdtemp(prefix="qms_test_nest_")
    src = os.path.join(sf, "events.parquet")
    for sub in ("day=1", "day=2"):
        os.makedirs(os.path.join(src, sub))
        with open(os.path.join(src, sub, "part-0.parquet"), "wb") as fh:
            fh.write(b"x")
    d = _stage_stream_dir(sf, "events")
    staged = sorted(
        os.path.relpath(os.path.join(r, f), d)
        for r, _, fs in os.walk(d) for f in fs
    )
    assert staged == ["day=1/part-0.parquet", "day=2/part-0.parquet"]

    sf_empty = tempfile.mkdtemp(prefix="qms_test_nestempty_")
    os.makedirs(os.path.join(sf_empty, "events.parquet"))
    with _pytest.raises(FileNotFoundError):
        _stage_stream_dir(sf_empty, "events")


def test_stream_staging_preserves_partition_values(spark):
    """End-to-end form of the r13 review finding: stream a hive-partitioned
    table through the staged dir and require the partition column's VALUES
    to match the batch read — the flattened layout streamed them as NULL
    with no error (staged>0, loud-failure guard satisfied)."""
    import os

    from quatrain_mapreduce_spark.streaming.hop import _stage_stream_dir

    sf = tempfile.mkdtemp(prefix="qms_test_partvals_")
    tbl = os.path.join(sf, "events.parquet")
    (spark.range(100).selectExpr("id", "cast(id % 3 as int) as day")
     .write.partitionBy("day").parquet(tbl))
    batch = spark.read.parquet(tbl)
    stream = (spark.readStream.schema(batch.schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(_stage_stream_dir(sf, "events")))
    q = (stream.groupBy("day").count().writeStream.outputMode("complete")
         .format("memory").queryName("partvals")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.sql(
        "select * from partvals").collect())
    want = sorted(tuple(r) for r in batch.groupBy("day").count().collect())
    assert got == want and all(d is not None for d, _ in got)


def test_online_agg_snapshots_converge_monotonically_to_exact(spark, sf_dir):
    """r9 stretch #8 — the HOP online-aggregation convergence property
    (MR/ReduceTask.java:631-669: full reduce over data-so-far per progress
    quantum): over an 8-slice bounded replay, every snapshot is a PARTIAL
    of the exact batch answer (no key overshoots), per-key counts are
    non-decreasing in ingest fraction, total L1 error to the exact answer
    is non-increasing, and the error reaches exactly 0 at fraction 1."""
    ev = load_table(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="qms_test_conv_src_")
    ev.repartitionByRange(8, "event_id").write.mode("overwrite").parquet(src)

    def agg_fn(df):
        return df.groupBy("event_type").agg(F.count("*").alias("cnt"))

    total = ev.count()
    runner = OnlineAggregator(
        spark, src, spark.read.parquet(src).schema, agg_fn, total_rows=total
    )
    runner.run()
    exact = {r["event_type"]: r["cnt"] for r in agg_fn(ev).collect()}

    assert len(runner.snapshots) >= 4
    prev_counts: dict = {}
    prev_err = None
    for i, (progress, _) in enumerate(runner.snapshots):
        snap = {r["event_type"]: r["cnt"] for r in runner.snapshot_df(i).collect()}
        # partial-of-exact: no overshoot on any key, no phantom keys
        assert set(snap) <= set(exact)
        assert all(snap[k] <= exact[k] for k in snap), (progress, i)
        # per-key monotone in ingest fraction
        assert all(snap.get(k, 0) >= v for k, v in prev_counts.items()), i
        # total L1 error non-increasing
        err = sum(exact[k] - snap.get(k, 0) for k in exact)
        if prev_err is not None:
            assert err <= prev_err, (i, err, prev_err)
        prev_counts, prev_err = snap, err
    assert prev_err == 0  # fraction 1.0 == exact batch answer


def test_sigkill_mid_stream_restart_is_exactly_once(spark):
    """The hard half of exactly-once (tools/soak_stream.py --mode
    kill-restart is the 10-minute soak form; this is the fast CI gate): a
    CHILD process streams a 30-file source into a parquet sink one file
    per trigger, and the parent SIGKILLs its whole process group mid-run —
    driver and JVM die unannounced, free to leave uncommitted part files
    in the sink. A restart from the same checkpoint (availableNow) must
    drain the remainder so that reading the sink THROUGH the commit log
    yields every row exactly once: no loss, no replay, regardless of where
    the kill landed."""
    import os
    import signal
    import subprocess
    import sys
    import textwrap
    import time

    work = tempfile.mkdtemp(prefix="qms_test_kill_")
    src, out, ckpt = (os.path.join(work, d) for d in ("src", "out", "ckpt"))
    spark.range(0, 300).repartitionByRange(30, "id") \
        .write.mode("overwrite").parquet(src)

    child_code = textwrap.dedent(f"""
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[2]")
                 .appName("qms-kill-child")
                 .config("spark.sql.shuffle.partitions", "2")
                 .config("spark.ui.enabled", "false").getOrCreate())
        q = (spark.readStream.schema("id long")
             .option("maxFilesPerTrigger", 1).parquet({src!r})
             .writeStream.format("parquet")
             .option("path", {out!r})
             .option("checkpointLocation", {ckpt!r})
             .trigger(processingTime="1 second").start())
        q.awaitTermination()
    """)
    script = os.path.join(work, "child.py")
    with open(script, "w") as fh:
        fh.write(child_code)
    proc = subprocess.Popen([sys.executable, script],
                            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                            start_new_session=True)
    # wait until some batches committed (mid-run), then kill driver+JVM
    commits = os.path.join(ckpt, "commits")
    deadline = time.monotonic() + 90
    while time.monotonic() < deadline:
        if os.path.isdir(commits) and len(os.listdir(commits)) >= 3:
            break
        time.sleep(0.5)
    os.killpg(proc.pid, signal.SIGKILL)
    proc.wait()
    n_committed_before = len([f for f in os.listdir(commits) if f.isdigit()]) \
        if os.path.isdir(commits) else 0
    assert n_committed_before >= 1, "child never committed a batch before the kill"

    # restart from the same checkpoint and drain the remainder
    q2 = (
        spark.readStream.schema("id long")
        .option("maxFilesPerTrigger", 1).parquet(src)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q2.awaitTermination()

    got = [r["id"] for r in spark.read.parquet(out).collect()]
    assert len(got) == 300 and set(got) == set(range(300)), (
        f"exactly-once violated: {len(got)} rows, "
        f"{len(set(got))} distinct after SIGKILL restart"
    )


def test_stream_cms_state_is_bounded_and_matches_batch_cells(spark, sf_dir):
    """The property that makes a COMPLETE-mode streaming aggregate safe
    here: CMS state never exceeds d*w = 4096 rows however much data
    streams through, and the drained cells are exactly the batch cells
    (mergeability: micro-batch = corpus shard)."""
    from pyspark.sql import functions as F

    from quatrain_mapreduce_spark.catalog import load_table
    from quatrain_mapreduce_spark.operators.curation import cms_probes
    from quatrain_mapreduce_spark.registry import all_queries
    from quatrain_mapreduce_spark.staging import stage_dir
    import os

    all_queries()["stream_heavy_hitters"].fn(spark, sf_dir).collect()
    # the staged slices exist now; rebuild the batch cells for comparison
    d = stage_dir(sf_dir, "docslices4")
    assert os.path.exists(os.path.join(d, "_STAGED"))
    batch_cells = sorted(map(tuple, (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(
            F.expr("filter(split(lower(text), ' '), x -> x <> '')")
        ).alias("tok"))
        .select(F.explode(cms_probes("tok")).alias("rb"))
        .groupBy(F.col("rb.i").alias("i"), F.col("rb.b").alias("b"))
        .agg(F.count("*").cast("bigint").alias("c"))
    ).collect()))
    assert len(batch_cells) <= 4096
    # drained snapshot dirs are qms_drain_qms_stream_cms_*; find the newest
    import glob
    import tempfile
    snaps = sorted(
        glob.glob(os.path.join(tempfile.gettempdir(),
                               "qms_drain_qms_stream_cms_*", "snapshot")),
        key=os.path.getmtime,
    )
    assert snaps, "stream drain left no snapshot"
    stream_cells = sorted(map(tuple, spark.read.parquet(snaps[-1]).collect()))
    assert stream_cells == batch_cells


def test_stream_training_pipeline_matches_batch_twin(spark, sf_dir):
    """The composed pipeline (gate -> stateful dedup -> foreachBatch fold)
    must equal its batch twin built from the SAME stage function: identical
    kept (source, fp) set, identical CMS cells, cells bounded at d*w."""
    import os

    from quatrain_mapreduce_spark.staging import stage_doc_slices
    from quatrain_mapreduce_spark.streaming.pipeline import (
        cms_cells_of, curate_dedup_stages, norm_tokens,
        read_training_stream_result, run_training_stream,
    )

    d = stage_doc_slices(spark, sf_dir)
    out_root = tempfile.mkdtemp(prefix="qms_test_stream_tdp_")
    run_training_stream(spark, d, out_root)
    kept, cells, commits = read_training_stream_result(spark, out_root)
    assert len(commits) >= 4, "4-slice source must commit >=4 micro-batches"

    batch_kept = curate_dedup_stages(spark.read.parquet(d), "text")
    got = sorted((r["source"], r["fp"]) for r in kept.collect())
    want = sorted((r["source"], r["fp"]) for r in batch_kept.collect())
    assert got == want, "streamed kept set != batch gate+dedup twin"
    assert len(got) == len(set(got)), "duplicate (source, fp) survived dedup"

    got_cells = sorted(map(tuple, cells.collect()))
    want_cells = sorted(map(tuple, cms_cells_of(norm_tokens(batch_kept)).collect()))
    assert got_cells == want_cells, "per-batch CMS merge != batch cells"
    assert len(got_cells) <= 4096, "CMS monitor state exceeded d*w"

    # every committed batch left its versioned snapshot (fold ran per batch)
    for i in sorted(commits):
        assert os.path.isdir(os.path.join(out_root, "cells", f"v{i}"))


def test_stream_pipeline_reader_masks_uncommitted_orphans(spark, sf_dir):
    """Readers trust the checkpoint commit log, not the directory listing:
    a kept/cells version with no commits/ entry — exactly what a mid-batch
    JVM death leaves behind — must be invisible."""
    import os

    from quatrain_mapreduce_spark.staging import stage_doc_slices
    from quatrain_mapreduce_spark.streaming.pipeline import (
        read_training_stream_result, run_training_stream,
    )

    d = stage_doc_slices(spark, sf_dir)
    out_root = tempfile.mkdtemp(prefix="qms_test_stream_tdp_orphan_")
    run_training_stream(spark, d, out_root)
    kept_before, cells_before, commits = read_training_stream_result(spark, out_root)
    n_before = kept_before.count()
    cells_sum_before = cells_before.agg(F.sum("c")).collect()[0][0]

    # forge orphans: an uncommitted kept batch and a poisoned cells version
    orphan_id = max(commits) + 7
    spark.createDataFrame(
        [(999_999_999, "forged", "forged text", "deadbeef")],
        "doc_id bigint, source string, norm string, fp string",
    ).write.parquet(os.path.join(out_root, "kept", f"b{orphan_id}"))
    spark.createDataFrame(
        [("1", 0, 10_000_000)], "i string, b int, c bigint"
    ).write.parquet(os.path.join(out_root, "cells", f"v{orphan_id}"))

    kept_after, cells_after, _ = read_training_stream_result(spark, out_root)
    assert kept_after.count() == n_before
    assert kept_after.where("source = 'forged'").count() == 0
    assert cells_after.agg(F.sum("c")).collect()[0][0] == cells_sum_before


def test_stream_pipeline_reader_survives_commit_log_retention(spark, sf_dir):
    """The checkpoint commits/ dir is a RETAINED WINDOW
    (minBatchesToRetain purges older entries after commit), not a complete
    ledger — the first 10-minute pipeline soak proved a listing-based
    reader silently drops the earliest batches, which hold nearly all
    first-seen dedup output. Simulate the purge by deleting the earliest
    commit entries: the reader must still surface every batch at or below
    the retained maximum."""
    import os

    from quatrain_mapreduce_spark.staging import stage_doc_slices
    from quatrain_mapreduce_spark.streaming.pipeline import (
        read_training_stream_result, run_training_stream,
    )

    d = stage_doc_slices(spark, sf_dir)
    out_root = tempfile.mkdtemp(prefix="qms_test_stream_tdp_retain_")
    run_training_stream(spark, d, out_root)
    kept_before, _, commits = read_training_stream_result(spark, out_root)
    n_before = kept_before.count()
    assert n_before > 0

    cdir = os.path.join(out_root, "ckpt", "commits")
    for i in sorted(commits)[:-1]:  # purge all but the latest, worst case
        p = os.path.join(cdir, str(i))
        if os.path.exists(p):
            os.unlink(p)

    kept_after, _, commits_after = read_training_stream_result(spark, out_root)
    assert commits_after == commits, "purged entries must be reconstructed"
    assert kept_after.count() == n_before, (
        "reader dropped pre-retention batches after commit-log purge"
    )


def test_pipeline_file_scheme_roundtrip(spark, sf_dir):
    """The exactly-once reader's listings are scheme-dispatched through the
    Hadoop FS API (r12 verdict directive #2 — the last driver-local-
    filesystem dependency removed), so an explicit-scheme out_root must
    behave identically to a bare local path. file:// is the scheme this
    container can exercise; hdfs:// / s3a:// take the same code path
    (Path.getFileSystem on the session hadoopConfiguration), matching the
    reference's DFS-native sink protocol (QL/exec/FileSinkOperator.java:39)."""
    import os

    from quatrain_mapreduce_spark.staging import stage_doc_slices
    from quatrain_mapreduce_spark.streaming.pipeline import (
        committed_batch_ids, curate_dedup_stages,
        read_training_stream_result, run_training_stream,
    )

    d = stage_doc_slices(spark, sf_dir)
    local_root = tempfile.mkdtemp(prefix="qms_test_stream_tdp_fsuri_")
    out_root = "file://" + local_root
    run_training_stream(spark, d, out_root)
    kept, cells, commits = read_training_stream_result(spark, out_root)
    assert len(commits) >= 4, "4-slice source must commit >=4 micro-batches"
    # URI-form and bare-path listings agree (same FS resolved either way)
    assert committed_batch_ids(os.path.join(out_root, "ckpt"), spark) == commits
    assert committed_batch_ids(os.path.join(local_root, "ckpt"), spark) == commits
    got = sorted((r["source"], r["fp"]) for r in kept.collect())
    want = sorted(
        (r["source"], r["fp"])
        for r in curate_dedup_stages(spark.read.parquet(d), "text").collect()
    )
    assert got == want, "file://-rooted pipeline != batch gate+dedup twin"
    assert cells.count() <= 4096


def test_stream_pipeline_damage_is_loud_not_silent(spark, sf_dir):
    """External damage to committed sink state must FAIL LOUDLY (ADVICE
    r11): a deleted kept/b{i} for a committed id makes the reader raise
    (silently shrinking the corpus is the same corruption class the
    commits/-retention fix addressed), and a deleted cells predecessor
    makes the RESUMED fold raise instead of silently restarting the
    cumulative CMS monitor from one batch's delta."""
    import os
    import shutil

    import pytest

    from quatrain_mapreduce_spark.staging import stage_doc_slices
    from quatrain_mapreduce_spark.streaming.pipeline import (
        read_training_stream_result, run_training_stream,
    )

    # private copy of the staged slices — this test mutates sink state and
    # resumes, and the shared staging dir must stay pristine
    staged = stage_doc_slices(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="qms_test_stream_tdp_damage_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    parts = sorted(
        f for f in os.listdir(staged)
        if f.endswith(".parquet") and not f.startswith("_")
    )
    assert len(parts) >= 3
    for f in parts[:-1]:  # hold the last slice back for the resume leg
        shutil.copy(os.path.join(staged, f), os.path.join(src, f))
    out_root = os.path.join(work, "out")
    run_training_stream(spark, src, out_root)
    kept, _, commits = read_training_stream_result(spark, out_root)
    assert kept.count() > 0 and len(commits) >= 2

    # leg 1: delete a committed kept dir -> reader raises, names the id
    victim = os.path.join(out_root, "kept", f"b{min(commits)}")
    shutil.rmtree(victim)
    with pytest.raises(ValueError, match="committed batch dirs missing"):
        read_training_stream_result(spark, out_root)
    # restore so leg 2's damage is isolated to the cells lineage
    kept.sparkSession.read.schema(
        "doc_id bigint, source string, norm string, fp string"
    ).parquet(os.path.join(out_root, "kept", f"b{max(commits)}")) \
        .limit(0).write.parquet(victim)

    # leg 2: delete the latest cells version, then resume with a new slice
    # — the next batch's fold needs cells/v{max} as its predecessor and
    # must surface the damage as a query failure, not a reset monitor
    shutil.rmtree(os.path.join(out_root, "cells", f"v{max(commits)}"))
    shutil.copy(os.path.join(staged, parts[-1]), os.path.join(src, parts[-1]))
    with pytest.raises(Exception, match="predecessor cells version"):
        run_training_stream(spark, src, out_root)


def test_watermarked_dedup_evicts_state_and_keeps_horizon_dedup(spark):
    """The production unbounded form of the pipeline's dedup stage
    (curate_dedup_stages with ts_col+watermark -> dropDuplicatesWithinWatermark):
    a duplicate arriving INSIDE the watermark horizon is dropped, a
    re-arrival AFTER the horizon is kept again because its state row was
    evicted — the bounded-state trade an always-on ingest makes, versus
    dropDuplicates whose state grows with the corpus forever."""
    import os
    import glob
    import shutil

    from quatrain_mapreduce_spark.streaming.hop import drain_to_parquet
    from quatrain_mapreduce_spark.streaming.pipeline import curate_dedup_stages

    work = tempfile.mkdtemp(prefix="qms_test_wm_dedup_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    base = 1_700_000_000  # epoch seconds; batches are 1 hour apart
    keys = [f"k{j}" for j in range(8)]

    def doc(i, j, key, b):
        return (b * 1000 + i * 10 + j, "s0", base + b * 3600,
                f"the a of and to {key} alpha beta")

    batches = []
    # batch 0: all 8 keys, each twice (within-batch duplicate)
    batches.append([doc(i, c, k, 0) for i, k in enumerate(keys) for c in range(2)])
    # batches 1-3: filler keys (advance the watermark), plus a k0 duplicate
    # ARRIVING in batch 1 with an event time 20 min past the first sighting
    # — inside the 30-min threshold, so the drop is the documented
    # dropDuplicatesWithinWatermark guarantee (ADVICE r12: a +1h event time
    # sat in the "may or may not be deduplicated" zone)
    for b in (1, 2, 3):
        rows = [doc(i, 0, f"fill{b}x{i}", b) for i in range(4)]
        if b == 1:
            rows.append((1090, "s0", base + 1200,
                         f"the a of and to {keys[0]} alpha beta"))
        batches.append(rows)
    # batch 4: the 8 keys re-arrive 4 h after first sighting — watermark
    # (batch-3 max ts - 30 min) is far past their state expiry, so they
    # were evicted and must be KEPT again
    batches.append([doc(i, 0, k, 4) for i, k in enumerate(keys)])

    for b, rows in enumerate(batches):
        tmp = os.path.join(work, f"tmp{b}")
        spark.createDataFrame(
            rows, "doc_id bigint, source string, epoch bigint, text string"
        ).select("doc_id", "source",
                 F.timestamp_seconds("epoch").alias("ts"), "text") \
         .coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(src, f"slice{b}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_000_000 + b, 1_000_000 + b))  # mtime = replay order

    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    deduped = curate_dedup_stages(stream, "text", ts_col="ts",
                                  watermark="30 minutes")
    kept = drain_to_parquet(deduped, "qms_test_wm_dedup",
                            output_mode="append").collect()

    by_key_hour = {}
    for r in kept:
        hr = (r["ts"] - __import__("datetime").datetime(1970, 1, 1,
              tzinfo=r["ts"].tzinfo)).total_seconds()
        by_key_hour.setdefault(r["norm"].split()[5], []).append(int((hr - base) // 3600))

    # within-batch duplicates collapsed: one kept row per (key, batch)
    assert all(len(hs) == len(set(hs)) for hs in by_key_hour.values())
    # k0's in-horizon duplicate (batch 1) was dropped...
    assert sorted(by_key_hour["k0"]) == [0, 4], by_key_hour["k0"]
    # ...and every key was RE-KEPT at batch 4 after eviction
    for k in keys:
        assert sorted(by_key_hour[k]) == [0, 4], (k, by_key_hour[k])
    # fillers kept once each
    n_fill = sum(1 for key in by_key_hour if key.startswith("fill"))
    assert n_fill == 12
    assert len(kept) == 8 + 12 + 8  # 28 rows total


def test_stream_pipeline_funnel_metrics_match_batch_counts(spark, sf_dir):
    """The composed pipeline's observe() funnel (the continuous sibling of
    training_pipeline_funnel, and the streaming form of the reference's
    Monitor counters — MR/monitor/MonitorClient.java:33): summed across
    micro-batches, tdp_ingest must equal the corpus row count and tdp_gate
    the gate-surviving count (duplicates included — dedup comes after)."""
    import os

    from quatrain_mapreduce_spark.operators.curation import gopher_rules
    from quatrain_mapreduce_spark.staging import stage_doc_slices
    from quatrain_mapreduce_spark.streaming.pipeline import (
        curate_dedup_stages, start_training_stream,
    )

    d = stage_doc_slices(spark, sf_dir)
    out_root = tempfile.mkdtemp(prefix="qms_test_stream_tdp_funnel_")
    schema = spark.read.parquet(d).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(d))
    q = start_training_stream(curate_dedup_stages(stream), out_root)
    q.awaitTermination()
    sums = {"tdp_ingest": 0, "tdp_gate": 0}
    # recentProgress retains only the last numRecentProgressUpdates entries
    # (default 100) — fine for this 4-slice fixture, but summing over it
    # silently undercounts past the cap; a run with more micro-batches must
    # accumulate via a QueryListener or dedup-by-batchId as the soak's
    # `seen` set does (tools/soak_stream.py)
    assert len(q.recentProgress) < 100, "fixture outgrew the retention cap"
    for p in q.recentProgress:
        for name in sums:
            m = (p.get("observedMetrics") or {}).get(name)
            if m is not None:
                sums[name] += m["rows"]
    batch = spark.read.parquet(d)
    assert sums["tdp_ingest"] == batch.count()
    assert sums["tdp_gate"] == gopher_rules(batch, "text").where("passes = 1").count()
    assert sums["tdp_gate"] <= sums["tdp_ingest"]
