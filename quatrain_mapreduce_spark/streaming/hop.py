"""HOP's streaming & online-aggregation semantics on Structured Streaming.

The reference's distinctive layer (SURVEY.md §2.8):

- continuous jobs with tumbling wall-clock windows
  (``mapred.reduce.window`` — ReduceTask.java:565-629: every N ms run reduce
  over the window's input, then free state) -> windowed groupBy +
  ``update`` output mode; processing-time trigger.
- CQ-style sliding averages (examples/CQ.java:365-398) -> sliding
  event-time window + watermark (a documented superset: the reference has
  no event time / late-data story at all).
- online aggregation snapshots (``mapred.snapshot.frequency`` —
  ReduceTask.java:631-669: full reduce over data-so-far at each progress
  quantum, emitting snapshot-<progress> outputs) -> a bounded file stream
  consumed incrementally; each micro-batch re-aggregates data-so-far and
  writes a snapshot tagged with the ingest fraction. Divergence pinned in
  SURVEY §7: reference progress is scheduler-based, ours is
  ingest-fraction-based; both converge to the exact answer.
- inter-job pipelining (JobClient.submitJobs / PipelineMapTask.java:52) —
  in Spark a multi-stage query is ONE plan; nothing to build.

All builders take/return DataFrames so batch and streaming share the same
transformation code (the point of Structured Streaming).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _stage_stream_dir(sf_dir: str, table: str = "events") -> str:
    """FileStreamSource requires a *directory* source whose top level holds
    the data FILES. The driver testdata table is a single flat parquet file
    (symlinked as-is); a Spark-written table (e.g. the synthetic sf1 from
    tools/make_sf1.py) is a DIRECTORY of part files — symlinking the
    directory stages zero listable files, the stream fires zero
    micro-batches, and a complete-mode drain has no snapshot to read
    (r9 sf1-survival finding). So a directory source gets each part file
    symlinked individually, which also replays as one micro-batch per part
    under maxFilesPerTrigger=1 — the production landing-directory shape.
    Idempotent per (sf_dir, table)."""
    import glob
    import os

    from quatrain_mapreduce_spark.staging import stage_dir

    # stage_dir keys on a CONTENT fingerprint of sf_dir, not just the path:
    # a regenerated source (tools/make_sf1.py overwrite) gets a fresh
    # staging dir instead of a dir of dangling symlinks from the previous
    # data generation (the exact invalidation bug staging.py documents).
    src = os.path.join(sf_dir, f"{table}.parquet")
    # tag bumped with the structure-preserving layout change: an old
    # flattened staged dir would otherwise get nested links ADDED beside
    # its flat ones (stage_dir is idempotent per (sf_dir, tag,
    # fingerprint)) and every file would stream twice
    d = stage_dir(sf_dir, f"streamsrc2-{table}")
    os.makedirs(d, exist_ok=True)
    staged = 0
    if os.path.isdir(os.path.realpath(src)):
        # recursive: a partitionBy-written or otherwise nested table keeps
        # its data files in subdirectories — a top-level-only glob stages
        # ZERO files and silently reproduces the zero-micro-batch bug this
        # function exists to fix (ADVICE r9). Links PRESERVE the relative
        # directory structure: hive-style `day=1/` components carry the
        # partition column's VALUES, and flattening them into file names
        # makes the stream fill that column with NULL for every row while
        # the batch twin reads it correctly (leaf files don't contain
        # partition columns). Sorted full paths keep FileStreamSource's
        # oldest-first ordering deterministic either way.
        for p in sorted(glob.glob(os.path.join(src, "**", "*.parquet"),
                                  recursive=True)):
            link = os.path.join(d, os.path.relpath(p, src))
            os.makedirs(os.path.dirname(link), exist_ok=True)
            if not os.path.lexists(link):  # lexists: never follow a dangling link
                os.symlink(p, link)
            staged += 1
    else:
        link = os.path.join(d, f"{table}.parquet")
        if not os.path.lexists(link):
            os.symlink(src, link)
        staged = 1
    if staged == 0:
        raise FileNotFoundError(
            f"stream staging found no *.parquet data files under {src!r} — "
            "an empty staged dir would fire zero micro-batches silently"
        )
    return d


def read_events_stream(spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """Replay the events table as a file stream (the batch stand-in for an
    unbounded source; swap for kafka/rate in production)."""
    # runtime-set so the nanos read works on externally-built sessions too
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(_stage_stream_dir(sf_dir, "events"))
    )
    from quatrain_mapreduce_spark.catalog import normalize_event_ts

    return normalize_event_ts(stream)


def clock_stream(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    """ClockInputFormat / RealTimeRecordReader: infinite (sequence, now) ticks
    (monitor/ClockInputFormat.java:12) — the built-in rate source."""
    return (
        spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
        .select(F.col("value").alias("sequence"), F.col("timestamp").alias("now"))
    )


def tumbling_window_agg(
    events: DataFrame, ts_col: str, keys: list[str], aggs: list[Column],
    window_duration: str = "5 minutes", watermark: str | None = "10 minutes",
) -> DataFrame:
    """HOP continuous job: periodic full-reduce over a tumbling window.

    The reference windows on reducer wall-clock and discards state each
    firing; the event-time equivalent is window() + update mode, with a
    watermark bounding state (superset: the reference drops nothing late
    because it has no event time)."""
    if watermark:
        events = events.withWatermark(ts_col, watermark)
    return events.groupBy(F.window(ts_col, window_duration).alias("win"), *[F.col(k) for k in keys]).agg(*aggs)


def sliding_window_agg(
    events: DataFrame, ts_col: str, keys: list[str], aggs: list[Column],
    window_duration: str = "10 minutes", slide: str = "5 minutes",
    watermark: str | None = "20 minutes",
) -> DataFrame:
    """CQ-shape sliding aggregate (last-N-seconds per key, refreshed every
    slide — CQ.java hostAvg)."""
    if watermark:
        events = events.withWatermark(ts_col, watermark)
    return events.groupBy(
        F.window(ts_col, window_duration, slide).alias("win"), *[F.col(k) for k in keys]
    ).agg(*aggs)


def drain_to_parquet(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
) -> DataFrame:
    """Drain a bounded stream with availableNow through a FILE sink and read
    the result back. This is the scale-shaped harness drain: a memory sink
    buffers every result row on the driver, while a parquet sink lands them
    on the (distributed) filesystem exactly as a production job would — the
    acceptance path and the 100 TB path are the same code.

    ``append`` mode uses the native parquet sink (exactly-once via the sink
    commit log). ``complete`` mode — unwatermarked aggregates, which the
    file sink rejects by design — goes through foreachBatch overwriting a
    snapshot dir, so the last micro-batch's full result is the answer: the
    same snapshot-file pattern as OnlineAggregator (HOP's
    snapshot-<progress> analogue), with no driver-side accumulation.
    """
    import os
    import tempfile

    out = tempfile.mkdtemp(prefix=f"qms_drain_{query_name}_")
    ckpt = tempfile.mkdtemp(prefix=f"qms_drain_ckpt_{query_name}_")
    spark = stream_df.sparkSession
    if output_mode == "append":
        q = (
            stream_df.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return spark.read.schema(stream_df.schema).parquet(out)
    snap = os.path.join(out, "snapshot")

    def write_snapshot(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(snap)

    q = (
        stream_df.writeStream.foreachBatch(write_snapshot)
        .option("checkpointLocation", ckpt)
        .outputMode(output_mode).trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return spark.read.schema(stream_df.schema).parquet(snap)


def run_available_now(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Drain a bounded complete-mode stream with availableNow; return the
    final result. Deterministic harness for tests/oracle checks — file-sink
    backed (drain_to_parquet), never a driver-buffering memory sink."""
    return drain_to_parquet(stream_df, query_name, output_mode="complete")


def monitor_job(spark: SparkSession, rows_per_second: int = 10, window: str = "2 seconds"):
    """Monitor framework demo (MR/monitor/MonitorClient.java:33,
    SystemMeasurement + ClockInputFormat): a continuous job over the clock
    source computing per-window measurement aggregates — returns the
    (unstarted) windowed DataFrame; callers attach their sink and trigger.

    The reference polls /proc per tick; here the 'measurement' is the tick
    itself (sequence number), keeping the demo hermetic. Swap the select for
    a real probe UDF on a live cluster.
    """
    ticks = clock_stream(spark, rows_per_second)
    return ticks.groupBy(F.window("now", window).alias("win")).agg(
        F.count("*").alias("n_ticks"),
        F.min("sequence").alias("first_seq"),
        F.max("sequence").alias("last_seq"),
    )


def sessionize(events: DataFrame, user_col: str, ts_col: str, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization (batch form): per user, a new session starts
    when the gap since the previous event STRICTLY exceeds ``gap_minutes``
    (an exact-gap event merges — matching ``session_window``, which extends
    a session to last+gap inclusive).

    Declarative two-window form (lag → boundary flag → running sum), fully
    shuffle-partitioned by user — the batch twin of the stateful streaming
    form (``sessionize_stream``). Superset of the reference: HOP's CQ keeps
    ad-hoc reducer state (EX/CQ.java:365-398); session windows are the
    modern shape of that pattern.

    Emits one row per session: (user, session_id, n_events,
    session_start_us, session_dur_us) — exact integer epoch microseconds
    (Spark ``unix_micros`` ↔ DuckDB ``epoch_us``), so results hash
    identically across engines with no float-rounding ties.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    ep = F.unix_micros(F.col(ts_col))
    gap = ep - F.lag(ep).over(w)
    # Boundary rule is STRICTLY > gap: Spark's session_window MERGES an event
    # arriving exactly gap after its predecessor (verified empirically — the
    # session extends to last+gap inclusive; see
    # tests/test_streaming.py::test_sessionize_exact_gap_boundary). The
    # lag/cumsum form must use the same strict rule or the two
    # implementations disagree on exact-gap pairs.
    flagged = events.withColumn(
        "_new",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)).otherwise(F.lit(0)),
    )
    sessions = flagged.withColumn("session_id", F.sum("_new").over(w))
    return sessions.groupBy(user_col, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ep).alias("session_start_us"),
        (F.max(ep) - F.min(ep)).alias("session_dur_us"),
    )


def sessionize_stream(events: DataFrame, user_col: str, ts_col: str, gap_minutes: int = 30) -> DataFrame:
    """Streaming sessionization via session_window — Spark's native
    gap-window (state-store backed; the applyInPandasWithState escape hatch
    is only needed for logic session_window can't express).

    Works on both batch and streaming frames (same expression — the point).
    """
    return events.groupBy(
        F.col(user_col), F.session_window(ts_col, f"{gap_minutes} minutes").alias("sw")
    ).agg(F.count("*").alias("n_events"))


class OnlineAggregator:
    """Online aggregation with snapshots over a bounded input.

    Consumes a bounded file stream micro-batch by micro-batch, emitting a
    parquet snapshot of the aggregate-so-far after each batch
    (``snapshot-<progress>`` naming — HOP's snapshot-<progress>-<partition>
    analogue, ReduceTask.java:631-669). Early results approximate,
    converging to exact at progress 1.0.

    Two execution modes:

    - ``run_incremental()`` (the scale path): the aggregate runs as ONE
      stateful Structured Streaming query in ``complete`` output mode —
      Spark's state store carries the partial aggregate across batches, so
      per-batch work is O(batch + groups), and ``foreachBatch`` receives the
      full updated result to write as the snapshot. This is the true
      streaming analogue of HOP's reducer-held snapshot state. Requires
      ``agg_fn`` to be expressible on a streaming frame (groupBy/agg,
      optional global sort+limit — complete mode allows both).

    - ``run()`` (the general path): each batch is appended to a parquet
      staging dir and ``agg_fn`` re-aggregates data-so-far from files.
      O(data-so-far) per batch — quadratic total work over the run — but
      imposes zero constraints on ``agg_fn``. Use for transformations the
      streaming engine rejects.

    Scale design (both modes): nothing accumulates on the driver;
    ``self.snapshots`` holds only (progress, path) metadata. Checkpoint
    location is a fresh mkdtemp per run — a reused checkpoint would mark
    all files processed and silently produce zero batches.
    """

    def __init__(
        self,
        spark: SparkSession,
        source_path: str,
        schema,
        agg_fn: Callable[[DataFrame], DataFrame],
        total_rows: int,
        max_files_per_trigger: int = 1,
        work_dir: str | None = None,
    ):
        self.spark = spark
        self.source_path = source_path
        self.schema = schema
        self.agg_fn = agg_fn
        self.total_rows = total_rows
        self.max_files_per_trigger = max_files_per_trigger
        self.work_dir = work_dir
        self.snapshots: list[tuple[float, str]] = []

    def snapshot_df(self, i: int = -1) -> DataFrame:
        """Read back a written snapshot (default: the latest)."""
        return self.spark.read.parquet(self.snapshots[i][1])

    def run(self, on_snapshot: Callable[[float, DataFrame], None] | None = None) -> DataFrame:
        import os
        import shutil
        import tempfile

        work = self.work_dir or tempfile.mkdtemp(prefix="qms_online_")
        staging = os.path.join(work, "staging")
        checkpoint = os.path.join(work, "checkpoint")
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(checkpoint, ignore_errors=True)
        # a second run() on the same instance must not append after the
        # first run's entries — stale snapshot metadata breaks the
        # monotone-convergence contract snapshot_df consumers rely on
        self.snapshots.clear()

        stream = (
            self.spark.readStream.schema(self.schema)
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .parquet(self.source_path)
        )
        seen = {"rows": 0}
        agg_fn, total, spark = self.agg_fn, self.total_rows, self.spark

        def per_batch(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.write.mode("append").parquet(staging)
            # O(batch) progress accounting — a full re-count of the
            # staging dir per micro-batch added a second O(data-so-far)
            # pass on top of the re-aggregation cost the docstring
            # already owns
            seen["rows"] += batch_df.count()
            progress = min(seen["rows"] / total, 1.0) if total else 1.0
            # keyed by batch id, not rounded progress: two batches with
            # close cumulative progress collided on one snapshot path and
            # the overwrite silently replaced the earlier snapshot while
            # self.snapshots kept both entries pointing at it
            snap_path = os.path.join(work, f"snapshot-b{batch_id:05d}")
            snap = agg_fn(spark.read.parquet(staging))
            snap.write.mode("overwrite").parquet(snap_path)
            self.snapshots.append((progress, snap_path))
            if on_snapshot is not None:
                on_snapshot(progress, spark.read.parquet(snap_path))

        q = (
            stream.writeStream.foreachBatch(per_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        if not self.snapshots:
            return None
        return agg_fn(self.spark.read.parquet(staging))

    def run_incremental(self, on_snapshot: Callable[[float, DataFrame], None] | None = None) -> DataFrame:
        """Stateful single-query mode: state store carries the aggregate
        across batches (per-batch cost O(batch + groups), not O(data-so-far)).
        Returns the final snapshot as a DataFrame (== the exact batch answer
        once progress reaches 1.0)."""
        import os
        import shutil
        import tempfile

        work = self.work_dir or tempfile.mkdtemp(prefix="qms_online_inc_")
        checkpoint = os.path.join(work, "checkpoint")
        shutil.rmtree(checkpoint, ignore_errors=True)

        stream = (
            self.spark.readStream.schema(self.schema)
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .parquet(self.source_path)
        )
        agg = self.agg_fn(stream)
        total, spark = self.total_rows, self.spark
        raw: list[tuple[int, str]] = []  # (batch_id, snapshot path)

        def per_batch(result_df: DataFrame, batch_id: int) -> None:
            # complete mode: result_df IS the full aggregate-so-far; input
            # size this batch comes from the query progress bookkeeping
            # (no extra pass over the data)
            # (no persist: persisting a complete-mode batch frame with a
            # post-agg sort+limit trips an internal attribute-rebind bug in
            # Spark 4.1; the frame is groups-sized, the plain write is cheap)
            snap_path = os.path.join(work, f"snapshot-b{batch_id:05d}")
            result_df.write.mode("overwrite").parquet(snap_path)
            raw.append((batch_id, snap_path))

        # recentProgress retains only ~spark.sql.streaming.numRecentProgressUpdates
        # (default 100) entries, so a >100-micro-batch run would undercount
        # early batches and stamp the final snapshot with progress < 1.0.
        # A listener sees EVERY progress event regardless of run length; the
        # recentProgress tail is merged in afterwards because listener
        # delivery is async and may lag the last batch at termination.
        from pyspark.sql.streaming import StreamingQueryListener

        class _RowsPerBatch(StreamingQueryListener):
            def __init__(self) -> None:
                self.rows: dict[tuple[str, int], int] = {}

            def onQueryStarted(self, event) -> None:
                pass

            def onQueryProgress(self, event) -> None:
                p = event.progress
                self.rows[(str(p.id), p.batchId)] = p.numInputRows

            def onQueryIdle(self, event) -> None:
                pass

            def onQueryTerminated(self, event) -> None:
                pass

        listener = _RowsPerBatch()
        self.spark.streams.addListener(listener)
        try:
            q = (
                agg.writeStream.foreachBatch(per_batch)
                .outputMode("complete")
                .option("checkpointLocation", checkpoint)
                .trigger(availableNow=True).start()
            )
            q.awaitTermination()
            # stamp real progress fractions from the query's input
            # bookkeeping, keyed by batchId so a zero-input batch can't shift
            # the pairing or drop the final snapshot
            rows_by_batch = {
                b: n for (qid, b), n in listener.rows.items() if qid == str(q.id)
            }
            rows_by_batch.update(
                {p["batchId"]: p["numInputRows"] for p in q.recentProgress}
            )
        finally:
            self.spark.streams.removeListener(listener)
        cum = 0
        fixed: list[tuple[float, str]] = []
        for batch_id, path in raw:
            cum += rows_by_batch.get(batch_id, 0)
            progress = min(cum / total, 1.0) if total else 1.0
            fixed.append((progress, path))
        self.snapshots[:] = fixed
        if on_snapshot is not None:
            for progress, path in self.snapshots:
                on_snapshot(progress, spark.read.parquet(path))
        if not self.snapshots:
            return None
        return self.spark.read.parquet(self.snapshots[-1][1])


def accumulate_counts_stream(
    spark,
    sf_dir: str,
    table: str,
    src_tag: str,
    work_tag: str,
    count_fn,
    key_cols: tuple,
    sum_cols: tuple,
    n_files: int = 4,
):
    """Generic streaming count accumulator — the shared scaffold behind
    stream_drift_monitor and stream_auc_monitor (previously ~55 duplicated
    lines each, review finding): stage ``table`` as an ``n_files`` parquet
    source, replay it file-by-file (maxFilesPerTrigger=1, availableNow),
    and foreachBatch-merge each batch's ``count_fn(batch)`` into a
    versioned running-counts table by ADDITION — valid exactly when the
    state is additively mergeable (per-key counts). Returns the final
    accumulated counts DataFrame (key_cols + sum_cols, sums as bigint).

    Retry idempotence: a retried batch id must not see its OWN previous
    (possibly partial) version as merge input, or the batch double-counts
    — the previous-version lookup therefore takes the latest version
    STRICTLY BELOW the current batch id, not the latest overall.
    """
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from quatrain_mapreduce_spark.catalog import load_table
    from quatrain_mapreduce_spark.staging import stage_dir

    src_d = stage_dir(sf_dir, src_tag)
    if not os.path.exists(os.path.join(src_d, "_STAGED")):
        load_table(spark, sf_dir, table).repartition(n_files) \
            .write.mode("overwrite").parquet(src_d)
        open(os.path.join(src_d, "_STAGED"), "w").close()

    work = stage_dir(sf_dir, work_tag)
    done = os.path.join(work, "_DONE")
    if not os.path.exists(done):
        if os.path.exists(work):
            shutil.rmtree(work)
        os.makedirs(work)
        ckpt = os.path.join(work, "ckpt")
        schema = spark.read.parquet(src_d).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src_d)
        )

        def accumulate(batch, bid: int) -> None:
            counts = count_fn(batch)
            # numeric sort: lexical order puts 'v10000' before 'v9999'
            # once ids outgrow the 4-digit pad, silently dropping batch
            # 10000's counts from the running total (r13 review)
            vers = sorted(
                (v for v in glob.glob(os.path.join(work, "v*"))
                 if int(os.path.basename(v)[1:]) < bid),
                key=lambda v: int(os.path.basename(v)[1:]),
            )
            if not vers and bid > 0:
                # every batch writes a version, so a missing predecessor
                # past batch 0 means external deletion of running state —
                # fresh-starting here would silently zero the accumulated
                # counts (same loud-failure contract as the pipeline
                # fold's predecessor check, which this scaffold mirrors)
                raise RuntimeError(
                    f"no predecessor version below batch {bid} under "
                    f"{work} — accumulated counts were deleted externally"
                )
            if vers:
                prev = batch.sparkSession.read.parquet(vers[-1])
                counts = (
                    prev.unionByName(counts)
                    .groupBy(*key_cols)
                    .agg(*[F.sum(c).alias(c) for c in sum_cols])
                )
            counts.write.mode("overwrite").parquet(
                os.path.join(work, f"v{bid:04d}")
            )

        q = (
            stream.writeStream.foreachBatch(accumulate)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        open(done, "w").close()

    vers = sorted(glob.glob(os.path.join(work, "v*")),
                  key=lambda v: int(os.path.basename(v)[1:]))
    return spark.read.parquet(vers[-1]).select(
        *key_cols,
        *[F.col(c).cast("bigint").alias(c) for c in sum_cols],
    )
