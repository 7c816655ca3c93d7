"""Idempotent /tmp staging for derivative fixtures and indexes.

Several queries exercise round trips (write a derivative of a testdata table,
read it back) or search staged indexes. Every such artifact lives in ONE
md5-keyed temp directory per (sf_dir, tag), built on first use and reused
after — this module is the single copy of that pattern.
"""

from __future__ import annotations

import glob
import hashlib
import os
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _source_fingerprint(sf_dir: str) -> str:
    """Cheap content-version stamp of a testdata dir: (name, size, mtime) of
    every parquet file. Staged artifacts derive from these tables, so keying
    on the fingerprint auto-invalidates every staged dir when the source data
    is regenerated between rounds — a path-only key would silently reuse
    artifacts built from the previous data generation."""
    parts = []
    try:
        for name in sorted(os.listdir(sf_dir)):
            if name.endswith(".parquet"):
                st = os.stat(os.path.join(sf_dir, name))
                parts.append(f"{name}:{st.st_size}:{int(st.st_mtime)}")
    except OSError:
        pass
    return ";".join(parts)


def stage_dir(sf_dir: str, tag: str) -> str:
    """The canonical staging path for (sf_dir, tag, data-version) — not
    created."""
    raw = f"{os.path.realpath(sf_dir)}:{tag}:{_source_fingerprint(sf_dir)}"
    key = hashlib.md5(raw.encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"qms_{tag}_{key}")


def stage_event_slices(
    spark: SparkSession,
    sf_dir: str,
    n_files: int,
    columns: list[str] | None = None,
    ordered_mtime: bool = False,
    tag: str = "eventslices",
) -> str:
    """Stage the events table as ``n_files`` event_id-range parquet slices.

    ``ordered_mtime`` additionally sets strictly increasing mtimes on the
    slice files so a maxFilesPerTrigger=1 file stream replays them in
    event_id order (FileStreamSource processes oldest-first; lexicographic
    part names agree with the ranges as a tie-break) — the deterministic
    arrival order stateful streaming oracles need. Idempotent per
    (sf_dir, n_files, columns, ordered_mtime).
    """
    from quatrain_mapreduce_spark.catalog import load_table

    full_tag = f"{tag}{n_files}{'o' if ordered_mtime else ''}{'-'.join(columns or [])}"
    d = stage_dir(sf_dir, full_tag)
    marker = os.path.join(d, "_STAGED")
    if not os.path.exists(marker):
        ev = load_table(spark, sf_dir, "events")
        if columns:
            ev = ev.select(*columns)
        ev.repartitionByRange(n_files, "event_id").write.mode("overwrite").parquet(d)
        if ordered_mtime:
            base = time.time() - 3600
            for i, f in enumerate(sorted(glob.glob(os.path.join(d, "part-*.parquet")))):
                os.utime(f, (base + i * 10, base + i * 10))
        open(marker, "w").close()
    return d


def stage_doc_slices(spark: SparkSession, sf_dir: str, n_files: int = 4) -> str:
    """Stage the documents table as ``n_files`` parquet slices for file
    streams (one micro-batch per slice via maxFilesPerTrigger=1). The
    single copy of the pattern shared by stream_dedup / stream_curation /
    stream_heavy_hitters; idempotent per (sf_dir, data fingerprint)."""
    from quatrain_mapreduce_spark.catalog import load_table

    d = stage_dir(sf_dir, f"docslices{n_files}")
    marker = os.path.join(d, "_STAGED")
    if not os.path.exists(marker):
        load_table(spark, sf_dir, "documents").repartition(n_files) \
            .write.mode("overwrite").parquet(d)
        open(marker, "w").close()
    return d


def stage_late_slices(spark: SparkSession, sf_dir: str, recent_hours: int = 6) -> str:
    """Stage events as THREE mtime-ordered slices engineering real late-data
    drops under an append-mode watermark (delay D, D << recent_hours):

    - slice 0: even event_ids (spans the whole range — processing it
      advances the watermark to maxE - D, maxE = max even event time);
    - slice 1: odd ids within ``recent_hours`` of maxE (its batch END is
      where windows <= maxE - D get evicted+emitted; these rows merge into
      still-open windows first);
    - slice 2: the remaining old odd ids — they arrive AFTER their windows
      were evicted, so the stateful operator genuinely DROPS them
      (numRowsDroppedByWatermark > 0).

    Empirically pinned semantics (Spark 4.1): a batch merges its input
    before evicting with its own watermark, so drops only happen for
    windows evicted in a PRIOR batch — hence three slices, not two. Every
    rule (slice membership, drop set, final emitted-window set) is a pure
    function of the data, so the whole run is SQL-oracle-checkable.
    """
    import shutil

    d = stage_dir(sf_dir, f"lateslices{recent_hours}")
    marker = os.path.join(d, "_STAGED")
    if not os.path.exists(marker):
        from quatrain_mapreduce_spark.catalog import load_table

        os.makedirs(d, exist_ok=True)
        ev = load_table(spark, sf_dir, "events")
        even = F.col("event_id") % 2 == 0
        max_even_us = ev.where(even).agg(F.max(F.unix_micros("ts"))).first()[0]
        recent_cut = max_even_us - recent_hours * 3_600_000_000
        ep = F.unix_micros("ts")
        slices = (
            ("even", even),
            ("oddrecent", (~even) & (ep >= F.lit(recent_cut))),
            ("oddold", (~even) & (ep < F.lit(recent_cut))),
        )
        base = time.time() - 3600
        for i, (name, cond) in enumerate(slices):
            tmp = os.path.join(d, f"_build_{name}")
            ev.where(cond).coalesce(1).write.mode("overwrite").parquet(tmp)
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            dst = os.path.join(d, f"slice-{i:03d}.parquet")
            shutil.move(part, dst)
            shutil.rmtree(tmp)
            os.utime(dst, (base + i * 10, base + i * 10))
        open(marker, "w").close()
    return d
