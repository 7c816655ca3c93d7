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
