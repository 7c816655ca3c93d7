"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Engine extension. Image/audio/video travel as BinaryType columns with a
metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so heavy per-item work is vectorized and partition-local.

The decode step is STUBBED (no image/audio libs in this environment): a
clearly-marked deterministic fake stands in, and ``decode_image`` raises
NotImplementedError. Everything Spark-side — schema, batch shape, UDF
signature, partitioning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, DoubleType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("payload", BinaryType()),
    StructField("n_bytes", LongType()),
])

FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("n_bytes", LongType()),
    StructField("feature_mean", DoubleType()),
])


def decode_image(payload: bytes):
    """Real decoder hook — requires an image library not present here."""
    raise NotImplementedError("image decoding requires PIL/opencv; wire in on a real cluster")


def _fake_feature(payload: bytes) -> float:
    """Deterministic stand-in for decode→feature-extract: mean byte value."""
    return float(sum(payload)) / len(payload) if payload else 0.0


def attach_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Synthesize a binary media column (md5-derived payload) + metadata.

    Stands in for reading real image/audio bytes; the column types and
    downstream plumbing are exactly what real payloads would use.

    NULL text coalesces to '' (md5('') is still 16 bytes) so every document
    carries a non-null 16-byte payload — the multimodal_frames oracle
    asserts n_bytes=4 per frame and depends on this invariant.
    """
    payload = F.unhex(F.md5(F.coalesce(F.col(text_col), F.lit(""))))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit("image/fake").alias("media_type"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each batch arrives as a pandas DataFrame; per-item decode
    happens partition-local with no shuffle. Swap ``_fake_feature`` for a
    real decode (resize / frame-sample / mel-spectrogram) on a cluster with
    media libs installed.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # self-contained: no references to module-level names, so cloudpickle
        # ships the function BY VALUE and workers need not import this
        # package (driver may run from any cwd / without the repo on the
        # executors' PYTHONPATH)
        def fake_feature(payload: bytes) -> float:
            return float(sum(payload)) / len(payload) if payload else 0.0

        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["n_bytes"],
                "feature_mean": [fake_feature(p) for p in pdf["payload"]],
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("payload", BinaryType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
])

FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_no", LongType()),
    StructField("frame", BinaryType()),
    StructField("n_bytes", LongType()),
])


def resize_images(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Arrow-batched image resize over binary payloads (1 row -> 1 row).

    The real decoder+resampler hook is ``decode_image`` (stubbed here);
    the stand-in emits a deterministic width*height-byte payload derived by
    cycling the source bytes, so batch shape, output schema, and
    partition-local execution are exercised for real.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # self-contained closure: shipped by value, workers never import
        # this package
        n_out = width * height
        def fake_resize(payload: bytes) -> bytes:
            if not payload:
                return bytes(n_out)
            reps = (n_out + len(payload) - 1) // len(payload)
            return (payload * reps)[:n_out]

        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "payload": [fake_resize(p) for p in pdf["payload"]],
                "width": width,
                "height": height,
            })

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling over video-like payloads (1 row -> n rows): the
    row-expanding mapInPandas shape — each input payload yields
    ``n_frames`` contiguous slices that PARTITION the payload (the last
    frame takes the remainder, so no tail byte is dropped; a real decoder
    would seek keyframes). Output stays partition-local; no shuffle until
    the caller aggregates frames.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def slices(payload: bytes):
            if not payload:
                return [b""] * n_frames
            step = max(len(payload) // n_frames, 1)
            out = [payload[i * step:(i + 1) * step] for i in range(n_frames - 1)]
            out.append(payload[(n_frames - 1) * step:])
            return out

        for pdf in batches:
            ids, frame_nos, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for j, fr in enumerate(slices(payload)):
                    ids.append(doc_id)
                    frame_nos.append(j)
                    frames.append(fr)
            yield pd.DataFrame({
                "doc_id": ids,
                "frame_no": frame_nos,
                "frame": frames,
                "n_bytes": [len(f) for f in frames],
            })

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
