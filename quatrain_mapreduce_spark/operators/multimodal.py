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
    """
    payload = F.unhex(F.md5(F.col(text_col)))
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
