"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Engine extension. Image/audio/video travel as BinaryType columns with a
metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so heavy per-item work is vectorized and partition-local.

``decode_image`` is REAL for the two uncompressed formats a pure-NumPy
parser can own (PPM P6 and 24-bit BI_RGB BMP, r10 — no media libs needed);
PIL is tried first when importable (the real-cluster hook for JPEG/PNG/
WebP). Compressed formats without PIL raise ValueError. The synthetic
feature/resize/frame helpers keep their deterministic stand-ins for
payloads that aren't images at all (md5-derived bench fixtures)."""

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
    """Decode an image payload to an (H, W, 3) uint8 RGB ndarray.

    Resolution order: PIL when importable (real-cluster hook — JPEG/PNG/
    WebP/...), else the pure-NumPy parsers below for PPM P6 and 24-bit
    uncompressed BMP. Anything else raises ValueError naming the format.
    """
    try:
        from PIL import Image  # type: ignore[import-not-found]
    except ImportError:
        Image = None
    if Image is not None:
        # PIL decodes everything it can; normalize its failure (an
        # OSError/UnidentifiedImageError) to the documented ValueError so
        # callers have ONE exception contract with or without PIL. The
        # import is the only thing the ImportError guard covers — a PIL
        # plugin failure must not silently fall through to the NumPy
        # parsers and surface as a misleading unsupported-format error.
        import io

        import numpy as np

        try:
            return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
        except Exception as exc:
            raise ValueError(
                f"image payload failed PIL decode (magic {payload[:2]!r}): {exc}"
            ) from exc
    if payload[:2] == b"P6":
        return _decode_ppm_p6(payload)
    if payload[:2] == b"BM":
        return _decode_bmp24(payload)
    raise ValueError(
        f"unsupported image format (magic {payload[:2]!r}); without PIL only "
        "PPM P6 and 24-bit BI_RGB BMP decode here"
    )


def _decode_ppm_p6(payload: bytes):
    """Binary PPM (netpbm P6): ASCII header 'P6 <w> <h> <maxval>' with
    whitespace/comment separators, then w*h*3 raw RGB bytes."""
    import numpy as np

    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":  # comment runs to end of line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raster
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"PPM maxval {maxval} unsupported (8-bit only)")
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3).copy()


def _decode_bmp24(payload: bytes):
    """24-bit uncompressed (BI_RGB) BMP: little-endian headers, BGR pixel
    order, rows padded to 4 bytes and stored BOTTOM-UP (positive height)."""
    import struct

    import numpy as np

    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"BMP bpp={bpp} compression={compression} unsupported (24-bit BI_RGB only)")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # each row padded to a 4-byte boundary
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=data_off)
    img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        img = img[::-1]  # bottom-up storage -> logical top-down
    return img[:, :, ::-1].copy()  # BGR -> RGB


def encode_ppm_p6(img) -> bytes:
    """Inverse of _decode_ppm_p6 (fixture/test encoder)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype("uint8").tobytes()


def encode_bmp24(img) -> bytes:
    """Inverse of _decode_bmp24: bottom-up, BGR, 4-byte row padding."""
    import struct

    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    raster = np.zeros((h, stride), dtype=np.uint8)
    raster[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    body = raster.tobytes()
    file_hdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info_hdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return file_hdr + info_hdr + body


def _fake_feature(payload: bytes) -> float:
    """Deterministic stand-in for decode→feature-extract: mean byte value."""
    return float(sum(payload)) / len(payload) if payload else 0.0


def _ship_module_by_value() -> None:
    """Closures below call module-level decoders (ONE copy of the parsing
    logic, shared with the pytest fixtures). cloudpickle serializes
    importable-module functions BY REFERENCE, which breaks on workers that
    don't have this repo on their path (the foreign-cwd failure mode the
    self-contained closures elsewhere in this file guard against) — so
    register THIS module for by-value pickling with Spark's vendored
    cloudpickle before any of these closures are serialized."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])


ENCODED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("payload", BinaryType()),
])

DECODE_STATS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("pix_sum", LongType()),
    StructField("first_px", LongType()),
])


def encode_fixture_images(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic REAL image fixtures: per id, a (4 + id%5) x (3 + id%4)
    RGB image whose flattened pixel bytes follow the ramp (7*id + i) % 256,
    serialized as PPM P6 for even ids and 24-bit BMP for odd ids. The ramp
    gives every image a closed-form pixel sum a SQL oracle can compute, so
    the decode round trip is value-checked end to end."""
    _ship_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, types, payloads = [], [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 4 + i % 5, 3 + i % 4
                img = ((7 * i + np.arange(w * h * 3)) % 256).astype(np.uint8).reshape(h, w, 3)
                if i % 2 == 0:
                    types.append("image/ppm")
                    payloads.append(encode_ppm_p6(img))
                else:
                    types.append("image/bmp")
                    payloads.append(encode_bmp24(img))
                ids.append(i)
            yield pd.DataFrame({"doc_id": ids, "media_type": types, "payload": payloads})

    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(run, schema=ENCODED_SCHEMA)


def decode_image_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode (decode_image: PIL if present, else the
    pure-NumPy PPM/BMP parsers) emitting integer stats — dimensions, total
    pixel sum, and the R channel of pixel (0,0). first_px is the
    orientation/channel-order canary: BMP stores rows bottom-up in BGR, so
    a decoder that skips the flip or the channel swap returns the wrong
    byte there while the order-invariant sum still matches."""
    _ship_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, sums, firsts = [], [], [], []
            for payload in pdf["payload"]:
                img = decode_image(bytes(payload))
                hs.append(img.shape[0])
                ws.append(img.shape[1])
                sums.append(int(img.astype("int64").sum()))
                firsts.append(int(img[0, 0, 0]))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "media_type": pdf["media_type"],
                "width": ws, "height": hs, "pix_sum": sums, "first_px": firsts,
            })

    return media.mapInPandas(run, schema=DECODE_STATS_SCHEMA)


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
