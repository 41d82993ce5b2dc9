"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, batching, partition sizing, UDF signatures)
is real and tested; the actual media decoding is STUBBED behind
``NotImplementedError`` / a deterministic fake because no image/audio
libraries ship in this container.  Swapping ``_decode_image_stub`` for a
PIL/libvips call is the only change needed in production.

Design notes for 100 TB of media:
- media rows are wide (MBs); ``mapInPandas`` with a small
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` keeps Arrow batches
  bounded — callers should also set ``spark.sql.files.maxPartitionBytes``
  down so a partition holds O(100) blobs, not O(10k);
- metadata (width/height/codec/duration) travels as plain columns so filters
  prune *before* bytes are decoded (predicate pushdown on the parquet scan
  never touches the binary column when the filter is metadata-only);
- derived features (thumbnails, frames, fingerprints) are emitted as new
  binary/array columns, one row per item or per frame (explode).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("payload", BinaryType(), True),
    ]
)


def synth_media(spark, n: int, kind: str = "image", payload_bytes: int = 4096) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) for testing
    the plumbing at any scale."""
    df = spark.range(n)
    payload = F.encode(
        F.rpad(F.concat(F.lit("blob:"), F.col("id").cast("string"), F.lit(":")),
               payload_bytes, "x"),
        "utf-8",
    )
    return df.select(
        F.concat(F.lit(f"{kind}-"), F.col("id").cast("string")).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lit(f"{kind}/fake").alias("mime"),
        (F.pmod(F.col("id"), F.lit(1920)) + 1).cast("int").alias("width"),
        (F.pmod(F.col("id"), F.lit(1080)) + 1).cast("int").alias("height"),
        ((F.pmod(F.col("id"), F.lit(60)) + 1) * 1000).cast("int").alias("duration_ms"),
        payload.alias("payload"),
    )


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB — production swaps in a real decoder (PIL / libvips).

    The deterministic fake derives an 8x8 grayscale 'image' from the payload
    hash so downstream feature code has real array shapes to work with.
    """
    if payload is None:
        raise NotImplementedError(
            "real image decoding is not available in this environment"
        )
    h = hashlib.md5(bytes(payload)).digest() * 4  # 64 bytes
    return np.frombuffer(h, dtype=np.uint8).reshape(8, 8).astype(np.float32)


def image_features(df: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction: decode (stub) -> mean/std/phash-style
    fingerprint.  Output: media_id, width, height, mean, std, feature(64).

    mean/std are computed from exact integer pixel sums with a fixed float64
    expression order (s/16320.0, ssq/64.0/65025.0 - mean*mean) so an
    independent engine replaying the same integer sums over the md5-derived
    stub pixels reproduces them bit-for-bit (the DuckDB driver oracle does)."""
    out_schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("mean", DoubleType()),
            StructField("std", DoubleType()),
            StructField("feature", ArrayType(FloatType())),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                img = _decode_image_stub(r.payload)
                px = img.ravel().astype(np.int64)  # 64 exact pixel ints
                s = int(px.sum())
                ssq = int((px * px).sum())
                mean = s / 16320.0  # 64 * 255
                var = ssq / 64.0 / 65025.0 - mean * mean  # 255^2
                std = float(np.sqrt(max(var, 0.0)))
                flat = img.ravel() / np.float32(255.0)
                rows.append(
                    (
                        r.media_id,
                        r.width,
                        r.height,
                        mean,
                        std,
                        [float(x) for x in flat],
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "mean", "std", "feature"]
            )

    cols = ["media_id", "width", "height", "payload"]
    return df.select(*cols).mapInPandas(extract, schema=out_schema)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one row per sampled timestamp
    (explode of the sample grid — the decode of the actual frame is the same
    stub boundary).  Output: media_id, frame_ts_ms, frame (binary stub)."""
    grid = F.sequence(
        F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
    )
    exploded = df.where(F.col("kind") == "video").select(
        "media_id", F.explode(grid).alias("frame_ts_ms"), "payload"
    )

    out_schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("frame_ts_ms", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def cut(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = [
                # STUB: a real implementation seeks the container; the fake
                # tags the payload hash with the timestamp
                hashlib.md5(bytes(p) + struct.pack("<i", int(t))).digest()
                for p, t in zip(pdf["payload"], pdf["frame_ts_ms"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_ts_ms": pdf["frame_ts_ms"].astype("int32"),
                    "frame": frames,
                }
            )

    return exploded.mapInPandas(cut, schema=out_schema)


def image_resize(
    df: DataFrame, box: int = 256, batch_size_hint: int = 256
) -> DataFrame:
    """Image resize plumbing: fit-in-box output dimensions from the metadata
    columns (integer math — no decode needed to plan storage), plus the
    resized payload from the (stub) decoder.

    Output: media_id, out_w, out_h, thumb (binary), px_sum.

    The dimension math is pure integer arithmetic so metadata-only pipelines
    (e.g. sizing a thumbnail store) never touch payload bytes: ``out_d =
    max(d * box // max(width, height), 1)``.  The stub 'resize' is 2x2 mean
    pooling of the 8x8 stub image to 4x4 — deterministic integer sums, so
    ``px_sum`` (the pooled total, = sum of all source pixels) is exactly
    replayable in SQL from the md5 byte sums.  Production swaps the stub for
    PIL/libvips ``thumbnail()`` at the same seam; the Spark-side batching,
    schema, and metadata pruning are the real, tested plumbing."""
    out_schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("out_w", IntegerType()),
            StructField("out_h", IntegerType()),
            StructField("thumb", BinaryType()),
            StructField("px_sum", IntegerType()),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                img = _decode_image_stub(r.payload).astype(np.int64)
                pooled = img.reshape(4, 2, 4, 2).sum(axis=(1, 3))  # 2x2 sums
                longest = max(int(r.width), int(r.height), 1)
                out_w = max(int(r.width) * box // longest, 1)
                out_h = max(int(r.height) * box // longest, 1)
                rows.append(
                    (
                        r.media_id,
                        out_w,
                        out_h,
                        (pooled // 4).astype(np.uint8).tobytes(),
                        int(pooled.sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "out_w", "out_h", "thumb", "px_sum"]
            )

    cols = ["media_id", "width", "height", "payload"]
    return df.select(*cols).mapInPandas(resize, schema=out_schema)


def audio_features(df: DataFrame) -> DataFrame:
    """Audio feature plumbing (stub decode -> fake 16-dim feature)."""
    out_schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("duration_ms", IntegerType()),
            StructField("feature", ArrayType(FloatType())),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                h = hashlib.md5(bytes(p)).digest()
                feats.append([b / 255.0 for b in h])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "duration_ms": pdf["duration_ms"].astype("int32"),
                    "feature": feats,
                }
            )

    return (
        df.where(F.col("kind") == "audio")
        .select("media_id", "duration_ms", "payload")
        .mapInPandas(extract, schema=out_schema)
    )
