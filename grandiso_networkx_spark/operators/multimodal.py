"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata
struct; decode/resize/frame-sample run as Arrow-batched kernels over
``mapInPandas``.  The actual codecs are NOT available in this
environment (no PIL/ffmpeg), so the decode step is a clearly-marked
deterministic fake behind ``fake_decode=True`` (default) or a
``NotImplementedError`` otherwise — the Spark-side plumbing (schema,
batch shape, partitioning, UDF signatures) is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 4
        meta = {
            "width": 32 + (i % 8) * 16 if kind != "audio" else None,
            "height": 32 + (i % 5) * 16 if kind != "audio" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": 1 + (i % 30) if kind == "video" else None,
            "codec": {"image": "png", "audio": "pcm16", "video": "h264"}[kind],
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _feature_kernel(feat_dim: int, fake_decode: bool):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError(
                    "Real media decoding requires PIL/ffmpeg, which are not "
                    "available in this environment; pass fake_decode=True."
                )
            feats = []
            for payload in pdf["payload"]:
                b = np.frombuffer(payload or b"\0", dtype=np.uint8)
                # Deterministic fake 'decode': fold bytes into feat_dim
                # bins (stands in for decode→pool; vectorized numpy).
                pad = (-len(b)) % feat_dim
                folded = np.pad(b, (0, pad)).reshape(-1, feat_dim).mean(axis=0)
                feats.append((folded / 255.0).astype(np.float32))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": [f.tolist() for f in feats]}
            )

    return kernel


def extract_features(
    media: DataFrame, feat_dim: int = 16, fake_decode: bool = True
) -> DataFrame:
    """``(media_id, feature array<float>)`` via an Arrow-batched kernel.

    Partitioning note for 100 TB: payloads dominate row size, so the
    input should be repartitioned by bytes (``maxPartitionBytes``), and
    only (media_id, payload) is shipped into the kernel — metadata
    stays JVM-side and re-joins on media_id if needed.
    """
    sel = media.select("media_id", "payload")
    return sel.mapInPandas(
        _feature_kernel(feat_dim, fake_decode),
        schema="media_id long, feature array<float>",
    )


def _resize_kernel(width: int, height: int, fake_decode: bool):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError(
                    "Real image resize requires PIL, which is not available "
                    "in this environment; pass fake_decode=True."
                )
            out = []
            n = width * height
            for payload in pdf["payload"]:
                b = np.frombuffer(payload or b"\0", dtype=np.uint8)
                # Deterministic fake 'decode→resize→encode': nearest-
                # neighbor index into the byte stream at the target size
                # (stands in for pixel resampling; vectorized numpy).
                idx = (np.arange(n) * max(len(b), 1) // n) % max(len(b), 1)
                out.append(b[idx].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    "width": np.int32(width),
                    "height": np.int32(height),
                }
            )

    return kernel


def resize_images(
    media: DataFrame, width: int = 64, height: int = 64, fake_decode: bool = True
) -> DataFrame:
    """``(media_id, payload binary, width, height)`` — images resized to
    a fixed target via an Arrow-batched kernel (codec stubbed; schema,
    batch shape and the image-only pushdown filter are real).  The
    ``kind = 'image'`` filter is applied before the Python stage, so
    non-image payload bytes never cross the Arrow boundary."""
    sel = media.where(F.col("kind") == "image").select("media_id", "payload")
    return sel.mapInPandas(
        _resize_kernel(width, height, fake_decode),
        schema="media_id long, payload binary, width int, height int",
    )


def frame_sample_plan(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Video frame-sampling *plan*: one row per sampled frame index,
    computed JVM-side from metadata (the decode itself is the stubbed
    kernel above).  Shows the explode-then-process shape a real
    pipeline uses so each frame can be decoded independently."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ).alias("frame_idx"),
        )
    )
