"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata structs, processed via Arrow-batched mapInPandas.

The Spark-side contract (schemas, partition strategy, batch shapes) is
real and tested; the actual media decode is STUBBED — the codec
libraries (Pillow/torchaudio/ffmpeg) are not in this container. Each
stub is a deterministic fake clearly marked below so the pipeline is
end-to-end testable; swap `_fake_decode_*` for a real decoder in
production.

Scale notes: binary payloads stay columnar (never hit the driver);
mapInPandas streams Arrow batches so one task holds only
``spark.sql.execution.arrow.maxRecordsPerBatch`` payloads at once.
Repartition by size class before decode so skewed payload sizes don't
straggle a task.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode_image(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB decoder — deterministic fake standing in for PIL/libjpeg.

    Produces (width, height, 8-dim feature vector) purely from the byte
    content so tests are reproducible. Replace with a real decode when
    codec libs are available.
    """
    n = len(payload)
    w = 16 + (n % 64)
    h = 16 + ((n // 64) % 64)
    feats = [float((payload[i % max(n, 1)] if n else 0) ^ i) for i in range(8)]
    return w, h, feats


def extract_image_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Decode + featurize binary image payloads via Arrow-batched
    mapInPandas (the real plumbing; fake decode, see module docstring)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                w, h, feats = _fake_decode_image(data)
                rows.append((mid, w, h, len(data), feats))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_bytes", "features"]
            )

    return df.select(id_col, payload_col).mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("mfcc", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode_audio(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB decoder — deterministic fake standing in for torchaudio /
    libsndfile. Returns (sample_rate, duration_ms, 13-dim MFCC-shaped
    vector) derived purely from the bytes."""
    n = len(payload)
    sr = 16000 if n % 2 == 0 else 44100
    duration_ms = n * 1000 // max(sr // 1000, 1) // 8
    mfcc = [float(((payload[i % max(n, 1)] if n else 0) * 31 + i) % 97) for i in range(13)]
    return sr, duration_ms, mfcc


def extract_audio_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Decode + featurize binary audio payloads via Arrow-batched
    mapInPandas (real plumbing; fake decode, see module docstring)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                sr, dur, mfcc = _fake_decode_audio(data)
                rows.append((mid, sr, dur, mfcc))
            yield pd.DataFrame(
                rows, columns=["media_id", "sample_rate", "duration_ms", "mfcc"]
            )

    return df.select(id_col, payload_col).mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Resize plumbing: binary in → binary out, one row per image, via
    mapInPandas. The transform is a STUB (truncate/pad bytes to the
    target pixel count) standing in for a real resample; the schema,
    batching, and binary round-trip are the real contract."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = target_w * target_h
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                out = (data * (target // max(len(data), 1) + 1))[:target].ljust(
                    target, b"\x00"
                )
                rows.append((mid, target_w, target_h, out))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "payload"]
            )

    return df.select(id_col, payload_col).mapInPandas(batches, RESIZED_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    every_n: int = 10,
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    index. Frame count is faked from payload length (STUB — a real
    implementation reads container metadata)."""
    n_frames = (F.length(F.col(payload_col)) % 256 + 1).alias("n_frames")
    return (
        df.select(F.col(id_col), n_frames)
        .select(
            id_col,
            "n_frames",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )
