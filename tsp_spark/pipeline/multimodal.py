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
