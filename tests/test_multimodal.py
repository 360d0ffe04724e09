"""Multimodal plumbing tests: binary columns through Arrow-batched
mapInPandas — schema, determinism, null-payload safety."""

from __future__ import annotations

from tsp_spark.pipeline.multimodal import (
    extract_audio_features,
    extract_image_features,
    frame_sample_plan,
    resize_images,
)


def _media_df(spark):
    rows = [
        (1, b"\x01\x02\x03\x04" * 100),
        (2, b"jpegdata-something-longer" * 7),
        (3, None),
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_image_features(spark):
    out = extract_image_features(_media_df(spark)).collect()
    by_id = {r["media_id"]: r for r in out}
    assert set(by_id) == {1, 2, 3}
    assert by_id[1]["n_bytes"] == 400
    assert len(by_id[1]["features"]) == 8
    assert by_id[3]["n_bytes"] == 0  # null payload is safe
    # determinism
    again = {r["media_id"]: r for r in extract_image_features(_media_df(spark)).collect()}
    assert again[2]["features"] == by_id[2]["features"]


def test_audio_features(spark):
    out = {r["media_id"]: r for r in extract_audio_features(_media_df(spark)).collect()}
    assert out[1]["sample_rate"] in (16000, 44100)
    assert len(out[1]["mfcc"]) == 13
    assert out[3]["duration_ms"] == 0


def test_resize(spark):
    out = {r["media_id"]: r for r in resize_images(_media_df(spark), 8, 4).collect()}
    for r in out.values():
        assert (r["width"], r["height"]) == (8, 4)
        assert len(r["payload"]) == 32


def test_frame_sample(spark):
    out = frame_sample_plan(_media_df(spark).where("payload is not null"), every_n=10)
    rows = out.collect()
    assert all(r["frame_idx"] % 10 == 0 for r in rows)
    assert all(r["frame_idx"] < r["n_frames"] for r in rows)


def test_video_features_real_avi(spark):
    """MJPEG AVI payloads: real container metadata + real first-frame
    features through the Arrow mapInPandas path; non-AVI payloads keep
    the stub fallback in the same job."""
    import numpy as np

    from tsp_spark.pipeline.codecs import encode_avi_mjpeg, image_features
    from tsp_spark.pipeline.multimodal import extract_video_features

    rng = np.random.default_rng(7)
    base = np.clip(
        np.add.outer(np.linspace(40, 200, 12), np.linspace(0, 40, 18)), 0, 255
    ).astype(np.uint8)
    frames = [np.stack([base + i] * 3, axis=2).clip(0, 255) for i in range(4)]
    avi = encode_avi_mjpeg([f.astype(np.uint8) for f in frames], fps=8)
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(b"not a video"))],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in extract_video_features(df).collect()}
    real = out[1]
    assert (real["width"], real["height"], real["n_frames"]) == (18, 12, 4)
    assert real["fourcc"] == "MJPG" and real["fps_milli"] == 8_000
    assert len(real["features"]) == len(image_features(frames[0]))
    stub = out[2]
    assert stub["fourcc"] == "" and stub["n_frames"] == len(b"not a video") % 256 + 1


def test_frame_sample_real_container(spark):
    """frame_sample_plan reads the REAL frame count from AVI payloads
    and keeps the stub for everything else."""
    import numpy as np

    from tsp_spark.pipeline.codecs import encode_avi_mjpeg

    img = np.full((8, 8, 3), 128, dtype=np.uint8)
    avi = encode_avi_mjpeg([img] * 23, fps=5)
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(b"xyz"))],
        "media_id long, payload binary",
    )
    out = frame_sample_plan(df, every_n=10).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    assert {r["frame_idx"] for r in by_id[1]} == {0, 10, 20}
    assert all(r["n_frames"] == 23 for r in by_id[1])
    assert all(r["n_frames"] == len(b"xyz") % 256 + 1 for r in by_id[2])


def test_video_features_empty_movi(spark):
    """ADVICE r5: an MJPEG AVI whose movi list has no video chunks must
    degrade to metadata+stub, not crash the task on np.mean([])."""
    import numpy as np

    from tsp_spark.pipeline.codecs import encode_avi_mjpeg
    from tsp_spark.pipeline.multimodal import extract_video_features

    img = np.full((8, 8, 3), 100, dtype=np.uint8)
    avi = encode_avi_mjpeg([img], fps=5)
    # retag every video chunk as an audio chunk: container stays
    # well-formed, frame iterator yields nothing
    empty = avi.replace(b"00dc", b"01wb")
    df = spark.createDataFrame(
        [(1, bytearray(empty))], "media_id long, payload binary"
    )
    row = extract_video_features(df).collect()[0]
    assert row["fourcc"] == "MJPG" and row["width"] == 8
    assert len(row["features"]) == 8  # stub feature vector


def test_id_col_preserved(spark):
    """ADVICE r5 (extended to EVERY mapInPandas op here in r6d): all
    five media operators must keep a caller-supplied id column's name
    AND Spark type — image/audio/resize previously hardcoded
    media_id/LongType and broke on string ids (review-caught)."""
    from tsp_spark.pipeline.multimodal import (
        extract_audio_features,
        extract_image_features,
        extract_video_features,
        resize_images,
    )

    df = spark.createDataFrame(
        [("docA", bytearray(b"xyz"))], "doc_id string, payload binary"
    )
    fs = frame_sample_plan(df, id_col="doc_id", every_n=10)
    assert fs.schema["doc_id"].dataType.simpleString() == "string"
    assert [r["doc_id"] for r in fs.collect()] == ["docA"]
    for fn in (
        extract_video_features,
        extract_image_features,
        extract_audio_features,
    ):
        out = fn(df, id_col="doc_id")
        assert out.schema["doc_id"].dataType.simpleString() == "string", fn
        assert out.collect()[0]["doc_id"] == "docA", fn
    rz = resize_images(df, 4, 4, id_col="doc_id")
    assert rz.schema["doc_id"].dataType.simpleString() == "string"
    assert rz.collect()[0]["doc_id"] == "docA"
