"""Multimodal plumbing tests: binary columns + mapInPandas pipelines
(decode is a deterministic stub; the Spark-side schema/partitioning/
batching is the real subject)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.multimodal.media import (
    attach_media_metadata,
    decode_images,
    extract_image_features,
    sample_video_frames,
)


def _media_df(spark):
    rows = [
        (1, b"\x89PNG\r\n\x1a\n" + b"x" * 100),
        (2, b"\xff\xd8\xff\xe0" + b"y" * 200),
        (3, b"RIFF" + b"z" * 64),
        (4, None),
        (5, b""),
    ]
    return spark.createDataFrame(rows, ["media_id", "payload"])


def test_mime_sniffing(spark):
    got = {
        r["media_id"]: r["sniffed_mime"]
        for r in attach_media_metadata(_media_df(spark)).collect()
    }
    assert got[1] == "image/png"
    assert got[2] == "image/jpeg"
    assert got[3] == "audio/wav"


def test_decode_images_null_safe(spark):
    got = {r["media_id"]: r["width"] for r in decode_images(_media_df(spark)).collect()}
    assert got[1] is not None and got[2] is not None
    assert got[4] is None and got[5] is None  # corrupt rows don't fail the job


def test_decode_deterministic(spark):
    a = decode_images(_media_df(spark)).collect()
    b = decode_images(_media_df(spark)).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_feature_extraction_shape(spark):
    rows = extract_image_features(_media_df(spark), dim=8).collect()
    feats = {r["media_id"]: r["features"] for r in rows}
    assert len(feats[1]) == 8
    assert all(0.0 <= x <= 1.0 for x in feats[1])
    assert feats[4] is None


def test_video_frame_sampling_fanout(spark):
    df = spark.createDataFrame([(1, bytes(range(256))), (2, None)], ["media_id", "payload"])
    frames = sample_video_frames(df, every_ms=500, max_frames=4).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id[1]) == 4
    assert 2 not in by_id  # null payload → no rows
    assert [r["frame_ts_ms"] for r in sorted(by_id[1], key=lambda r: r["frame_idx"])] == [0, 500, 1000, 1500]
    assert "payload" not in frames[0].asDict()  # big blob dropped from fan-out
