"""L5 multimodal plumbing: binary payload + metadata columns through
mapInPandas feature extraction and declarative frame sampling."""

from __future__ import annotations

import hashlib
import json

import pytest

from hyperswitch_data_backfill_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    extract_features,
    frame_sample,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, "image", b"\x89PNG" + b"a" * 2048, json.dumps({"w": 64, "h": 64})),
        (2, "audio", b"RIFF" + b"b" * 4096, json.dumps({"sr": 16000})),
        (3, "video", b"\x00\x00ftyp" + b"c" * 8192, json.dumps({"fps": 30})),
        (4, "image", None, None),  # missing payload must not crash the batch
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_stub(spark, media_df):
    out = extract_features(media_df, decode_stub=True)
    assert out.schema == FEATURE_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[1]["n_bytes"] == 2052
    expected_sha = hashlib.sha256(b"\x89PNG" + b"a" * 2048).hexdigest()
    assert rows[1]["content_sha"] == expected_sha
    assert rows[1]["feature"] == f"stub-{expected_sha[:8]}"
    assert rows[4]["n_bytes"] is None and rows[4]["content_sha"] is None


def test_extract_features_real_decoder_is_explicit_stub(spark, media_df):
    out = extract_features(media_df, decode_stub=False)
    with pytest.raises(Exception, match="NotImplementedError|real media decoding"):
        out.collect()


def test_frame_sample_offsets(spark, media_df):
    out = frame_sample(media_df.filter("payload IS NOT NULL"), every_n_bytes=1024)
    rows = [r for r in out.collect() if r["media_id"] == 2]  # 4100 bytes
    offsets = sorted(r["byte_offset"] for r in rows)
    assert offsets == [0, 1024, 2048, 3072, 4096]
    assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["byte_offset"])] == [0, 1, 2, 3, 4]


def test_frame_features_pipeline(spark, media_df):
    from pyspark.sql import functions as F

    from hyperswitch_data_backfill_spark.operators.multimodal import frame_features

    out = frame_features(media_df, every_n_bytes=1024, frame_bytes=256)
    rows = [r for r in out.collect() if r["media_id"] == 3]  # 8196 bytes → 9 frames
    assert len(rows) == 9
    payload = b"\x00\x00ftyp" + b"c" * 8192
    for r in rows:
        expected = hashlib.sha256(payload[r["byte_offset"]:r["byte_offset"] + 256]).hexdigest()
        assert r["frame_sha"] == expected
    # interior frames of a constant payload collapse under dedup (scene count)
    scenes = (
        frame_features(media_df, every_n_bytes=1024)
        .groupBy("media_id")
        .agg(F.count_distinct("frame_sha").alias("n_scenes"), F.count("*").alias("n_frames"))
    )
    got = {r["media_id"]: (r["n_scenes"], r["n_frames"]) for r in scenes.collect()}
    assert got[3][1] == 9 and got[3][0] < got[3][1]


def test_frame_ops_skip_empty_payload(spark):
    """A 0-byte (non-null) payload must produce zero frames, not a
    phantom frame at offset 0."""
    from hyperswitch_data_backfill_spark.operators.multimodal import frame_features

    empty = spark.createDataFrame([(9, "video", b"", None)], MEDIA_SCHEMA)
    assert frame_sample(empty).count() == 0
    assert frame_features(empty).count() == 0
