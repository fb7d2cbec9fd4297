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


def test_extract_features_real_decode_dispatches_by_magic(spark):
    """decode_stub=False: PNG and WAV payloads decode for real (stdlib
    codecs); unknown containers dead-letter to a NULL feature."""
    import numpy as np

    from hyperswitch_data_backfill_spark.operators import codecs

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    png = codecs.encode_png(img)
    pcm = np.array([0, 1000, -1000, 32767, -32768] * 10, dtype=np.int16)
    wav = codecs.encode_wav(pcm, rate=8000)
    rows = [
        (1, "image", bytearray(png), json.dumps({"w": 8, "h": 8})),
        (2, "audio", bytearray(wav), json.dumps({"sr": 8000})),
        (3, "video", b"\x00\x00ftyp" + b"c" * 64, json.dumps({"fps": 30})),
        (4, "image", None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in extract_features(media, decode_stub=False).collect()}
    assert out[1]["feature"] == f"png:8x8:mean={img.mean():.4f}"
    assert out[2]["feature"] == "wav:50x1@8000"
    assert out[3]["feature"] is None  # unknown container: dead-letter
    assert out[4]["feature"] is None and out[4]["n_bytes"] is None


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


def test_resize_raw_images_real_decode(spark):
    """Raw grayscale bitmaps decode + resize with numpy only — REAL path,
    no stub: exact nearest-neighbor values, malformed rows dead-letter to
    NULL instead of failing the task."""
    import json

    import numpy as np

    from hyperswitch_data_backfill_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_raw_images,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(8, 12), dtype=np.uint8)  # h=8, w=12
    rows = [
        (1, "image", bytearray(img.tobytes()), json.dumps({"width": 12, "height": 8})),
        (2, "image", bytearray(b"\x00" * 5), json.dumps({"width": 4, "height": 4})),  # bad size
        (3, "image", bytearray(b"\x00" * 16), None),  # missing meta
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in resize_raw_images(media, out_w=4, out_h=4).collect()}

    ys = (np.arange(4) * 8) // 4
    xs = (np.arange(4) * 12) // 4
    expected = img[np.ix_(ys, xs)]
    assert bytes(got[1]["pixels"]) == expected.tobytes()
    assert got[1]["mean_px"] == f"{expected.mean():.4f}"
    assert got[2]["pixels"] is None and got[3]["pixels"] is None


def test_audio_window_features_real_pcm(spark):
    """Raw PCM int16 windowed RMS/ZCR: exact on a synthetic square wave."""
    import numpy as np

    from hyperswitch_data_backfill_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_window_features,
    )

    # square wave period 8 -> zcr = 2/8 transitions per sample boundary
    n = 2048
    samples = (np.where(np.arange(n) % 8 < 4, 1000, -1000)).astype("<i2")
    rows = [
        (1, "audio", bytearray(samples.tobytes()), None),
        (2, "audio", bytearray(b""), None),           # empty -> no windows
        (3, "audio", bytearray(b"\x01"), None),       # odd byte -> no windows
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = audio_window_features(media, window=1024).collect()
    by_media = {}
    for r in got:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == {1}
    assert len(by_media[1]) == 2  # 2048 / 1024
    for r in by_media[1]:
        assert r["rms"] == "1000.0000"
        # sign flips every 4 samples -> ~1 transition per 4 boundaries
        assert abs(float(r["zcr"]) - 0.25) < 0.01


def test_resample_pcm_linear(spark):
    """Linear resample: exact on a ramp (linear interp reproduces a line)."""
    import numpy as np

    from hyperswitch_data_backfill_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resample_pcm,
    )

    ramp = np.arange(0, 1000, 2, dtype="<i2")  # 500 samples at 8 kHz
    rows = [
        (1, "audio", bytearray(ramp.tobytes()), json.dumps({"rate": 8000})),
        (2, "audio", bytearray(ramp.tobytes()), json.dumps({"rate": 32000})),
        (3, "audio", bytearray(b""), json.dumps({"rate": 8000})),   # empty
        (4, "audio", bytearray(ramp.tobytes()), None),               # no rate
        (5, "audio", bytearray(ramp.tobytes()), json.dumps({"rate": 0})),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in resample_pcm(media, dst_rate=16_000).collect()}

    # 2x upsample of a ramp: y[i] = i (step halves from 2 to 1)
    up = np.frombuffer(bytes(got[1]["payload"]), dtype="<i2")
    assert got[1]["n_in"] == 500 and got[1]["n_out"] == 1000
    assert np.array_equal(up[:998], np.arange(998))
    # 2x downsample: every other sample, step doubles to 4
    down = np.frombuffer(bytes(got[2]["payload"]), dtype="<i2")
    assert got[2]["n_out"] == 250
    assert np.array_equal(down, np.arange(0, 1000, 4))
    for bad in (3, 4, 5):
        assert got[bad]["payload"] is None and got[bad]["n_out"] is None
