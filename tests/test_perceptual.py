"""Perceptual image dedup: dHash fingerprint math, PNG near-dup family
recovery, pigeonhole banding completeness, dead-letter decodes, and the
driver-fixture oracles (operators/perceptual.py)."""

import json
import random

import numpy as np
import pytest

from hyperswitch_data_backfill_spark.operators.codecs import encode_png
from hyperswitch_data_backfill_spark.operators.perceptual import (
    DHASH_MAX_HAMMING,
    _dhash_of,
    fingerprint_pairs,
    image_dhash,
    neardup_images,
)
from tests.conftest import SF_DIR, assert_oracle_match

MEDIA_DDL = "media_id bigint, kind string, payload binary, meta_json string"


def _raw_row(media_id: int, img: np.ndarray):
    h, w = img.shape
    return (media_id, "image", bytearray(img.tobytes()),
            json.dumps({"width": w, "height": h}))


def test_dhash_hand_computed_tiny_case():
    """2x9 image sampled at grid 8: rows repeat, so the top row's 8
    comparisons replicate down all 8 grid rows — hand-checkable pack."""
    top = np.array([5, 9, 2, 2, 7, 1, 8, 8, 3], dtype=np.uint8)
    img = np.vstack([top, top])
    # xs = (c*9)//9 = identity; comparisons: 5>9 F, 9>2 T, 2>2 F, 2>7 F,
    # 7>1 T, 1>8 F, 8>8 F, 8>3 T  ->  row bits 01001001 (bit1,4,7)
    row_bits = 0b10010010
    expect = 0
    for r in range(8):
        expect |= row_bits << (8 * r)
    expect -= 1 << 64 if expect >= 1 << 63 else 0
    assert _dhash_of(img, 8) == expect


def test_dhash_invariant_to_small_noise_distinct_for_unrelated(spark):
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=(64, 64), dtype=np.uint8).astype(np.uint8)
    # near-dup: flip a couple of pixels far from each other
    near = base.copy()
    near[3, 3] ^= 0xFF
    near[50, 50] ^= 0xFF
    other = rng.integers(0, 256, size=(64, 64), dtype=np.uint8).astype(np.uint8)
    media = spark.createDataFrame(
        [_raw_row(1, base), _raw_row(2, near), _raw_row(3, other)], MEDIA_DDL)
    fps = {r.media_id: r.dhash for r in image_dhash(media).collect()}
    d_near = bin((fps[1] ^ fps[2]) & (1 << 64) - 1).count("1")
    d_other = bin((fps[1] ^ fps[3]) & (1 << 64) - 1).count("1")
    assert d_near <= DHASH_MAX_HAMMING
    assert d_other > 10


def test_png_near_dup_family_recovered(spark):
    """The planted-family contract through the REAL PNG codec path:
    re-encoded and lightly perturbed variants of one image pair up;
    an unrelated image pairs with nothing."""
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, size=(48, 48), dtype=np.uint8).astype(np.uint8)
    v1 = base.copy(); v1[0, 0] ^= 0x80                      # 1-pixel nudge
    v2 = base.copy(); v2[20:22, 20:22] ^= 0x01              # invisible tweak
    other = rng.integers(0, 256, size=(48, 48), dtype=np.uint8).astype(np.uint8)
    rows = [
        (i, "image", bytearray(encode_png(img)), None)
        for i, img in ((10, base), (11, v1), (12, v2), (99, other))
    ]
    media = spark.createDataFrame(rows, MEDIA_DDL)
    pairs = {(r.id_a, r.id_b) for r in
             neardup_images(media, codec="png").collect()}
    assert {(10, 11), (10, 12), (11, 12)} <= pairs
    assert not any(99 in p for p in pairs)


def test_rgb_png_luma_collapse(spark):
    """Color PNGs flow through the integer ITU-R 601 luma: a gray image
    and its RGB self (equal channels) fingerprint identically."""
    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, size=(32, 32), dtype=np.uint8).astype(np.uint8)
    rgb = np.stack([gray, gray, gray], axis=2)
    media = spark.createDataFrame(
        [(1, "image", bytearray(encode_png(gray)), None),
         (2, "image", bytearray(encode_png(rgb)), None)], MEDIA_DDL)
    fps = {r.media_id: r.dhash for r in
           image_dhash(media, codec="png").collect()}
    assert fps[1] == fps[2] and fps[1] is not None


def test_dead_letter_rows_yield_null_and_pair_with_nothing(spark):
    good = np.arange(64, dtype=np.uint8).reshape(8, 8)
    media = spark.createDataFrame(
        [
            _raw_row(1, good),
            (2, "image", bytearray(b"\x01\x02\x03"), json.dumps({"width": 8, "height": 8})),
            (3, "image", bytearray(b""), None),
        ],
        MEDIA_DDL,
    )
    fps = {r.media_id: r.dhash for r in image_dhash(media).collect()}
    assert fps[1] is not None and fps[2] is None and fps[3] is None
    assert neardup_images(media).count() == 0  # NULLs excluded from banding


def test_pigeonhole_completeness_on_planted_perturbations(spark):
    """Every fingerprint pair within Hamming<=3 MUST surface through the
    4x16 banding (completeness is a theorem; this pins the wiring):
    200 random 64-bit fingerprints, each with a <=3-bit-flipped twin."""
    rng = random.Random(13)
    rows, expected = [], set()
    for i in range(200):
        fp = rng.getrandbits(64)
        flips = rng.sample(range(64), rng.randint(0, 3))
        twin = fp
        for b in flips:
            twin ^= 1 << b
        def signed(v):
            return v - (1 << 64) if v >= 1 << 63 else v
        rows.append((2 * i, signed(fp)))
        rows.append((2 * i + 1, signed(twin)))
        expected.add((2 * i, 2 * i + 1))
    sigs = spark.createDataFrame(rows, "media_id bigint, dhash bigint")
    got = {(r.id_a, r.id_b) for r in fingerprint_pairs(sigs).collect()}
    assert expected <= got


def test_fingerprint_pairs_parameter_validation():
    with pytest.raises(ValueError, match="pigeonhole"):
        fingerprint_pairs(None, n_bands=4, max_hamming=4)
    with pytest.raises(ValueError, match="not divisible"):
        fingerprint_pairs(None, n_bands=3, max_hamming=2)


def test_dhash_fixture_oracles(spark, duck):
    from hyperswitch_data_backfill_spark.registry import (
        REGISTRY,
        _load_all_operator_modules,
    )

    _load_all_operator_modules()
    for key in ("dedup_image_dhash", "dedup_image_dhash_pairs"):
        q = REGISTRY[key]
        df = q.fn(spark, SF_DIR)
        assert df.count() > 0
        assert_oracle_match(df, duck, q.oracle, name=key)


# ------------------------------------------------------------ audio twin

def test_ehash_hand_computed_tiny_case():
    """65 windows of exactly 2 samples each (n=130): energies are
    adjacent-pair square sums — hand-checkable envelope pack."""
    import numpy as np

    from hyperswitch_data_backfill_spark.operators.perceptual import _ehash_of

    # energies strictly DEcreasing -> every comparison true -> all 64 bits
    samples = np.repeat(np.arange(65, 0, -1, dtype=np.int16), 2)
    assert _ehash_of(samples) == -1  # 64 one-bits = two's-complement -1
    # strictly INcreasing -> no bits
    assert _ehash_of(samples[::-1].copy()) == 0


def test_ehash_null_dtype_precision_regression(spark):
    """Regression for a real bug the audio oracle caught: a mapInPandas
    batch containing one dead-letter None made pandas infer float64 for
    the fingerprint column, silently destroying the low ~11 bits of
    every OTHER fingerprint in the batch (53-bit mantissa). The column
    must be nullable Int64 — exact values survive a mixed batch."""
    import numpy as np

    from hyperswitch_data_backfill_spark.operators.perceptual import (
        _ehash_of,
        audio_ehash,
    )

    rng = np.random.default_rng(5)
    samples = rng.integers(-3000, 3000, size=999, dtype=np.int16)
    rows = [
        (1, "audio", bytearray(samples.tobytes()), None),
        (2, "audio", bytearray(b"xy"), None),  # < 65 samples: dead-letter
    ]
    media = spark.createDataFrame(rows, MEDIA_DDL)
    got = {r.media_id: r.ehash for r in audio_ehash(media).collect()}
    assert got[2] is None
    assert got[1] == _ehash_of(samples)  # exact, low bits intact


def test_wav_near_dup_family_recovered(spark):
    """Real WAV codec path: re-encoded and lightly perturbed variants of
    one waveform pair up; an unrelated waveform pairs with nothing."""
    import numpy as np

    from hyperswitch_data_backfill_spark.operators.codecs import encode_wav
    from hyperswitch_data_backfill_spark.operators.perceptual import neardup_audio

    rng = np.random.default_rng(23)
    t = np.arange(4000)
    base = (3000 * np.sin(t / 25.0) * (1 + 0.5 * np.sin(t / 600.0))).astype(np.int16)
    v1 = base.copy(); v1[100:110] += 40            # tiny local nudge
    v2 = (base.astype(np.int32) * 99 // 100).astype(np.int16)  # -1% gain
    other = rng.integers(-3000, 3000, size=4000, dtype=np.int16)
    rows = [
        (i, "audio", bytearray(encode_wav(w)), None)
        for i, w in ((10, base), (11, v1), (12, v2), (99, other))
    ]
    media = spark.createDataFrame(rows, MEDIA_DDL)
    pairs = {(r.id_a, r.id_b) for r in
             neardup_audio(media, codec="wav").collect()}
    assert {(10, 11), (10, 12), (11, 12)} <= pairs
    assert not any(99 in p for p in pairs)


def test_ehash_fixture_oracles(spark, duck):
    from hyperswitch_data_backfill_spark.registry import (
        REGISTRY,
        _load_all_operator_modules,
    )

    _load_all_operator_modules()
    for key in ("dedup_audio_ehash", "dedup_audio_ehash_pairs"):
        q = REGISTRY[key]
        df = q.fn(spark, SF_DIR)
        assert df.count() > 0
        assert_oracle_match(df, duck, q.oracle, name=key)


# ------------------------------------------------------------ video twin

def _video_row(media_id, frames_arr):
    import numpy as np

    f, h, w = frames_arr.shape
    return (media_id, "video", bytearray(frames_arr.astype(np.uint8).tobytes()),
            json.dumps({"width": w, "height": h, "frames": f}))


def test_video_family_recovered_including_cross_slot(spark):
    """Planted clip family: a lightly perturbed re-encode matches on
    every sampled frame; a RE-CUT clip (content shifted by a frame)
    still matches cross-slot; an unrelated clip pairs with nothing."""
    import numpy as np

    from hyperswitch_data_backfill_spark.operators.perceptual import (
        neardup_videos,
    )

    rng = np.random.default_rng(31)
    base = rng.integers(0, 256, size=(8, 32, 32), dtype=np.uint8)
    noisy = base.copy(); noisy[:, 5, 5] ^= 0x01           # invisible tweak
    # shifted by one SAMPLING STRIDE (8 frames / 4 samples = 2), so the
    # recut's sampled frames are base content at different slots
    recut = np.concatenate([base[2:], base[:2]])
    other = rng.integers(0, 256, size=(8, 32, 32), dtype=np.uint8)
    media = spark.createDataFrame(
        [_video_row(1, base), _video_row(2, noisy),
         _video_row(3, recut), _video_row(9, other)],
        MEDIA_DDL.replace("meta_json string", "meta_json string"),
    )
    got = {(r.id_a, r.id_b): r.n_frame_matches for r in
           neardup_videos(media, sample_frames=4).collect()}
    assert got.get((1, 2)) == 4          # all sampled frames match
    assert (1, 3) in got                 # cross-slot containment found
    assert not any(9 in p for p in got)


def test_video_dead_letter_and_composite_guard(spark):
    import numpy as np

    from pyspark.errors import SparkRuntimeException

    from hyperswitch_data_backfill_spark.operators.perceptual import (
        neardup_videos,
        video_frame_dhash,
    )

    good = np.arange(2 * 8 * 8, dtype=np.uint8).reshape(2, 8, 8)
    media = spark.createDataFrame(
        [
            _video_row(1, good),
            (2, "video", bytearray(b"\x00\x01"), json.dumps(
                {"width": 8, "height": 8, "frames": 2})),
        ],
        MEDIA_DDL,
    )
    rows = video_frame_dhash(media, sample_frames=2).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    assert len(by_id[1]) == 2 and all(r.dhash is not None for r in by_id[1])
    assert len(by_id[2]) == 1 and by_id[2][0].dhash is None
    # composite-id guard: an id outside the collision-free range raises
    huge = spark.createDataFrame(
        [_video_row((1 << 53) // 1024 + 7, good)], MEDIA_DDL)
    with pytest.raises(SparkRuntimeException, match="composite-id range"):
        neardup_videos(huge, sample_frames=2).count()


def test_vhash_fixture_oracles(spark, duck):
    from hyperswitch_data_backfill_spark.registry import (
        REGISTRY,
        _load_all_operator_modules,
    )

    _load_all_operator_modules()
    for key in ("dedup_video_vhash", "dedup_video_vhash_pairs"):
        q = REGISTRY[key]
        df = q.fn(spark, SF_DIR)
        assert df.count() > 0
        assert_oracle_match(df, duck, q.oracle, name=key)


def test_video_family_recovered_through_avi_container(spark):
    """r13 stretch item 8: the SAME clip family is recovered when clips
    arrive as real AVI containers (uncompressed-DIB streams, decoded
    from the container's own strf header) — and a family split ACROSS
    container types (one member AVI, one raw frame-major) still pairs,
    because the decode stage normalizes both to identical pixels."""
    import numpy as np

    from hyperswitch_data_backfill_spark.operators import codecs
    from hyperswitch_data_backfill_spark.operators.perceptual import (
        neardup_videos,
        video_frame_dhash,
    )

    rng = np.random.default_rng(41)
    base = rng.integers(0, 256, size=(8, 32, 32), dtype=np.uint8)
    noisy = base.copy(); noisy[:, 5, 5] ^= 0x01
    recut = np.concatenate([base[2:], base[:2]])
    other = rng.integers(0, 256, size=(8, 32, 32), dtype=np.uint8)

    def _avi_row(media_id, frames_arr):
        return (media_id, "video",
                bytearray(codecs.encode_avi(frames_arr, fps=8)), None)

    media = spark.createDataFrame(
        [_avi_row(1, base), _video_row(2, noisy),   # AVI + raw, one family
         _avi_row(3, recut), _avi_row(9, other)],
        MEDIA_DDL,
    )
    # the AVI rows decode to the same per-frame hashes as raw rows
    hashes = {(r.media_id, r.slot): r.dhash for r in
              video_frame_dhash(media, sample_frames=4).collect()}
    raw_media = spark.createDataFrame([_video_row(1, base)], MEDIA_DDL)
    raw_hashes = {(r.media_id, r.slot): r.dhash for r in
                  video_frame_dhash(raw_media, sample_frames=4).collect()}
    for slot in range(4):
        assert hashes[(1, slot)] == raw_hashes[(1, slot)]
    got = {(r.id_a, r.id_b): r.n_frame_matches for r in
           neardup_videos(media, sample_frames=4).collect()}
    assert got.get((1, 2)) == 4          # cross-container family found
    assert (1, 3) in got                 # AVI recut containment found
    assert not any(9 in p for p in got)
