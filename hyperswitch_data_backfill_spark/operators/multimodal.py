"""Multimodal columns — SURVEY §2.11 L5 (north-star mandate).

Pattern: media is an opaque ``binary`` payload column + a typed metadata
struct; all real decode/resize/frame-sample work happens in Arrow-batched
``mapInPandas`` stages so bytes never round-trip through the driver and
each batch is one Python invocation. The image/audio libraries are not
in this container, so the decode step is a clearly-marked stub
(``decode_stub=True`` → deterministic fake features; ``False`` raises
NotImplementedError where PIL/librosa would be called) — the Spark-side
plumbing (schema, batching, partitioning) is real and tested.

Ingest path for real deployments: ``spark.read.format("binaryFile")``
(path/modificationTime/length/content), partitioned by directory layout.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("meta_json", StringType(), True),  # typed metadata as JSON
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("content_sha", StringType(), True),
        StructField("feature", StringType(), True),
    ]
)


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Ingest a directory of media files as binary rows (binaryFile source)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode/feature-extract media payloads via mapInPandas.

    Each Arrow batch is processed in one Python call; per-row work is
    numpy/bytes-level. With ``decode_stub=False`` this is where a real
    decoder (PIL.Image.open / librosa.load / pyav) plugs in.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decoding requires PIL/librosa/pyav — not in this container"
                )
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else None),
                    "content_sha": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest() if b is not None else None
                    ),
                    # deterministic fake "embedding" tag standing in for the decoder output
                    "feature": payloads.map(
                        lambda b: f"stub-{hashlib.sha256(bytes(b)).hexdigest()[:8]}"
                        if b is not None
                        else None
                    ),
                }
            )
            yield out

    return media.mapInPandas(gen, FEATURE_SCHEMA)


def _frame_offsets(every_n_bytes: int):
    """Sampled byte offsets of a payload: [0, every, 2·every, …) — empty
    for empty (0-byte) payloads, so no phantom frame is emitted."""
    n = F.length("payload")
    return F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(every_n_bytes))
    ).otherwise(F.array().cast("array<int>"))


FRAME_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("byte_offset", LongType(), False),
        StructField("frame_sha", StringType(), True),
    ]
)


def frame_features(media: DataFrame, every_n_bytes: int = 1024,
                   frame_bytes: int = 256, decode_stub: bool = True) -> DataFrame:
    """Composed video pipeline: sample frames, decode each, fingerprint.

    Stage 1 (declarative, JVM-side): the shared ``_frame_offsets``
    sampling rule fans each payload out to one row per sampled offset
    and carries the payload along so the decode stage owns its bytes —
    no second join back to the media table, no shuffle between the
    stages.

    Stage 2 (Arrow-batched ``mapInPandas``): slice the payload window at
    each offset and fingerprint it — the seam where a real frame decoder
    (pyav / PIL) plugs in when ``decode_stub=False``. Downstream dedup
    (distinct frame_sha per media = scene count) stays declarative.
    """
    sampled = media.filter(F.col("payload").isNotNull()).select(
        "media_id",
        "payload",
        F.posexplode(_frame_offsets(every_n_bytes)).alias("frame_idx", "byte_offset"),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real frame decoding requires pyav/PIL — not in this container"
                )
            shas = [
                hashlib.sha256(bytes(p)[o : o + frame_bytes]).hexdigest()
                for p, o in zip(pdf["payload"], pdf["byte_offset"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"],
                    "byte_offset": pdf["byte_offset"],
                    "frame_sha": shas,
                }
            )

    return sampled.mapInPandas(gen, FRAME_FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """'Frame sampling' over the opaque payload: one row per sampled offset.

    Stands in for video frame extraction: posexplode over computed offsets
    keeps the fan-out declarative (no Python), and the decode of each
    sampled frame would be a follow-up mapInPandas stage (see
    ``frame_features``, which shares the ``_frame_offsets`` rule).
    """
    return media.select(
        "media_id",
        "kind",
        F.posexplode(_frame_offsets(every_n_bytes)).alias("frame_idx", "byte_offset"),
    )


# ---------------------------------------------------------------------------
# Raw-format decoders — REAL implementations (numpy-only), no stub.
#
# Compressed codecs (PNG/JPEG/FLAC/H.264) need PIL/librosa/pyav and stay
# behind the NotImplementedError stubs above. RAW formats don't: a raw
# grayscale bitmap is width×height bytes and raw PCM audio is an int16
# sample stream, so decode/resize/feature-extract is pure numpy — these
# paths are fully functional end-to-end in this container.
# ---------------------------------------------------------------------------

IMAGE_RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("out_w", LongType(), False),
        StructField("out_h", LongType(), False),
        StructField("pixels", BinaryType(), True),  # resized raw bitmap
        StructField("mean_px", StringType(), True),  # formatted, engine-neutral
    ]
)


def resize_raw_images(media: DataFrame, out_w: int = 16, out_h: int = 16) -> DataFrame:
    """Decode + nearest-neighbor-resize raw grayscale bitmaps (mapInPandas).

    Input rows: payload = height×width uint8 bytes, meta_json =
    ``{"width": W, "height": H}``. Each Arrow batch is one Python call;
    per-image work is two numpy index gathers (no per-pixel Python).
    Malformed rows (size ≠ W·H, missing dims) yield NULL pixels rather
    than poisoning the batch — at 100 TB a decode stage must be
    dead-letter-friendly, never fail the task on one bad file.
    """
    import json

    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_pixels, out_means = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta_json"]):
                try:
                    m = json.loads(meta) if meta else {}
                    w, h = int(m["width"]), int(m["height"])
                    img = np.frombuffer(bytes(payload), dtype=np.uint8)
                    if img.size != w * h:
                        raise ValueError("payload size != width*height")
                    img = img.reshape(h, w)
                    ys = (np.arange(out_h) * h) // out_h
                    xs = (np.arange(out_w) * w) // out_w
                    small = img[np.ix_(ys, xs)]
                    out_pixels.append(small.tobytes())
                    out_means.append(f"{small.mean():.4f}")
                except Exception:
                    out_pixels.append(None)
                    out_means.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_w": out_w,
                    "out_h": out_h,
                    "pixels": out_pixels,
                    "mean_px": out_means,
                }
            )

    return media.mapInPandas(gen, IMAGE_RESIZE_SCHEMA)


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("window_idx", LongType(), False),
        StructField("rms", StringType(), True),  # formatted, engine-neutral
        StructField("zcr", StringType(), True),
    ]
)


def audio_window_features(media: DataFrame, window: int = 1024) -> DataFrame:
    """Windowed RMS + zero-crossing-rate over raw PCM int16 payloads.

    The language-ID-for-audio primitives: per fixed-size sample window,
    root-mean-square energy and the zero-crossing rate — all vectorized
    numpy over Arrow batches, one output row per (media, window). Odd
    trailing bytes and empty payloads produce zero windows, not errors.
    At scale the fan-out is bounded by payload length; partitioning by
    media_id keeps one file's windows in one task.
    """
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widx, rms, zcr = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                buf = bytes(payload)
                samples = np.frombuffer(buf[: len(buf) - (len(buf) % 2)], dtype="<i2")
                n_win = len(samples) // window
                if n_win == 0:
                    continue
                frames = samples[: n_win * window].reshape(n_win, window).astype(np.float64)
                w_rms = np.sqrt((frames**2).mean(axis=1))
                signs = np.signbit(frames)
                w_zcr = (signs[:, 1:] != signs[:, :-1]).mean(axis=1)
                ids.extend([mid] * n_win)
                widx.extend(range(n_win))
                rms.extend(f"{v:.4f}" for v in w_rms)
                zcr.extend(f"{v:.6f}" for v in w_zcr)
            yield pd.DataFrame(
                {"media_id": ids, "window_idx": widx, "rms": rms, "zcr": zcr}
            )

    return media.mapInPandas(gen, AUDIO_FEATURE_SCHEMA)


AUDIO_RESAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("src_rate", LongType(), True),
        StructField("dst_rate", LongType(), False),
        StructField("n_in", LongType(), True),
        StructField("n_out", LongType(), True),
        StructField("payload", BinaryType(), True),  # resampled int16 PCM
    ]
)


def resample_pcm(media: DataFrame, dst_rate: int = 16_000) -> DataFrame:
    """Linear-interpolation resample of raw PCM int16 payloads (mapInPandas).

    Source rate comes from each row's ``meta_json`` ``{"rate": R}``; the
    output grid places n_out = round(n_in * dst/src) samples on the same
    time axis and interpolates with one vectorized ``np.interp`` per
    payload — no per-sample Python, no external DSP library (linear
    interpolation is the honest no-dependency kernel; a polyphase
    filter would slot into the same row contract). Malformed rows
    (missing/invalid rate, empty payload) yield NULL payload — the
    dead-letter stance every decode stage here shares. Scale: per-row
    work is O(samples), rows never interact — embarrassingly parallel
    over whatever partitioning the binary source arrived with.
    """
    import json

    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            src_rates, n_ins, n_outs, payloads = [], [], [], []
            for payload, meta in zip(pdf["payload"], pdf["meta_json"]):
                try:
                    m = json.loads(meta) if meta else {}
                    src = int(m["rate"])
                    if src <= 0:
                        raise ValueError("bad rate")
                    buf = bytes(payload)
                    x = np.frombuffer(
                        buf[: len(buf) - (len(buf) % 2)], dtype="<i2"
                    ).astype(np.float64)
                    if x.size == 0:
                        raise ValueError("empty payload")
                    n_out = max(1, round(x.size * dst_rate / src))
                    # same time axis: sample i sits at i/rate seconds
                    t_out = np.arange(n_out) * (src / dst_rate)
                    y = np.interp(t_out, np.arange(x.size), x)
                    out = np.clip(np.rint(y), -32768, 32767).astype("<i2")
                    src_rates.append(src)
                    n_ins.append(x.size)
                    n_outs.append(n_out)
                    payloads.append(out.tobytes())
                except Exception:
                    src_rates.append(None)
                    n_ins.append(None)
                    n_outs.append(None)
                    payloads.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "src_rate": pd.array(src_rates, dtype="Int64"),
                    "dst_rate": dst_rate,
                    "n_in": pd.array(n_ins, dtype="Int64"),
                    "n_out": pd.array(n_outs, dtype="Int64"),
                    "payload": payloads,
                }
            )

    return media.mapInPandas(gen, AUDIO_RESAMPLE_SCHEMA)
