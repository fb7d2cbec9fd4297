"""Multimodal columns — SURVEY §2.11 L5 (north-star mandate).

Pattern: media is an opaque ``binary`` payload column + a typed metadata
struct; all real decode/resize/frame-sample work happens in Arrow-batched
``mapInPandas`` stages so bytes never round-trip through the driver and
each batch is one Python invocation. Decode capability is per-format
(operators/codecs.py): raw bitmaps / raw PCM and PNG / WAV containers
decode for real with stdlib+numpy; JPEG and non-WAV audio dispatch to
PIL / soundfile when importable and raise a clearly-marked
``NotImplementedError`` otherwise. ``extract_features(decode_stub=True)``
keeps the deterministic fake-feature path for tests that only exercise
the Spark-side plumbing (schema, batching, partitioning).

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
    """Ingest a directory of media files as binary rows (binaryFile source).

    Thin wrapper over the canonical ``sources.files.read_binary_files``
    (which adds recursive lookup and documents the small-file packing /
    2 GiB-per-file / manifest-at-10^8-objects scale contract)."""
    from hyperswitch_data_backfill_spark.sources.files import read_binary_files

    return read_binary_files(spark, path, glob=glob)


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode/feature-extract media payloads via mapInPandas.

    Each Arrow batch is processed in one Python call; per-row work is
    numpy/bytes-level. With ``decode_stub=False`` payloads are decoded
    for real, dispatched by container magic (operators/codecs.py): PNG
    and WAV natively (stdlib zlib/wave + numpy), JPEG/other-audio via
    PIL/soundfile when importable. Undecodable rows dead-letter to a
    NULL feature — at 100 TB a decode stage must never fail the task on
    one bad file.
    """

    def _real_feature(b) -> str | None:
        if b is None:
            return None
        from hyperswitch_data_backfill_spark.operators import codecs

        payload = bytes(b)
        kind = codecs.sniff(payload)
        try:
            if kind in ("png", "jpeg"):
                img = codecs.decode_image(payload)
                return f"{kind}:{img.shape[0]}x{img.shape[1]}:mean={img.mean():.4f}"
            if kind == "wav":
                pcm, rate = codecs.decode_wav(payload)
                return f"wav:{pcm.shape[0]}x{pcm.shape[1]}@{rate}"
            return None  # raw/unknown container: dead-letter
        except Exception:
            # per-format capability guard OR corrupt payload; corrupt
            # containers raise format-library errors (zlib.error on bad
            # IDAT, struct.error on truncated IHDR, wave.Error on bad
            # RIFF) — all must dead-letter to NULL, never fail the task
            return None

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "kind": pdf["kind"],
                        "n_bytes": pdf["payload"].map(
                            lambda b: len(b) if b is not None else None
                        ),
                        "content_sha": pdf["payload"].map(
                            lambda b: hashlib.sha256(bytes(b)).hexdigest()
                            if b is not None
                            else None
                        ),
                        "feature": pdf["payload"].map(_real_feature),
                    }
                )
                continue
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
# A raw grayscale bitmap is width×height bytes and raw PCM audio is an
# int16 sample stream, so decode/resize/feature-extract is pure numpy —
# fully functional end-to-end in this container. Compressed containers
# (PNG/WAV natively; JPEG/FLAC via optional PIL/soundfile) are handled
# by operators/codecs.py — see the round-trip fixture queries below.
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

# ---------------------------------------------------------------------------
# Driver-visible multimodal queries.
#
# The fixtures carry no media table, so these derive one deterministically
# from `documents`: payload = the document's (ASCII) text bytes truncated
# to a multiple of the image width, metadata = the computed dimensions.
# That makes the REAL numpy decode paths above oracle-checkable — DuckDB
# reproduces the byte arithmetic with ord(substr(...)) over the same text
# (strlen == char count for this ASCII fixture) — so L5 gets full
# hash-level driver evidence, not just pytest. The mapInPandas plumbing
# exercised here is byte-identical to what a real binaryFile ingest feeds.
# ---------------------------------------------------------------------------

from hyperswitch_data_backfill_spark.catalog import load_table  # noqa: E402
from hyperswitch_data_backfill_spark.registry import register  # noqa: E402

_IMG_W = 8  # synthetic image width (bytes per row)


def doc_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → MEDIA_SCHEMA frame: payload = text bytes, dims in meta.

    Truncates each text to a multiple of _IMG_W bytes so payload size ==
    width × height exactly (the decode contract); fixture text is ASCII,
    so 1 char == 1 byte on both engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    usable = F.expr(f"{_IMG_W} * (octet_length(text) div {_IMG_W})")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(
            F.expr(f"substring(text, 1, {_IMG_W} * (octet_length(text) div {_IMG_W}))"),
            "UTF-8",
        ).alias("payload"),
        F.to_json(
            F.struct(
                F.lit(_IMG_W).alias("width"),
                (usable / _IMG_W).cast("int").alias("height"),
            )
        ).alias("meta_json"),
    )


@register(
    "multimodal_resize_mean",
    oracle=f"""
    WITH d AS (
        SELECT doc_id AS media_id, text,
               (strlen(text) // {_IMG_W}) AS h
        FROM documents
    ), sel AS (
        SELECT media_id, h,
               flatten([[ord(substr(text,
                             ((r * h) // 4) * {_IMG_W} + ((c * {_IMG_W}) // 4) + 1,
                             1))
                         FOR c IN range(4)] FOR r IN range(4)]) AS px
        FROM d
    )
    -- h = 0 (doc shorter than one scanline) mirrors Spark's dead-letter
    -- behavior: the decoder emits the row with NULL mean_px, while
    -- ord(substr(...)) past end-of-string would silently yield -1 and
    -- fabricate a numeric row — so NULL it out explicitly.
    SELECT media_id, CAST(4 AS BIGINT) AS out_w, CAST(4 AS BIGINT) AS out_h,
           CASE WHEN h > 0 THEN printf('%.4f', list_sum(px) / 16.0) END AS mean_px
    FROM sel
    """,
    doc="L5a: REAL raw-bitmap decode + nearest-neighbor 4x4 resize "
        "(mapInPandas, vectorized numpy index gathers) over a media frame "
        "derived from documents; the oracle replays the identical "
        "byte-index arithmetic in SQL, so the decode path is hash-checked "
        "end to end. mean_px is sum/16 — a 4-fraction-bit double, so the "
        "%.4f rendering is exact on both engines.",
)
def multimodal_resize_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = doc_media(spark, sf_dir)
    return resize_raw_images(media, out_w=4, out_h=4).select(
        "media_id", "out_w", "out_h", "mean_px"
    )


@register(
    "multimodal_frame_sample",
    oracle=f"""
    SELECT doc_id AS media_id, 'image' AS kind,
           CAST(o // 64 AS INT) AS frame_idx, CAST(o AS INT) AS byte_offset
    FROM documents,
         unnest(range(0, {_IMG_W} * (strlen(text) // {_IMG_W}), 64)) AS t(o)
    """,
    doc="L5b: declarative frame sampling — posexplode over computed byte "
        "offsets (one row per sampled frame position, no Python); the "
        "fan-out a video frame-extract stage consumes. Offsets every 64 "
        "bytes over the truncated payload.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = doc_media(spark, sf_dir)
    return frame_sample(media, every_n_bytes=64)


_AUDIO_WIN = 64  # samples per analysis window


@register(
    "multimodal_audio_rms",
    oracle=f"""
    WITH d AS (
        SELECT doc_id AS media_id,
               substr(text, 1, {_IMG_W} * (strlen(text) // {_IMG_W})) AS t
        FROM documents
    ), s AS (
        SELECT media_id,
               list_transform(range(0, strlen(t) // 2), i ->
                   CASE WHEN ord(substr(t, 2*i + 2, 1)) >= 128
                        THEN ord(substr(t, 2*i + 1, 1)) + 256 * ord(substr(t, 2*i + 2, 1)) - 65536
                        ELSE ord(substr(t, 2*i + 1, 1)) + 256 * ord(substr(t, 2*i + 2, 1))
                   END) AS smp
        FROM d
    ), w AS (
        SELECT media_id, (len(smp) // {_AUDIO_WIN}) AS n_win, smp
        FROM s WHERE len(smp) >= {_AUDIO_WIN}
    ), win AS (
        SELECT media_id, k AS window_idx,
               list_slice(smp, k * {_AUDIO_WIN} + 1, (k + 1) * {_AUDIO_WIN}) AS ws
        FROM w, unnest(range(0, n_win)) AS t(k)
    )
    SELECT media_id, CAST(window_idx AS BIGINT) AS window_idx,
           printf('%.4f',
                  sqrt(list_sum(list_transform(ws, x -> CAST(x * x AS DOUBLE)))
                       / {_AUDIO_WIN}.0)) AS rms,
           printf('%.6f',
                  list_sum(list_transform(range(0, {_AUDIO_WIN} - 1), i ->
                      CASE WHEN (ws[i + 1] < 0) <> (ws[i + 2] < 0) THEN 1 ELSE 0 END))
                  / {_AUDIO_WIN - 1}.0) AS zcr
    FROM win
    """,
    doc="L5c: REAL raw-PCM int16 decode + windowed RMS / zero-crossing "
        "rate (mapInPandas, vectorized numpy) over the same derived media "
        "frame read as little-endian samples; the oracle rebuilds each "
        "int16 from its byte pair in SQL. Both engines divide integer "
        "sums by the same power-of-two window then format the identical "
        "double, so the fixed-point renderings agree bit-for-bit.",
)
def multimodal_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = doc_media(spark, sf_dir)
    return audio_window_features(media, window=_AUDIO_WIN)


# ---------------------------------------------------------------------------
# Compressed-codec round-trips — REAL PNG / WAV bytes through the pure
# stdlib+numpy decoders in operators/codecs.py (round 3; closes the
# round-2 "codec decode is a stub" gap for formats a bare container can
# decode). The fixture queries synthesize payloads from the documents
# table, ENCODE them to genuine compressed containers, then DECODE them
# back inside the same Arrow batch; because the round trip is the
# identity on pixels/samples, the DuckDB oracle can hash-check the
# result by replaying the pre-codec byte arithmetic in SQL.
# ---------------------------------------------------------------------------

CODEC_IMG_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("codec", StringType(), False),
        StructField("mean_px", StringType(), True),  # formatted, engine-neutral
    ]
)


@register(
    "multimodal_png_roundtrip",
    oracle=f"""
    WITH d AS (
        SELECT doc_id AS media_id, (strlen(text) // {_IMG_W}) AS h,
               substr(text, 1, {_IMG_W} * (strlen(text) // {_IMG_W})) AS t
        FROM documents
    )
    SELECT media_id, 'png' AS codec,
           CASE WHEN h > 0 THEN printf('%.4f',
                list_sum(list_transform(range(1, strlen(t) + 1),
                                        i -> ord(substr(t, i, 1))))
                / CAST(strlen(t) AS DOUBLE))
           END AS mean_px
    FROM d
    """,
    doc="L5d: REAL compressed-codec round-trip — each doc-derived gray "
        "bitmap is PNG-ENCODED (zlib deflate, Up filter) then PNG-DECODED "
        "by the pure stdlib decoder (codecs.py: chunk walk, inflate, "
        "per-scanline unfilter) inside one mapInPandas batch; the mean "
        "pixel of the decoded image must equal the mean byte of the "
        "original payload (round-trip identity), which the oracle "
        "computes directly in SQL. Docs shorter than one scanline "
        "dead-letter to NULL on both engines. At 100 TB this is the "
        "image-ingest decode stage: Arrow-batched, driver-free, "
        "per-format capability-guarded.",
)
def multimodal_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json

    import numpy as np

    from hyperswitch_data_backfill_spark.operators import codecs

    media = doc_media(spark, sf_dir)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means = []
            for payload, meta in zip(pdf["payload"], pdf["meta_json"]):
                try:
                    m = json.loads(meta)
                    w, h = int(m["width"]), int(m["height"])
                    if h <= 0:
                        raise ValueError("empty image")
                    img = np.frombuffer(bytes(payload), dtype=np.uint8).reshape(h, w)
                    png = codecs.encode_png(img, filter_type=2)
                    back = codecs.decode_png(png)
                    if back.shape != img.shape:
                        raise ValueError("roundtrip shape mismatch")
                    means.append(f"{back.mean():.4f}")
                except Exception:
                    means.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "codec": "png",
                    "mean_px": means,
                }
            )

    return media.mapInPandas(gen, CODEC_IMG_SCHEMA)


CODEC_WAV_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("codec", StringType(), False),
        StructField("n_samples", LongType(), False),
        StructField("rms", StringType(), True),  # formatted, engine-neutral
    ]
)


@register(
    "multimodal_wav_roundtrip",
    oracle=f"""
    WITH d AS (
        SELECT doc_id AS media_id,
               substr(text, 1, {_IMG_W} * (strlen(text) // {_IMG_W})) AS t
        FROM documents
    ), s AS (
        SELECT media_id,
               list_transform(range(0, strlen(t) // 2), i ->
                   CASE WHEN ord(substr(t, 2*i + 2, 1)) >= 128
                        THEN ord(substr(t, 2*i + 1, 1)) + 256 * ord(substr(t, 2*i + 2, 1)) - 65536
                        ELSE ord(substr(t, 2*i + 1, 1)) + 256 * ord(substr(t, 2*i + 2, 1))
                   END) AS smp
        FROM d
    )
    SELECT media_id, 'wav' AS codec,
           CAST(len(smp) AS BIGINT) AS n_samples,
           CASE WHEN len(smp) > 0 THEN printf('%.4f',
                sqrt(CAST(list_sum(list_transform(smp, x -> x * x)) AS DOUBLE)
                     / len(smp)))
           END AS rms
    FROM s
    """,
    doc="L5e: REAL audio-container round-trip — doc-derived int16 PCM is "
        "packed into a genuine RIFF/WAV container (stdlib wave) and "
        "parsed back by codecs.decode_wav inside the same Arrow batch; "
        "full-stream RMS of the decoded samples must equal the RMS of "
        "the source byte pairs, which the oracle rebuilds in SQL "
        "(little-endian int16 from consecutive ords). Integer sums stay "
        "exact, both engines then format the identical double.",
)
def multimodal_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    import numpy as np

    from hyperswitch_data_backfill_spark.operators import codecs

    media = doc_media(spark, sf_dir)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ns, rmss = [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                b = b[: len(b) - (len(b) % 2)]
                pcm = np.frombuffer(b, dtype="<i2")
                if pcm.size == 0:
                    ns.append(0)
                    rmss.append(None)
                    continue
                wav = codecs.encode_wav(pcm, rate=16_000)
                back, rate = codecs.decode_wav(wav)
                back = back.ravel()
                if rate != 16_000 or not np.array_equal(back, pcm):
                    ns.append(int(pcm.size))
                    rmss.append(None)  # dead-letter: roundtrip mismatch
                    continue
                ss = int(np.sum(back.astype(np.int64) ** 2))
                rmss.append(f"{math.sqrt(ss / back.size):.4f}")
                ns.append(int(back.size))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "codec": "wav",
                    "n_samples": ns,
                    "rms": rmss,
                }
            )

    return media.mapInPandas(gen, CODEC_WAV_SCHEMA)
