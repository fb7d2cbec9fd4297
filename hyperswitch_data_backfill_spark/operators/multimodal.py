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
