"""Perceptual media near-dup dedup — image dHash and audio energy-hash
fingerprints + Hamming-banded pairing (r12 verdict next-round item 2,
extended to audio the same round).

Dedup existed for text (shingles/minhash/simhash — dedup.py) and for
embeddings (cosine LSH — similarity.py) but not for the decoded media
payloads themselves. The standard LLM-corpus image-dedup stage is
a difference hash (dHash): downsample to a tiny grid, emit one bit per
horizontally adjacent pixel pair (left > right), and call two images
near-duplicates when the 64-bit fingerprints are within a small Hamming
distance. Crops, re-encodes, and small pixel noise move few bits;
unrelated images differ in ~32. The audio twin (``audio_ehash``) is the
same construction over the ENERGY ENVELOPE: 65 equal time windows,
one bit per adjacent-window energy comparison — robust to low-level
noise and amplitude-preserving re-encodes, cheap enough to fingerprint
a 100 TB audio corpus in one mapInPandas pass.

Everything here is DETERMINISTIC INTEGER MATH — nearest-neighbor index
gathers and byte comparisons — so, unlike minhash/simhash over token
streams, the fingerprint itself is exact-oracle checkable: the DuckDB
oracle replays the identical byte-index arithmetic over the same
payload bytes (the doc_media convention multimodal.py established for
the codec roundtrips).

Pairing reuses dedup.py's pigeonhole machinery at 64 bits: 4 bands x
16 bits guarantee any pair at Hamming distance <= 3 collides in >= 1
band; candidates are generated bucket-locally after ONE shuffle on
(band, bits) — no self-join — and the exact ``bit_count(a ^ b)`` cut
runs as pure codegen on the candidate stream. Scale valves are the
same executed contract as simhash_pairs: uncapped mode fuses the
in-plan MAX_POSTING_LIST assert ahead of the k-squared stage; capped
mode (``max_bucket_members``) drops over-full buckets (flat-region
fingerprints a dedup_exact pass collapses upstream).

16-bit bands are the scale choice (not simhash's 8): expected bucket
size is n / 65536 per band, so a 10^9-image corpus lands ~15k per
bucket *on uniform fingerprints* — inside the single-task pair budget
— where 8-bit bands would melt at n/256. Real corpora skew (borders,
flat color), which is what the valves are for.

Reference anchor: the reference has no media surface at all (919-line
Rust ETL); this is north-star LLM-pipeline surface alongside L2/L3.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from hyperswitch_data_backfill_spark.catalog import load_table
from hyperswitch_data_backfill_spark.operators.dedup import guard_posting_buckets
from hyperswitch_data_backfill_spark.registry import register

DHASH_GRID = 8          # 8 rows x 9 sampled cols -> 64 comparison bits
DHASH_BANDS = 4         # 4 x 16-bit bands: pigeonhole covers Hamming <= 3
DHASH_MAX_HAMMING = 3

DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("dhash", LongType(), True),  # NULL = undecodable row
    ]
)


def _to_gray(img) -> "object":
    """(h, w[, ch]) uint8 -> (h, w) uint8 via integer ITU-R 601 luma.
    Integer-only so the fingerprint is bit-reproducible everywhere."""
    import numpy as np

    if img.ndim == 2:
        return img
    if img.ndim == 3 and img.shape[2] >= 3:
        r = img[:, :, 0].astype(np.uint32)
        g = img[:, :, 1].astype(np.uint32)
        b = img[:, :, 2].astype(np.uint32)
        return ((299 * r + 587 * g + 114 * b + 500) // 1000).astype(np.uint8)
    raise ValueError(f"unsupported image shape {img.shape}")


def _dhash_of(img, grid: int) -> int:
    """The dHash core: nearest-neighbor sample to grid x (grid+1),
    compare horizontal neighbors, pack row-major (bit k = r*grid + c).
    Returns the SIGNED 64-bit reinterpretation (Spark/DuckDB BIGINT)."""
    import numpy as np

    h, w = img.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ys = (np.arange(grid) * h) // grid
    xs = (np.arange(grid + 1) * w) // (grid + 1)
    small = img[np.ix_(ys, xs)].astype(np.int16)
    bits = (small[:, :-1] > small[:, 1:]).flatten()  # row-major, grid*grid
    fp = np.uint64(0)
    for k in np.nonzero(bits)[0]:
        fp |= np.uint64(1) << np.uint64(k)
    return int(fp.astype(np.int64))


def image_dhash(
    media: DataFrame, *, grid: int = DHASH_GRID, codec: str = "raw"
) -> DataFrame:
    """(media_id, dhash) perceptual fingerprints over a MEDIA_SCHEMA
    frame (mapInPandas, Arrow-batched; numpy index gathers per image,
    no per-pixel Python).

    ``codec="raw"``: payload = height x width uint8 bytes with dims in
    meta_json (the fixture convention). ``codec="png"``: payload is a
    PNG container decoded through codecs.decode_png (PIL fast path,
    stdlib fallback), RGB collapsed to integer luma. Malformed rows
    yield NULL dhash — dead-letter, never a task failure (the 100 TB
    decode-stage contract multimodal.py documents)."""
    if codec not in ("raw", "png"):
        raise ValueError(f"codec must be raw|png, got {codec!r}")
    if grid * grid != 64:
        raise ValueError("grid must be 8: dhash packs 64 bits into a BIGINT")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        if codec == "png":
            from hyperswitch_data_backfill_spark.operators.codecs import decode_png

        for pdf in batches:
            out = []
            for payload, meta in zip(pdf["payload"], pdf["meta_json"]):
                try:
                    if codec == "png":
                        img = _to_gray(decode_png(bytes(payload)))
                    else:
                        m = json.loads(meta) if meta else {}
                        w, h = int(m["width"]), int(m["height"])
                        img = np.frombuffer(bytes(payload), dtype=np.uint8)
                        if img.size != w * h or h == 0 or w == 0:
                            raise ValueError("payload size != width*height")
                        img = img.reshape(h, w)
                    out.append(_dhash_of(img, grid))
                except Exception:
                    out.append(None)
            # NULLABLE Int64, never inferred: a plain list with one None
            # infers float64 and silently destroys the low ~11 bits of
            # every fingerprint in the batch (float64 has a 53-bit
            # mantissa) — caught by the audio twin's oracle, latent here
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dhash": pd.array(out, dtype="Int64"),
                }
            )

    return media.mapInPandas(gen, DHASH_SCHEMA)


def fingerprint_pairs(
    sigs: DataFrame,
    *,
    id_col: str = "media_id",
    fp_col: str = "dhash",
    fp_bits: int = 64,
    n_bands: int = DHASH_BANDS,
    max_hamming: int = DHASH_MAX_HAMMING,
    max_bucket_members: int | None = None,
    op: str = "image_dhash_pairs",
) -> DataFrame:
    """Banded Hamming-pair generation over 64-bit BIGINT fingerprints —
    dedup.simhash_pairs generalized to wider fingerprints.

    Pigeonhole: ``max_hamming`` must stay below ``n_bands`` or the pair
    set would silently lose completeness (a pair differing in n_bands
    bits can miss every band). One shuffle on (band, bits); candidate
    pairs are emitted inside each bucket; the exact bit_count cut runs
    BEFORE the dropDuplicates shuffle so only O(near-dup) pairs shuffle
    (the r10 simhash lesson). NULL fingerprints (dead-letter decodes)
    are excluded — an undecodable image pairs with nothing.

    Skew contract, executed: uncapped -> in-plan MAX_POSTING_LIST
    assert fused ahead of the k-squared stage; capped -> over-full
    buckets dropped (standard max-df stance: flat-fingerprint floods
    belong to dedup_exact upstream)."""
    if max_hamming >= n_bands:
        raise ValueError(
            f"max_hamming={max_hamming} >= n_bands={n_bands} voids the "
            "pigeonhole guarantee — a pair can differ in every band"
        )
    if fp_bits % n_bands != 0:
        raise ValueError(f"fp_bits={fp_bits} not divisible by n_bands={n_bands}")
    band_bits = fp_bits // n_bands
    mask = (1 << band_bits) - 1
    fp = F.col(fp_col)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(fp, b * band_bits).bitwiseAND(F.lit(mask)).alias("bits"),
            )
            for b in range(n_bands)
        ]
    )
    banded = (
        sigs.filter(fp.isNotNull())
        .select(F.col(id_col).alias("_id"), fp.alias("_fp"), F.explode(bands).alias("b"))
        .select("_id", "_fp", "b.band", "b.bits")
    )
    buckets = (
        banded.groupBy("band", "bits")
        .agg(F.sort_array(F.collect_list(F.struct("_id", "_fp"))).alias("members"))
        .filter(F.size("members") > 1)
    )
    if max_bucket_members is None:
        buckets = guard_posting_buckets(buckets, F.size("members"), op)
    else:
        buckets = buckets.filter(F.size("members") <= max_bucket_members)
    # Hamming cut fused into the pair expansion (r16, guide §5 — the
    # dedup.simhash_pairs change, same proof): only pairs passing the
    # bit_count cut are allocated as structs; the r15 form materialized
    # the full k(k-1)/2 candidate array per bucket before filtering
    # (the x100 scale rehearsal put 10.9 M of those through this very
    # expression). Pair set unchanged — the generator-level filter is
    # the identical bit_count(xor) <= max_hamming predicate.
    pair_structs = F.expr(
        f"""
        flatten(transform(sequence(0, size(members) - 2), i ->
            transform(
                filter(sequence(i + 1, size(members) - 1), j ->
                    bit_count(members[i]._fp ^ members[j]._fp)
                        <= {int(max_hamming)}),
                j -> struct(members[i] AS a, members[j] AS b))))
        """
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select(
            F.col("p.a._id").alias("id_a"),
            F.col("p.b._id").alias("id_b"),
            F.col("p.a._fp").alias("fp_a"),
            F.col("p.b._fp").alias("fp_b"),
        )
        .withColumn("hamming", hamming)
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", "hamming")
    )


def neardup_images(
    media: DataFrame,
    *,
    codec: str = "raw",
    max_hamming: int = DHASH_MAX_HAMMING,
    max_bucket_members: int | None = None,
) -> DataFrame:
    """media frame -> (id_a, id_b, hamming) perceptual near-dup pairs:
    the one-call composition (decode -> dHash -> banded pairing)."""
    return fingerprint_pairs(
        image_dhash(media, codec=codec),
        max_hamming=max_hamming,
        max_bucket_members=max_bucket_members,
    )


# ----------------------------------------------------- fixture queries
#
# Same oracle convention as multimodal.py: the media frame derives from
# `documents` (payload = ASCII text bytes, w=8, h=strlen//8), so DuckDB
# can replay the EXACT byte-index arithmetic with ord(substr(...)).
# The 64-bit pack crosses BIGINT's sign bit, so the oracle accumulates
# in HUGEINT and applies two's complement for bit 63 explicitly.

_DHASH_ORACLE_FP_CTE = """
    d AS (
        SELECT doc_id, text, (strlen(text) // 8) AS h FROM documents
    ), bits AS (
        SELECT doc_id, k,
               CASE WHEN ord(substr(text,
                        (((k // 8) * h) // 8) * 8 + (((k % 8) * 8) // 9) + 1, 1))
                   > ord(substr(text,
                        (((k // 8) * h) // 8) * 8 + ((((k % 8) + 1) * 8) // 9) + 1, 1))
               THEN 1 ELSE 0 END AS bit
        FROM d, range(64) t(k)
        WHERE h > 0
    ), fp AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN k < 63 THEN bit * (1::HUGEINT << k)
                             ELSE -bit * (1::HUGEINT << 63) END) AS BIGINT)
                   AS dhash
        FROM bits GROUP BY doc_id
    )
"""


@register(
    "dedup_image_dhash",
    oracle=f"""
    WITH {_DHASH_ORACLE_FP_CTE}
    SELECT d.doc_id AS media_id, fp.dhash
    FROM d LEFT JOIN fp USING (doc_id)
    """,
    doc="L5/L2 bridge: 64-bit dHash perceptual fingerprints over the "
        "documents-derived raw-bitmap media frame — REAL decode + "
        "nearest-neighbor 8x9 sample + neighbor-compare bit pack in "
        "vectorized numpy (mapInPandas); the oracle replays the "
        "identical integer byte arithmetic in SQL including the "
        "two's-complement bit-63 pack, so the fingerprint math is "
        "hash-checked bit for bit. Sub-scanline docs dead-letter to "
        "NULL on both engines.",
)
def dedup_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hyperswitch_data_backfill_spark.operators.multimodal import doc_media

    return image_dhash(doc_media(spark, sf_dir)).select("media_id", "dhash")


@register(
    "dedup_image_dhash_pairs",
    oracle=f"""
    WITH {_DHASH_ORACLE_FP_CTE},
    bands AS (
        SELECT doc_id, dhash, b, (dhash >> (b * 16)) & 65535 AS bits
        FROM fp, range(4) t(b)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               a.dhash AS fa, b.dhash AS fb
        FROM bands a JOIN bands b
          ON a.b = b.b AND a.bits = b.bits AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, bit_count(xor(fa, fb)) AS hamming
    FROM cand WHERE bit_count(xor(fa, fb)) <= 3
    """,
    doc="L2 for images: the Hamming<=3 perceptual near-dup pair set "
        "over the dHash fingerprints — banded 4x16-bit pigeonhole "
        "bucketing (one shuffle, bucket-local pair generation, exact "
        "bit_count cut in codegen) with the executed MAX_POSTING_LIST "
        "valve. The oracle builds the SAME fingerprints in SQL and "
        "joins band-equal candidates, which pigeonhole makes exactly "
        "the Hamming<=3 pair set — so banding COMPLETENESS is "
        "hash-checked, not assumed.",
)
def dedup_image_dhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hyperswitch_data_backfill_spark.operators.multimodal import doc_media

    return neardup_images(doc_media(spark, sf_dir))


# ------------------------------------------------------------ audio twin

EHASH_WINDOWS = 65      # 65 windows -> 64 adjacent energy comparisons

EHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("ehash", LongType(), True),  # NULL = undecodable/short
    ]
)


def _ehash_of(samples) -> int:
    """Energy-envelope hash: split the sample stream into EHASH_WINDOWS
    equal windows (nearest-neighbor boundaries), bit k = energy of
    window k > energy of window k+1, packed row-major like dHash.
    Integer-only (int64 sums of int16 squares — exact below ~8.6e9
    samples per payload, far past any single media file), so the
    fingerprint is bit-reproducible across engines."""
    import numpy as np

    n = int(samples.size)
    if n < EHASH_WINDOWS:
        raise ValueError("too few samples for the energy envelope")
    bounds = (np.arange(EHASH_WINDOWS + 1, dtype=np.int64) * n) // EHASH_WINDOWS
    csum = np.concatenate(
        ([0], np.cumsum(samples.astype(np.int64) ** 2))
    )
    energy = csum[bounds[1:]] - csum[bounds[:-1]]
    bits = energy[:-1] > energy[1:]
    fp = np.uint64(0)
    for k in np.nonzero(bits)[0]:
        fp |= np.uint64(1) << np.uint64(k)
    return int(fp.astype(np.int64))


def audio_ehash(
    media: DataFrame, *, codec: str = "raw"
) -> DataFrame:
    """(media_id, ehash) energy-envelope fingerprints over a media frame
    (mapInPandas, Arrow-batched; one vectorized cumsum per payload).

    ``codec="raw"``: payload = little-endian int16 PCM (the fixture
    convention, multimodal.py audio_window_features). ``codec="wav"``:
    payload is a RIFF/WAV container decoded through codecs.decode_wav,
    channels mixed by integer sum (deterministic). Payloads shorter
    than EHASH_WINDOWS samples or undecodable dead-letter to NULL."""
    if codec not in ("raw", "wav"):
        raise ValueError(f"codec must be raw|wav, got {codec!r}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        if codec == "wav":
            from hyperswitch_data_backfill_spark.operators.codecs import decode_wav

        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                try:
                    raw = bytes(payload)
                    if codec == "wav":
                        pcm, _rate = decode_wav(raw)
                        samples = pcm.astype(np.int64).sum(axis=1)
                    else:
                        samples = np.frombuffer(
                            raw[: 2 * (len(raw) // 2)], dtype="<i2"
                        )
                    out.append(_ehash_of(samples))
                except Exception:
                    out.append(None)
            # nullable Int64 — see image_dhash: float64 inference on a
            # None-bearing batch truncates 64-bit fingerprints
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "ehash": pd.array(out, dtype="Int64"),
                }
            )

    return media.mapInPandas(gen, EHASH_SCHEMA)


def neardup_audio(
    media: DataFrame,
    *,
    codec: str = "raw",
    max_hamming: int = DHASH_MAX_HAMMING,
    max_bucket_members: int | None = None,
) -> DataFrame:
    """media frame -> (id_a, id_b, hamming) audio near-dup pairs —
    the audio composition (decode -> energy hash -> banded pairing);
    the banding/valve machinery is fingerprint_pairs, identical to the
    image path."""
    return fingerprint_pairs(
        audio_ehash(media, codec=codec),
        fp_col="ehash",
        max_hamming=max_hamming,
        max_bucket_members=max_bucket_members,
        op="audio_ehash_pairs",
    )


# Oracle CTE: the fixture media frame reads document text bytes as
# little-endian int16 PCM (the multimodal_audio_rms convention), so the
# envelope arithmetic replays exactly: byte-pair sample reconstruction,
# (k*n)//65 window boundaries, int64 square sums, two's-complement pack.
_EHASH_ORACLE_FP_CTE = f"""
    d AS (
        SELECT doc_id, substr(text, 1, 8 * (strlen(text) // 8)) AS t
        FROM documents
    ), s AS (
        SELECT doc_id,
               list_transform(range(0, strlen(t) // 2), i ->
                   CASE WHEN ord(substr(t, 2*i + 2, 1)) >= 128
                        THEN ord(substr(t, 2*i + 1, 1))
                             + 256 * ord(substr(t, 2*i + 2, 1)) - 65536
                        ELSE ord(substr(t, 2*i + 1, 1))
                             + 256 * ord(substr(t, 2*i + 2, 1))
                   END) AS smp
        FROM d
    ), e AS (
        SELECT doc_id,
               [list_sum(list_transform(
                    list_slice(smp, (k * len(smp)) // {EHASH_WINDOWS} + 1,
                               ((k + 1) * len(smp)) // {EHASH_WINDOWS}),
                    x -> CAST(x AS BIGINT) * x))
                FOR k IN range({EHASH_WINDOWS})] AS eng
        FROM s WHERE len(smp) >= {EHASH_WINDOWS}
    ), bits AS (
        SELECT doc_id, k,
               CASE WHEN eng[k + 1] > eng[k + 2] THEN 1 ELSE 0 END AS bit
        FROM e, range(64) t(k)
    ), fp AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN k < 63 THEN bit * (1::HUGEINT << k)
                             ELSE -bit * (1::HUGEINT << 63) END) AS BIGINT)
                   AS ehash
        FROM bits GROUP BY doc_id
    )
"""


@register(
    "dedup_audio_ehash",
    oracle=f"""
    WITH {_EHASH_ORACLE_FP_CTE}
    SELECT s.doc_id AS media_id, fp.ehash
    FROM s LEFT JOIN fp USING (doc_id)
    """,
    doc="L5/L2 bridge, audio: 64-bit energy-envelope fingerprints over "
        "the documents-derived int16 PCM media frame — one vectorized "
        "int64 cumsum per payload (mapInPandas); the oracle replays the "
        "identical integer arithmetic in SQL (byte-pair sample "
        "reconstruction, (k*n)//65 boundaries, square sums, "
        "two's-complement pack). Sub-65-sample payloads dead-letter to "
        "NULL on both engines.",
)
def dedup_audio_ehash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hyperswitch_data_backfill_spark.operators.multimodal import doc_media

    return audio_ehash(doc_media(spark, sf_dir)).select("media_id", "ehash")


@register(
    "dedup_audio_ehash_pairs",
    oracle=f"""
    WITH {_EHASH_ORACLE_FP_CTE},
    bands AS (
        SELECT doc_id, ehash, b, (ehash >> (b * 16)) & 65535 AS bits
        FROM fp, range(4) t(b)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               a.ehash AS fa, b.ehash AS fb
        FROM bands a JOIN bands b
          ON a.b = b.b AND a.bits = b.bits AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, bit_count(xor(fa, fb)) AS hamming
    FROM cand WHERE bit_count(xor(fa, fb)) <= 3
    """,
    doc="L2 for audio: the Hamming<=3 energy-envelope near-dup pair set "
        "— same banded 4x16-bit pigeonhole machinery (and executed "
        "valve) as the image path; the oracle builds the SAME "
        "fingerprints in SQL and band-joins, which pigeonhole makes "
        "exactly the Hamming<=3 set, so banding completeness is "
        "hash-checked for the audio leg too.",
)
def dedup_audio_ehash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hyperswitch_data_backfill_spark.operators.multimodal import doc_media

    return neardup_audio(doc_media(spark, sf_dir))


# ------------------------------------------------------------ video twin

VHASH_SAMPLE_FRAMES = 4   # frames sampled per video (nearest-neighbor)
# composite frame-id stride: media_id * stride + sampled-slot index.
# Valid while media_id < 2^53 / stride — asserted at plan build.
_VHASH_ID_STRIDE = 1 << 10

VHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), True),  # ORIGINAL frame index
        StructField("slot", LongType(), True),       # sampled-slot ordinal
        StructField("dhash", LongType(), True),
    ]
)


def video_frame_dhash(
    media: DataFrame, *, sample_frames: int = VHASH_SAMPLE_FRAMES
) -> DataFrame:
    """(media_id, frame_idx, slot, dhash) — per-sampled-frame dHash over
    video payloads: frame-major ``frames x height x width`` uint8 raw
    bytes with ``{"width","height","frames"}`` in meta_json, or (r14) a
    real AVI container (sniffed by RIFF magic; dims from its strf
    header — uncompressed-DIB streams decode natively, MJPG via the
    PIL capability gate in codecs.decode_avi). Frame
    sampling is nearest-neighbor over the frame axis ((s*f)//n), the
    video analogue of the dHash pixel grid — a re-encoded or slightly
    perturbed clip samples the SAME frames and lands Hamming-near per
    slot. Undecodable/short payloads dead-letter to one NULL row (the
    decode-stage contract). One row per sampled frame: fan-out is the
    fixed ``sample_frames``, not clip length."""
    if sample_frames < 1:
        raise ValueError("sample_frames must be >= 1")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, fidx, slots, hashes = [], [], [], []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta_json"]
            ):
                try:
                    raw = bytes(payload)
                    if raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
                        # real container ingest (r14): dims come from the
                        # AVI's own strf header, meta_json not required
                        from hyperswitch_data_backfill_spark.operators import (
                            codecs as _codecs,
                        )

                        vid = _codecs.decode_avi(raw)
                        f = vid.shape[0]
                    else:
                        m = json.loads(meta) if meta else {}
                        w, h, f = (int(m["width"]), int(m["height"]),
                                   int(m["frames"]))
                        vid = np.frombuffer(raw, dtype=np.uint8)
                        if vid.size != w * h * f or min(w, h, f) <= 0:
                            raise ValueError(
                                "payload size != width*height*frames")
                        vid = vid.reshape(f, h, w)
                    picks = (np.arange(sample_frames, dtype=np.int64) * f) // sample_frames
                    for slot, fi in enumerate(picks):
                        ids.append(int(media_id))
                        fidx.append(int(fi))
                        slots.append(slot)
                        hashes.append(_dhash_of(vid[fi], DHASH_GRID))
                except Exception:
                    ids.append(int(media_id))
                    fidx.append(None)
                    slots.append(None)
                    hashes.append(None)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": pd.array(fidx, dtype="Int64"),
                    "slot": pd.array(slots, dtype="Int64"),
                    # nullable Int64 — the audio-oracle lesson: float64
                    # inference truncates 64-bit fingerprints
                    "dhash": pd.array(hashes, dtype="Int64"),
                }
            )

    return media.mapInPandas(gen, VHASH_SCHEMA)


def neardup_videos(
    media: DataFrame,
    *,
    sample_frames: int = VHASH_SAMPLE_FRAMES,
    max_hamming: int = DHASH_MAX_HAMMING,
    min_frame_matches: int = 1,
    max_bucket_members: int | None = None,
) -> DataFrame:
    """media frame -> (id_a, id_b, n_frame_matches) video near-dup
    pairs: per-sampled-frame dHash, frame-level Hamming banding
    (fingerprint_pairs over a composite frame id — same machinery and
    executed valve as the image/audio legs), then pairs aggregated to
    the video level counting DISTINCT matching frame-slot pairs. Frames
    may match across different slots (a clipped or re-cut video aligns
    its content at a different sampled position), same-video frame
    collisions are dropped. ``min_frame_matches`` is the clip-level
    confidence knob: 1 = any shared frame (containment detection),
    sample_frames = whole-clip duplication."""
    if sample_frames > _VHASH_ID_STRIDE:
        raise ValueError(
            f"sample_frames={sample_frames} exceeds the composite-id "
            f"stride {_VHASH_ID_STRIDE}"
        )
    frames = video_frame_dhash(media, sample_frames=sample_frames)
    composite = (
        frames.filter(F.col("dhash").isNotNull())
        # in-plan guard, the guard_posting_buckets idiom (assert_true is
        # NULL on success, so isNull() keeps every legal row and the
        # filter can't be constant-folded away): composite frame ids
        # must be collision-free
        .filter(
            F.assert_true(
                (F.col("media_id") >= 0)
                & (F.col("media_id") < F.lit((1 << 53) // _VHASH_ID_STRIDE)),
                F.lit(
                    "neardup_videos: media_id out of the collision-free "
                    f"composite-id range [0, 2^53/{_VHASH_ID_STRIDE})"
                ),
            ).isNull()
        )
        .select(
            (F.col("media_id") * _VHASH_ID_STRIDE + F.col("slot")).alias("fid"),
            "dhash",
        )
    )
    pairs = fingerprint_pairs(
        composite,
        id_col="fid",
        max_hamming=max_hamming,
        max_bucket_members=max_bucket_members,
        op="video_vhash_pairs",
    )
    vid_a = F.expr(f"id_a div {_VHASH_ID_STRIDE}")   # integer div, no
    vid_b = F.expr(f"id_b div {_VHASH_ID_STRIDE}")   # double round-trip
    return (
        pairs.select(
            F.least(vid_a, vid_b).alias("va"),
            F.greatest(vid_a, vid_b).alias("vb"),
            F.col("id_a").alias("fa"),
            F.col("id_b").alias("fb"),
        )
        .filter(F.col("va") != F.col("vb"))
        .groupBy(F.col("va").alias("id_a"), F.col("vb").alias("id_b"))
        .agg(F.count_distinct("fa", "fb").cast("bigint").alias("n_frame_matches"))
        .filter(F.col("n_frame_matches") >= min_frame_matches)
    )


def doc_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → raw-video media frame: payload = text bytes truncated
    to 2 frames x frame_h x 8 (the doc_media convention extended with a
    frame axis), meta carries {width, height, frames}. Docs shorter
    than two 8-byte scanlines (frame_h = 0) keep their full payload and
    an invalid meta — the operator dead-letters them, mirroring the
    oracle's NULL row."""
    docs = load_table(spark, sf_dir, "documents")
    fh = F.expr("(octet_length(text) div 8) div 2")
    usable = fh * 16
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.encode(F.expr(
            "substring(text, 1, 16 * ((octet_length(text) div 8) div 2))"
        ), "UTF-8").alias("payload"),
        F.to_json(
            F.struct(
                F.lit(8).alias("width"),
                fh.cast("int").alias("height"),
                F.lit(2).alias("frames"),
            )
        ).alias("meta_json"),
    )


_VHASH_ORACLE_FP_CTE = """
    d AS (
        SELECT doc_id, text, ((strlen(text) // 8) // 2) AS fh FROM documents
    ), fr AS (
        SELECT doc_id, text, fh, fi FROM d, range(2) t(fi) WHERE fh > 0
    ), bits AS (
        SELECT doc_id, fi, k,
               CASE WHEN ord(substr(text,
                        fi * 8 * fh + (((k // 8) * fh) // 8) * 8
                        + (((k % 8) * 8) // 9) + 1, 1))
                   > ord(substr(text,
                        fi * 8 * fh + (((k // 8) * fh) // 8) * 8
                        + ((((k % 8) + 1) * 8) // 9) + 1, 1))
               THEN 1 ELSE 0 END AS bit
        FROM fr, range(64) t(k)
    ), fp AS (
        SELECT doc_id, fi,
               CAST(SUM(CASE WHEN k < 63 THEN bit * (1::HUGEINT << k)
                             ELSE -bit * (1::HUGEINT << 63) END) AS BIGINT)
                   AS dhash
        FROM bits GROUP BY doc_id, fi
    )
"""


@register(
    "dedup_video_vhash",
    oracle=f"""
    WITH {_VHASH_ORACLE_FP_CTE}
    SELECT d.doc_id AS media_id, fp.fi AS frame_idx, fp.fi AS slot, fp.dhash
    FROM d LEFT JOIN fp USING (doc_id)
    """,
    doc="L5/L2 bridge, video: per-sampled-frame dHash over the "
        "documents-derived 2-frame raw-video media frame (one fan-out "
        "row per sampled frame, mapInPandas); the oracle replays the "
        "byte arithmetic with the frame-offset term, so the frame "
        "sampling + per-frame fingerprint math is hash-checked. "
        "Sub-2-scanline docs dead-letter to one NULL row on both "
        "engines.",
)
def dedup_video_vhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return video_frame_dhash(doc_video(spark, sf_dir), sample_frames=2)


@register(
    "dedup_video_vhash_pairs",
    oracle=f"""
    WITH {_VHASH_ORACLE_FP_CTE},
    bands AS (
        SELECT doc_id, fi, dhash, b, (dhash >> (b * 16)) & 65535 AS bits
        FROM fp, range(4) t(b)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS da, a.fi AS sa, a.dhash AS fa,
                        b.doc_id AS db, b.fi AS sb, b.dhash AS fb
        FROM bands a JOIN bands b
          ON a.b = b.b AND a.bits = b.bits
         AND (a.doc_id * 1024 + a.fi) < (b.doc_id * 1024 + b.fi)
        WHERE a.doc_id <> b.doc_id
    )
    SELECT LEAST(da, db) AS id_a, GREATEST(da, db) AS id_b,
           CAST(COUNT(DISTINCT CAST(da * 1024 + sa AS VARCHAR) || ':'
                               || CAST(db * 1024 + sb AS VARCHAR)) AS BIGINT)
               AS n_frame_matches
    FROM cand WHERE bit_count(xor(fa, fb)) <= 3
    GROUP BY 1, 2
    """,
    doc="L2 for video: clip-level near-dup pairs — per-frame dHash, "
        "frame-level 4x16 Hamming banding over composite frame ids "
        "(same machinery and executed valve as image/audio), pairs "
        "aggregated per video with the DISTINCT matching-frame count; "
        "cross-slot matches allowed (a re-cut clip aligns content at a "
        "different sampled position). The oracle band-joins the SAME "
        "frame fingerprints, so frame-banding completeness AND the "
        "clip-level aggregation are hash-checked.",
)
def dedup_video_vhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return neardup_videos(
        doc_video(spark, sf_dir), sample_frames=2, min_frame_matches=1
    )
