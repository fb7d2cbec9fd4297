"""Real compressed-codec decode for multimodal payloads — SURVEY §2.11 L5.

Round 2 shipped the decode seam as an honest stub (`NotImplementedError`
without PIL/librosa). This module closes it for the formats a stdlib +
numpy container CAN genuinely decode:

- **PNG** (image): pure zlib-inflate + per-scanline unfilter decoder for
  8-bit grayscale / RGB / RGBA non-interlaced images — every standard
  filter type (None/Sub/Up/Average/Paeth) implemented per the PNG spec
  (RFC 2083 §6). A matching minimal encoder exists so tests and fixture
  queries can round-trip real compressed bytes end to end.
- **WAV** (audio): RIFF/PCM container parse via the stdlib ``wave``
  module into an int16 numpy sample array (+ sample rate).

Formats that truly need an external library (JPEG, MP3/OGG) dispatch to
PIL / soundfile **when importable** (the same optional-dependency pattern
as functions/crypto.py's `cryptography` AES path) and raise a
clearly-marked ``NotImplementedError`` otherwise — the capability guard
is now per-format, not blanket.

Reference parity note: the reference engine (919 LoC Rust,
juspay/hyperswitch-data-backfill) has no media path at all; this is
north-star surface for LLM training-data pipelines, per the build brief.
All decoders are driver-free: they run inside Arrow-batched mapInPandas
stages over binary columns (see operators/multimodal.py).
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
JPEG_MAGIC = b"\xff\xd8\xff"
RIFF_MAGIC = b"RIFF"

# PNG color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff(payload: bytes) -> str:
    """Identify a payload's container by magic bytes."""
    if payload.startswith(PNG_MAGIC):
        return "png"
    if payload.startswith(JPEG_MAGIC):
        return "jpeg"
    if payload.startswith(RIFF_MAGIC) and payload[8:12] == b"WAVE":
        return "wav"
    if payload.startswith(RIFF_MAGIC) and payload[8:12] == b"AVI ":
        return "avi"
    return "raw"


# ---------------------------------------------------------------- PNG --


def decode_png(payload: bytes, prefer_pil: bool = True) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to (h, w) or (h, w, ch) uint8.

    Fast path: when PIL is importable (and ``prefer_pil``), decode via
    its native C codec — per-pixel Python never touches the hot path.
    Fallback is the pure-stdlib decoder below; pytest cross-checks the
    two byte-identical on every filter type when PIL is present, so the
    fallback stays honest."""
    if prefer_pil and payload.startswith(PNG_MAGIC):
        try:
            from PIL import Image  # optional fast path, stdlib fallback below
        except ImportError:
            pass
        else:
            return np.asarray(Image.open(io.BytesIO(payload)))
    return _decode_png_stdlib(payload)


def _decode_png_stdlib(payload: bytes) -> np.ndarray:
    """Pure stdlib PNG decode: chunk walk -> zlib inflate -> per-scanline
    unfilter. Filters 0/2 are fully vectorized; Sub collapses to a
    channel-wise prefix sum (cumsum mod 256); Average/Paeth carry a
    genuinely serial in-scanline dependency and run as bounded pure-int
    loops (inside one Arrow batch — slow path only, see decode_png)."""
    if not payload.startswith(PNG_MAGIC):
        raise ValueError("not a PNG payload")
    pos, w = len(PNG_MAGIC), None
    idat = bytearray()
    h = bit_depth = color_type = interlace = None
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or color_type not in _PNG_CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"PNG variant not supported (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace}) — 8-bit non-interlaced gray/RGB/RGBA only"
        )
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            # cur[x] = line[x] + cur[x-ch] is, per channel, a prefix sum
            # of the deltas — cumsum in int64 then mod 256 is exact
            cur = line
            for c in range(ch):
                cur[c::ch] = (
                    np.cumsum(line[c::ch], dtype=np.int64) & 0xFF
                ).astype(np.uint8)
        elif ftype == 2:  # Up
            cur = (line + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            # serial along the scanline (left operand is the just-decoded
            # pixel); pure-int Python list loop — no per-pixel numpy
            # scalar overhead on the fallback path
            vals = line.tolist()
            up = prev.tolist()
            for x in range(stride):
                left = vals[x - ch] if x >= ch else 0
                vals[x] = (vals[x] + ((left + up[x]) >> 1)) & 0xFF
            cur = np.asarray(vals, dtype=np.uint8)
        elif ftype == 4:  # Paeth
            vals = line.tolist()
            up = prev.tolist()
            for x in range(stride):
                left = vals[x - ch] if x >= ch else 0
                ul = up[x - ch] if x >= ch else 0
                b = up[x]
                p = left + b - ul
                pa, pb, pc = abs(p - left), abs(p - b), abs(p - ul)
                if pa <= pb and pa <= pc:
                    pred = left
                elif pb <= pc:
                    pred = b
                else:
                    pred = ul
                vals[x] = (vals[x] + pred) & 0xFF
            cur = np.asarray(vals, dtype=np.uint8)
        else:
            raise ValueError(f"PNG bad filter type {ftype}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal PNG encoder (8-bit gray/RGB/RGBA, one IDAT, fixed filter).

    Exists so tests and fixture queries can synthesize REAL compressed
    payloads deterministically; zlib level 6 output is bit-stable for a
    given input across platforms (same zlib algorithm/version in CPython).
    """
    if img.dtype != np.uint8:
        raise ValueError("uint8 images only")
    if img.ndim == 2:
        h, w, ch, color_type = *img.shape, 1, 0
        flat = img.reshape(h, w)
    elif img.ndim == 3 and img.shape[2] in (2, 3, 4):
        h, w, ch = img.shape
        color_type = {2: 4, 3: 2, 4: 6}[ch]
        flat = img
    else:
        raise ValueError("expected (h,w) or (h,w,{2,3,4}) array")
    if filter_type not in (0, 1, 2):
        raise ValueError("encoder supports filter 0/1/2 only")
    stride = w * ch
    rows = flat.reshape(h, stride)
    scan = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        cur = rows[y]
        scan.append(filter_type)
        if filter_type == 0:
            scan.extend(cur.tobytes())
        elif filter_type == 1:
            shifted = np.zeros_like(cur)
            shifted[ch:] = cur[:-ch]
            scan.extend(((cur - shifted) & 0xFF).astype(np.uint8).tobytes())
        else:  # 2: Up
            scan.extend(((cur - prev) & 0xFF).astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan), 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------- WAV --


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse a RIFF/WAV container to (int16 samples [n, channels], rate)."""
    with wave_open(payload) as wf:
        n, ch, width = wf.getnframes(), wf.getnchannels(), wf.getsampwidth()
        if width != 2:
            raise NotImplementedError("16-bit PCM WAV only")
        pcm = np.frombuffer(wf.readframes(n), dtype="<i2").reshape(-1, ch)
        return pcm, wf.getframerate()


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Write int16 samples [n] or [n, ch] into a RIFF/WAV container."""
    import wave

    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s.reshape(-1, 1)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(s.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(s.tobytes())
    return buf.getvalue()


def wave_open(payload: bytes):
    import wave

    return wave.open(io.BytesIO(payload), "rb")


# ------------------------------------------------- optional libraries --


def decode_image(payload: bytes) -> np.ndarray:
    """Decode a compressed image payload by magic: PNG natively; JPEG via
    PIL when importable, else a clearly-marked capability error."""
    kind = sniff(payload)
    if kind == "png":
        return decode_png(payload)
    if kind == "jpeg":
        try:
            from PIL import Image  # optional dependency, like crypto.py's AES
        except ImportError as exc:
            raise NotImplementedError(
                "JPEG decode requires PIL (pip install pillow); PNG works natively"
            ) from exc
        return np.asarray(Image.open(io.BytesIO(payload)).convert("L"))
    raise ValueError(f"not a recognized image container: {kind}")


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a compressed audio payload: WAV natively; other codecs via
    soundfile/librosa when importable."""
    if sniff(payload) == "wav":
        return decode_wav(payload)
    try:
        import soundfile  # optional dependency

        data, rate = soundfile.read(io.BytesIO(payload), dtype="int16")
        return np.atleast_2d(data).reshape(-1, 1) if data.ndim == 1 else data, rate
    except ImportError as exc:
        raise NotImplementedError(
            "non-WAV audio decode requires soundfile/librosa; WAV works natively"
        ) from exc


# ---------------------------------------------------------------- AVI --
#
# Real video CONTAINER ingest (r13 verdict stretch item 8): the video
# perceptual leg previously read frame-major raw clips only. AVI is the
# RIFF container (public OpenDML/Microsoft AVI spec): LIST 'hdrl'
# (avih main header + one 'strl' stream with strh/strf), LIST 'movi'
# with one '00db'/'00dc' chunk per frame, optional 'idx1'. Two codecs:
#
# - uncompressed DIB frames ('DIB '/biCompression=0): decoded NATIVELY
#   (numpy only) — 8-bit palettized (bottom-up rows, 4-byte stride,
#   palette-mapped to gray) and 24-bit BGR (integer-mean gray);
# - MJPG frames (each chunk a standalone JPEG): via PIL when
#   importable, else the per-format capability error — same gate as
#   decode_image's JPEG leg.
#
# The matching encoder writes standard 8-bit-DIB AVIs (grayscale
# palette, idx1 index) so tests and fixtures can round-trip real
# container bytes end to end, the PNG/WAV discipline.

AVI_DIB_FOURCC = b"DIB "
AVI_MJPG_FOURCC = b"MJPG"


def _riff_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, data_start, data_size) walking a RIFF chunk run;
    chunks are word-aligned (odd sizes padded by one byte)."""
    pos = start
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        data_start = pos + 8
        if data_start + size > end:
            raise ValueError(
                f"AVI: chunk {fourcc!r} overruns its parent "
                f"({data_start}+{size} > {end})")
        yield fourcc, data_start, size
        pos = data_start + size + (size & 1)


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """(f, h, w) uint8 grayscale → a standard uncompressed-DIB AVI
    (8-bit palettized video stream, grayscale palette, bottom-up rows
    padded to 4 bytes, idx1 keyframe index)."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 3:
        raise ValueError("encode_avi expects (frames, height, width)")
    f, h, w = frames.shape
    stride = (w + 3) & ~3
    frame_size = stride * h

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(data)) + data + (
            b"\x00" if len(data) & 1 else b"")

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1),        # dwMicroSecPerFrame
        frame_size * fps,                # dwMaxBytesPerSec
        0,                               # dwPaddingGranularity
        0x10,                            # AVIF_HASINDEX
        f, 0, 1, frame_size,             # totalframes/initial/streams/bufsz
        w, h, 0, 0, 0, 0,                # width/height/reserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H",
        b"vids", AVI_DIB_FOURCC, 0, 0, 0, 0,
        1, fps,                          # dwScale / dwRate → fps
        0, f, frame_size, 0xFFFFFFFF & -1, 0,
        0, 0, w & 0xFFFF, h & 0xFFFF,    # rcFrame
    )
    palette = b"".join(bytes((g, g, g, 0)) for g in range(256))
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, frame_size, 0, 0, 256, 0
    ) + palette
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_frames = []
    idx_entries = []
    offset = 4                           # relative to the 'movi' fourcc
    for i in range(f):
        rows = frames[i]
        if stride != w:
            rows = np.pad(rows, ((0, 0), (0, stride - w)))
        data = rows[::-1].tobytes()      # bottom-up, per BMP convention
        movi_frames.append(chunk(b"00db", data))
        idx_entries.append(struct.pack(
            b"<4sIII", b"00db", 0x10, offset, len(data)))
        offset += 8 + len(data) + (len(data) & 1)
    movi = lst(b"movi", b"".join(movi_frames))
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    return chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def _dib_frame_to_gray(
    data: bytes, w: int, h: int, bitcount: int,
    palette: np.ndarray | None, *, top_down: bool = False,
) -> np.ndarray:
    """One uncompressed DIB frame → (h, w) uint8 gray. Rows are
    bottom-up per BMP convention unless the header said biHeight < 0
    (``top_down`` — legal and common; silently mirroring those frames
    would break perceptual pairing, r14 review finding); stride padded
    to 4 bytes; 8-bit via palette lookup, 24-bit BGR via integer mean."""
    flip = slice(None) if top_down else slice(None, None, -1)
    if bitcount == 8:
        stride = (w + 3) & ~3
        if len(data) < stride * h:
            raise ValueError("AVI: 8-bit DIB frame shorter than h*stride")
        img = np.frombuffer(data, np.uint8, stride * h).reshape(h, stride)
        img = img[flip, :w]
        if palette is not None:
            # integer mean of the palette's (r, g, b) — identity for a
            # grayscale palette, deterministic for any other
            gray_lut = palette.astype(np.uint32).sum(axis=1) // 3
            img = gray_lut.astype(np.uint8)[img]
        return img
    if bitcount == 24:
        stride = (w * 3 + 3) & ~3
        if len(data) < stride * h:
            raise ValueError("AVI: 24-bit DIB frame shorter than h*stride")
        img = np.frombuffer(data, np.uint8, stride * h).reshape(h, stride)
        bgr = img[flip, : w * 3].reshape(h, w, 3).astype(np.uint32)
        return ((bgr[..., 0] + bgr[..., 1] + bgr[..., 2]) // 3).astype(np.uint8)
    raise NotImplementedError(
        f"AVI DIB bitcount {bitcount} not supported (8 and 24 are)")


def decode_avi(payload: bytes) -> np.ndarray:
    """AVI bytes → (frames, h, w) uint8 grayscale. Native for
    uncompressed DIB streams; MJPG via PIL (capability-gated)."""
    if sniff(payload) != "avi":
        raise ValueError("not an AVI container (RIFF/AVI magic missing)")
    end = 8 + struct.unpack_from("<I", payload, 4)[0]
    end = min(end, len(payload))
    width = height = bitcount = compression = None
    palette = None
    movi_span = None
    # Decoding binds to exactly ONE stream: the strl whose strh says
    # 'vids'. Without the binding, a multi-stream AVI (video+audio, or
    # two video streams) would interleave foreign '??db'/'??dc' chunks
    # or let the LAST strf overwrite the video dims — silently-wrong
    # perceptual hashes instead of an error (r14 ADVICE).
    video_stream = None  # strl index of the bound video stream
    strl_index = -1
    for fourcc, dstart, dsize in _riff_chunks(payload, 12, end):
        if fourcc != b"LIST":
            continue
        kind = payload[dstart : dstart + 4]
        if kind == b"hdrl":
            for f2, s2, z2 in _riff_chunks(payload, dstart + 4, dstart + dsize):
                if f2 == b"LIST" and payload[s2 : s2 + 4] == b"strl":
                    strl_index += 1
                    is_vids = False
                    for f3, s3, z3 in _riff_chunks(payload, s2 + 4, s2 + z2):
                        if f3 == b"strh" and z3 >= 4:
                            # strh precedes strf within its strl (spec)
                            is_vids = payload[s3 : s3 + 4] == b"vids"
                            if is_vids and video_stream is not None:
                                raise NotImplementedError(
                                    "AVI: multiple video streams "
                                    f"(strl {video_stream} and "
                                    f"{strl_index}) — single-stream "
                                    "clips only")
                            if is_vids:
                                video_stream = strl_index
                        elif f3 == b"strf" and z3 >= 40 and is_vids:
                            (_bisz, width, height, _planes, bitcount,
                             comp4) = struct.unpack_from("<IiiHHI", payload, s3)
                            compression = comp4
                            n_colors = (z3 - 40) // 4
                            if n_colors > 0 and bitcount == 8:
                                pal = np.frombuffer(
                                    payload, np.uint8, n_colors * 4, s3 + 40
                                ).reshape(n_colors, 4)
                                # RGBQUAD is (b, g, r, reserved) → (r, g, b)
                                palette = np.zeros((256, 3), np.uint8)
                                palette[:n_colors] = pal[:, 2::-1]
        elif kind == b"movi":
            movi_span = (dstart + 4, dstart + dsize)
    if width is None or movi_span is None or video_stream is None:
        raise ValueError(
            "AVI: missing video stream (strh 'vids' + strf) or movi list")
    stream_prefix = b"%02d" % video_stream
    top_down = int(height) < 0  # negative biHeight = rows stored top-first
    height = abs(int(height))
    width = int(width)
    frames = []
    for fourcc, dstart, dsize in _riff_chunks(payload, *movi_span):
        tag = fourcc[2:4]
        if fourcc[:2] != stream_prefix or tag not in (b"db", b"dc"):
            continue      # foreign-stream or non-video chunk (audio, rec )
        data = payload[dstart : dstart + dsize]
        if compression == 0:
            frames.append(_dib_frame_to_gray(
                data, width, height, bitcount, palette,
                top_down=top_down))
        elif data[:3] == JPEG_MAGIC or compression in (
            struct.unpack("<I", AVI_MJPG_FOURCC)[0],
        ):
            try:
                from PIL import Image  # optional dependency, per-format gate
            except ImportError as exc:
                raise NotImplementedError(
                    "MJPG AVI decode requires PIL (pip install pillow); "
                    "uncompressed-DIB AVIs work natively"
                ) from exc
            frames.append(np.asarray(
                Image.open(io.BytesIO(data)).convert("L")))
        else:
            raise NotImplementedError(
                f"AVI compression 0x{compression:08x} not supported "
                "(uncompressed DIB native, MJPG via PIL)")
    if not frames:
        raise ValueError("AVI: no video frames in movi list")
    return np.stack(frames)
