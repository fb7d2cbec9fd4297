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
