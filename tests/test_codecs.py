"""Pure-codec tests: PNG encode/decode (all filter types) and WAV
container round-trips — the real compressed-decode layer behind the
multimodal operators (operators/codecs.py)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from hyperswitch_data_backfill_spark.operators import codecs


@pytest.mark.parametrize("shape", [(1, 1), (7, 5), (16, 16), (3, 9, 3), (4, 4, 4)])
@pytest.mark.parametrize("filter_type", [0, 1, 2])
def test_png_roundtrip(shape, filter_type):
    rng = np.random.default_rng(hash(shape) % 2**32)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    # target the stdlib fallback explicitly — in a PIL environment the
    # default path would silently bypass the decoder under test
    out = codecs._decode_png_stdlib(codecs.encode_png(img, filter_type=filter_type))
    assert out.shape == img.shape
    assert (out == img).all()


def _manual_png(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Hand-filtered grayscale PNG stream — covers decoder filters 3/4,
    which the minimal encoder never emits."""
    h, w = img.shape
    scan = bytearray()
    prev = np.zeros(w, dtype=np.int32)
    for y, ft in zip(range(h), ftypes):
        cur = img[y].astype(np.int32)
        scan.append(ft)
        for x in range(w):
            left = int(cur[x - 1]) if x >= 1 else 0
            up, ul = int(prev[x]), (int(prev[x - 1]) if x >= 1 else 0)
            if ft == 3:
                pred = (left + up) >> 1
            elif ft == 4:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            else:
                pred = 0
            scan.append((int(cur[x]) - pred) & 0xFF)
        prev = cur

    def chunk(t: bytes, d: bytes) -> bytes:
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        codecs.PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan)))
        + chunk(b"IEND", b"")
    )


def test_png_decode_average_and_paeth_filters():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(6, 8), dtype=np.uint8)
    assert (
        codecs._decode_png_stdlib(_manual_png(img, [3, 4, 3, 4, 4, 3])) == img
    ).all()


def test_png_pil_fast_path_matches_stdlib():
    """When PIL is importable the default decode path is PIL's C codec;
    this cross-check keeps the stdlib fallback byte-identical on every
    filter type, so environments with and without PIL agree."""
    pytest.importorskip("PIL")
    rng = np.random.default_rng(13)
    for shape in [(9, 4), (5, 6, 3), (4, 4, 4)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for ft in (0, 1, 2):
            payload = codecs.encode_png(img, filter_type=ft)
            assert (
                codecs.decode_png(payload) == codecs._decode_png_stdlib(payload)
            ).all()
    gray = rng.integers(0, 256, size=(6, 8), dtype=np.uint8)
    payload = _manual_png(gray, [3, 4, 3, 4, 4, 3])
    assert (codecs.decode_png(payload) == codecs._decode_png_stdlib(payload)).all()


def test_jpeg_roundtrip_when_pil_present():
    """JPEG executable coverage (the most common real-world format):
    encode via PIL at quality 100 / grayscale, decode through
    codecs.decode_image, assert near-lossless recovery. Skips cleanly
    where PIL is absent — there decode_image raises the per-format
    capability error instead (test_decode_image_jpeg_requires_pil)."""
    Image = pytest.importorskip("PIL.Image")
    import io as _io

    rng = np.random.default_rng(17)
    img = rng.integers(64, 192, size=(16, 16), dtype=np.uint8)
    buf = _io.BytesIO()
    Image.fromarray(img, mode="L").save(buf, format="JPEG", quality=100)
    payload = buf.getvalue()
    assert codecs.sniff(payload) == "jpeg"
    out = codecs.decode_image(payload)
    assert out.shape == img.shape
    # JPEG is lossy even at q100 — bound the error instead of equality
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 8


def test_png_unsupported_variants_fail_loudly():
    img = np.zeros((2, 2), dtype=np.uint8)
    png = bytearray(codecs.encode_png(img))
    # patch IHDR bit depth (offset: 8 magic + 8 len/type + 8 w/h)
    png[24] = 16
    with pytest.raises(NotImplementedError, match="8-bit"):
        codecs.decode_png(bytes(png))
    with pytest.raises(ValueError, match="not a PNG"):
        codecs.decode_png(b"\xff\xd8\xffjunk")


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(11)
    mono = rng.integers(-32768, 32767, size=777, dtype=np.int16)
    out, rate = codecs.decode_wav(codecs.encode_wav(mono, 22050))
    assert rate == 22050 and (out.ravel() == mono).all()
    stereo = rng.integers(-32768, 32767, size=(300, 2), dtype=np.int16)
    out2, _ = codecs.decode_wav(codecs.encode_wav(stereo, 44100))
    assert out2.shape == (300, 2) and (out2 == stereo).all()


def test_sniff_magic_dispatch():
    assert codecs.sniff(codecs.encode_png(np.zeros((1, 1), dtype=np.uint8))) == "png"
    assert codecs.sniff(codecs.encode_wav(np.zeros(4, dtype=np.int16))) == "wav"
    assert codecs.sniff(b"\xff\xd8\xff\xe0JFIF") == "jpeg"
    assert codecs.sniff(b"RIFFxxxxAVI ") == "avi"  # real container (r14)
    assert codecs.sniff(b"RIFFxxxxELSE") == "raw"
    assert codecs.sniff(b"plain bytes") == "raw"


def test_decode_image_jpeg_requires_pil():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present — JPEG path exercised elsewhere")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PIL"):
        codecs.decode_image(b"\xff\xd8\xff\xe0 fake jpeg")


# ----------------------------------------------------------------- AVI


def test_avi_roundtrip_grayscale():
    """encode_avi → decode_avi is the identity for (f, h, w) uint8,
    including widths that need 4-byte row-stride padding."""
    rng = np.random.default_rng(7)
    for shape in ((1, 4, 4), (5, 16, 16), (3, 9, 7), (4, 6, 13)):
        frames = rng.integers(0, 256, size=shape, dtype=np.uint8)
        payload = codecs.encode_avi(frames, fps=12)
        assert codecs.sniff(payload) == "avi"
        got = codecs.decode_avi(payload)
        assert got.shape == shape
        assert np.array_equal(got, frames)


def test_avi_container_structure():
    """The written container is structurally standard RIFF: AVI magic,
    hdrl with avih dims, movi with one 00db per frame, idx1 index."""
    frames = np.arange(2 * 4 * 4, dtype=np.uint8).reshape(2, 4, 4)
    payload = codecs.encode_avi(frames, fps=10)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    assert riff_size == len(payload) - 8
    assert payload.count(b"00db") == 2 + 2  # movi chunks + idx1 entries
    assert b"idx1" in payload and b"avih" in payload and b"strf" in payload


def test_avi_24bit_dib_frame_gray():
    """24-bit BGR DIB rows decode to integer-mean gray, bottom-up."""
    # one 2x2 frame: BGR triples, rows padded to 4 bytes (2*3=6 → 8)
    top = [(10, 20, 30), (40, 50, 60)]
    bot = [(70, 80, 90), (100, 110, 120)]
    raw = b""
    for row in (bot, top):  # bottom-up storage
        for b, g, r in row:
            raw += bytes((b, g, r))
        raw += b"\x00\x00"  # stride pad
    img = codecs._dib_frame_to_gray(raw, 2, 2, 24, None)
    assert img.tolist() == [[20, 50], [80, 110]]


def test_avi_mjpg_capability_gate():
    """An MJPG-compressed AVI either decodes via PIL or refuses with the
    per-format capability error — never silently-wrong frames."""
    frames = np.zeros((1, 4, 4), dtype=np.uint8)
    payload = bytearray(codecs.encode_avi(frames))
    i = payload.index(b"strf")
    # biCompression sits 16 bytes into BITMAPINFOHEADER (after fourcc+size)
    payload[i + 8 + 16 : i + 8 + 20] = codecs.AVI_MJPG_FOURCC
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if has_pil:
        with pytest.raises(Exception):  # frame bytes are not a real JPEG
            codecs.decode_avi(bytes(payload))
    else:
        with pytest.raises(NotImplementedError, match="MJPG"):
            codecs.decode_avi(bytes(payload))


def _avi_chunk(fourcc, data):
    return fourcc + struct.pack("<I", len(data)) + data + (
        b"\x00" if len(data) & 1 else b"")


def _avi_list(kind, data):
    return _avi_chunk(b"LIST", kind + data)


def _strl(fcc_type: bytes, strf: bytes) -> bytes:
    return _avi_list(
        b"strl",
        _avi_chunk(b"strh", fcc_type + b"\x00" * 52)
        + _avi_chunk(b"strf", strf))


def _vids_strf(w: int, h: int) -> bytes:
    palette = b"".join(bytes((g, g, g, 0)) for g in range(256))
    return struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, w * h, 0, 0, 256, 0) + palette


def test_avi_binds_to_the_video_stream():
    """An AVI whose FIRST stream is audio ('auds') must decode the
    SECOND ('vids') stream's chunks ('01db') with ITS dims, skipping
    the audio stream's '00wb' chunks — unbound decoding interleaved
    foreign frames and let the last strf win (r14 ADVICE)."""
    hdrl = _avi_list(
        b"hdrl",
        _avi_chunk(b"avih", b"\x00" * 56)
        + _strl(b"auds", b"\x00" * 16)          # stream 00: audio
        + _strl(b"vids", _vids_strf(4, 4)))     # stream 01: video
    f0 = np.arange(16, dtype=np.uint8).reshape(4, 4)
    f1 = (f0 + 100).astype(np.uint8)
    movi = _avi_list(
        b"movi",
        _avi_chunk(b"00wb", b"\xaa" * 16)       # audio data, NOT a frame
        + _avi_chunk(b"01db", f0[::-1].tobytes())
        + _avi_chunk(b"00wb", b"\xbb" * 16)
        + _avi_chunk(b"01db", f1[::-1].tobytes()))
    payload = _avi_chunk(b"RIFF", b"AVI " + hdrl + movi)
    got = codecs.decode_avi(payload)
    assert got.shape == (2, 4, 4)
    assert np.array_equal(got[0], f0) and np.array_equal(got[1], f1)


def test_avi_refuses_multiple_video_streams():
    """Two 'vids' streams cannot be decoded into one (frames, h, w)
    stack — refuse loudly instead of interleaving them."""
    hdrl = _avi_list(
        b"hdrl",
        _avi_chunk(b"avih", b"\x00" * 56)
        + _strl(b"vids", _vids_strf(4, 4))
        + _strl(b"vids", _vids_strf(8, 8)))
    movi = _avi_list(b"movi", _avi_chunk(
        b"00db", np.zeros((4, 4), np.uint8).tobytes()))
    payload = _avi_chunk(b"RIFF", b"AVI " + hdrl + movi)
    with pytest.raises(NotImplementedError, match="multiple video"):
        codecs.decode_avi(payload)


def test_avi_refuses_malformed():
    with pytest.raises(ValueError, match="AVI"):
        codecs.decode_avi(b"RIFF\x04\x00\x00\x00AVI ")  # no headers
    with pytest.raises(ValueError, match="not an AVI"):
        codecs.decode_avi(b"\x00" * 16)
    good = codecs.encode_avi(np.zeros((1, 4, 4), dtype=np.uint8))
    truncated = bytearray(good)
    (sz,) = struct.unpack_from("<I", truncated, 4)
    struct.pack_into("<I", truncated, 4, sz + 64)  # lie about the size
    i = truncated.index(b"00db")
    struct.pack_into("<I", truncated, i + 4, 1 << 20)  # chunk overrun
    with pytest.raises(ValueError, match="overruns"):
        codecs.decode_avi(bytes(truncated))
