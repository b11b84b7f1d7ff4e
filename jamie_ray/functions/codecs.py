"""Real media codecs behind the multimodal strict boundary.

Two tiers, mirroring the ``mecab_real`` adapter pattern
(``tokenization.py``):

- **Stdlib-real** (always available, no optional deps): a genuine PNG
  decoder/encoder (``zlib`` + ``struct``; 8-bit depth, color types
  0/2/3/4/6, all five scanline filters, non-interlaced) and a genuine
  WAV decoder/encoder (stdlib ``wave``; 8/16/24/32-bit PCM). These make
  ``DecodeImage(strict=True)`` / ``DecodeAudio(strict=True)`` decode
  REAL payloads in this container, live-tested (no skips).
- **Optional adapters** for the formats stdlib can't reach: PIL for
  JPEG/GIF/WebP/…, ``soundfile`` for FLAC/OGG/…, ``av`` (PyAV) for
  video containers. Selecting one without the package installed fails
  loudly at first use with an actionable ImportError — never a silent
  fallback to the fake path.

The pure-Python PNG unfilter loops per scanline; that is fine for the
thumbnail-scale payloads of tests and fixtures, and the PIL adapter is
the production path for bulk decode (its codec is C). Decoded output
is always a ``(height, width, channels) uint8`` array (PNG) or a
``(n_samples,) float32 in [-1, 1]`` mono waveform + sample rate (WAV —
multi-channel input is mean-downmixed).
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# channels per PNG color type (palette counts as 1 on the wire, 3 out)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# per-process optional-module singletons (the _REAL_TAGGERS pattern)
_OPTIONAL: dict[str, object] = {}


def sniff(payload: bytes | None) -> str | None:
    """Magic-byte container sniff: png | jpeg | gif | webp | wav |
    flac | ogg | mp4 | None (unrecognized)."""
    if not payload or len(payload) < 12:
        return None
    if payload[:8] == _PNG_SIG:
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return "webp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"fLaC":
        return "flac"
    if payload[:4] == b"OggS":
        return "ogg"
    if payload[4:8] == b"ftyp":
        return "mp4"
    return None


class CodecError(ValueError):
    """Malformed or unsupported-feature payload for a REAL codec (as
    opposed to 'payload is not this format at all' — that's the
    caller's sniff)."""


# ---------------------------------------------------------------------------
# PNG (stdlib-real)
# ---------------------------------------------------------------------------


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (height, width, channels) uint8 array.

    Supports bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette ->
    RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced, all five scanline
    filters. Anything else raises :class:`CodecError` (16-bit /
    interlaced PNGs exist; route them through the PIL adapter).
    """
    if payload[:8] != _PNG_SIG:
        raise CodecError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = None
    palette: bytes | None = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise CodecError("truncated PNG chunk")
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise CodecError(f"unsupported PNG bit depth {depth} (only 8)")
            if color_type not in _PNG_CHANNELS:
                raise CodecError(f"unsupported PNG color type {color_type}")
            if interlace != 0:
                raise CodecError("interlaced PNG unsupported (use the PIL adapter)")
            if comp != 0 or filt != 0:
                raise CodecError("nonstandard PNG compression/filter method")
        elif ctype == b"PLTE":
            palette = data
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise CodecError("PNG missing IHDR or IDAT")
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise CodecError("PNG IDAT length mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += stride + 1
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub: sequential along x — per-byte loop
            for x in range(ch, stride):
                row[x] = (int(row[x]) + int(row[x - ch])) & 0xFF
        elif ftype == 2:  # Up: vectorized
            row = (row.astype(np.uint16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(row[x - ch]) if x >= ch else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = int(row[x - ch]) if x >= ch else 0
                ul = int(prev[x - ch]) if x >= ch else 0
                row[x] = (int(row[x]) + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise CodecError(f"unknown PNG filter type {ftype}")
        out[y] = row
        prev = row
    img = out.reshape(height, width, ch)
    if color_type == 3:
        if palette is None:
            raise CodecError("palette PNG missing PLTE")
        pal = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)
        img = pal[img[:, :, 0]]
    return img


def encode_png(img: np.ndarray) -> bytes:
    """(h, w) or (h, w, {1,2,3,4}) uint8 array -> PNG bytes (filter 0,
    color type derived from channel count). The test-fixture inverse of
    :func:`decode_png`."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw.extend(a[y].tobytes())

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# WAV (stdlib-real)
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 mono waveform in [-1, 1], sample_rate).

    Stdlib ``wave`` handles 8/16/32-bit PCM; 24-bit is widened by hand.
    Multi-channel audio is mean-downmixed to mono (documented lossy
    convention; keep channels via the soundfile adapter if needed).
    """
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as f:
            n_ch = f.getnchannels()
            sw = f.getsampwidth()
            sr = f.getframerate()
            frames = f.readframes(f.getnframes())
    except (wave.Error, EOFError) as ex:
        raise CodecError(f"malformed WAV: {ex}") from ex
    if sw == 1:  # unsigned 8-bit
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 3:  # 24-bit: widen to int32
        b = np.frombuffer(frames, dtype=np.uint8).reshape(-1, 3)
        i32 = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        i32 = np.where(i32 >= 1 << 23, i32 - (1 << 24), i32)
        x = i32.astype(np.float32) / float(1 << 23)
    elif sw == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float32) / float(1 << 31)
    else:
        raise CodecError(f"unsupported WAV sample width {sw}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x.astype(np.float32), sr


def encode_wav(samples: np.ndarray, sample_rate: int, sampwidth: int = 2) -> bytes:
    """float array in [-1, 1] -> mono PCM WAV bytes (default 16-bit).
    The test-fixture inverse of :func:`decode_wav`."""
    import wave

    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    if sampwidth == 2:
        pcm = (x * 32767.0).round().astype("<i2").tobytes()
    elif sampwidth == 1:
        # compute in int16 space: int8 + 128 overflows under NumPy 2.x
        # (NEP 50 no longer value-casts the Python 128 into int8)
        pcm = ((x * 127.0).round().astype(np.int16) + 128).astype(np.uint8).tobytes()
    elif sampwidth == 4:
        pcm = (x * float((1 << 31) - 1)).round().astype("<i4").tobytes()
    else:
        raise CodecError(f"unsupported encode sample width {sampwidth}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(sampwidth)
        f.setframerate(int(sample_rate))
        f.writeframes(pcm)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# optional adapters (PIL / soundfile / PyAV) — the mecab_real pattern
# ---------------------------------------------------------------------------


def decode_image_pil(payload: bytes) -> np.ndarray:
    """Genuine PIL adapter: any PIL-supported format -> (h, w, c) uint8.

    Requires the optional ``Pillow`` package; fails loudly without it
    (the stdlib :func:`decode_png` needs nothing for PNG payloads).
    """
    mod = _OPTIONAL.get("PIL")
    if mod is None:
        try:
            from PIL import Image  # type: ignore[import-not-found]
        except ImportError as ex:
            raise ImportError(
                "codec 'pil' needs the optional Pillow package (pip install "
                "Pillow); PNG payloads decode without it via the stdlib "
                "decode_png path"
            ) from ex
        _OPTIONAL["PIL"] = Image
        mod = Image
    img = mod.open(io.BytesIO(payload))
    a = np.asarray(img.convert("RGBA" if "A" in img.getbands() else "RGB"))
    if a.ndim == 2:
        a = a[:, :, None]
    return a.astype(np.uint8)


def decode_audio_soundfile(payload: bytes) -> tuple[np.ndarray, int]:
    """Genuine soundfile adapter: FLAC/OGG/WAV/… -> (float32 mono, sr).

    Requires the optional ``soundfile`` package (libsndfile); fails
    loudly without it (WAV payloads decode via stdlib :func:`decode_wav`).
    """
    sf = _OPTIONAL.get("soundfile")
    if sf is None:
        try:
            import soundfile  # type: ignore[import-not-found]
        except ImportError as ex:
            raise ImportError(
                "codec 'soundfile' needs the optional soundfile package "
                "(pip install soundfile); WAV payloads decode without it "
                "via the stdlib decode_wav path"
            ) from ex
        _OPTIONAL["soundfile"] = soundfile
        sf = soundfile
    data, sr = sf.read(io.BytesIO(payload), dtype="float32")
    x = np.asarray(data, dtype=np.float32)
    if x.ndim > 1:
        x = x.mean(axis=1)
    return x.astype(np.float32), int(sr)


def sample_frames_pyav(payload: bytes, stride: int) -> list[tuple[int, np.ndarray]]:
    """Genuine PyAV adapter: video container bytes -> [(frame_idx,
    (h, w, 3) uint8 array)] for every ``stride``-th decoded frame.

    Requires the optional ``av`` package (FFmpeg bindings); fails
    loudly without it. There is no stdlib video codec, so strict video
    decode ALWAYS needs this adapter.
    """
    av = _OPTIONAL.get("av")
    if av is None:
        try:
            import av as _av  # type: ignore[import-not-found]
        except ImportError as ex:
            raise ImportError(
                "codec 'pyav' needs the optional av package (pip install "
                "av); no stdlib fallback exists for video"
            ) from ex
        _OPTIONAL["av"] = _av
        av = _av
    out: list[tuple[int, np.ndarray]] = []
    with av.open(io.BytesIO(payload)) as container:
        for i, frame in enumerate(container.decode(video=0)):
            if i % stride == 0:
                out.append((i, frame.to_ndarray(format="rgb24")))
    return out
