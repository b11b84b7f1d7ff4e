"""Real codec boundary: stdlib PNG/WAV decoders are live-tested here
(no skips — they need nothing beyond zlib/struct/wave), the optional
PIL/soundfile/PyAV adapters get skip-if-missing live tests, and the
strict-mode multimodal stages are exercised end to end on REAL
payloads whose decoded dims must win over the metadata columns."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from jamie_ray.functions import codecs, multimodal


def _pattern(h: int, w: int, c: int) -> np.ndarray:
    """Deterministic uint8 tensor with structure along every axis."""
    i = np.arange(h * w * c, dtype=np.int64)
    return ((3 * i + 7) % 251).astype(np.uint8).reshape(h, w, c)


# ---- PNG: stdlib-real ------------------------------------------------------


@pytest.mark.parametrize("c", [1, 2, 3, 4])
@pytest.mark.parametrize("h,w", [(1, 1), (5, 3), (16, 23)])
def test_png_roundtrip_all_color_types(h, w, c):
    img = _pattern(h, w, c)
    back = codecs.decode_png(codecs.encode_png(img))
    assert back.shape == (h, w, c)
    assert np.array_equal(back, img)


def test_png_grayscale_2d_input():
    img = _pattern(7, 9, 1)
    back = codecs.decode_png(codecs.encode_png(img[:, :, 0]))
    assert np.array_equal(back[:, :, 0], img[:, :, 0])


def _manual_png(img: np.ndarray, filters: list[int]) -> bytes:
    """Spec-conformant PNG encoder written INDEPENDENTLY of
    codecs.encode_png: applies the given per-row filter types by the
    RFC 2083 formulas, so decode_png's unfiltering is checked against
    the spec, not against our own inverse."""
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int64)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        row = flat[y]
        ft = filters[y % len(filters)]
        raw.append(ft)
        for x in range(stride):
            left = row[x - c] if x >= c else 0
            up = prev[x]
            ul = prev[x - c] if x >= c else 0
            if ft == 0:
                v = row[x]
            elif ft == 1:
                v = row[x] - left
            elif ft == 2:
                v = row[x] - up
            elif ft == 3:
                v = row[x] - ((left + up) >> 1)
            else:  # 4: Paeth
                p = left + up - ul
                pa_, pb, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa_ <= pb and pa_ <= pc_) else (up if pb <= pc_ else ul)
                v = row[x] - pred
            raw.append(v & 0xFF)
        prev = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_decode_every_filter_type(filters):
    img = _pattern(10, 6, 3)
    assert np.array_equal(codecs.decode_png(_manual_png(img, filters)), img)


def test_png_palette():
    # 4-entry palette, indices cycle
    pal = bytes([10, 20, 30, 200, 0, 0, 0, 200, 0, 0, 0, 200])
    h, w = 4, 5
    idx = (np.arange(h * w, dtype=np.uint8) % 4).reshape(h, w, 1)
    # manual palette PNG (encode_png never emits color type 3)
    stride = w
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw.extend(idx[y, :, 0].tobytes())

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", pal)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    img = codecs.decode_png(payload)
    assert img.shape == (h, w, 3)
    want = np.frombuffer(pal, dtype=np.uint8).reshape(4, 3)[idx[:, :, 0]]
    assert np.array_equal(img, want)


def test_png_rejects_unsupported():
    with pytest.raises(codecs.CodecError, match="signature"):
        codecs.decode_png(b"not a png at all, nope")
    # 16-bit depth
    img = _pattern(2, 2, 1)
    payload = bytearray(codecs.encode_png(img))
    payload[24] = 16  # IHDR bit-depth byte
    with pytest.raises(codecs.CodecError, match="bit depth"):
        codecs.decode_png(bytes(payload))


def test_sniff():
    assert codecs.sniff(codecs.encode_png(_pattern(2, 2, 3))) == "png"
    assert codecs.sniff(codecs.encode_wav(np.zeros(8), 8000)) == "wav"
    assert codecs.sniff(b"\xff\xd8\xff\xe0" + b"\0" * 16) == "jpeg"
    assert codecs.sniff(b"\0" * 32) is None
    assert codecs.sniff(None) is None


# ---- WAV: stdlib-real ------------------------------------------------------


@pytest.mark.parametrize("sampwidth,tol", [(1, 1 / 100), (2, 1 / 30000), (4, 1e-7)])
def test_wav_roundtrip(sampwidth, tol):
    t = np.arange(800, dtype=np.float64)
    x = 0.5 * np.sin(2 * np.pi * 440 * t / 8000)
    wav, sr = codecs.decode_wav(codecs.encode_wav(x, 8000, sampwidth=sampwidth))
    assert sr == 8000
    assert wav.dtype == np.float32
    assert len(wav) == len(x)
    assert np.abs(wav - x).max() < tol


def test_wav_24bit_and_stereo_downmix():
    import io
    import wave as wave_mod

    # hand-build a stereo 24-bit WAV: L = ramp, R = -ramp -> mono mean 0
    n = 64
    ramp = np.linspace(-0.9, 0.9, n)
    def pack24(v: float) -> bytes:
        i = int(round(v * (1 << 23)))
        i = max(-(1 << 23), min((1 << 23) - 1, i)) & 0xFFFFFF
        return bytes([i & 0xFF, (i >> 8) & 0xFF, (i >> 16) & 0xFF])
    frames = b"".join(pack24(l) + pack24(-l) for l in ramp)
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(3)
        f.setframerate(16000)
        f.writeframes(frames)
    wav, sr = codecs.decode_wav(buf.getvalue())
    assert sr == 16000 and len(wav) == n
    assert np.abs(wav).max() < 1e-6  # L + R cancel


def test_wav_malformed_raises():
    with pytest.raises(codecs.CodecError, match="malformed WAV"):
        codecs.decode_wav(b"RIFF\0\0\0\0WAVEjunkjunkjunk")


# ---- strict-mode stages over REAL payloads --------------------------------


def _real_media_table() -> pa.Table:
    """Media rows whose payloads are real PNGs and whose metadata
    columns LIE about the dimensions — strict decode must report the
    payload's truth."""
    imgs = [_pattern(6, 4, 3), _pattern(9, 9, 1), _pattern(3, 7, 4)]
    return pa.table(
        {
            "media_id": pa.array([0, 1, 2], pa.int64()),
            "kind": pa.array(["image"] * 3, pa.string()),
            "payload": pa.array([codecs.encode_png(i) for i in imgs], pa.binary()),
            "width": pa.array([999] * 3, pa.int32()),
            "height": pa.array([999] * 3, pa.int32()),
            "n_frames": pa.array([1] * 3, pa.int32()),
            "sample_rate": pa.array([0] * 3, pa.int32()),
        }
    )


def test_decode_image_strict_real_png():
    out = multimodal.DecodeImage(strict=True)(_real_media_table())
    got = {
        r["media_id"]: (r["height"], r["width"], r["channels"], r["pixels"])
        for r in out.to_pylist()
    }
    for mid, img in ((0, _pattern(6, 4, 3)), (1, _pattern(9, 9, 1)), (2, _pattern(3, 7, 4))):
        h, w, c, px = got[mid]
        assert (h, w, c) == img.shape  # payload dims win over metadata
        assert np.array_equal(np.asarray(px, np.uint8).reshape(h, w, c), img)


def test_decode_image_strict_real_png_through_resize_and_features(ray_session):
    import ray

    ds = ray.data.from_arrow(_real_media_table()).map_batches(
        multimodal.DecodeImage,
        fn_constructor_kwargs={"strict": True},
        concurrency=1,
        batch_size=2,
        batch_format="pyarrow",
    )
    resized = ds.map_batches(
        lambda b: multimodal.resize_stub(b, target=2), batch_format="pyarrow"
    )
    rows = sorted(resized.take_all(), key=lambda r: r["media_id"])
    for r in rows:
        assert len(r["pixels"]) == 2 * 2 * r["channels"]
    feats = (
        ray.data.from_arrow(pa.Table.from_pylist(rows))
        .map_batches(multimodal.ImageFeatures, concurrency=1, batch_format="pyarrow")
        .take_all()
    )
    assert len(feats) == 3 and all(len(f["features"]) == 10 for f in feats)


def test_decode_audio_strict_real_wav():
    x = 0.25 * np.sin(np.arange(400) / 10.0)
    t = pa.table(
        {
            "media_id": pa.array([7], pa.int64()),
            "kind": pa.array(["audio"], pa.string()),
            "payload": pa.array([codecs.encode_wav(x, 22050)], pa.binary()),
            "width": pa.array([0], pa.int32()),
            "height": pa.array([0], pa.int32()),
            "n_frames": pa.array([0], pa.int32()),
            "sample_rate": pa.array([123], pa.int32()),  # lies; payload wins
        }
    )
    out = multimodal.DecodeAudio(strict=True)(t).to_pylist()[0]
    assert out["sample_rate"] == 22050
    assert len(out["waveform"]) == 400
    assert np.abs(np.asarray(out["waveform"]) - x).max() < 1e-4


def test_strict_unrecognized_still_refuses():
    """Hash-byte payloads are not a real format: strict mode must raise,
    never silently fake."""
    media = multimodal.synthetic_media(1)
    with pytest.raises(NotImplementedError, match="image decode"):
        multimodal.DecodeImage(strict=True)(media)
    audio = multimodal.synthetic_media(1, kind="audio")
    with pytest.raises(NotImplementedError, match="audio decode"):
        multimodal.DecodeAudio(strict=True)(audio)
    video = multimodal.synthetic_media(1, kind="video")
    with pytest.raises(NotImplementedError, match="video frame decode"):
        multimodal.SampleFrames(strict=True)(video)


def test_strict_video_refuses_recognized_non_video():
    """A payload that sniffs as a RECOGNIZED non-video kind (wav/png)
    must hit the strict boundary too — never reach PyAV, which would
    error opaquely or 'decode' a still image as video."""
    wav = codecs.encode_wav(np.zeros(64, dtype=np.float64), 8000)
    t = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "payload": pa.array([wav], pa.binary()),
            "width": pa.array([4], pa.int32()),
            "height": pa.array([4], pa.int32()),
            "n_frames": pa.array([8], pa.int32()),
        }
    )
    with pytest.raises(NotImplementedError, match="not a.*video container"):
        multimodal.SampleFrames(strict=True)(t)


def test_png_only_codec_refuses_jpeg():
    jpeg_ish = b"\xff\xd8\xff\xe0" + b"\0" * 32
    t = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "payload": pa.array([jpeg_ish], pa.binary()),
            "width": pa.array([4], pa.int32()),
            "height": pa.array([4], pa.int32()),
        }
    )
    with pytest.raises(NotImplementedError, match="jpeg"):
        multimodal.DecodeImage(strict=True, codec="png")(t)


# ---- optional adapters: skip-if-missing live tests -------------------------


def test_pil_adapter_live_or_skip():
    pytest.importorskip("PIL")
    img = _pattern(5, 8, 3)
    got = codecs.decode_image_pil(codecs.encode_png(img))
    assert np.array_equal(got[:, :, :3], img)


def test_pil_adapter_loud_without_pil():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed; loud-ImportError path not reachable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="Pillow"):
        codecs.decode_image_pil(b"\xff\xd8\xff\xe0" + b"\0" * 16)


def test_soundfile_adapter_live_or_skip():
    pytest.importorskip("soundfile")
    x = 0.3 * np.sin(np.arange(256) / 5.0)
    wav, sr = codecs.decode_audio_soundfile(codecs.encode_wav(x, 16000))
    assert sr == 16000 and np.abs(wav - x).max() < 1e-3


def test_soundfile_adapter_loud_without_soundfile():
    try:
        import soundfile  # noqa: F401

        pytest.skip("soundfile installed; loud-ImportError path not reachable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="soundfile"):
        codecs.decode_audio_soundfile(b"fLaC" + b"\0" * 16)


def test_pyav_adapter_loud_without_av():
    try:
        import av  # noqa: F401

        pytest.skip("av installed; loud-ImportError path not reachable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="av"):
        codecs.sample_frames_pyav(b"\0\0\0\x18ftypisom" + b"\0" * 16, 2)
