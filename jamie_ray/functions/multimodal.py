"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are ``binary`` columns with sibling metadata columns;
decode / feature-extract / resize / frame-sample run as actor-pool
``map_batches`` stages. The codec boundary has two modes:

- ``strict=True`` — REAL decode: the payload is sniffed and decoded by
  a genuine codec from :mod:`.codecs` — stdlib-real PNG and WAV
  (always available, live-tested in this container) or the optional
  PIL / soundfile / PyAV adapters (loud ImportError when the package
  is missing, never a silent fake). An unrecognized payload raises
  ``NotImplementedError`` at the exact decode call. Decoded dimensions
  come from the PAYLOAD, not the metadata columns.
- ``strict=False`` (default) — deterministic fake decode (hash-derived
  pixels honoring the declared width/height) so oracle-checked
  pipelines stay bit-reproducible with zero payload dependencies.

Payload batches are large: size ``batch_size`` small (e.g. 16-64) so a
batch x concurrency stays inside a worker's heap, and let the object
store spill the rest (memory-aware rule from the brief).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import mix64

MEDIA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),       # image | audio | video
        pa.field("payload", pa.binary()),    # opaque encoded bytes
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("n_frames", pa.int32()),
        pa.field("sample_rate", pa.int32()),
    ]
)


def synthetic_media(n: int, kind: str = "image") -> pa.Table:
    """Deterministic fake media table (payload = hash-derived bytes).

    ``kind``: image (1 frame), video (8-31 frames), audio (16 kHz,
    no frames) — the metadata shapes each decode stage keys on.
    """
    ids = np.arange(n, dtype=np.uint64)
    w = (mix64(ids, 1) % np.uint64(48) + np.uint64(16)).astype(np.int32)
    h = (mix64(ids, 2) % np.uint64(48) + np.uint64(16)).astype(np.int32)
    if kind == "video":
        n_frames = (mix64(ids, 3) % np.uint64(24) + np.uint64(8)).astype(np.int32)
        sample_rate = np.zeros(n, dtype=np.int32)
    elif kind == "audio":
        n_frames = np.zeros(n, dtype=np.int32)
        sample_rate = np.full(n, 16_000, dtype=np.int32)
        w = np.zeros(n, dtype=np.int32)
        h = np.zeros(n, dtype=np.int32)
    else:
        n_frames = np.ones(n, dtype=np.int32)
        sample_rate = np.zeros(n, dtype=np.int32)
    payloads = [
        mix64(np.arange(64, dtype=np.uint64), seed=int(i) + 7).astype(np.uint8).tobytes()
        for i in ids
    ]
    return pa.table(
        {
            "media_id": pa.array(ids.astype(np.int64), pa.int64()),
            "kind": pa.array([kind] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(h, pa.int32()),
            "n_frames": pa.array(n_frames, pa.int32()),
            "sample_rate": pa.array(sample_rate, pa.int32()),
        }
    )


class DecodeImage:
    """Actor-pool stage: payload bytes -> pixel tensor column.

    ``__init__`` resolves the codec once per actor; ``__call__``
    decodes a batch. Use
    ``ds.map_batches(DecodeImage, concurrency=N, batch_size=32)``.

    ``codec`` (strict mode only): ``"auto"`` — stdlib-real PNG decode
    for PNG payloads, PIL adapter for every other recognized image
    format; ``"png"`` — stdlib only; ``"pil"`` — force PIL. Output is
    (media_id, width, height, channels, pixels) with the flattened
    ``(h, w, c)`` tensor and DECODED dims (strict) or the declared
    metadata dims with channels=1 (fake).
    """

    def __init__(self, strict: bool = False, codec: str = "auto") -> None:
        if codec not in ("auto", "png", "pil"):
            raise ValueError(f"DecodeImage: unknown codec {codec!r}")
        self.strict = strict
        self.codec = codec

    def _decode_real(self, payload: bytes) -> np.ndarray:
        from . import codecs

        kind = codecs.sniff(payload)
        if self.codec in ("auto", "png") and kind == "png":
            return codecs.decode_png(payload)
        if self.codec == "pil" or (
            self.codec == "auto" and kind in ("jpeg", "gif", "webp")
        ):
            return codecs.decode_image_pil(payload)
        raise NotImplementedError(
            f"image decode: payload is {kind or 'unrecognized'}, which no "
            f"enabled real codec handles (codec={self.codec!r}; stdlib "
            "covers PNG, the optional PIL adapter covers the rest)"
        )

    def _decode_one(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if self.strict:
            img = self._decode_real(payload)
            return img if img.ndim == 3 else img[:, :, None]
        # deterministic fake decode: hash-derived grayscale pixels
        n_px = int(width) * int(height)
        seed = int.from_bytes(payload[:8] or b"\0" * 8, "little")
        px = (mix64(np.arange(n_px, dtype=np.uint64), seed=seed % (1 << 31)) & np.uint64(0xFF)).astype(
            np.uint8
        )
        return px.reshape(int(height), int(width), 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        pixels, ws, hs, chs = [], [], [], []
        for p, w, h in zip(
            batch.column("payload").to_pylist(),
            batch.column("width").to_pylist(),
            batch.column("height").to_pylist(),
        ):
            img = self._decode_one(p, w, h)
            pixels.append(img.flatten().tolist())
            hs.append(img.shape[0])
            ws.append(img.shape[1])
            chs.append(img.shape[2])
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "channels": pa.array(chs, pa.int32()),
                "pixels": pa.array(pixels, pa.list_(pa.uint8())),
            }
        )


class ImageFeatures:
    """Actor-pool stage: pixels -> feature vector (mean/std/histogram).

    Stands in for batched model inference; vectorized numpy per batch.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for px in batch.column("pixels").to_pylist():
            a = np.asarray(px, dtype=np.float64)
            hist, _ = np.histogram(a, bins=8, range=(0, 256))
            feats.append(
                [float(a.mean()), float(a.std())] + (hist / max(len(a), 1)).tolist()
            )
        cols = {"media_id": batch.column("media_id")}
        if "frame_idx" in batch.column_names:  # video path: keep frame key
            cols["frame_idx"] = batch.column("frame_idx")
        cols["features"] = pa.array(feats, pa.list_(pa.float64()))
        return pa.table(cols)


def explode_features(batch: pa.Table) -> pa.Table:
    """(media_id, [frame_idx,] features list) -> one scalar row per
    feature component — the oracle-comparable surface (no list columns).
    """
    has_frame = "frame_idx" in batch.column_names
    out: dict[str, list] = {"media_id": [], "feat_idx": [], "value": []}
    if has_frame:
        out["frame_idx"] = []
    for i, feats in enumerate(batch.column("features").to_pylist()):
        mid = batch.column("media_id")[i].as_py()
        frame = batch.column("frame_idx")[i].as_py() if has_frame else None
        for fi, v in enumerate(feats):
            out["media_id"].append(mid)
            out["feat_idx"].append(fi)
            out["value"].append(v)
            if has_frame:
                out["frame_idx"].append(frame)
    cols = {"media_id": pa.array(out["media_id"], pa.int64())}
    if has_frame:
        cols["frame_idx"] = pa.array(out["frame_idx"], pa.int64())
    cols["feat_idx"] = pa.array(out["feat_idx"], pa.int64())
    cols["value"] = pa.array(out["value"], pa.float64())
    return pa.table(cols)


class SampleFrames:
    """Actor-pool stage: video payload -> one row per SAMPLED frame.

    Samples every ``stride``-th frame. Fake mode derives pixels from
    (payload, frame_idx) so frames differ but reproduce; strict mode
    decodes real containers via the optional PyAV adapter (there is no
    stdlib video codec, so strict ALWAYS needs it — unrecognized bytes
    raise, never fake). Output explodes rows:
    (media_id, frame_idx, width, height, pixels).
    """

    def __init__(self, stride: int = 4, strict: bool = False) -> None:
        self.stride = int(stride)
        self.strict = strict

    def _decode_frame(self, payload: bytes, w: int, h: int, idx: int) -> np.ndarray:
        seed = (int.from_bytes(payload[:8] or b"\0" * 8, "little") + idx * 1_000_003) % (
            1 << 31
        )
        n_px = int(w) * int(h)
        px = (mix64(np.arange(n_px, dtype=np.uint64), seed=seed) & np.uint64(0xFF)).astype(
            np.uint8
        )
        return px.reshape(int(h), int(w))

    def _sample_real(self, payload: bytes) -> list[tuple[int, np.ndarray]]:
        from . import codecs

        kind = codecs.sniff(payload)
        if kind is None:
            # unrecognized bytes: there is NO stdlib video codec, so
            # strict mode must refuse rather than fake
            raise NotImplementedError(
                "video frame decode: payload is unrecognized and no "
                "stdlib video codec exists; install the optional av "
                "package for real containers"
            )
        if kind not in ("mp4", "webp"):
            # recognized NON-video payload (wav/png/...): refuse rather
            # than hand audio/image bytes to PyAV, which would either
            # error opaquely or silently 'decode' a still as video
            raise NotImplementedError(
                f"video frame decode: payload sniffs as {kind!r}, not a "
                "video container (mp4|webp)"
            )
        return codecs.sample_frames_pyav(payload, self.stride)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids, fidx, ws, hs, pixels = [], [], [], [], []
        for mid, payload, w, h, nf in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("width").to_pylist(),
            batch.column("height").to_pylist(),
            batch.column("n_frames").to_pylist(),
        ):
            if self.strict:
                for idx, frame in self._sample_real(payload):
                    mids.append(mid)
                    fidx.append(idx)
                    hs.append(frame.shape[0])
                    ws.append(frame.shape[1])
                    pixels.append(frame.flatten().tolist())
                continue
            for idx in range(0, int(nf), self.stride):
                mids.append(mid)
                fidx.append(idx)
                ws.append(w)
                hs.append(h)
                pixels.append(self._decode_frame(payload, w, h, idx).flatten().tolist())
        return pa.table(
            {
                "media_id": pa.array(mids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "pixels": pa.array(pixels, pa.list_(pa.uint8())),
            }
        )


class DecodeAudio:
    """Actor-pool stage: audio payload -> waveform column (float32 in
    [-1, 1], one fake second at the declared sample rate). Strict mode
    marks the codec boundary exactly like :class:`DecodeImage`."""

    def __init__(self, strict: bool = False, codec: str = "auto") -> None:
        if codec not in ("auto", "wav", "soundfile"):
            raise ValueError(f"DecodeAudio: unknown codec {codec!r}")
        self.strict = strict
        self.codec = codec

    def _decode_real(self, payload: bytes) -> tuple[np.ndarray, int]:
        from . import codecs

        kind = codecs.sniff(payload)
        if self.codec in ("auto", "wav") and kind == "wav":
            return codecs.decode_wav(payload)
        if self.codec == "soundfile" or (
            self.codec == "auto" and kind in ("flac", "ogg")
        ):
            return codecs.decode_audio_soundfile(payload)
        raise NotImplementedError(
            f"audio decode: payload is {kind or 'unrecognized'}, which no "
            f"enabled real codec handles (codec={self.codec!r}; stdlib "
            "covers WAV, the optional soundfile adapter covers the rest)"
        )

    def _decode_one(self, payload: bytes, sample_rate: int) -> tuple[np.ndarray, int]:
        if self.strict:
            return self._decode_real(payload)
        seed = int.from_bytes(payload[:8] or b"\0" * 8, "little") % (1 << 31)
        n = max(int(sample_rate), 1)
        u = mix64(np.arange(n, dtype=np.uint64), seed=seed)
        wav = ((u >> np.uint64(11)).astype(np.float32) / float(1 << 53)) * 2.0 - 1.0
        return wav, int(sample_rate)

    def __call__(self, batch: pa.Table) -> pa.Table:
        waves, rates = [], []
        for p, sr in zip(
            batch.column("payload").to_pylist(),
            batch.column("sample_rate").to_pylist(),
        ):
            wav, real_sr = self._decode_one(p, sr)
            waves.append(wav.tolist())
            rates.append(real_sr)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "sample_rate": pa.array(rates, pa.int32()),
                "waveform": pa.array(waves, pa.list_(pa.float32())),
            }
        )


class AudioFeatures:
    """Actor-pool stage: waveform -> per-window RMS energy + zero-cross
    rate (vectorized; stands in for batched model inference)."""

    def __init__(self, window: int = 1024) -> None:
        self.window = int(window)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for wav in batch.column("waveform").to_pylist():
            a = np.asarray(wav, dtype=np.float64)
            n_win = max(len(a) // self.window, 1)
            a = a[: n_win * self.window].reshape(n_win, -1)
            rms = np.sqrt((a**2).mean(axis=1))
            zcr = (np.abs(np.diff(np.sign(a), axis=1)) > 0).mean(axis=1)
            feats.append(np.concatenate([rms, zcr]).tolist())
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "features": pa.array(feats, pa.list_(pa.float64())),
            }
        )


def resize_stub(batch: pa.Table, target: int = 32) -> pa.Table:
    """Nearest-neighbor resize on decoded pixel tensors (deterministic
    math, channel-aware: works on both the fake single-channel path and
    real multi-channel decodes)."""
    has_ch = "channels" in batch.column_names
    chans = (
        batch.column("channels").to_pylist()
        if has_ch
        else [1] * batch.num_rows
    )
    out = []
    for px, w, h, c in zip(
        batch.column("pixels").to_pylist(),
        batch.column("width").to_pylist(),
        batch.column("height").to_pylist(),
        chans,
    ):
        a = np.asarray(px, dtype=np.uint8).reshape(int(h), int(w), int(c))
        ys = (np.arange(target) * h // target).astype(int)
        xs = (np.arange(target) * w // target).astype(int)
        out.append(a[np.ix_(ys, xs)].flatten().tolist())
    cols = {
        "media_id": batch.column("media_id"),
        "width": pa.array([target] * batch.num_rows, pa.int32()),
        "height": pa.array([target] * batch.num_rows, pa.int32()),
    }
    if has_ch:
        cols["channels"] = batch.column("channels")
    cols["pixels"] = pa.array(out, pa.list_(pa.uint8()))
    return pa.table(cols)
