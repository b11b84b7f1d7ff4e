"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are ``binary`` columns with sibling metadata columns;
decode / feature-extract / resize / frame-sample run as actor-pool
``map_batches`` stages. The decode libraries are NOT in this container
(by design — no pip installs), so the codec boundary is STUBBED two
ways, both clearly marked:

- ``DecodeImage(strict=True)`` raises ``NotImplementedError`` at the
  exact call that would invoke the codec;
- ``DecodeImage(strict=False)`` substitutes a deterministic fake decode
  (hash-derived pixels honoring the declared width/height) so the
  Ray-side plumbing — schema, batch sizing, actor signature, output
  layout — is real and testable end to end.

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
    """Deterministic fake media table (payload = hash-derived bytes)."""
    ids = np.arange(n, dtype=np.uint64)
    w = (mix64(ids, 1) % np.uint64(48) + np.uint64(16)).astype(np.int32)
    h = (mix64(ids, 2) % np.uint64(48) + np.uint64(16)).astype(np.int32)
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
            "n_frames": pa.array([1] * n, pa.int32()),
            "sample_rate": pa.array([0] * n, pa.int32()),
        }
    )


class DecodeImage:
    """Actor-pool stage: payload bytes -> pixel tensor column.

    Real deployments: ``__init__`` loads the codec/model once per actor;
    ``__call__`` decodes a batch. Use
    ``ds.map_batches(DecodeImage, concurrency=N, batch_size=32)``.
    """

    def __init__(self, strict: bool = False) -> None:
        self.strict = strict
        # real impl: self.codec = load_codec_library()

    def _decode_one(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if self.strict:
            # STUB: the image codec is not available in this container.
            raise NotImplementedError(
                "image decode requires a codec library not present here; "
                "install one and replace this call"
            )
        # deterministic fake decode: hash-derived grayscale pixels
        n_px = int(width) * int(height)
        seed = int.from_bytes(payload[:8] or b"\0" * 8, "little")
        px = (mix64(np.arange(n_px, dtype=np.uint64), seed=seed % (1 << 31)) & np.uint64(0xFF)).astype(
            np.uint8
        )
        return px.reshape(int(height), int(width))

    def __call__(self, batch: pa.Table) -> pa.Table:
        pixels = [
            self._decode_one(p, w, h).flatten().tolist()
            for p, w, h in zip(
                batch.column("payload").to_pylist(),
                batch.column("width").to_pylist(),
                batch.column("height").to_pylist(),
            )
        ]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "width": batch.column("width"),
                "height": batch.column("height"),
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
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "features": pa.array(feats, pa.list_(pa.float64())),
            }
        )


def resize_stub(batch: pa.Table, target: int = 32) -> pa.Table:
    """Nearest-neighbor resize on the fake pixel tensors (real plumbing,
    deterministic math; a real codec path would swap in here)."""
    out = []
    for px, w, h in zip(
        batch.column("pixels").to_pylist(),
        batch.column("width").to_pylist(),
        batch.column("height").to_pylist(),
    ):
        a = np.asarray(px, dtype=np.uint8).reshape(int(h), int(w))
        ys = (np.arange(target) * h // target).astype(int)
        xs = (np.arange(target) * w // target).astype(int)
        out.append(a[np.ix_(ys, xs)].flatten().tolist())
    return pa.table(
        {
            "media_id": batch.column("media_id"),
            "width": pa.array([target] * batch.num_rows, pa.int32()),
            "height": pa.array([target] * batch.num_rows, pa.int32()),
            "pixels": pa.array(out, pa.list_(pa.uint8())),
        }
    )
