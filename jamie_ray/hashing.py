"""Stable deterministic hashing used everywhere in the engine.

All synthetic-data generation, mock-model decisions, partition ids and
dedup keys are pure functions of content via these hashes — never of RNG
state or scheduling order — so runs (and resumed runs) are reproducible
bit-for-bit (SURVEY.md §7.4 determinism requirement).

Implementation is blake2b (stdlib, no deps) truncated to 64 bits for the
scalar path, plus a vectorized numpy multiply-xor-shift mix for hot paths
that operate on whole Arrow columns.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MASK64 = (1 << 64) - 1


def stable_hash64(*parts: object) -> int:
    """64-bit stable hash of a tuple of parts (joined with a separator).

    Unsigned range [0, 2^64). Accepts str/int/bytes parts.
    """
    h = hashlib.blake2b(digest_size=8)
    for p in parts:
        if isinstance(p, bytes):
            h.update(p)
        else:
            h.update(str(p).encode("utf-8"))
        h.update(b"\x1f")
    return int.from_bytes(h.digest(), "little")


def stable_hash64_signed(*parts: object) -> int:
    """Same as :func:`stable_hash64` but mapped into int64 range."""
    v = stable_hash64(*parts)
    return v - (1 << 64) if v >= (1 << 63) else v


def hash_str_array(values, seed: int = 0) -> np.ndarray:
    """Vectorized-ish 64-bit hash of an iterable of strings -> uint64 array.

    Per-element blake2b; used for dedup keys and partition assignment on
    string columns. (Python loop over a batch is acceptable here: hashing
    is the whole kernel and blake2b releases the GIL per call; for very
    hot paths use :func:`mix64` over already-integer columns instead.)
    """
    out = np.empty(len(values), dtype=np.uint64)
    seed_b = seed.to_bytes(8, "little", signed=False)
    for i, v in enumerate(values):
        h = hashlib.blake2b(digest_size=8, key=seed_b)
        h.update(v.encode("utf-8") if isinstance(v, str) else bytes(v))
        out[i] = int.from_bytes(h.digest(), "little")
    return out


def mix64(x: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized 64-bit finalizer (splitmix64-style) over a uint64 array.

    Used to derive independent hash families (minhash permutations,
    salting) from one base hash without re-hashing strings.
    """
    z = (x.astype(np.uint64) + np.uint64((seed * 0x9E3779B97F4A7C15) & _MASK64))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z &= np.uint64(_MASK64)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z &= np.uint64(_MASK64)
    return z ^ (z >> np.uint64(31))


def mix64_multi(x: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """Apply :func:`mix64` for many seeds at once: returns shape
    (len(seeds), len(x)) — one hash family per row. Vectorizes the
    minhash permutation loop into a single broadcasted pass."""
    s = (seeds.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) & np.uint64(_MASK64)
    z = x.astype(np.uint64)[None, :] + s[:, None]
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z &= np.uint64(_MASK64)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z &= np.uint64(_MASK64)
    return z ^ (z >> np.uint64(31))


def uniform01(x: np.ndarray, seed: int = 0) -> np.ndarray:
    """Map uint64 hashes to deterministic floats in [0, 1)."""
    return (mix64(x, seed) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
