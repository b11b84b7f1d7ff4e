"""Benchmark decontamination over a documents table.

Every serious LLM training-data pipeline removes training documents
that overlap an evaluation benchmark (Brown et al. 2020 appendix C;
Chowdhery et al. 2022 §6; Rae et al. 2021 — public literature): a
training doc sharing word n-grams with a held-out benchmark leaks the
eval set into training and must be flagged or dropped.

Scale shape — the benchmark is SMALL by definition (eval sets are
megabytes) while the corpus is the 100-TB side, so this is the
canonical broadcast pattern, never a shuffle join:

1. one streaming pass over the *benchmark* docs: per-block DISTINCT
   n-grams (set union inside ``map_batches``), streamed to the driver
   under a hard cap (:class:`~jamie_ray.state.collect.EdgeCapExceeded`
   like every driver-side collection in this repo — a "benchmark" big
   enough to blow the cap is a misconfigured input, fail loudly);
2. ``ray.put`` the frozen gram set ONCE;
3. one streaming ``map_batches`` pass over the corpus counts each
   doc's distinct grams and how many fall in the benchmark set —
   no shuffle, no join, corpus never leaves its blocks.

Exactness: grams are compared as strings built from the RE2-exact
``\\s+`` tokenization (:func:`~jamie_ray.functions.text_analysis.ws_tokens`),
bit-exact with the DuckDB ``string_split_regex(text, '\\s+')`` twin in
``__ray_entry__.oracle_sql``. ``hashed=True`` hashes the benchmark
ONCE on the driver and broadcasts a sorted ``uint64`` array (8 B/gram
— the shape for a very large benchmark) at a documented
~|bench|·|doc grams|/2^64 false-positive collision risk; the default
stays exact. Corpus-side gram hashing goes through a per-worker
vocabulary cache (the ``dedup_docs._SHINGLE_HASH_CACHE`` argument
applies verbatim: real text repeats grams heavily, so the blake2b
cost is vocabulary-sized, not occurrence-sized).

n-gram convention matches ``doc_ngram_jaccard`` (and its SQL twin):
empty text -> no grams; <= n tokens -> the whole doc as one gram;
else all contiguous n-grams joined with a single space.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pyarrow as pa
import ray

from ..hashing import stable_hash64
from ..state.collect import DEFAULT_EDGE_CAP, iter_capped_batches
from .text_analysis import ws_tokens

__all__ = ["doc_grams", "benchmark_ngram_set", "decontaminate", "gram_hash"]

# per-worker gram-hash cache (vocabulary-sized, capped)
_GRAM_HASH_CACHE: dict[str, int] = {}
_GRAM_CACHE_CAP = 1 << 20


def gram_hash(g: str) -> int:
    """``stable_hash64`` of a gram string through the per-worker cache
    — the SAME function on the benchmark and corpus sides, so hashed
    membership is exactly string membership minus 2^-64 collisions."""
    h = _GRAM_HASH_CACHE.get(g)
    if h is None:
        h = stable_hash64(g)
        if len(_GRAM_HASH_CACHE) < _GRAM_CACHE_CAP:
            _GRAM_HASH_CACHE[g] = h
    return h


def _to_hash_array(grams) -> np.ndarray:
    """Sorted uint64 hash array from gram strings or precomputed 64-bit
    ints (``int`` or ``np.integer`` — e.g. ``hash_str_array`` output).

    Accepts any iterable, including len-less generators (materialized
    once so ``np.fromiter`` can be given an exact count)."""
    grams = grams if hasattr(grams, "__len__") else list(grams)
    arr = np.fromiter(
        (g if isinstance(g, (int, np.integer)) else gram_hash(g) for g in grams),
        dtype=np.uint64,
        count=len(grams),
    )
    arr.sort()
    return arr


def doc_grams(text: str | None, n: int = 3) -> set[str]:
    """Distinct word ``n``-grams of ``text`` (see module docstring for
    the short-doc convention shared with the SQL oracle)."""
    toks = ws_tokens(text)
    if not toks:
        return set()
    if len(toks) <= n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def benchmark_ngram_set(
    bench_ds: ray.data.Dataset,
    *,
    n: int = 3,
    text_col: str = "text",
    cap: int = DEFAULT_EDGE_CAP,
) -> frozenset[str]:
    """One pass over the (small) benchmark: per-block distinct grams,
    capped driver union. Raises ``EdgeCapExceeded`` past ``cap``."""

    def block_grams(batch: pa.Table) -> pa.Table:
        grams: set[str] = set()
        for t in batch.column(text_col).to_pylist():
            grams |= doc_grams(t, n)
        # sorted for deterministic block output (helps caching/tests)
        return pa.table({"g": pa.array(sorted(grams), pa.string())})

    per_block = bench_ds.map_batches(block_grams, batch_format="pyarrow")
    out: set[str] = set()
    # iter_capped_batches bounds streamed (pre-union) rows, and the
    # union is never larger, so no separate post-union check is needed
    for batch in iter_capped_batches(per_block, cap, context="benchmark n-gram set"):
        out.update(batch.column("g").to_pylist())
    return frozenset(out)


class _FlagContaminated:
    """map_batches actor: benchmark gram set shipped via ``ray.put``
    once, materialized per actor in ``__init__`` (the `_BroadcastJoin`
    pattern from ``pipelines/relational.py``)."""

    def __init__(self, grams_ref, n: int, text_col: str, hashed: bool) -> None:
        grams = (
            ray.get(grams_ref) if isinstance(grams_ref, ray.ObjectRef) else grams_ref
        )
        if hashed:
            # decontaminate() already ships a sorted uint64 array;
            # normalize here too for callers passing a pre-put ref of
            # raw grams. Sorted for O(log n) searchsorted membership.
            self.bench_hashes = (
                np.sort(grams) if isinstance(grams, np.ndarray) else _to_hash_array(grams)
            )
            self.bench = None
        else:
            self.bench = grams if isinstance(grams, frozenset) else frozenset(grams)
            self.bench_hashes = None
        self.n = n
        self.text_col = text_col

    def _hits(self, grams: set[str]) -> int:
        if self.bench is not None:
            return len(grams & self.bench)
        if not grams:
            return 0
        h = np.fromiter(
            (gram_hash(g) for g in grams), dtype=np.uint64, count=len(grams)
        )
        idx = np.searchsorted(self.bench_hashes, h)
        in_range = idx < len(self.bench_hashes)
        hits = np.zeros(len(h), dtype=bool)
        hits[in_range] = self.bench_hashes[idx[in_range]] == h[in_range]
        return int(hits.sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_grams, n_hits = [], []
        for t in batch.column(self.text_col).to_pylist():
            grams = doc_grams(t, self.n)
            n_grams.append(len(grams))
            n_hits.append(self._hits(grams))
        out = batch.drop_columns([self.text_col])
        out = out.append_column("n_grams", pa.array(n_grams, pa.int64()))
        out = out.append_column("n_hits", pa.array(n_hits, pa.int64()))
        return out.append_column(
            "contaminated",
            pa.array([1 if h > 0 else 0 for h in n_hits], pa.int64()),
        )


def decontaminate(
    docs_ds: ray.data.Dataset,
    benchmark: frozenset[str] | Iterable[str] | "ray.ObjectRef",
    *,
    n: int = 3,
    text_col: str = "text",
    hashed: bool = False,
    concurrency: tuple[int, int] = (1, 8),
) -> ray.data.Dataset:
    """Flag corpus docs sharing any word ``n``-gram with ``benchmark``.

    Output: the input's non-text columns + ``n_grams`` (distinct grams
    in the doc), ``n_hits`` (distinct grams also in the benchmark) and
    ``contaminated`` (0/1 int). Filtering/dropping is the caller's
    one-liner (``pc.equal(contaminated, 0)``) so the counts stay
    observable.

    ``benchmark`` may be a plain set/iterable of gram strings, an
    ``ObjectRef`` from a prior ``ray.put`` (shipped verbatim, re-used
    across calls), or — with ``hashed=True`` — gram strings OR 64-bit
    ``stable_hash64`` ints (``int``/``np.integer``); either way the
    hashed path broadcasts ONE sorted uint64 array, hashed on the
    driver, so the 8 B/gram object-store footprint is realized and
    actors never re-hash the benchmark.
    """
    if isinstance(benchmark, ray.ObjectRef):
        ref = benchmark
    elif hashed:
        ref = ray.put(_to_hash_array(benchmark))
    else:
        ref = ray.put(
            benchmark if isinstance(benchmark, frozenset) else frozenset(benchmark)
        )
    return docs_ds.map_batches(
        _FlagContaminated,
        fn_constructor_args=(ref, n, text_col, hashed),
        concurrency=concurrency,
        batch_format="pyarrow",
    )
