"""Mergeable sketches for wide aggregations (custom-operator class
"a novel sketch" from the brief; no reference analogue — the reference
never aggregates beyond label vocabularies).

Two operators, both DESIGNED to give exact, oracle-checkable answers
while keeping the sketch's distributed shape:

- :func:`kmv_distinct` — K-Minimum-Values distinct count per group.
  Each block keeps the k smallest ``stable_hash64`` values per group
  (a combiner — bounded state regardless of block size); one tiny
  shuffle merges per-block sketches by sorted-union-truncate. With
  fewer than k distinct values the sketch IS the distinct set (exact
  count); beyond k it estimates ``(k-1) * 2^64 / h_k`` — the standard
  KMV estimator. Deterministic either way (no RNG: the hash is fixed).
- :func:`heavy_hitters` — exact frequent items via the two-pass
  Misra-Gries pattern: pass 1 runs an MG summary per block (bounded
  memory) and merges summaries; the merged summary's guarantee
  (undercount <= n/k) makes it a SUPERSET of every item with true
  frequency >= n/k. Pass 2 broadcast-filters to the candidates and
  counts them exactly — so the output is the exact set and exact
  counts of items above the threshold, while the full-key groupby a
  naive implementation would need never happens.

Scale notes: both shuffles carry O(groups × k) rows, independent of
input size; the MG candidate set is <= k items broadcast via the
closure (ids only).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import stable_hash64

DEFAULT_K = 8192


def _min_hashes(values: list, k: int) -> list[int]:
    hs = np.unique(
        np.array([stable_hash64("kmv", v) for v in values], dtype=np.uint64)
    )
    return hs[:k].tolist()  # np.unique sorts ascending


def kmv_distinct(ds, group_col: str, value_col: str, k: int = DEFAULT_K):
    """Dataset -> (group_col, n_distinct) via per-group KMV sketches.

    Exact whenever a group's true distinct count < ``k`` (the sketch
    holds the whole hash set); the KMV estimate beyond that. One
    shuffle of <= k hashes per (block, group).
    """

    def local(batch: pa.Table) -> pa.Table:
        g_type = batch.column(group_col).type
        out_g, out_h = [], []
        for g in pc.unique(batch.column(group_col)).to_pylist():
            part = batch.filter(pc.equal(batch.column(group_col), g))
            out_g.append(g)
            out_h.append(_min_hashes(part.column(value_col).to_pylist(), k))
        # key column typed from the INPUT (an empty block would
        # otherwise infer null type and break block schema unification)
        return pa.table(
            {
                group_col: pa.array(out_g, g_type),
                "kmv": pa.array(out_h, pa.list_(pa.uint64())),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        merged = np.unique(
            np.concatenate(
                [np.asarray(h, dtype=np.uint64) for h in group.column("kmv").to_pylist()]
            )
        )[:k]
        if len(merged) < k:
            n = len(merged)  # sketch holds the whole set: exact
        else:
            n = int(round((k - 1) * float(1 << 64) / float(merged[-1])))
        return pa.table(
            {
                group_col: group.column(group_col).slice(0, 1),
                "n_distinct": pa.array([n], pa.int64()),
            }
        )

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(merge, batch_format="pyarrow")
    )


def _mg_update(counters: dict, value, k: int) -> None:
    if value in counters:
        counters[value] += 1
    elif len(counters) < k - 1:
        counters[value] = 1
    else:  # decrement-all step
        dead = []
        for key in counters:
            counters[key] -= 1
            if counters[key] == 0:
                dead.append(key)
        for key in dead:
            del counters[key]


def heavy_hitters(
    ds,
    col: str,
    min_count: int | None = None,
    *,
    phi: float | None = None,
    k: int = 1024,
):
    """Dataset -> (col, n) EXACT counts of every value occurring at
    least ``min_count`` times (or ``phi`` fraction of all rows),
    without a full-key groupby.

    Correctness requirement (checked): the merged Misra-Gries summary
    undercounts any item by at most n_total/k, so the candidate set
    provably contains every item with true count >= n_total/k; the
    function requires ``k >= n_total / min_count`` (equivalently
    ``k >= 1/phi``), failing loudly rather than silently losing
    recall — the no-silent-caps rule.
    """
    import math

    if (min_count is None) == (phi is None):
        raise ValueError("pass exactly one of min_count / phi")

    def local(batch: pa.Table) -> pa.Table:
        counters: dict = {}
        for v in batch.column(col).to_pylist():
            _mg_update(counters, v, k)
        items = sorted(counters)
        return pa.table(
            {
                col: pa.array(items, batch.column(col).type),
                "mg_count": pa.array([counters[i] for i in items], pa.int64()),
            }
        )

    # merge all block summaries on the driver: <= k rows per block of
    # (value, count) — tiny. Summing MG summaries preserves the
    # per-item undercount bound (sum of per-block bounds <= n_total/k
    # after a final MG reduction with the same k).
    merged: dict = {}
    summaries = ds.map_batches(local, batch_format="pyarrow")
    for b in summaries.iter_batches(batch_format="pyarrow"):
        for v, c in zip(b.column(col).to_pylist(), b.column("mg_count").to_pylist()):
            merged[v] = merged.get(v, 0) + c
    n_total = ds.count()
    if min_count is None:
        min_count = max(1, math.ceil(phi * n_total))
    # STRICT bound: MG's guarantee is undercount <= n/k, so an item
    # with true count exactly n/k can merge to zero — equality at the
    # bound loses recall, hence <= not <
    if k <= n_total / max(min_count, 1):
        raise ValueError(
            f"heavy_hitters recall bound violated: k={k} <= n_total/min_count "
            f"= {n_total}/{min_count} — raise k or min_count/phi"
        )
    # final MG reduction to k-1 candidates (sum can exceed k-1 items)
    if len(merged) >= k:
        items = sorted(merged.items(), key=lambda kv: (-kv[1], repr(kv[0])))
        merged = dict(items[: k - 1])
    candidates = set(merged)

    # pass 2: exact counts of the candidates only (broadcast filter ->
    # partial counts -> one tiny groupby)
    def count_candidates(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_pylist()
        acc: dict = {}
        for v in vals:
            if v in candidates:
                acc[v] = acc.get(v, 0) + 1
        items = sorted(acc)
        return pa.table(
            {
                col: pa.array(items, batch.column(col).type),
                "n": pa.array([acc[i] for i in items], pa.int64()),
            }
        )

    def finish(group: pa.Table) -> pa.Table:
        total = sum(group.column("n").to_pylist())
        if total < min_count:
            return group.slice(0, 0)
        return pa.table(
            {
                col: group.column(col).slice(0, 1),
                "n": pa.array([total], pa.int64()),
            }
        )

    return (
        ds.map_batches(count_candidates, batch_format="pyarrow")
        .groupby(col)
        .map_groups(finish, batch_format="pyarrow")
    )
