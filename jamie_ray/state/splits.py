"""Deterministic dataset splits (reference O2/O3, training harness).

The reference splits by document with a seeded KFold
(/root/reference/utils.py:1354-1380) and an unseeded ``random.random()``
train/dev carve-out (formater.py:61-75). Both are replaced with pure
key-hash splits — a row's split is a function of its key and the seed,
never of RNG state or row order, so splits are stable under
repartitioning and resume (SURVEY.md §4 determinism)."""

from __future__ import annotations

import pyarrow as pa

from ..hashing import stable_hash64


def split_column(batch: pa.Table, key_col: str, n_folds: int, seed: int = 1029) -> pa.Table:
    """+ ``fold`` column: stable_hash64(seed, key) % n_folds."""
    keys = batch.column(key_col).to_pylist()
    folds = [stable_hash64("fold", seed, k) % n_folds for k in keys]
    return batch.append_column("fold", pa.array(folds, pa.int32()))


def train_dev_filter(
    batch: pa.Table, key_col: str, dev_ratio: float = 0.1, side: str = "train",
    seed: int = 1029,
) -> pa.Table:
    """Keep train or dev rows: dev iff hash-uniform(key) < dev_ratio."""
    keys = batch.column(key_col).to_pylist()
    is_dev = [
        (stable_hash64("dev", seed, k) % 1_000_000) / 1_000_000.0 < dev_ratio
        for k in keys
    ]
    mask = pa.array([d if side == "dev" else not d for d in is_dev])
    return batch.filter(mask)


def kfold(ds, key_col: str, n_folds: int = 5, seed: int = 1029):
    """KFold analogue: returns [(train_ds, test_ds), ...] per fold —
    lazy filters over one pass-through column, no shuffles."""
    import pyarrow.compute as pc

    with_fold = ds.map_batches(
        lambda b: split_column(b, key_col, n_folds, seed), batch_format="pyarrow"
    )
    out = []
    for f in range(n_folds):
        test = with_fold.map_batches(
            lambda b, _f=f: b.filter(pc.equal(b.column("fold"), _f)),
            batch_format="pyarrow",
        )
        train = with_fold.map_batches(
            lambda b, _f=f: b.filter(pc.not_equal(b.column("fold"), _f)),
            batch_format="pyarrow",
        )
        out.append((train, test))
    return out
