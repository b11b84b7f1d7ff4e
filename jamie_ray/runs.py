"""Equal-key run iteration over sorted Arrow tables.

Shared by the bucketed-shuffle kernels (entity-link bands,
minhash-LSH bands): the shuffle groups on a coarse key bucket, and the
kernel walks the bucket's per-key runs — one place for the boundary
logic instead of copy-pasted loops.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa


def iter_key_runs(table: pa.Table, key_col: str) -> Iterator[pa.Table]:
    """Yield maximal equal-key slices of ``table`` (which MUST already
    be sorted by ``key_col``; callers sort with ``sort_by``)."""
    keys = table.column(key_col).to_pylist()
    run_start = 0
    for k in range(1, len(keys) + 1):
        if k < len(keys) and keys[k] == keys[run_start]:
            continue
        yield table.slice(run_start, k - run_start)
        run_start = k
