"""Column profiler — the corpus-QA front door a 100-TB ingest wants
before any pipeline runs: per-column row/null counts, typed min/max,
and distinct counts (exact below the sketch size, KMV estimate
beyond), in ONE streaming pass.

Shape: every block emits one WIDE partial row (per column: count,
null count, typed min/max, the k smallest value hashes); the driver
reduces one row per block — bounded at any corpus size — with typed
Python compares for min/max and sorted-union-truncate for the KMV
sketches (the ``functions/sketch.py`` estimator). No shuffle at all.

No reference analogue (the reference never profiles its corpora);
brief-driven, composing the engine's sketch family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import stable_hash64

_KMV_SEED = "kmv"  # same hash family as sketch.kmv_distinct


def _profilable(t: pa.DataType) -> bool:
    return (
        pa.types.is_integer(t)
        or pa.types.is_floating(t)
        or pa.types.is_boolean(t)
        or pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_temporal(t)
    )


def profile_columns(ds, cols=None, *, kmv_k: int = 8192) -> pa.Table:
    """Dataset -> one profile row per column:
    (column, n, n_null, n_distinct, distinct_exact, min, max).

    ``n_distinct`` is exact while a column's true distinct count stays
    below ``kmv_k`` (``distinct_exact`` says which regime a row is in);
    beyond that it is the standard KMV estimate ``(k-1) * 2^64 / h_k``.
    ``min``/``max`` are rendered with ``str()`` so the output schema is
    uniform across column types (null for all-null or unprofilable
    columns). Deterministic on any block layout: counts are sums,
    min/max are order-free reduces, the hash set is layout-free.
    """
    schema = ds.schema().base_schema
    cols = list(cols) if cols is not None else list(schema.names)
    for c in cols:
        if c not in schema.names:
            raise KeyError(f"profile_columns: no column {c!r}")
    types = {c: schema.field(c).type for c in cols}

    def partial(batch: pa.Table) -> pa.Table:
        out: dict = {}
        for c in cols:
            col = batch.column(c)
            out[f"{c}__n"] = pa.array([len(col)], pa.int64())
            out[f"{c}__null"] = pa.array([col.null_count], pa.int64())
            valid = col.drop_null()
            ok = _profilable(types[c]) and len(valid) > 0
            if ok:
                mm = pc.min_max(col)
                mn, mx = mm["min"].as_py(), mm["max"].as_py()
            else:
                mn = mx = None
            out[f"{c}__min"] = pa.array([mn], types[c] if _profilable(types[c]) else pa.null())
            out[f"{c}__max"] = pa.array([mx], types[c] if _profilable(types[c]) else pa.null())
            if ok:
                hs = np.unique(
                    np.array(
                        [stable_hash64(_KMV_SEED, v) for v in valid.to_pylist()],
                        dtype=np.uint64,
                    )
                )[:kmv_k].tolist()
            else:
                hs = []
            out[f"{c}__kmv"] = pa.array([hs], pa.list_(pa.uint64()))
        return pa.table(out)

    # one partial row per block through the driver — bounded
    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()

    out_rows = []
    for c in cols:
        n = sum(r[f"{c}__n"] for r in rows)
        n_null = sum(r[f"{c}__null"] for r in rows)
        mins = [r[f"{c}__min"] for r in rows if r[f"{c}__min"] is not None]
        maxs = [r[f"{c}__max"] for r in rows if r[f"{c}__max"] is not None]
        merged: np.ndarray = np.array([], dtype=np.uint64)
        for r in rows:
            hs = r[f"{c}__kmv"]
            if len(hs):
                merged = np.unique(np.concatenate([merged, np.asarray(hs, np.uint64)]))[
                    :kmv_k
                ]
        if len(merged) < kmv_k:
            n_distinct, exact = len(merged), True
        else:
            n_distinct = int((kmv_k - 1) * (2**64) / int(merged[-1]))
            exact = False
        if not _profilable(types[c]):
            n_distinct, exact = 0, False
        out_rows.append(
            {
                "column": c,
                "n": n,
                "n_null": n_null,
                "n_distinct": n_distinct,
                "distinct_exact": exact,
                "min": str(min(mins)) if mins else None,
                "max": str(max(maxs)) if maxs else None,
            }
        )
    return pa.Table.from_pylist(
        out_rows,
        schema=pa.schema(
            [
                ("column", pa.string()),
                ("n", pa.int64()),
                ("n_null", pa.int64()),
                ("n_distinct", pa.int64()),
                ("distinct_exact", pa.bool_()),
                ("min", pa.string()),
                ("max", pa.string()),
            ]
        ),
    )
