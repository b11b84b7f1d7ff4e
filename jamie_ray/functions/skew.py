"""Skew handling utilities: salted groupby for hot keys.

The engine's default answer to skew is the combiner pattern (pre-
aggregate inside ``map_batches`` so a hot key collapses to one row per
block before the shuffle — see ``pipelines/relational.py``) plus
deterministic caps on quadratic per-group work (``stages/link.py``,
``functions/dedup_docs.py``). This module adds the third tool the north
rule names explicitly: **salting** for aggregations whose per-group
state is too large to combine blindly — the key is sharded into
``n_salts`` sub-keys, partial-aggregated per (key, salt), then reduced
per key, so one hot key's rows spread over ``n_salts`` reducers instead
of one.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def salted_group_sum(
    ds,
    key: str,
    sum_cols: list[str],
    *,
    n_salts: int = 16,
    count_as: str = "n",
):
    """groupby(key).sum(...) with a salt stage: shuffle #1 on
    (key, salt) — a hot key spreads over n_salts reducers — then a tiny
    shuffle #2 on key over the already-reduced rows. Returns one row per
    key with exact sums + counts."""

    def add_salt(batch: pa.Table) -> pa.Table:
        # round-robin by block-local row index: salt assignment is free
        # to be arbitrary (sums merge across salts, so WHICH salt a row
        # lands on never affects results — only load balance), and the
        # plain modulo spreads a hot key perfectly evenly, unlike a
        # hash, which collides away ~1/e of the salt space
        n = batch.num_rows
        salts = np.arange(n, dtype=np.int64) % n_salts
        return batch.append_column(
            "__salt", pa.array(salts.astype(np.int32), pa.int32())
        )

    def local(batch: pa.Table) -> pa.Table:
        gb = batch.group_by([key, "__salt"]).aggregate(
            [(c, "sum") for c in sum_cols] + [(key, "count")]
        )
        # select by the documented <col>_<agg> names — pyarrow's output
        # column ORDER is an implementation detail (CLAUDE.md rule)
        cols = {
            key: gb.column(key),
            "__salt": gb.column("__salt"),
        }
        for c in sum_cols:
            cols[f"{c}_sum"] = gb.column(f"{c}_sum")
        cols["__n"] = gb.column(f"{key}_count")
        return pa.table(cols)

    salted = ds.map_batches(add_salt, batch_format="pyarrow").map_batches(
        local, batch_format="pyarrow"
    )
    stage1 = salted.groupby([key, "__salt"]).sum(
        [f"{c}_sum" for c in sum_cols] + ["__n"]
    )

    def strip(batch: pa.Table) -> pa.Table:
        cols = {key: batch.column(key)}
        for c in sum_cols:
            cols[f"{c}_sum"] = batch.column(f"sum({c}_sum)")
        cols["__n"] = batch.column("sum(__n)")
        return pa.table(cols)

    stage2 = (
        stage1.map_batches(strip, batch_format="pyarrow")
        .groupby(key)
        .sum([f"{c}_sum" for c in sum_cols] + ["__n"])
    )

    def finish(batch: pa.Table) -> pa.Table:
        cols = {key: batch.column(key)}
        for c in sum_cols:
            cols[f"{c}_sum"] = batch.column(f"sum({c}_sum)")
        cols[count_as] = batch.column("sum(__n)")
        return pa.table(cols)

    return stage2.map_batches(finish, batch_format="pyarrow")
