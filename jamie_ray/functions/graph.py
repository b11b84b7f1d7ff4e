"""Distributed connected components over an edge Dataset.

The default cluster merger in this engine is the driver-side
``state.union_find.UnionFind``: verified edge lists are tiny while LSH
precision holds, so collecting them under ``state/collect.py``'s hard
cap is the fast path. When a corpus genuinely carries more duplicate
mass than driver memory (the ``EdgeCapExceeded`` failure mode), THIS
module is the remedy: the alternating large-star / small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC 2014 — public literature) computes the same min-id
components as a bounded number of bucketed shuffles over the edge
Dataset, never collecting the edge list anywhere.

Semantics are bit-identical to ``UnionFind`` with min-key roots (the
engine's determinism rule): every node that appears in any input edge
gets a row ``(node, root)`` where ``root`` is the smallest node id in
its component — singletons (self-loop-only nodes) map to themselves.
``tests/test_graph.py`` asserts equality against ``UnionFind`` on
seeded random graphs and on the worst-case path graph.

Scale notes (the 100-TB shape):

- per round the edge set lives as a **materialized** Dataset in the
  object store (edges are O(duplicate mass), orders of magnitude
  smaller than the corpus; materializing per round is what makes the
  iteration not re-execute its whole lineage each pass);
- every round is two ``groupby(bucket)`` shuffles whose rows are three
  int64s — no payloads, no driver state;
- round count is O(log^2 n) worst case (paper bound); near-dup
  cluster graphs (small diameter) converge in 2-4 rounds;
- ``max_iters`` fails loudly rather than spinning.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_CHK_MASK = (1 << 64) - 1


def _bucketize(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    # numpy mod follows Python sign semantics -> non-negative for a
    # positive divisor even on negative ids
    return np.mod(keys, np.int64(n_buckets))


def _canonicalize(edges, col_a: str, col_b: str, n_buckets: int):
    """(a, b) -> canonical (hi, lo) rows, self-loops dropped (their
    nodes are retained via the separate node inventory)."""

    def canon(batch: pa.Table) -> pa.Table:
        if batch.column(col_a).null_count or batch.column(col_b).null_count:
            # a null id would round-trip through float NaN and astype
            # to INT64_MIN — the global minimum, which would silently
            # become the root of its whole component
            raise ValueError(
                "connected_components: edge endpoint column contains "
                "nulls — drop/repair upstream"
            )
        a = batch.column(col_a).to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column(col_b).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        hi = np.maximum(a, b)
        lo = np.minimum(a, b)
        return pa.table(
            {
                "hi": pa.array(hi, pa.int64()),
                "lo": pa.array(lo, pa.int64()),
            }
        )

    return edges.map_batches(canon, batch_format="pyarrow")


def _edge_stats(edges) -> tuple[int, int]:
    """(row count, order-independent checksum) in ONE pass over a
    materialized edge Dataset — the convergence signature."""

    def partial(batch: pa.Table) -> pa.Table:
        hi = batch.column("hi").to_numpy(zero_copy_only=False).astype(np.uint64)
        lo = batch.column("lo").to_numpy(zero_copy_only=False).astype(np.uint64)
        # order-independent: sum of a per-edge mix (wraparound uint64)
        x = hi * np.uint64(0x9E3779B97F4A7C15) ^ lo * np.uint64(0xC2B2AE3D27D4EB4F)
        x ^= x >> np.uint64(33)
        chk = int(np.sum(x, dtype=np.uint64))
        return pa.table(
            {
                "n": pa.array([batch.num_rows], pa.int64()),
                "chk": pa.array([chk & _CHK_MASK], pa.uint64()),
            }
        )

    n_total, chk_total = 0, 0
    for row in edges.map_batches(partial, batch_format="pyarrow").take_all():
        n_total += row["n"]
        chk_total = (chk_total + row["chk"]) & _CHK_MASK
    return n_total, chk_total


def _star(edges, large: bool, n_buckets: int):
    """One star operation: bucketed shuffle on the key node, per-key
    min-neighbor emission. ``large=True`` hooks every larger neighbor
    to the key's min; ``large=False`` (small-star) hooks every smaller
    neighbor (and the key itself) to the minimum."""

    def emit(batch: pa.Table) -> pa.Table:
        hi = batch.column("hi").to_numpy(zero_copy_only=False)
        lo = batch.column("lo").to_numpy(zero_copy_only=False)
        if large:
            # both directions: each endpoint sees its full neighborhood
            key = np.concatenate([hi, lo])
            val = np.concatenate([lo, hi])
        else:
            key, val = hi, lo
        return pa.table(
            {
                "bucket": pa.array(_bucketize(key, n_buckets), pa.int64()),
                "key": pa.array(key, pa.int64()),
                "val": pa.array(val, pa.int64()),
            }
        )

    def reduce_group(group: pa.Table) -> pa.Table:
        from ..runs import iter_key_runs

        group = group.sort_by([("key", "ascending"), ("val", "ascending")])
        out_hi: list[int] = []
        out_lo: list[int] = []
        for run in iter_key_runs(group, "key"):
            u = run.column("key")[0].as_py()
            vals = run.column("val").to_numpy(zero_copy_only=False)
            m = int(min(vals.min(), u))
            if large:
                # hook strictly-larger neighbors to m (v > u >= m)
                bigger = np.unique(vals[vals > u])
                out_hi.extend(int(v) for v in bigger)
                out_lo.extend([m] * len(bigger))
            else:
                # hook all smaller neighbors and u itself to m
                members = np.unique(vals)  # all < u by construction
                for v in members:
                    if int(v) != m:
                        out_hi.append(int(v))
                        out_lo.append(m)
                if u != m:
                    out_hi.append(int(u))
                    out_lo.append(m)
        return pa.table(
            {
                "hi": pa.array(out_hi, pa.int64()),
                "lo": pa.array(out_lo, pa.int64()),
            }
        )

    return (
        edges.map_batches(emit, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce_group, batch_format="pyarrow")
    )


def _iterate_stars(cur, n_buckets: int, max_iters: int):
    """Alternate large/small stars on a materialized canonical edge
    Dataset until the edge set is stable; returns the fixpoint star
    edges ``(hi=node, lo=root)``."""
    prev_sig = None
    for _ in range(max_iters):
        cur = _star(cur, large=True, n_buckets=n_buckets).materialize()
        cur = _star(cur, large=False, n_buckets=n_buckets).materialize()
        sig = _edge_stats(cur)
        if sig == prev_sig:
            return cur
        prev_sig = sig
    raise RuntimeError(
        f"connected_components: no convergence after {max_iters} "
        "alternating star rounds — this exceeds the algorithm's "
        "O(log^2 n) bound and indicates a bug or non-int64 ids"
    )


def component_pairs(
    edges,
    col_a: str = "id_a",
    col_b: str = "id_b",
    *,
    n_buckets: int = 1024,
    max_iters: int = 64,
):
    """Lean variant of :func:`connected_components` for lookup-style
    consumers (e.g. ``minhash_clusters(cc="distributed")``): returns
    the fixpoint star edges as ``(node, root)`` WITHOUT the singleton
    inventory and final resolve shuffles. Contract differences, both
    harmless for map-assignment (``.get(node, node)`` semantics):
    rows may be duplicated, and self-loop-only nodes are absent."""

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"node": batch.column("hi"), "root": batch.column("lo")}
        )

    cur = _iterate_stars(
        _canonicalize(edges, col_a, col_b, n_buckets).materialize(),
        n_buckets,
        max_iters,
    )
    return cur.map_batches(rename, batch_format="pyarrow")


def connected_components(
    edges,
    col_a: str = "id_a",
    col_b: str = "id_b",
    *,
    n_buckets: int = 1024,
    max_iters: int = 64,
):
    """Edge Dataset ``(col_a, col_b)`` (int64 node ids, undirected,
    duplicates/self-loops fine) -> Dataset ``(node, root)`` with one
    row per distinct node, ``root`` = min node id of its component.

    Raises ``RuntimeError`` if the alternating iteration has not
    converged after ``max_iters`` rounds (the paper's bound is
    O(log^2 n); hitting this indicates a bug, not a big graph).
    """
    # node inventory (for singleton completeness) — one bucketed
    # distinct over both endpoint columns
    def emit_nodes(batch: pa.Table) -> pa.Table:
        a = batch.column(col_a).to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column(col_b).to_numpy(zero_copy_only=False).astype(np.int64)
        nodes = np.unique(np.concatenate([a, b]))
        return pa.table(
            {
                "bucket": pa.array(_bucketize(nodes, n_buckets), pa.int64()),
                "node": pa.array(nodes, pa.int64()),
            }
        )

    def distinct_nodes(group: pa.Table) -> pa.Table:
        nodes = np.unique(group.column("node").to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(nodes, pa.int64())})

    nodes = (
        edges.map_batches(emit_nodes, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(distinct_nodes, batch_format="pyarrow")
    ).materialize()

    cur = _iterate_stars(
        _canonicalize(edges, col_a, col_b, n_buckets).materialize(),
        n_buckets,
        max_iters,
    )

    # final assembly: every node joined (bucketed) against the star
    # edges; nodes with no incoming (v, root) row are roots/singletons
    def tag_nodes(batch: pa.Table) -> pa.Table:
        n = batch.column("node").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(_bucketize(n, n_buckets), pa.int64()),
                "node": pa.array(n, pa.int64()),
                "root": pa.array(np.full(len(n), -1), pa.int64()),
                "is_edge": pa.array(np.zeros(len(n), np.int8), pa.int8()),
            }
        )

    def tag_edges(batch: pa.Table) -> pa.Table:
        hi = batch.column("hi").to_numpy(zero_copy_only=False)
        lo = batch.column("lo").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(_bucketize(hi, n_buckets), pa.int64()),
                "node": pa.array(hi, pa.int64()),
                "root": pa.array(lo, pa.int64()),
                "is_edge": pa.array(np.ones(len(hi), np.int8), pa.int8()),
            }
        )

    def resolve(group: pa.Table) -> pa.Table:
        from ..runs import iter_key_runs

        group = group.sort_by([("node", "ascending"), ("root", "ascending")])
        out_node: list[int] = []
        out_root: list[int] = []
        for run in iter_key_runs(group, "node"):
            node = run.column("node")[0].as_py()
            roots = run.column("root").to_numpy(zero_copy_only=False)
            is_edge = run.column("is_edge").to_numpy(zero_copy_only=False)
            real = roots[is_edge == 1]
            # a node the inventory saw but no star edge points at is
            # its own root; otherwise the (unique at convergence) min
            out_node.append(node)
            out_root.append(int(real.min()) if len(real) else node)
        return pa.table(
            {
                "node": pa.array(out_node, pa.int64()),
                "root": pa.array(out_root, pa.int64()),
            }
        )

    return (
        nodes.map_batches(tag_nodes, batch_format="pyarrow")
        .union(cur.map_batches(tag_edges, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(resolve, batch_format="pyarrow")
    )


def assign_components(ids_ds, comp_ds, id_col: str = "doc_id", *, n_buckets: int = 1024):
    """Bucketed shuffle-join assignment: each row of ``ids_ds`` gets
    ``cluster_id`` = its component root (itself when unclustered),
    WITHOUT collecting the component map to the driver — the full-scale
    sibling of the broadcast ``Assign`` in ``dedup_docs``.

    ``comp_ds`` is ``connected_components`` output ``(node, root)``.
    """

    def tag_ids(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(_bucketize(ids, n_buckets), pa.int64()),
                "node": pa.array(ids, pa.int64()),
                "root": pa.array(np.full(len(ids), -1), pa.int64()),
                "is_comp": pa.array(np.zeros(len(ids), np.int8), pa.int8()),
            }
        )

    def tag_comp(batch: pa.Table) -> pa.Table:
        n = batch.column("node").to_numpy(zero_copy_only=False)
        r = batch.column("root").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(_bucketize(n, n_buckets), pa.int64()),
                "node": pa.array(n, pa.int64()),
                "root": pa.array(r, pa.int64()),
                "is_comp": pa.array(np.ones(len(n), np.int8), pa.int8()),
            }
        )

    def join(group: pa.Table) -> pa.Table:
        from ..runs import iter_key_runs

        group = group.sort_by([("node", "ascending"), ("is_comp", "descending")])
        out_id: list[int] = []
        out_cluster: list[int] = []
        for run in iter_key_runs(group, "node"):
            node = run.column("node")[0].as_py()
            is_comp = run.column("is_comp").to_numpy(zero_copy_only=False)
            roots = run.column("root").to_numpy(zero_copy_only=False)
            comp_roots = roots[is_comp == 1]
            root = int(comp_roots[0]) if len(comp_roots) else node
            n_id_rows = int((is_comp == 0).sum())
            out_id.extend([node] * n_id_rows)
            out_cluster.extend([root] * n_id_rows)
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "cluster_id": pa.array(out_cluster, pa.int64()),
            }
        )

    return (
        ids_ds.map_batches(tag_ids, batch_format="pyarrow")
        .union(comp_ds.map_batches(tag_comp, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(join, batch_format="pyarrow")
    )
