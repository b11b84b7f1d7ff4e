"""Exact triple deduplication with provenance (SURVEY.md O6).

The reference keeps duplicate triples (one per sentence occurrence);
the north rule requires a deduplicated graph. Pattern: vectorized key
derivation -> **local pre-aggregation inside map_batches** (the
combiner: collapses duplicates within each block before any network
move) -> one global ``groupby(triple_key).map_groups`` shuffle over the
already-reduced rows. Provenance is deterministic: ``n_sources`` sums
occurrence counts; the kept (url, chunk_id) is the lexicographic min.
"""

from __future__ import annotations

import pyarrow as pa

from ..hashing import stable_hash64_signed

def _local_combine(batch: pa.Table) -> pa.Table:
    """Combiner: one row per triple key within this block."""
    cols = {name: batch.column(name).to_pylist() for name in batch.column_names}
    n = batch.num_rows
    has_count = "n_sources" in cols
    # first pass sees linked rows (subj_canon/obj_canon); the merge pass
    # sees already-combined rows whose subj/obj ARE the canonical surfaces
    subj_surface = cols.get("subj_canon", cols["subj"])
    obj_surface = cols.get("obj_canon", cols["obj"])
    acc: dict[int, dict] = {}
    for i in range(n):
        key = stable_hash64_signed(
            cols["subj_id"][i], cols["pred"][i], cols["obj_id"][i]
        )
        row = acc.get(key)
        # deterministic representative: the row that is lexicographically
        # smallest on (provenance, attributes) wins, so the kept
        # attributes (notably subj_mod, which can differ between
        # occurrences of the same triple) never depend on block layout
        order = (
            cols["url"][i],
            cols["chunk_id"][i],
            cols["subj_mod"][i],
            cols["subj_type"][i],
            cols["obj_type"][i],
        )
        cnt = cols["n_sources"][i] if has_count else 1
        if row is None:
            acc[key] = {
                "triple_key": key,
                "subj_id": cols["subj_id"][i],
                "pred": cols["pred"][i],
                "obj_id": cols["obj_id"][i],
                # canonical surfaces make the graph row self-describing
                "subj": subj_surface[i],
                "obj": obj_surface[i],
                "subj_type": cols["subj_type"][i],
                "obj_type": cols["obj_type"][i],
                "subj_mod": cols["subj_mod"][i],
                "n_sources": cnt,
                "url": order[0],
                "chunk_id": order[1],
                "__order": order,
            }
        else:
            row["n_sources"] += cnt
            if order < row["__order"]:
                row["__order"] = order
                row["url"], row["chunk_id"] = order[0], order[1]
                row["subj_mod"] = cols["subj_mod"][i]
                row["subj_type"] = cols["subj_type"][i]
                row["obj_type"] = cols["obj_type"][i]
                row["subj"] = subj_surface[i]
                row["obj"] = obj_surface[i]
    rows = list(acc.values())
    return pa.table(
        {
            "triple_key": pa.array([r["triple_key"] for r in rows], pa.int64()),
            "subj_id": pa.array([r["subj_id"] for r in rows], pa.int64()),
            "pred": pa.array([r["pred"] for r in rows], pa.string()),
            "obj_id": pa.array([r["obj_id"] for r in rows], pa.int64()),
            "subj": pa.array([r["subj"] for r in rows], pa.string()),
            "obj": pa.array([r["obj"] for r in rows], pa.string()),
            "subj_type": pa.array([r["subj_type"] for r in rows], pa.string()),
            "obj_type": pa.array([r["obj_type"] for r in rows], pa.string()),
            "subj_mod": pa.array([r["subj_mod"] for r in rows], pa.string()),
            "n_sources": pa.array([r["n_sources"] for r in rows], pa.int64()),
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "chunk_id": pa.array([r["chunk_id"] for r in rows], pa.int32()),
        }
    )


def _merge_group(group: pa.Table) -> pa.Table:
    """Reducer for one triple key: sum counts, min provenance."""
    combined = _local_combine(group)
    if combined.num_rows != 1:
        # same key, already combined per block — merging preserves that
        raise AssertionError("triple_key group merged to >1 row")
    return combined


def dedup_triples(linked):
    """linked triples Dataset -> deduplicated graph rows Dataset.

    The subj/obj columns of the output carry the canonical surfaces.
    """
    combined = linked.map_batches(_local_combine, batch_format="pyarrow")
    out = combined.groupby("triple_key").map_groups(
        _merge_group, batch_format="pyarrow"
    )
    return out.drop_columns(["triple_key"])
