"""Sequence packing — assign documents' token spans into fixed-size
training sequences of the virtual concatenated token stream (the
standard LLM pretraining batch layout: GPT-3, Brown et al. 2020 §2.3
"documents ... packed into sequences"; T5, Raffel et al. 2020 — public
literature). The engine emits the ASSIGNMENT (which doc tokens land in
which sequence), not token tensors: downstream tokenizers consume it.

Order contract: docs are packed in ``id_col`` order (or the input's
existing order with ``presorted=True``). The global prefix sum that
placement needs is inherently sequential, which the Dataset API cannot
express — this is one of the repo's few deliberate drops to raw Ray
tasks, structured so the sequential part touches ONE SMALL INTEGER PER
FILE, never the data:

1. sort by id (the one all-to-all; skipped with ``presorted=True``)
   and spill to parquet — Ray's default filename provider encodes
   ``{task_index:06}_{block_index:06}``, so lexicographic filename
   order IS global block order (pinned by a test);
2. one tiny Ray task per file counts its tokens (and reads its min id
   — sorted blocks hold disjoint id ranges, so min id recovers global
   order exactly even if write-task scheduling reordered filenames) →
   the driver cumsums ~one int per file (bounded by file count, not
   rows) into per-file start offsets;
3. a Dataset over the FILE DESCRIPTORS ``(path, token_offset)`` fans
   out the real work: each task re-reads its own file, local-cumsums,
   and emits per-``(doc, sequence)`` overlap rows — fully streaming,
   no shuffle, no driver bulk.

Determinism: integer token counts via the RE2-exact ``ws_tokens``;
spans are a pure function of (order, counts, max_len) — bit-identical
on any block layout or cluster size (pinned by ``test_packing.py``
against an independent pure-Python replay).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray

from .text_analysis import ws_tokens

__all__ = ["pack_sequences"]


@ray.remote(num_cpus=1)
def _count_file_tokens(path: str, id_col: str, text_col: str):
    """-> (token count, min id) of one spill file (min id None when
    the file is empty)."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=[id_col, text_col])
    n = sum(len(ws_tokens(x)) for x in t.column(text_col).to_pylist())
    ids = t.column(id_col)
    return n, (min(ids.to_pylist()) if len(ids) else None)


def _overlap_rows(
    batch: pa.Table,
    *,
    max_len: int,
    id_col: str,
    text_col: str,
) -> pa.Table:
    """One row per (doc, sequence) overlap for the file descriptor rows
    in ``batch`` (each row: path + that file's global token offset)."""
    import pyarrow.parquet as pq

    seq_ids, doc_ids, starts, ends, seq_offs = [], [], [], [], []
    id_type = pa.int64()
    for path, off in zip(
        batch.column("path").to_pylist(), batch.column("offset").to_pylist()
    ):
        t = pq.read_table(path, columns=[id_col, text_col])
        id_type = t.schema.field(id_col).type
        pos = off
        for did, text in zip(
            t.column(id_col).to_pylist(), t.column(text_col).to_pylist()
        ):
            n = len(ws_tokens(text))
            if n == 0:
                continue  # empty docs occupy no tokens (documented)
            first_seq = pos // max_len
            last_seq = (pos + n - 1) // max_len
            for k in range(first_seq, last_seq + 1):
                lo = max(pos, k * max_len)
                hi = min(pos + n, (k + 1) * max_len)
                seq_ids.append(k)
                doc_ids.append(did)
                starts.append(lo - pos)
                ends.append(hi - pos)
                seq_offs.append(lo - k * max_len)
            pos += n
    return pa.table(
        {
            "seq_id": pa.array(seq_ids, pa.int64()),
            # explicit type: an all-empty-docs file emits zero rows and
            # bare pa.array([]) would infer null, breaking the schema
            "doc_id": pa.array(doc_ids, id_type),
            "tok_start": pa.array(starts, pa.int64()),
            "tok_end": pa.array(ends, pa.int64()),
            "seq_tok_start": pa.array(seq_offs, pa.int64()),
        }
    )


def pack_sequences(
    docs,
    max_len: int,
    *,
    spill_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    presorted: bool = False,
    drop_remainder: bool = False,
):
    """documents -> Dataset of per-``(doc, sequence)`` assignments:
    ``seq_id`` (0-based fixed-size sequence), ``doc_id``, the doc-local
    token span ``[tok_start, tok_end)`` that lands in the sequence, and
    ``seq_tok_start`` (where it lands inside the sequence). Docs are
    concatenated in ``id_col`` order (input order with ``presorted``);
    a doc may span sequences. ``drop_remainder`` drops the final
    partial sequence. Returns ``(assignments, n_sequences)``.

    ``spill_dir``: parquet scratch; the sorted corpus is written once
    and each downstream task reads only its own file (resumable and
    idempotent like every spill in this repo)."""
    if max_len <= 0:
        raise ValueError(f"pack_sequences: max_len {max_len} must be positive")
    os.makedirs(spill_dir, exist_ok=True)
    for stale in os.listdir(spill_dir):
        if stale.endswith(".parquet"):
            os.unlink(os.path.join(spill_dir, stale))
    ordered = docs.select_columns([id_col, text_col])
    if not presorted:
        ordered = ordered.sort(id_col)
    # streaming execution does not guarantee write-task order matches
    # block order unless asked; the presorted path depends on it (the
    # sorted path re-derives order from per-file min ids below)
    ordered.context.execution_options.preserve_order = True
    ordered.write_parquet(spill_dir)
    files = sorted(
        os.path.join(spill_dir, f)
        for f in os.listdir(spill_dir)
        if f.endswith(".parquet")
    )
    stats = ray.get(
        [_count_file_tokens.remote(f, id_col, text_col) for f in files]
    )
    if not presorted:
        # sorted blocks hold disjoint id ranges: min id recovers the
        # global order exactly, independent of write-task scheduling
        order = sorted(
            range(len(files)),
            key=lambda i: (stats[i][1] is None, stats[i][1]),
        )
        files = [files[i] for i in order]
        stats = [stats[i] for i in order]
    counts = [s[0] for s in stats]
    total = int(sum(counts))
    n_sequences = total // max_len if drop_remainder else -(-total // max_len)
    if not files or total == 0:
        # keep the id type consistent with the non-empty path (the
        # spill files carry the real type; int64 only when nothing was
        # written at all)
        if files:
            import pyarrow.parquet as pq

            empty_id_type = pq.read_schema(files[0]).field(id_col).type
        else:
            empty_id_type = pa.int64()
        empty = pa.table(
            {
                "seq_id": pa.array([], pa.int64()),
                "doc_id": pa.array([], empty_id_type),
                "tok_start": pa.array([], pa.int64()),
                "tok_end": pa.array([], pa.int64()),
                "seq_tok_start": pa.array([], pa.int64()),
            }
        )
        return ray.data.from_arrow(empty), 0
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).tolist()

    descriptors = ray.data.from_items(
        [{"path": f, "offset": int(o)} for f, o in zip(files, offsets)]
    )
    assignments = descriptors.map_batches(
        lambda b: _overlap_rows(
            b, max_len=max_len, id_col=id_col, text_col=text_col
        ),
        batch_size=1,  # one file per task: the unit of read parallelism
        batch_format="pyarrow",
    )
    if drop_remainder and total % max_len:
        import pyarrow.compute as pc

        assignments = assignments.map_batches(
            lambda b: b.filter(pc.less(b.column("seq_id"), n_sequences)),
            batch_format="pyarrow",
        )
    return assignments, n_sequences
