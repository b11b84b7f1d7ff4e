"""JSONL (pmhs) debug sink (reference S10).

Re-expression of ``convert_rels_to_pmhs``
(/root/reference/utils.py:2635-2665): one JSON object per chunk with
``{"text", "spo_list", "bio", "selection"}`` — text is the fused token
string, spo_list carries mention-level subject/predicate/object dicts,
bio the tag sequence, selection the sparse (subject last-token,
predicate, object last-token) cells.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..labels import add_rel_cell, restore_tokens, bio_to_spans


def chunk_to_pmhs(tokens, ner, rels, heads) -> str:
    toks = restore_tokens(tokens)
    entities = bio_to_spans(ner)
    sent_dic = {e[2] - 1: e for e in entities}
    spo_list = []
    selection = []
    for tail_id, (head_ids, rel_tags) in enumerate(zip(heads, rels)):
        for head_id, rel in zip(head_ids, rel_tags):
            if rel == "N":
                continue
            selection.append(
                {"subject": tail_id, "predicate": rel, "object": head_id}
            )
            if tail_id in sent_dic and head_id in sent_dic:
                _, ts, te = sent_dic[tail_id]
                _, hs, he = sent_dic[head_id]
                spo_list.append(
                    {
                        "subject": "".join(toks[ts:te]),
                        "predicate": rel,
                        "object": "".join(toks[hs:he]),
                    }
                )
    return json.dumps(
        {
            "text": "".join(toks),
            "spo_list": spo_list,
            "bio": list(ner),
            "selection": selection,
        },
        ensure_ascii=False,
    )


def parse_pmhs(pmhs_json: str) -> dict:
    """One pmhs JSON object -> tagged-chunk dict (S10 input direction).

    The sink drops modality (the reference's pmhs schema has none,
    utils.py:2635-2665), so ``mod`` comes back all ``_`` — compare
    roundtrips on the mod-free projection. Tokens are recovered by
    re-analysis of the fused text (valid for analyzer-produced token
    sequences, i.e. all pipeline tokens — same domain argument as the
    brat reader); ``selection`` cells anchor rels/heads directly at
    token ids, so relations survive exactly.
    """
    from ..tokenization import analyze
    from .chunk import SEP_JOIN

    obj = json.loads(pmhs_json)
    text = obj.get("text", "")
    tokens = analyze(text.replace("\n", SEP_JOIN)) if text else []
    ner = list(obj.get("bio", []))
    n = len(tokens)
    anno_errors = 0
    if len(ner) != n:
        # token recovery disagrees with the stored bio length: the
        # chunk was not analyzer-consistent — counted, not dropped
        anno_errors += 1
        ner = (ner + ["O"] * n)[:n]
    rels: list[list[str]] = [["N"] for _ in range(n)]
    heads: list[list[int]] = [[i] for i in range(n)]
    for cell in obj.get("selection", []):
        t, h, r = cell.get("subject"), cell.get("object"), cell.get("predicate")
        if not (
            isinstance(t, int)
            and isinstance(h, int)
            and 0 <= t < n
            and 0 <= h < n
            and isinstance(r, str)  # missing/non-string predicate would
            # otherwise append None into the rels list column
        ):
            anno_errors += 1
            continue
        add_rel_cell(rels, heads, t, h, r)
    return {
        "tokens": tokens, "ner": ner, "mod": ["_"] * n,
        "rels": rels, "heads": heads, "anno_errors": anno_errors,
    }


def pmhs_to_tagged_batch(batch: pa.Table, pmhs_col: str = "pmhs") -> pa.Table:
    """map_batches kernel: (url, chunk_id, pmhs) -> tagged_chunks rows
    (+ ``anno_errors``; ``mod`` is all ``_`` — see :func:`parse_pmhs`)."""
    rows = [parse_pmhs(x) for x in batch.column(pmhs_col).to_pylist()]
    return pa.table(
        {
            "url": batch.column("url"),
            "chunk_id": batch.column("chunk_id"),
            "tokens": pa.array([r["tokens"] for r in rows], pa.list_(pa.string())),
            "ner": pa.array([r["ner"] for r in rows], pa.list_(pa.string())),
            "mod": pa.array([r["mod"] for r in rows], pa.list_(pa.string())),
            "rels": pa.array([r["rels"] for r in rows], pa.list_(pa.list_(pa.string()))),
            "heads": pa.array([r["heads"] for r in rows], pa.list_(pa.list_(pa.int32()))),
            "anno_errors": pa.array([r["anno_errors"] for r in rows], pa.int32()),
        }
    )


def tagged_to_pmhs_batch(batch: pa.Table) -> pa.Table:
    """map_batches kernel: tagged_chunks -> (url, chunk_id, pmhs json)."""
    out = [
        chunk_to_pmhs(t, n, r, h)
        for t, n, r, h in zip(
            batch.column("tokens").to_pylist(),
            batch.column("ner").to_pylist(),
            batch.column("rels").to_pylist(),
            batch.column("heads").to_pylist(),
        )
    ]
    return pa.table(
        {
            "url": batch.column("url"),
            "chunk_id": batch.column("chunk_id"),
            "pmhs": pa.array(out, pa.string()),
        }
    )
