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

from ..labels import bio_to_spans


def chunk_to_pmhs(tokens, ner, rels, heads) -> str:
    toks = [t.replace("[JASP]", "　").replace("[SEP]", "\n") for t in tokens]
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
