"""Triple assembly: tagged_chunks -> mention-level triples.

Re-implements the five derived views of the reference's
``MultiheadConll`` document object (/root/reference/data_objects.py:
166-265) as pure functions over Arrow list columns inside one
``map_batches`` kernel:

- entity spans        (update_entities, via bio_to_spans)
- modality entities   (update_mod_entities — LAST-token rule, :226-229)
- rel triplets        (update_rel_triplets — skip 'N', :231-238)
- span resolution     (update_rel_detailed_triplets dict, :240-249)
- mention triplets    (update_rel_mention_triplets — drop pairs whose
                       anchor is not an entity last token, :251-265)

Sentinel restore on token surfaces ( [JASP]->U+3000, [SEP]->newline )
follows data_objects.py:210.
"""

from __future__ import annotations

import pyarrow as pa

from ..labels import restore_tokens, bio_to_spans


def assemble_batch(batch: pa.Table) -> pa.Table:
    """map_batches kernel: tagged_chunks -> triples rows."""
    urls = batch.column("url").to_pylist()
    cids = batch.column("chunk_id").to_pylist()
    tokens_col = batch.column("tokens").to_pylist()
    ner_col = batch.column("ner").to_pylist()
    mod_col = batch.column("mod").to_pylist()
    rels_col = batch.column("rels").to_pylist()
    heads_col = batch.column("heads").to_pylist()

    out: dict[str, list] = {
        k: []
        for k in ("subj", "pred", "obj", "subj_type", "obj_type", "subj_mod", "url", "chunk_id")
    }

    for url, cid, toks, ner, mod, rels, heads in zip(
        urls, cids, tokens_col, ner_col, mod_col, rels_col, heads_col
    ):
        toks = restore_tokens(toks)
        entities = bio_to_spans(ner)
        # last-token -> (tag, start, end); ends are unique by construction
        sent_dic = {e[2] - 1: e for e in entities}

        for tail_id, (head_ids, rel_tags) in enumerate(zip(heads, rels)):
            for head_id, rel in zip(head_ids, rel_tags):
                if rel == "N":
                    continue
                # mention-level rule: both anchors must be entity last
                # tokens (data_objects.py:261)
                if tail_id not in sent_dic or head_id not in sent_dic:
                    continue
                t_tag, t_start, t_end = sent_dic[tail_id]
                h_tag, h_start, h_end = sent_dic[head_id]
                out["subj"].append("".join(toks[t_start:t_end]))
                out["pred"].append(rel)
                out["obj"].append("".join(toks[h_start:h_end]))
                out["subj_type"].append(t_tag)
                out["obj_type"].append(h_tag)
                out["subj_mod"].append(mod[t_end - 1])
                out["url"].append(url)
                out["chunk_id"].append(cid)

    return pa.table(
        {
            "subj": pa.array(out["subj"], pa.string()),
            "pred": pa.array(out["pred"], pa.string()),
            "obj": pa.array(out["obj"], pa.string()),
            "subj_type": pa.array(out["subj_type"], pa.string()),
            "obj_type": pa.array(out["obj_type"], pa.string()),
            "subj_mod": pa.array(out["subj_mod"], pa.string()),
            "url": pa.array(out["url"], pa.string()),
            "chunk_id": pa.array(out["chunk_id"], pa.int32()),
        }
    )


def entities_batch(batch: pa.Table) -> pa.Table:
    """map_batches kernel: tagged_chunks -> entity-mention rows
    (the mod_entities view, data_objects.py:226-229)."""
    urls = batch.column("url").to_pylist()
    cids = batch.column("chunk_id").to_pylist()
    tokens_col = batch.column("tokens").to_pylist()
    ner_col = batch.column("ner").to_pylist()
    mod_col = batch.column("mod").to_pylist()

    out: dict[str, list] = {k: [] for k in ("url", "chunk_id", "mention", "ner_tag", "mod")}
    for url, cid, toks, ner, mod in zip(urls, cids, tokens_col, ner_col, mod_col):
        toks = restore_tokens(toks)
        for tag, start, end in bio_to_spans(ner):
            out["url"].append(url)
            out["chunk_id"].append(cid)
            out["mention"].append("".join(toks[start:end]))
            out["ner_tag"].append(tag)
            out["mod"].append(mod[end - 1])
    return pa.table(
        {
            "url": pa.array(out["url"], pa.string()),
            "chunk_id": pa.array(out["chunk_id"], pa.int32()),
            "mention": pa.array(out["mention"], pa.string()),
            "ner_tag": pa.array(out["ner_tag"], pa.string()),
            "mod": pa.array(out["mod"], pa.string()),
        }
    )
