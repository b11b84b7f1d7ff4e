"""XML / brat output formatters (reference S8/S9 debug surfaces).

Re-expressions of ``MultiheadConll.doc_to_xml``
(/root/reference/data_objects.py:267-310) and ``doc_to_brat``
(data_objects.py:312-361) as per-chunk string builders inside
``map_batches`` — the engine's outputs are Parquet tables of strings,
not files, so they compose with any sink.

Semantics preserved from the reference:
- entity tags re-inserted in reverse span order with ``tid`` ids and a
  modality attribute named via the MOD_DICT value class (certainty /
  state / type);
- ``brel`` vs ``trel`` chosen by whether either endpoint is a TIMEX3;
  self-relations become ``DCT-Rel`` attributes (xml) / A-lines (brat);
- brat char offsets accumulate over emitted sentence text.
"""

from __future__ import annotations

import pyarrow as pa

from ..labels import restore_tokens, bio_to_spans

# modality value -> attribute name (data_objects.py:6-10)
MOD_DICT = {
    "positive": "certainty", "suspicious": "certainty",
    "negative": "certainty", "general": "certainty",
    "executed": "state", "negated": "state", "scheduled": "state", "other": "state",
    "DATE": "type", "TIME": "type", "DURATION": "type", "CC": "type",
    "SET": "type", "AGE": "type", "MISC": "type",
}

_TIMEX_TAGS = ("TIMEX3", "Timex3")


def _views(toks, ner, mod, rels, heads):
    """Shared derived views (mod_entities + detailed triplets)."""
    toks = restore_tokens(toks)
    entities = bio_to_spans(ner)
    mod_entities = [(tag, s, e, mod[e - 1]) for tag, s, e in entities]
    sent_dic = {e - 1: (s, e) for _, s, e in entities}
    detailed = []
    for tail_id, (head_ids, rel_tags) in enumerate(zip(heads, rels)):
        for head_id, rel in zip(head_ids, rel_tags):
            if rel == "N":
                continue
            t_span = sent_dic.get(tail_id, (tail_id, tail_id + 1))
            h_span = sent_dic.get(head_id, (head_id, head_id + 1))
            detailed.append((t_span, h_span, rel))
    return toks, mod_entities, detailed


def chunk_to_xml(toks, ner, mod, rels, heads) -> str:
    """One tagged chunk -> inline-XML string (doc_to_xml semantics)."""
    toks, mod_entities, detailed = _views(toks, ner, mod, rels, heads)
    span2tid: dict[tuple[int, int], tuple[str, str]] = {}
    tid = 1
    for tag, s, e, _m in mod_entities:
        span2tid[(s, e)] = (f"T{tid}", tag)
        tid += 1
    span2rel = {(t, h): r for t, h, r in detailed}

    out = list(toks)
    for tag, s, e, m in reversed(mod_entities):
        span = (s, e)
        out.insert(e, f"</{tag}>")
        attrs = f" tid=\"{span2tid[span][0]}\""
        if m != "_":
            # attribute named by the reference's value class; a value
            # outside the reference vocabulary (e.g. i2b2 assertions)
            # keeps a generic "modality" attribute instead of being
            # silently dropped (the brat sink preserves such values too)
            attrs += f" {MOD_DICT.get(m, 'modality')}=\"{m}\""
        if (span, span) in span2rel:
            attrs += f" DCT-Rel=\"{span2rel[(span, span)]}\""
        out.insert(s, f"<{tag}{attrs}>")
    lines = ["".join(out)]

    rid = 1
    for (t_span, h_span), rel in span2rel.items():
        if t_span not in span2tid or h_span not in span2tid:
            continue
        t_tid, t_tag = span2tid[t_span]
        h_tid, h_tag = span2tid[h_span]
        if t_tid == h_tid:
            continue
        el = "trel" if (t_tag in _TIMEX_TAGS or h_tag in _TIMEX_TAGS) else "brel"
        lines.append(
            f"<{el} rid=\"R{rid}\" arg1=\"{t_tid}\" arg2=\"{h_tid}\" reltype=\"{rel}\" />"
        )
        rid += 1
    return "\n".join(lines) + "\n"


def chunk_to_brat(toks, ner, mod, rels, heads) -> tuple[str, str]:
    """One tagged chunk -> (brat .txt, brat .ann) strings
    (doc_to_brat semantics, is_prism=False surface tags)."""
    toks, mod_entities, detailed = _views(toks, ner, mod, rels, heads)
    txt = "".join(toks) + "\n"
    # one cumulative offset array instead of a prefix join per
    # annotation (the reader's `starts` pattern — O(n) not O(E*n))
    starts = [0]
    for t in toks:
        starts.append(starts[-1] + len(t))
    ann_lines: list[str] = []
    eid, mid, rid = 1, 1, 1
    charid2eid: dict[int, str] = {}
    for tag, s, e, m in mod_entities:
        begin = starts[s]
        end = starts[e]
        surface = "".join(toks[s:e])
        ann_lines.append(f"T{eid}\t{tag} {begin} {end}\t{surface}")
        charid2eid[end - 1] = f"T{eid}"
        if m != "_":
            ann_lines.append(f"A{mid}\t{m} T{eid} {m}")
            mid += 1
        eid += 1
    for (ts, te), (hs, he), rel in detailed:
        t_char = starts[te] - 1
        h_char = starts[he] - 1
        if t_char in charid2eid and h_char in charid2eid:
            if t_char != h_char:
                ann_lines.append(
                    f"R{rid}\t{rel} Arg1:{charid2eid[t_char]} Arg2:{charid2eid[h_char]}"
                )
                rid += 1
            else:
                ann_lines.append(f"A{mid}\tDCT-Rel {charid2eid[t_char]} {rel}")
                mid += 1
    return txt, "\n".join(ann_lines) + ("\n" if ann_lines else "")


def tagged_to_xml_batch(batch: pa.Table) -> pa.Table:
    xmls = [
        chunk_to_xml(t, n, m, r, h)
        for t, n, m, r, h in zip(
            batch.column("tokens").to_pylist(),
            batch.column("ner").to_pylist(),
            batch.column("mod").to_pylist(),
            batch.column("rels").to_pylist(),
            batch.column("heads").to_pylist(),
        )
    ]
    return pa.table(
        {
            "url": batch.column("url"),
            "chunk_id": batch.column("chunk_id"),
            "xml": pa.array(xmls, pa.string()),
        }
    )


def tagged_to_brat_batch(batch: pa.Table) -> pa.Table:
    txts, anns = [], []
    for t, n, m, r, h in zip(
        batch.column("tokens").to_pylist(),
        batch.column("ner").to_pylist(),
        batch.column("mod").to_pylist(),
        batch.column("rels").to_pylist(),
        batch.column("heads").to_pylist(),
    ):
        txt, ann = chunk_to_brat(t, n, m, r, h)
        txts.append(txt)
        anns.append(ann)
    return pa.table(
        {
            "url": batch.column("url"),
            "chunk_id": batch.column("chunk_id"),
            "brat_txt": pa.array(txts, pa.string()),
            "brat_ann": pa.array(anns, pa.string()),
        }
    )
