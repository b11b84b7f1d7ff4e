"""Gold annotated-XML reader (the S1/S3 *input* direction).

The reference trains and evaluates on documents whose entities are
inline XML tags and whose relations are ``<brel>/<trel>`` elements
(parsed at /root/reference/utils.py:682-814: split text around tags,
tokenize each segment, assign B-/I- tags to mention tokens, map
``rid/arg1/arg2/reltype`` through ``tid`` anchors). Round 1 shipped
only the writer direction (``stages/format_out.py``); this module adds
the reader, so real annotated corpora load into the engine's
tagged-chunk schema and ``kg_eval`` runs against them.

Faithful behaviors:

- segment-wise tokenization (the reference tokenizes between tags, so
  token boundaries at tag edges are preserved, never re-merged);
- modality read from the value-class attribute (certainty/state/type,
  ``MOD_DICT``), default ``_``;
- ``DCT-Rel`` attributes become self-relations; ``brel``/``trel``
  elements anchor at each argument's LAST word with the default-cell
  replace-then-append convention of ``labels.sbwrel2head``;
- sentence boundaries: the writer emits ``[SEP]`` tokens as ``\\n`` —
  the reader maps them back through the ``　SEP　`` join the analyzer
  folds into ``[SEP]`` (``stages/chunk.py:SEP_JOIN``).

Use :func:`gold_xml_to_tagged_batch` as a ``map_batches`` kernel over
(url, chunk_id, xml) rows; output is the tagged-chunk schema, identical
to the scorer's, so every downstream stage (assemble, link, dedup,
eval) composes unchanged.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..tokenization import analyze
from .chunk import SEP_JOIN

_REL_LINE_RE = re.compile(
    r"<(?:brel|trel)\s+rid=\"[^\"]*\"\s+arg1=\"(?P<a1>[^\"]*)\"\s+"
    r"arg2=\"(?P<a2>[^\"]*)\"\s+reltype=\"(?P<rel>[^\"]*)\"\s*/>"
)
_ENTITY_RE = re.compile(
    r"<(?P<tag>[A-Za-z][\w-]*)(?P<attrs>(?:\s+[\w-]+=\"[^\"]*\")*)\s*>"
    r"(?P<inner>[^<]*)</(?P=tag)>"
)
_ATTR_RE = re.compile(r"([\w-]+)=\"([^\"]*)\"")

# value-class attributes that carry modality (format_out.MOD_DICT values)
_MOD_ATTRS = ("certainty", "state", "type")


def _tokenize_segment(segment: str) -> list[str]:
    """Plain-text segment (with ``\\n`` sentence breaks) -> tokens."""
    if not segment:
        return []
    return analyze(segment.replace("\n", SEP_JOIN))


def parse_gold_xml(xml: str) -> dict:
    """One gold chunk document -> tagged-chunk dict
    (tokens, ner, mod, rels, heads)."""
    rels_raw = [
        (m.group("a1"), m.group("a2"), m.group("rel"))
        for m in _REL_LINE_RE.finditer(xml)
    ]
    text = _REL_LINE_RE.sub("", xml).rstrip("\n")

    tokens: list[str] = []
    ner: list[str] = []
    mod: list[str] = []
    tid_span: dict[str, tuple[int, int]] = {}
    self_rels: list[tuple[int, str]] = []  # (anchor word, rel)

    pos = 0
    auto_tid = 0
    for m in _ENTITY_RE.finditer(text):
        for t in _tokenize_segment(text[pos : m.start()]):
            tokens.append(t)
            ner.append("O")
            mod.append("_")
        tag = m.group("tag")
        attrs = dict(_ATTR_RE.findall(m.group("attrs")))
        inner_toks = _tokenize_segment(m.group("inner"))
        if inner_toks:
            start = len(tokens)
            modality = next(
                (attrs[a] for a in _MOD_ATTRS if a in attrs), "_"
            )
            for k, t in enumerate(inner_toks):
                tokens.append(t)
                ner.append(("B-" if k == 0 else "I-") + tag)
                mod.append("_")
            mod[-1] = modality
            end = len(tokens)
            auto_tid += 1
            # auto ids are namespaced so an entity WITHOUT a tid can
            # never collide with (and be overwritten by) a later
            # explicit tid="T1" from the file
            tid_span[attrs.get("tid", f"__auto{auto_tid}")] = (start, end)
            if "DCT-Rel" in attrs:
                self_rels.append((end - 1, attrs["DCT-Rel"]))
        pos = m.end()
    for t in _tokenize_segment(text[pos:]):
        tokens.append(t)
        ner.append("O")
        mod.append("_")

    n = len(tokens)
    rels: list[list[str]] = [["N"] for _ in range(n)]
    heads: list[list[int]] = [[i] for i in range(n)]

    def add_rel(tail: int, head: int, rel: str) -> None:
        if rels[tail] == ["N"] and heads[tail] == [tail]:
            rels[tail] = [rel]
            heads[tail] = [head]
        else:
            rels[tail].append(rel)
            heads[tail].append(head)

    for anchor, rel in self_rels:
        add_rel(anchor, anchor, rel)
    for a1, a2, rel in rels_raw:
        if a1 not in tid_span or a2 not in tid_span:
            continue  # dangling tid: skip the relation, keep the doc
        add_rel(tid_span[a1][1] - 1, tid_span[a2][1] - 1, rel)

    return {"tokens": tokens, "ner": ner, "mod": mod, "rels": rels, "heads": heads}


def gold_xml_to_tagged_batch(batch: pa.Table, xml_col: str = "xml") -> pa.Table:
    """map_batches kernel: (url, chunk_id, xml) -> tagged_chunks rows."""
    rows = [parse_gold_xml(x) for x in batch.column(xml_col).to_pylist()]
    return pa.table(
        {
            "url": batch.column("url"),
            "chunk_id": batch.column("chunk_id"),
            "tokens": pa.array([r["tokens"] for r in rows], pa.list_(pa.string())),
            "ner": pa.array([r["ner"] for r in rows], pa.list_(pa.string())),
            "mod": pa.array([r["mod"] for r in rows], pa.list_(pa.string())),
            "rels": pa.array([r["rels"] for r in rows], pa.list_(pa.list_(pa.string()))),
            "heads": pa.array([r["heads"] for r in rows], pa.list_(pa.list_(pa.int32()))),
        }
    )
