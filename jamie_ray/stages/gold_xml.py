"""Gold annotated-XML reader (the S1/S3 *input* direction).

The reference trains and evaluates on documents whose entities are
inline XML tags and whose relations are ``<brel>/<trel>`` elements
(parsed at /root/reference/utils.py:682-814: ElementTree over each
wrapped sentence, tokenize ``item.text``/``item.tail`` segments,
assign B-/I- tags to mention tokens, map ``rid/arg1/arg2/reltype``
through ``tid`` anchors). Round 1 shipped only the writer direction
(``stages/format_out.py``); this module adds the reader, so real
annotated corpora load into the engine's tagged-chunk schema and
``kg_eval`` runs against them.

Faithful behaviors (ElementTree-based like the reference, NOT regex —
nested tags, attribute order, and XML escapes all parse):

- the reference's pre-parse escape repairs (utils.py:736-738):
  ``>>``/``<<`` splits, double-escaped and plain ``&gt;``/``&lt;`` to
  full-width, BEFORE ElementTree sees the line;
- element text labeled with the element's tag, element tail labeled
  ``O`` (an inner entity's tail is ``O`` even inside an outer entity,
  the reference's flattening), walked in DOCUMENT order — see the
  ``walk`` note for why recursion, not ``iter()``, is the faithful
  shape on non-root containers;
- modality via the reference's sequential assignment order
  (utils.py:769-784): ``certainty`` only on ``d/D``, ``type`` only on
  ``TIMEX3/Timex3``, then ``state`` (any tag) OVERRIDES, then EVENT
  ``DCT`` and ``DURATION`` override in turn — last writer wins;
- ``DCT-Rel`` attributes become self-relations; ``brel``/``trel``
  elements anchor at each argument's LAST word with the default-cell
  replace-then-append convention of ``labels.sbwrel2head``;
- sentence boundaries: the writer emits ``[SEP]`` tokens as ``\\n`` —
  the reader maps them back through the ``　SEP　`` join the analyzer
  folds into ``[SEP]`` (``stages/chunk.py:SEP_JOIN``).

Malformed input is COUNTED, not silently dropped (the i2b2 reader's
``anno_errors`` convention): a chunk that fails to parse yields an
empty row with a non-zero ``anno_errors``; dangling relation tids
increment it too.

Use :func:`gold_xml_to_tagged_batch` as a ``map_batches`` kernel over
(url, chunk_id, xml) rows; output is the tagged-chunk schema, identical
to the scorer's, so every downstream stage (assemble, link, dedup,
eval) composes unchanged.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pyarrow as pa

from ..labels import add_rel_cell
from ..tokenization import analyze
from .chunk import SEP_JOIN

# container tags whose text is plain O context, not an entity mention
_CONTAINER_TAGS = ("doc", "sentence", "p")


def _tokenize_segment(segment: str) -> list[str]:
    """Plain-text segment (with ``\\n`` sentence breaks) -> tokens."""
    if not segment:
        return []
    return analyze(segment.replace("\n", SEP_JOIN))


def _repair_escapes(xml: str) -> str:
    """The reference's pre-parse repairs (utils.py:736-738), applied
    before ElementTree: broken double brackets and already-flattened
    ``&gt;``/``&lt;`` escapes fold to full-width so they survive as
    literal text."""
    return (
        xml.replace(">>", ">＞")
        .replace("<<", "＜<")
        .replace("＆ａｍｐ；ｇｔ；", "＞")
        .replace("＆ａｍｐ；ｌｔ；", "＜")
        .replace("&gt;", "＞")
        .replace("&lt;", "＜")
    )


def _modality(tag: str, attrs: dict) -> str:
    """Sequential assignment exactly as utils.py:769-784 — later rules
    override earlier ones (state beats certainty; EVENT DCT/DURATION
    beat state)."""
    m = "_"
    if tag in ("d", "D") and "certainty" in attrs:
        m = attrs["certainty"]
    if tag in ("TIMEX3", "Timex3") and "type" in attrs:
        m = attrs["type"]
    if "state" in attrs:
        m = attrs["state"]
    if tag == "EVENT" and "DCT" in attrs:
        m = attrs["DCT"]
    if tag == "EVENT" and "DURATION" in attrs:
        m = attrs["DURATION"]
    return m


def parse_gold_xml(xml: str) -> dict:
    """One gold chunk document -> tagged-chunk dict
    (tokens, ner, mod, rels, heads, anno_errors)."""
    tokens: list[str] = []
    ner: list[str] = []
    mod: list[str] = []
    tid_span: dict[str, tuple[int, int]] = {}
    self_rels: list[tuple[int, str]] = []  # (anchor word, rel)
    rels_raw: list[tuple[str, str, str]] = []
    anno_errors = 0

    # the reference's line filter (utils.py:700): ``<brel``/``<trel``
    # lines are relation records, everything else is sentence text
    # (interior empty lines kept — they carry [SEP] boundaries)
    text_lines: list[str] = []
    rel_lines: list[str] = []
    for line in xml.split("\n"):
        if line.strip()[1:5] in ("brel", "trel"):
            rel_lines.append(line)
        else:
            text_lines.append(line)
    text = "\n".join(text_lines).rstrip("\n")

    try:
        root = ET.fromstring("<doc>" + _repair_escapes(text) + "</doc>")
        rel_root = ET.fromstring(
            "<doc>" + _repair_escapes("".join(rel_lines)) + "</doc>"
        )
    except ET.ParseError:
        # malformed chunk: empty row, counted — never silently dropped
        return {
            "tokens": [], "ner": [], "mod": [],
            "rels": [], "heads": [], "anno_errors": 1,
        }
    for item in rel_root.iter():
        if "rel" not in item.tag:
            continue
        a = item.attrib
        if "arg1" in a and "arg2" in a:
            rels_raw.append((a["arg1"], a["arg2"], a.get("reltype", "")))
        else:
            anno_errors += 1

    def emit_o(segment: str | None) -> None:
        for t in _tokenize_segment(segment or ""):
            tokens.append(t)
            ner.append("O")
            mod.append("_")

    auto_tid = 0

    # DOCUMENT-ORDER recursion: element text, then children, then tail.
    # The reference's flat per-sentence loop (``for item in st.iter()``
    # with text-then-tail per item) produces the same order on every
    # input the reference actually receives (containers only as the
    # parse root, whose tail is empty); on non-root containers iter()'s
    # shape would emit the container's tail — including a sentence's
    # trailing [SEP] — BEFORE its entity children, scrambling token
    # order, so recursion is the faithful generalization, not a
    # divergence.
    def walk(item) -> None:
        nonlocal auto_tid
        tag = item.tag
        if tag in _CONTAINER_TAGS:
            emit_o(item.text)
            for child in item:
                walk(child)
        elif "rel" in tag:  # brel / trel relation elements
            a = item.attrib
            if "arg1" in a and "arg2" in a:
                rels_raw.append((a["arg1"], a["arg2"], a.get("reltype", "")))
            else:
                anno_errors += 1
        else:
            attrs = item.attrib
            inner_toks = _tokenize_segment(item.text or "")
            if inner_toks:
                start = len(tokens)
                for k, t in enumerate(inner_toks):
                    tokens.append(t)
                    ner.append(("B-" if k == 0 else "I-") + tag)
                    mod.append("_")
                mod[-1] = _modality(tag, attrs)
                end = len(tokens)
                auto_tid += 1
                # auto ids are namespaced so an entity WITHOUT a tid can
                # never collide with (and be overwritten by) a later
                # explicit tid="T1" from the file
                tid_span[attrs.get("tid", f"__auto{auto_tid}")] = (start, end)
                if "DCT-Rel" in attrs:
                    self_rels.append((end - 1, attrs["DCT-Rel"]))
            for child in item:  # nested entities, in document order
                walk(child)
        if tag != "doc":
            emit_o(item.tail)

    walk(root)

    n = len(tokens)
    rels: list[list[str]] = [["N"] for _ in range(n)]
    heads: list[list[int]] = [[i] for i in range(n)]

    def add_rel(tail: int, head: int, rel: str) -> None:
        add_rel_cell(rels, heads, tail, head, rel)

    for anchor, rel in self_rels:
        add_rel(anchor, anchor, rel)
    for a1, a2, rel in rels_raw:
        if a1 not in tid_span or a2 not in tid_span:
            anno_errors += 1  # dangling tid: skip the relation, count it
            continue
        add_rel(tid_span[a1][1] - 1, tid_span[a2][1] - 1, rel)

    return {
        "tokens": tokens, "ner": ner, "mod": mod,
        "rels": rels, "heads": heads, "anno_errors": anno_errors,
    }


def gold_xml_to_tagged_batch(batch: pa.Table, xml_col: str = "xml") -> pa.Table:
    """map_batches kernel: (url, chunk_id, xml) -> tagged_chunks rows
    (+ ``anno_errors`` count column — malformed annotations are
    visible, never silently dropped)."""
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
            "anno_errors": pa.array([r["anno_errors"] for r in rows], pa.int32()),
        }
    )
