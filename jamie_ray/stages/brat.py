"""brat standoff READER (the S9 input direction).

The reference only *writes* brat (``doc_to_brat``,
/root/reference/data_objects.py:312-361); real brat-annotated corpora
(.txt + .ann pairs — the format's home is annotation tooling) must
also LOAD. This reader inverts the engine's writer exactly and accepts
the standard standoff line forms:

- ``T{n}\\t{tag} {begin} {end}\\t{surface}`` — entity span in char
  offsets over the .txt;
- ``A{n}\\t{value} T{k} {value}`` — modality attribute (the writer's
  value-named attribute lines);
- ``A{n}\\tDCT-Rel T{k} {rel}`` — self-relation;
- ``R{n}\\t{rel} Arg1:T{a} Arg2:T{b}`` — binary relation, anchored at
  each argument's LAST word with the replace-then-append default-cell
  convention (``labels.sbwrel2head``).

Tokens are recovered by re-analysis of the .txt (newlines map back
through the ``　SEP　`` join, exactly like the gold-XML reader); char
offsets must land on token boundaries — every malformed line, dangling
T-id, off-boundary offset or surface mismatch increments
``anno_errors`` instead of silently dropping the annotation (i2b2
convention).
"""

from __future__ import annotations

from bisect import bisect_left

import pyarrow as pa

from ..labels import add_rel_cell, restore_tokens

from ..tokenization import analyze
from .chunk import SEP_JOIN


def _tokenize_txt(txt: str) -> list[str]:
    txt = txt.rstrip("\n")
    if not txt:
        return []
    return analyze(txt.replace("\n", SEP_JOIN))


def parse_brat(txt: str, ann: str) -> dict:
    """One (.txt, .ann) chunk pair -> tagged-chunk dict
    (tokens, ner, mod, rels, heads, anno_errors)."""
    tokens = _tokenize_txt(txt)
    restored = restore_tokens(tokens)
    # char offset of each token start over the emitted .txt
    starts: list[int] = []
    pos = 0
    for t in restored:
        starts.append(pos)
        pos += len(t)
    total = pos

    n = len(tokens)
    ner = ["O"] * n
    mod = ["_"] * n
    rels: list[list[str]] = [["N"] for _ in range(n)]
    heads: list[list[int]] = [[i] for i in range(n)]
    anno_errors = 0

    def char_to_tok(begin: int, end: int) -> tuple[int, int] | None:
        """(char begin, char end) -> (token start, token end) — both
        must land on token boundaries."""
        if not (0 <= begin < end <= total):
            return None
        s = bisect_left(starts, begin)
        if s >= n or starts[s] != begin:
            return None
        e = bisect_left(starts, end)
        if e < n and starts[e] != end:
            return None
        if e == n and end != total:
            return None
        return s, e

    tid_span: dict[str, tuple[int, int]] = {}
    attr_lines: list[tuple[str, str, str]] = []  # (label, tid, value)
    rel_lines: list[tuple[str, str, str]] = []  # (rel, tid_a, tid_b)

    for line in ann.split("\n"):
        line = line.rstrip("\r")
        if not line.strip():
            continue
        try:
            lid, rest = line.split("\t", 1)
        except ValueError:
            anno_errors += 1
            continue
        if lid.startswith("T"):
            try:
                head_part, surface = rest.split("\t", 1)
                tag, begin_s, end_s = head_part.rsplit(" ", 2)
                span = char_to_tok(int(begin_s), int(end_s))
            except ValueError:
                anno_errors += 1
                continue
            if span is None:
                anno_errors += 1
                continue
            s, e = span
            if "".join(restored[s:e]) != surface:
                anno_errors += 1  # offsets and surface disagree
                continue
            tid_span[lid] = (s, e)
            ner[s] = f"B-{tag}"
            for j in range(s + 1, e):
                ner[j] = f"I-{tag}"
        elif lid.startswith("A"):
            parts = rest.split(" ")
            if len(parts) != 3:
                anno_errors += 1
                continue
            attr_lines.append((parts[0], parts[1], parts[2]))
        elif lid.startswith("R"):
            parts = rest.split(" ")
            if (
                len(parts) != 3
                or not parts[1].startswith("Arg1:")
                or not parts[2].startswith("Arg2:")
            ):
                anno_errors += 1
                continue
            rel_lines.append((parts[0], parts[1][5:], parts[2][5:]))
        else:
            anno_errors += 1

    def add_rel(tail: int, head: int, rel: str) -> None:
        add_rel_cell(rels, heads, tail, head, rel)

    for label, tid, value in attr_lines:
        span = tid_span.get(tid)
        if span is None:
            anno_errors += 1
            continue
        anchor = span[1] - 1
        if label == "DCT-Rel":
            add_rel(anchor, anchor, value)
        else:
            mod[anchor] = value
    for rel, ta, tb in rel_lines:
        sa, sb = tid_span.get(ta), tid_span.get(tb)
        if sa is None or sb is None:
            anno_errors += 1
            continue
        add_rel(sa[1] - 1, sb[1] - 1, rel)

    return {
        "tokens": tokens, "ner": ner, "mod": mod,
        "rels": rels, "heads": heads, "anno_errors": anno_errors,
    }


def brat_to_tagged_batch(
    batch: pa.Table, txt_col: str = "brat_txt", ann_col: str = "brat_ann"
) -> pa.Table:
    """map_batches kernel: (url, chunk_id, brat_txt, brat_ann) ->
    tagged_chunks rows (+ ``anno_errors``)."""
    rows = [
        parse_brat(t, a)
        for t, a in zip(
            batch.column(txt_col).to_pylist(), batch.column(ann_col).to_pylist()
        )
    ]
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
