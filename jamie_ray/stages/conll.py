"""Multihead-CoNLL text interop (reference IR round-trip).

The reference's universal intermediate representation is the multihead
CoNLL file: ``token_id \\t token \\t BIO \\t modality \\t [rels] \\t
[heads]`` rows with ``#doc``/``## line`` comment delimiters (writer:
/root/reference/clinical_joint.py:100-102, utils.py:835-840; reader:
/root/reference/data_objects.py:190-220). This engine's native IR is
the ``tagged_chunks`` Arrow table; these kernels convert both ways so a
user of the reference can feed its files in or get its format out.

The reader parses the stringified list columns with a literal parser
(never ``eval`` — the reference's ``eval(tok_items[4])`` at
data_objects.py:213-214 is an arbitrary-code-execution hazard on
untrusted files; SURVEY.md §1.2 flags this as a deliberate fix).
"""

from __future__ import annotations

import ast

import pyarrow as pa


def merge_modality(ner_lab: str, mod_lab: str) -> str:
    """Merged-label mode (M14): fold the modality into the BIO tag —
    ``B-d`` + ``positive`` -> ``B-d_positive``; a ``_`` placeholder
    modality leaves the tag unchanged (reference
    utils.py:1115-1120's ``merge_modality``, collapsed to this
    engine's single ``mod`` column)."""
    return ner_lab if mod_lab == "_" else f"{ner_lab}_{mod_lab}"


def split_merged(merged_tag: str, delimiter: str = "_") -> tuple[str, str]:
    """Inverse of :func:`merge_modality` — QUIRK-PRESERVING port of
    the reference's ``split_merged`` (utils.py:1421-1426): split on
    the delimiter and rejoin the head WITHOUT it, so a tag whose BIO
    part itself contains ``_`` (or a double-merged tag) mangles
    exactly as the reference mangles it. Do not "fix"."""
    items = merged_tag.split(delimiter)
    if len(items) > 1:
        return "".join(items[:-1]), items[-1]
    return merged_tag, "_"


def chunk_to_conll(
    url: str, chunk_id: int, tokens, ner, mod, rels, heads, *, merged: bool = False
) -> str:
    """One tagged chunk -> multihead CoNLL block (reference row format).

    ``merged=True`` writes the reference's merged-label variant: the
    NER column carries ``merge_modality(ner, mod)`` and the modality
    column a ``_`` placeholder (the shape ``read_conll(is_merged=True)``
    consumers train on)."""
    lines = [f"#doc {url}#{chunk_id}"]
    for i, (t, n, m, r, h) in enumerate(zip(tokens, ner, mod, rels, heads)):
        if merged:
            n, m = merge_modality(n, m), "_"
        lines.append(f"{i}\t{t}\t{n}\t{m}\t{list(r)}\t{list(h)}")
    return "\n".join(lines) + "\n"


def tagged_to_conll_batch(batch: pa.Table, *, merged: bool = False) -> pa.Table:
    """map_batches kernel: tagged_chunks -> (url, chunk_id, conll)."""
    out = [
        chunk_to_conll(u, c, t, n, m, r, h, merged=merged)
        for u, c, t, n, m, r, h in zip(
            batch.column("url").to_pylist(),
            batch.column("chunk_id").to_pylist(),
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
            "conll": pa.array(out, pa.string()),
        }
    )


def _parse_literal_list(s: str) -> list:
    """Safe replacement for the reference's eval() of list columns."""
    v = ast.literal_eval(s)
    if not isinstance(v, list):
        raise ValueError(f"expected a list literal, got {s!r}")
    return v


def conll_to_chunks(text: str, *, merged: bool = False) -> list[dict]:
    """Parse multihead CoNLL text -> tagged_chunks-shaped dicts.

    Accepts the reference's file layout: ``#doc``/``## line`` comment
    lines delimit sentences (data_objects.py:190-202); blank lines are
    ignored. Comments of the form ``#doc <url>#<chunk_id>`` (our
    writer) recover provenance; other comments get synthetic keys.

    ``merged=True`` reads the merged-label variant (M14): the NER
    column carries ``B-d_positive``-style tags which are split back to
    (ner, mod) via :func:`split_merged` — the reference's decode-side
    inverse (utils.py:1421-1426); the file's modality column (all
    ``_`` placeholders in that format) is ignored.
    """
    rows: list[dict] = []
    cur: dict | None = None
    synthetic = 0
    # per-url sentence counter: the reference WRITES one bare
    # '#doc {file}' header per sentence (utils.py:831), so a suffixless
    # header must get the doc's NEXT sentence index — a constant 0
    # would collapse every sentence of a doc onto one (url, chunk_id)
    # key, breaking hash-keyed splits/shards/joins downstream
    seen_per_url: dict[str, int] = {}

    def flush() -> None:
        nonlocal cur
        if cur is not None and cur["tokens"]:
            rows.append(cur)
        cur = None

    def fresh(url: str, chunk_id: int | None) -> dict:
        if chunk_id is None:
            chunk_id = seen_per_url.get(url, 0)
        seen_per_url[url] = max(seen_per_url.get(url, 0), chunk_id + 1)
        return {
            "url": url,
            "chunk_id": chunk_id,
            "tokens": [],
            "ner": [],
            "mod": [],
            "rels": [],
            "heads": [],
        }

    for line in text.split("\n"):
        if line.startswith(("#doc", "## line")):
            flush()
            synthetic += 1
            url, chunk_id = f"conll://{synthetic}", None
            if line.startswith("#doc ") and "#" in line[5:]:
                head, _, tail = line[5:].rpartition("#")
                if tail.isdigit():
                    url, chunk_id = head, int(tail)
                else:
                    url = line[5:]
            elif line.startswith("#doc "):
                url = line[5:]
            cur = fresh(url, chunk_id)
            continue
        if not line.strip():
            continue
        if cur is None:
            synthetic += 1
            cur = fresh(f"conll://{synthetic}", None)
        items = line.rstrip("\n").split("\t")
        if len(items) == 5 and not merged:
            # the reference's no-modality variant (utils.py:835-840,
            # contains_modality=False): id, token, ner, rels, heads
            items = items[:3] + ["_"] + items[3:]
        if len(items) != 6:
            raise ValueError(
                f"bad CoNLL row (need 6 cols, or 5 for the no-modality "
                f"variant): {line!r}"
            )
        cur["tokens"].append(items[1])
        if merged:
            ner_lab, mod_lab = split_merged(items[2])
            cur["ner"].append(ner_lab)
            cur["mod"].append(mod_lab)
        else:
            cur["ner"].append(items[2])
            cur["mod"].append(items[3])
        cur["rels"].append([str(x) for x in _parse_literal_list(items[4])])
        cur["heads"].append([int(x) for x in _parse_literal_list(items[5])])
    flush()
    return rows


def conll_text_to_tagged_batch(
    batch: pa.Table, text_col: str = "conll", *, merged: bool = False
) -> pa.Table:
    """map_batches kernel: (.., conll text) -> tagged_chunks rows."""
    rows: list[dict] = []
    for text in batch.column(text_col).to_pylist():
        rows.extend(conll_to_chunks(text, merged=merged))
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "chunk_id": pa.array([r["chunk_id"] for r in rows], pa.int32()),
            "tokens": pa.array([r["tokens"] for r in rows], pa.list_(pa.string())),
            "ner": pa.array([r["ner"] for r in rows], pa.list_(pa.string())),
            "mod": pa.array([r["mod"] for r in rows], pa.list_(pa.string())),
            "rels": pa.array([r["rels"] for r in rows], pa.list_(pa.list_(pa.string()))),
            "heads": pa.array([r["heads"] for r in rows], pa.list_(pa.list_(pa.int32()))),
        }
    )
