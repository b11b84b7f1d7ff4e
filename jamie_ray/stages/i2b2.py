"""i2b2-style corpus reader (SURVEY §2.1 S11 — the reference's only
alternate-corpus path, /root/reference/formater.py:87-176).

Format: one document = four aligned files under
``<root>/<collection>/{txt,concept,ast,rel}/<name>.{txt,con,ast,rel}``:

- ``.txt``  — pre-tokenized text, one sentence per line, tokens
  whitespace-separated;
- ``.con``  — ``c="<text>" S:B S:E||t="<type>"`` concept spans
  (sentence 1-based, token ids 0-based inclusive);
- ``.ast``  — ``c=...||t=...||a="<assertion>"`` assertion at the span's
  LAST token (the engine's ``mod`` column);
- ``.rel``  — ``c=<tail>||r="<rel>"||c=<head>`` with last-token anchors
  and the replace-then-append default-cell rule.

Faithful to the reference's semantics including its quirks: the span
text must equal the lowercased token join or the ANNOTATION is skipped
(the reference prints-and-drops; here each skip is recorded in an
``anno_errors`` list column so data loss is countable), and the
replace-vs-append condition is the reference's OR form
(formater.py:158), not ``sbwrel2head``'s AND.

Divergence (documented): cross-sentence relations — impossible to
represent in the per-sentence head-index schema — are skipped with an
error instead of silently corrupting head indices.

Output rows are the engine's tagged-chunk schema
(url = ``i2b2://<collection>/<name>``, chunk_id = sentence index), so
assemble/link/dedup/eval/CoNLL-writer all compose unchanged.
"""

from __future__ import annotations

import os
import re

import pyarrow as pa

_PTR_RE = re.compile(r'c="(?P<text>[^"]*)"\s+(?P<sb>\d+):(?P<tb>\d+)\s+(?P<se>\d+):(?P<te>\d+)')
_VAL_RE = re.compile(r'"([^"]*)"')


def _parse_pointer(part: str):
    m = _PTR_RE.search(part)
    if m is None:
        raise ValueError(f"malformed concept pointer: {part!r}")
    # sentence ids are 1-based in the files; token ids 0-based inclusive
    return (
        m.group("text"),
        int(m.group("sb")) - 1,
        int(m.group("tb")),
        int(m.group("te")),
    )


def i2b2_doc_to_rows(
    url: str, txt: str, con: str, ast: str, rel: str
) -> list[dict]:
    """One document's four file contents -> tagged-chunk dicts (one per
    sentence) with an ``anno_errors`` list of skipped annotations."""
    tok_2d = [line.rstrip().split() for line in txt.splitlines()]
    if not tok_2d and (con.strip() or ast.strip() or rel.strip()):
        # empty/missing txt but annotations exist: the doc must surface
        # as ONE countable error row, not vanish (the reference's silent
        # data loss is exactly what this reader exists to fix)
        n_anno = sum(
            1 for blob in (con, ast, rel) for ln in blob.splitlines() if ln.strip()
        )
        return [
            {
                "url": url,
                "chunk_id": 0,
                "tokens": [],
                "ner": [],
                "mod": [],
                "rels": [],
                "heads": [],
                "anno_errors": [
                    f"[doc] empty txt but {n_anno} annotation lines present"
                ],
            }
        ]
    ner_2d = [["O"] * len(t) for t in tok_2d]
    mod_2d = [["_"] * len(t) for t in tok_2d]
    rel_2d = [[["N"] for _ in t] for t in tok_2d]
    head_2d = [[[i] for i in range(len(t))] for t in tok_2d]
    errors_2d: list[list[str]] = [[] for _ in tok_2d]

    def check_span(text: str, sid: int, tb: int, te: int) -> str | None:
        if not (0 <= sid < len(tok_2d)) or te >= len(tok_2d[sid]) or tb > te:
            return f"span out of range: {sid}:{tb}-{te}"
        joined = " ".join(tok_2d[sid][tb : te + 1])
        if text != joined.lower():
            return f"span text mismatch: {text!r} vs {joined!r}"
        return None

    for line in con.splitlines():
        if not line.strip():
            continue
        try:
            tl, cl = line.rstrip().split("||")
            text, sid, tb, te = _parse_pointer(tl)
            err = check_span(text, sid, tb, te)
            if err:
                # clamp BOTH ends: a malformed 1-based sentence id of 0
                # gives sid=-1, and a bare min() would Python-wrap to
                # the LAST sentence's error list
                errors_2d[min(max(sid, 0), len(errors_2d) - 1)].append(
                    f"[ner] {err}"
                )
                continue
            tag = _VAL_RE.findall(cl)[0]
            ner_2d[sid][tb] = f"B-{tag}"
            for i in range(tb + 1, te + 1):
                ner_2d[sid][i] = f"I-{tag}"
        except (ValueError, IndexError) as ex:
            if errors_2d:
                errors_2d[0].append(f"[ner] {type(ex).__name__}: {line.strip()!r}")

    for line in ast.splitlines():
        if not line.strip():
            continue
        try:
            tl, _cl, al = line.rstrip().split("||")
            text, sid, tb, te = _parse_pointer(tl)
            err = check_span(text, sid, tb, te)
            if err:
                errors_2d[min(max(sid, 0), len(errors_2d) - 1)].append(
                    f"[ast] {err}"
                )
                continue
            mod_2d[sid][te] = _VAL_RE.findall(al)[0]
        except (ValueError, IndexError) as ex:
            if errors_2d:
                errors_2d[0].append(f"[ast] {type(ex).__name__}: {line.strip()!r}")

    for line in rel.splitlines():
        if not line.strip():
            continue
        try:
            tl, rl, hl = line.rstrip().split("||")
            t_text, t_sid, t_tb, t_te = _parse_pointer(tl)
            h_text, h_sid, h_tb, h_te = _parse_pointer(hl)
            err = check_span(t_text, t_sid, t_tb, t_te) or check_span(
                h_text, h_sid, h_tb, h_te
            )
            if err:
                errors_2d[min(t_sid, len(errors_2d) - 1)].append(f"[rel] {err}")
                continue
            if t_sid != h_sid:
                errors_2d[t_sid].append(
                    f"[rel] cross-sentence relation skipped: {t_sid} vs {h_sid}"
                )
                continue
            r = _VAL_RE.findall(rl)[0]
            # reference quirk (formater.py:158): OR, not AND
            if head_2d[t_sid][t_te] == [t_te] or rel_2d[t_sid][t_te] == ["N"]:
                head_2d[t_sid][t_te] = [h_te]
                rel_2d[t_sid][t_te] = [r]
            else:
                head_2d[t_sid][t_te].append(h_te)
                rel_2d[t_sid][t_te].append(r)
        except (ValueError, IndexError) as ex:
            if errors_2d:
                errors_2d[0].append(f"[rel] {type(ex).__name__}: {line.strip()!r}")

    return [
        {
            "url": url,
            "chunk_id": sid,
            "tokens": tok_2d[sid],
            "ner": ner_2d[sid],
            "mod": mod_2d[sid],
            "rels": rel_2d[sid],
            "heads": head_2d[sid],
            "anno_errors": errors_2d[sid],
        }
        for sid in range(len(tok_2d))
    ]


def i2b2_files_to_tagged_batch(batch: pa.Table) -> pa.Table:
    """map_batches kernel: (url, txt_path, con_path, ast_path,
    rel_path) -> tagged_chunks rows (file reads run IN the task, so a
    directory of documents parses distributed)."""
    rows: list[dict] = []
    for url, tp, cp, ap, rp in zip(
        batch.column("url").to_pylist(),
        batch.column("txt_path").to_pylist(),
        batch.column("con_path").to_pylist(),
        batch.column("ast_path").to_pylist(),
        batch.column("rel_path").to_pylist(),
    ):
        def read(p: str) -> str:
            if p and os.path.exists(p):
                with open(p, encoding="utf-8") as f:
                    return f.read()
            return ""

        rows.extend(i2b2_doc_to_rows(url, read(tp), read(cp), read(ap), read(rp)))
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "chunk_id": pa.array([r["chunk_id"] for r in rows], pa.int32()),
            "tokens": pa.array([r["tokens"] for r in rows], pa.list_(pa.string())),
            "ner": pa.array([r["ner"] for r in rows], pa.list_(pa.string())),
            "mod": pa.array([r["mod"] for r in rows], pa.list_(pa.string())),
            "rels": pa.array([r["rels"] for r in rows], pa.list_(pa.list_(pa.string()))),
            "heads": pa.array([r["heads"] for r in rows], pa.list_(pa.list_(pa.int32()))),
            "anno_errors": pa.array([r["anno_errors"] for r in rows], pa.list_(pa.string())),
        }
    )


def read_i2b2(data_dir: str, collection: str):
    """Directory layout -> tagged_chunks Dataset.

    The driver only LISTS file names; reading and parsing run inside
    ``map_batches`` tasks.
    """
    import ray.data

    txt_dir = os.path.join(data_dir, collection, "txt")
    names = sorted(
        os.path.splitext(f)[0]
        for f in os.listdir(txt_dir)
        if f.endswith(".txt")
    )
    items = [
        {
            "url": f"i2b2://{collection}/{name}",
            "txt_path": os.path.join(data_dir, collection, "txt", f"{name}.txt"),
            "con_path": os.path.join(data_dir, collection, "concept", f"{name}.con"),
            "ast_path": os.path.join(data_dir, collection, "ast", f"{name}.ast"),
            "rel_path": os.path.join(data_dir, collection, "rel", f"{name}.rel"),
        }
        for name in names
    ]
    return ray.data.from_items(items).map_batches(
        i2b2_files_to_tagged_batch, batch_format="pyarrow"
    )
