"""Chunking stage: normalized page text -> trunks under a subword budget.

Reference semantics: trunk packing at /root/reference/utils.py:700-722 —
consecutive lines join with the ``　SEP　`` sentinel while the candidate
trunk's subword length + 2 stays under ``len_limit`` (512).

Web-scale divergence (SURVEY.md §7.4): the reference *drops* trunks over
the budget (utils.py:841-842); at 10^12 pages that is silent data loss,
so a single over-long line is *split* at wakati boundaries into multiple
chunks instead. The packing itself is incremental (per-line subword
lengths are additive across the ``[SEP]`` join) — O(n) per page, unlike
the reference's re-tokenize-the-whole-trunk loop.
"""

from __future__ import annotations

from typing import Iterable

import pyarrow as pa

from ..tokenization import (
    analyze,
    get_analyzer,
    subword_len,
    subword_tokenize,
)

SEP_JOIN = "　SEP　"
DEFAULT_LEN_LIMIT = 512


def split_long_line(line: str, budget: int, analyzer: str = "mecab") -> list[str]:
    """Split one over-budget line at wakati token boundaries.

    Deterministic greedy accumulation of per-token subword lengths
    (an upper bound on the merged length, so every piece fits). The
    built-in wakati tokens partition the input chars exactly; a REAL
    analyzer may DROP chars (mecab_real strips ASCII spaces) or
    normalize surfaces, so each token is re-located in the line with
    ``find`` — skipped chars ride inside the surrounding slices and the
    tail is always emitted, keeping ``"".join(pieces) == line`` (the
    byte-identity invariant) for any analyzer. A token whose surface
    can't be located (normalizing analyzer) falls back to budget-sized
    char windows — still byte-exact, token alignment abandoned.
    """
    # a single token can itself exceed the budget (long URL, base64
    # blob, unbroken katakana run — wakati only chunks kanji runs):
    # hard-split such tokens at char windows sized so each window's
    # subword count fits (subword pieces are fixed-width chars)
    from ..tokenization import _PIECE

    max_tok_chars = max(1, (budget - 1) * _PIECE)

    def char_windows(s: str) -> list[str]:
        return [
            s[off : off + max_tok_chars]
            for off in range(0, len(s), max_tok_chars)
        ]

    toks = list(get_analyzer(analyzer)(line))
    exact_partition = sum(len(t) for t in toks) == len(line)

    pieces: list[str] = []
    cur_len = 0
    start = 0
    pos = 0
    for tok in toks:
        if exact_partition:
            # tokens partition the chars exactly (the built-in wakati:
            # it may NORMALIZE surfaces — full-width ASCII — but never
            # changes char counts, so cumulative lengths are offsets)
            idx = pos
        else:
            # a dropping analyzer (mecab_real strips ASCII spaces):
            # re-locate each surface; skipped chars ride inside the
            # surrounding slices
            idx = line.find(tok, pos) if tok else pos
            if idx < 0:
                # normalized surface not present verbatim: byte-exact
                # fallback for the REMAINDER of the line
                if pos > start:
                    pieces.append(line[start:pos])
                pieces.extend(char_windows(line[pos:]))
                return [p for p in pieces if p]
        tok_end = idx + len(tok)
        if subword_len([tok]) > budget:
            if idx > start:
                pieces.append(line[start:idx])
            pieces.extend(char_windows(line[idx:tok_end]))
            pos = tok_end
            start = pos
            cur_len = 0
            continue
        tok_sbw = subword_len([tok])
        if cur_len + tok_sbw > budget and pos > start:
            pieces.append(line[start:pos])
            start = pos
            cur_len = 0
        cur_len += tok_sbw
        pos = tok_end
    if len(line) > start:
        # the remainder INCLUDING any trailing chars the analyzer
        # dropped (never silently lost)
        pieces.append(line[start:])
    return [p for p in pieces if p]


def chunk_pack(
    lines: Iterable[str],
    len_limit: int = DEFAULT_LEN_LIMIT,
    analyzer: str = "mecab",
) -> tuple[list[str], list[int], list[list[int]]]:
    """Pack lines (normalized sentences) into trunk texts.

    Returns ``(trunk_texts, n_subwords, line_assignment)`` where
    ``line_assignment[i]`` lists the input line indices packed into
    trunk ``i`` (the fixture oracle uses it to compute chunk ids).

    Budget rule mirrors utils.py:715: grow the trunk while
    ``subword_len(trunk + SEP + line) + 2 < len_limit``; the join adds
    exactly one ``[SEP]`` subword per boundary.
    """
    budget = len_limit - 2
    trunk_texts: list[str] = []
    trunk_lens: list[int] = []
    assignment: list[list[int]] = []

    cur_lines: list[str] = []
    cur_ids: list[int] = []
    cur_len = 0

    def flush() -> None:
        nonlocal cur_lines, cur_ids, cur_len
        if cur_lines:
            trunk_texts.append(SEP_JOIN.join(cur_lines))
            trunk_lens.append(cur_len)
            assignment.append(cur_ids)
        cur_lines, cur_ids, cur_len = [], [], 0

    for i, line in enumerate(lines):
        line_len = subword_len(analyze(line, analyzer))
        if line_len >= budget:
            flush()
            for piece in split_long_line(line, budget, analyzer):
                trunk_texts.append(piece)
                trunk_lens.append(subword_len(analyze(piece, analyzer)))
                assignment.append([i])
            continue
        # +1 for the [SEP] subword at the join boundary
        cand = cur_len + (1 if cur_lines else 0) + line_len
        if cur_lines and cand + 2 >= len_limit:
            flush()
            cand = line_len
        cur_lines.append(line)
        cur_ids.append(i)
        cur_len = cand
    flush()
    return trunk_texts, trunk_lens, assignment


def chunk_pages_batch(
    batch: pa.Table, len_limit: int = DEFAULT_LEN_LIMIT, analyzer: str = "mecab"
) -> pa.Table:
    """map_batches kernel: pages(url, text, ...) -> chunks rows.

    Explodes each page's text into ``(url, chunk_id, text, n_subwords)``
    rows; chunk_id is the within-page trunk ordinal (stable under any
    block layout — no global state).
    """
    urls = batch.column("url").to_pylist()
    texts = batch.column("text").to_pylist()
    out_url: list[str] = []
    out_cid: list[int] = []
    out_text: list[str] = []
    out_len: list[int] = []
    for url, text in zip(urls, texts):
        if not text:
            continue
        trunks, lens, _ = chunk_pack(text.split("\n"), len_limit, analyzer)
        for cid, (t, n) in enumerate(zip(trunks, lens)):
            out_url.append(url)
            out_cid.append(cid)
            out_text.append(t)
            out_len.append(n)
    return pa.table(
        {
            "url": pa.array(out_url, pa.string()),
            "chunk_id": pa.array(out_cid, pa.int32()),
            "text": pa.array(out_text, pa.string()),
            "n_subwords": pa.array(out_len, pa.int32()),
        }
    )


def parity_check_incremental(lines: list[str], len_limit: int = DEFAULT_LEN_LIMIT) -> bool:
    """Test hook: verify the incremental packing length equals the direct
    re-tokenization of the joined trunk (the reference's O(n^2) rule)."""
    trunks, lens, _ = chunk_pack(lines, len_limit)
    for t, n in zip(trunks, lens):
        if subword_len(analyze(t)) != n:
            return False
        if len(subword_tokenize(analyze(t))) != n:
            return False
    return True
