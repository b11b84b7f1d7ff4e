"""Label algebra: BIO spans, selection decode, subword<->word alignment.

Faithful re-implementations (fresh code, same semantics) of the
reference's decode rules — the correctness gate (triple P/R >= 0.95)
lives or dies on these exact behaviors:

- :func:`bio_to_spans`            /root/reference/data_objects.py:44-70
- :func:`find_entity`             /root/reference/model.py:731-747
- :func:`selection_decode`        /root/reference/model.py:728-770
- :func:`sbwtok2tok_alignment`    /root/reference/utils.py:1831-1846
- :func:`sbwner2ner`              /root/reference/utils.py:1849-1857
- :func:`sbwmod2mod`              /root/reference/utils.py:1860-1870
- :func:`sbwrel2head`             /root/reference/utils.py:1873-1892
- :func:`match_ner_label` etc.    /root/reference/utils.py:117-159

Deliberately preserved quirks (do NOT "fix"; SURVEY.md §7.4):
- ``bio_to_spans`` accepts spans that *start* with ``I-`` (no ``B-``)
  and closes a span on tag-type switch inside an ``I-`` run;
- ``find_entity`` anchored on an ``O`` or ``B`` token returns just that
  token; anchored on ``I-`` it walks backwards through ``I-`` tokens and
  includes a ``B-`` if it reaches one — without checking the tag type;
- ``sbwrel2head`` collapses the default ``[self]``/``['N']`` cell only
  the first time a tail gets a relation, then appends.
"""

from __future__ import annotations

from typing import Sequence

Span = tuple[str, int, int]  # (tag, start, end) — end exclusive


def restore_tokens(tokens: Sequence[str]) -> list[str]:
    """Undo the chunker's whitespace sentinels (``[JASP]`` -> U+3000,
    ``[SEP]`` -> newline) — the reference's token restore rule
    (data_objects.py:210). ONE shared definition: the format sinks and
    the assembler must all restore identically or the byte-exact
    writer oracles diverge."""
    return [
        t.replace("[JASP]", "　").replace("[SEP]", "\n") for t in tokens
    ]


def add_rel_cell(
    rels: list[list[str]], heads: list[list[int]], tail: int, head: int, rel: str
) -> None:
    """Insert one relation into the multihead cell lists under the
    reference's default-cell rule: a still-default cell (``['N']`` rels
    with a self head) is REPLACED by the first real relation; further
    relations APPEND. One shared definition for every reader that
    reconstructs multihead cells (gold-XML, brat, pmhs) — the
    convention belongs next to :func:`sbwrel2head`, which consumes it."""
    if rels[tail] == ["N"] and heads[tail] == [tail]:
        rels[tail] = [rel]
        heads[tail] = [head]
    else:
        rels[tail].append(rel)
        heads[tail].append(head)


def bio_to_spans(ner_tags: Sequence[str]) -> list[Span]:
    """BIO tag sequence -> entity spans (data_objects.py:44-70 semantics)."""
    entities: list[Span] = []
    start: int | None = None
    for i, tag in enumerate(ner_tags):
        if i == 0:
            if tag != "O":
                start = i
            continue
        if tag.startswith("O"):
            if start is not None:
                entities.append((ner_tags[i - 1][2:], start, i))
                start = None
        elif tag.startswith("I"):
            if start is not None:
                if tag[2:] != ner_tags[i - 1][2:]:
                    entities.append((ner_tags[i - 1][2:], start, i))
                    start = i
            else:
                start = i
        elif tag.startswith("B"):
            if start is not None:
                entities.append((ner_tags[i - 1][2:], start, i))
            start = i
        else:
            raise ValueError(f"bad BIO tag: {tag!r}")
    if start is not None:
        entities.append((ner_tags[-1][2:], start, len(ner_tags)))
    return entities


def find_entity(pos: int, s_ner_tags: Sequence[str]) -> list[int]:
    """Backward entity walk from an anchor position (model.py:731-747)."""
    if s_ner_tags[pos][0] in ("B", "O"):
        return [pos]
    temp: list[int] = []
    while s_ner_tags[pos][0] == "I":
        temp.append(pos)
        pos -= 1
        if pos < 0:
            break
        if s_ner_tags[pos][0] == "B":
            temp.append(pos)
            break
    return list(reversed(temp))


def selection_decode(
    ner_tags: Sequence[str],
    cells: Sequence[tuple[int, str, int]],
) -> list[dict]:
    """Sparse selection cells -> SPO index triples (model.py:728-770).

    ``cells`` is the sparse equivalent of ``nonzero(sigmoid(logits)>0.5)``
    for ONE sentence: (subject_anchor, predicate, object_anchor). The
    ``'N'`` predicate is skipped; anchors expand to full entity index
    lists via :func:`find_entity`. Cell order is preserved (the dense
    reference iterates nonzero cells in row-major (s, p, o) order — the
    scorer emits cells already in that order).
    """
    out: list[dict] = []
    for s, p, o in cells:
        if p == "N":
            continue
        subject_ix = find_entity(s, ner_tags)
        object_ix = find_entity(o, ner_tags)
        if not subject_ix or not object_ix:
            raise AssertionError("empty entity in selection_decode")
        out.append({"subject": subject_ix, "predicate": p, "object": object_ix})
    return out


# ---------------------------------------------------------------------------
# Subword -> word alignment inverses (utils.py:1831-1892)
# ---------------------------------------------------------------------------

def sbwtok2tok_alignment(sbw_sent_tok: Sequence[str]) -> tuple[list[str], list[int]]:
    """Fuse ``##`` pieces back into words; return (words, aligned_ids)
    where ``aligned_ids[i]`` is the word index of subword ``i``."""
    aligned_ids: list[int] = []
    sent_tok: list[str] = []
    cache: list[str] = []
    curr = -1
    for token in sbw_sent_tok:
        if not token.startswith("##"):
            if cache:
                sent_tok.append(" ".join(cache).replace(" ##", ""))
                cache = []
            curr += 1
        cache.append(token)
        aligned_ids.append(curr)
    if cache:
        sent_tok.append(" ".join(cache).replace(" ##", ""))
    return sent_tok, aligned_ids


def sbwner2ner(sbw_sent_ner: Sequence[str], aligned_ids: Sequence[int]) -> list[str]:
    """Word NER tag = FIRST subword's tag (utils.py:1849-1857)."""
    out: list[str] = []
    for index, tag in enumerate(sbw_sent_ner):
        if index == 0 or aligned_ids[index] != aligned_ids[index - 1]:
            out.append(tag)
    return out


def sbwmod2mod(sbw_sent_mod: Sequence[str], aligned_ids: Sequence[int]) -> list[str]:
    """Word modality tag = LAST subword's tag (utils.py:1860-1870)."""
    out: list[str] = []
    for index, tag in enumerate(sbw_sent_mod):
        if index > 0 and aligned_ids[index] == aligned_ids[index - 1]:
            out[-1] = tag
        else:
            out.append(tag)
    return out


def sbwrel2head(
    sbw_sent_rel: Sequence[dict],
    aligned_ids: Sequence[int],
    offset: int = -1,
) -> tuple[list[list[str]], list[list[int]]]:
    """SPO index triples -> word-level (rels, heads) list columns.

    Anchor = LAST subword of each argument; ``offset=-1`` removes the
    ``[CLS]`` position (utils.py:1873-1892). Default cells are
    ``['N']``/``[self]``; the first real relation on a tail REPLACES the
    default, later ones append.
    """
    n_words = aligned_ids[-1] + offset
    sent_rel: list[list[str]] = [["N"] for _ in range(n_words)]
    sent_head: list[list[int]] = [[i] for i in range(n_words)]
    for trip in sbw_sent_rel:
        w_tail = aligned_ids[trip["subject"][-1]] + offset
        w_head = aligned_ids[trip["object"][-1]] + offset
        rel = trip["predicate"]
        if sent_head[w_tail] == [w_tail] and sent_rel[w_tail] == ["N"]:
            sent_head[w_tail] = [w_head]
            sent_rel[w_tail] = [rel]
        else:
            sent_head[w_tail].append(w_head)
            sent_rel[w_tail].append(rel)
    return sent_rel, sent_head


# ---------------------------------------------------------------------------
# Word -> subword label expansion (training-side algebra, utils.py:117-159;
# the mock scorer uses these to emit subword-level predictions)
# ---------------------------------------------------------------------------

def match_ner_label(bpe_x: Sequence[str], y: Sequence[str]) -> list[str]:
    """Expand word BIO tags onto subwords: continuation pieces get
    ``I-<type>`` (or a copy for ``O``) — utils.py:117-125."""
    bpe_y = list(y)
    for i in range(len(bpe_x)):
        if bpe_x[i].startswith("##") and len(bpe_x[i]) > 2:
            if "-" in bpe_y[i - 1]:
                bpe_y.insert(i, "I" + bpe_y[i - 1][1:])
            else:
                bpe_y.insert(i, bpe_y[i - 1])
    return bpe_y


def match_mod_label(
    bpe_x: Sequence[str], y: Sequence[str], default_lab: str = "_"
) -> list[str]:
    """Expand word modality tags onto subwords: the label rides the LAST
    piece of each word — utils.py:128-135."""
    bpe_y = list(y)
    for i in range(len(bpe_x)):
        if bpe_x[i].startswith("##") and len(bpe_x[i]) > 2:
            lab = bpe_y[i - 1]
            bpe_y[i - 1] = default_lab
            bpe_y.insert(i, lab)
    return bpe_y


def word_to_sbw_last_index(aligned_ids: Sequence[int]) -> dict[int, int]:
    """word index -> index of its LAST subword (relation-anchor map,
    the inverse of the ``sbwrel2head`` anchor rule)."""
    last: dict[int, int] = {}
    for sbw_ix, w_ix in enumerate(aligned_ids):
        last[w_ix] = sbw_ix
    return last
