"""Deterministic synthetic ``pages`` corpus + expected-output oracles.

Implements FIXTURES.md §1: every value is a pure function of the page
index via ``stable_hash64`` (never RNG state), so two runs — or a
resumed run — produce identical bytes at any scale.

The generator composes each sentence from an explicit segment structure
(hiragana filler / gazetteer mention / filler / ... / ``。``) and derives
the expected entity + triple set DIRECTLY from that structure (no BIO
tags, no subwords, no selection decode). The Ray pipeline recovers the
same set through the full reference algebra (gazetteer tagging ->
subword expansion -> selection cells -> decode -> alignment -> span
assembly), which makes `expected == produced` a real end-to-end test of
the decode/alignment machinery (P/R gate, BASELINE.md).

Class boundaries guarantee oracle exactness: fillers are hiragana-only,
mention surfaces are kanji/katakana/latin, so wakati can never merge a
mention token into its context and the gazetteer can never match across
segment boundaries.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from .hashing import stable_hash64
from .mockmodel import (
    GAZETTEER_SURFACES,
    mention_string,
    modality_for,
    relation_for,
)
from .stages.chunk import chunk_pack
from .textnorm import normalize_line

SURFACES = sorted(GAZETTEER_SURFACES)

FILLERS = (
    "これは", "そして", "ただし", "について", "ところで", "いわゆる",
    "とても", "やや", "ほとんど", "あきらか", "すみやかに", "ときどき",
)

EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds

# bump when generation rules change so stale cached corpora regenerate
FIXTURE_VERSION = 3

_HOT_DOMAIN = "hot.example.com"


def _xml_escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _url_for(i: int) -> str:
    h = stable_hash64("dom", i)
    # zipf-ish skew: one hot domain takes ~30% of rows (exercises salting)
    domain = _HOT_DOMAIN if h % 10 < 3 else f"site{h % 97:02d}.example.org"
    return f"https://{domain}/p/{i:08d}"


def _lang_for(i: int) -> str:
    h = stable_hash64("lang", i)
    m = h % 25
    return "ja" if m < 23 else ("en" if m == 23 else "")


def _compose_sentence(i: int, l: int, s: int) -> tuple[str, list[tuple[str, str]]]:
    """Return (raw sentence text, ordered [(surface, tag), ...])."""
    hs = stable_hash64("sent", i, l, s)
    n_mentions = hs % 4
    parts: list[str] = []
    mentions: list[tuple[str, str]] = []
    parts.append(FILLERS[stable_hash64("fill", i, l, s, 0) % len(FILLERS)])
    for k in range(n_mentions):
        surf = SURFACES[stable_hash64("men", i, l, s, k) % len(SURFACES)]
        mentions.append((surf, GAZETTEER_SURFACES[surf]))
        parts.append(surf)
        parts.append(FILLERS[stable_hash64("fill", i, l, s, k + 1) % len(FILLERS)])
    return "".join(parts) + "。", mentions


def _compose_page(i: int) -> tuple[list[str], list[list[tuple[str, str]]]]:
    """Return (raw lines, mentions per *sentence* in order)."""
    adv = stable_hash64("adv", i) % 20
    if adv == 1:
        # over-budget single line: exercises split-not-drop (no mentions)
        n = 260
        words = [FILLERS[stable_hash64("lf", i, k) % len(FILLERS)] for k in range(n)]
        # interleave punctuation-free katakana runs to defeat run merging
        line = "ー".join(words)
        return [line], [[]]
    if adv == 2:
        # specials: ascii spaces -> [JASP], '>>' repairs, a mention
        surf = SURFACES[stable_hash64("sm", i) % len(SURFACES)]
        line = f"データ >> {surf} << 確認 # テスト。"
        return [line], [[(surf, GAZETTEER_SURFACES[surf])]]

    n_lines = 1 + stable_hash64("nl", i) % 5
    lines: list[str] = []
    per_sentence: list[list[tuple[str, str]]] = []
    for l in range(n_lines):
        n_sents = 1 + stable_hash64("ns", i, l) % 2
        sents = []
        for s in range(n_sents):
            text, mentions = _compose_sentence(i, l, s)
            sents.append(text)
            per_sentence.append(mentions)
        lines.append("".join(sents))
    return lines, per_sentence


def _compose_en_page(i: int) -> list[str]:
    words = ["this", "page", "has", "plain", "english", "words", "only"]
    n = 3 + stable_hash64("en", i) % 4
    return [" ".join(words[: n + 2]) + "."]


def generate(n_pages: int) -> dict[str, pa.Table]:
    """Generate pages + expected tables for ``n_pages`` synthetic pages.

    Returns dict with keys: ``pages``, ``expected_text``,
    ``expected_chunks``, ``expected_entities``, ``expected_triples``.
    """
    urls: list[str] = []
    tss: list[int] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []

    ent_rows: dict[str, list] = {k: [] for k in ("url", "chunk_id", "mention", "ner_tag", "mod")}
    tri_rows: dict[str, list] = {
        k: []
        for k in ("subj", "pred", "obj", "subj_type", "obj_type", "subj_mod", "url", "chunk_id")
    }
    chk_rows: dict[str, list] = {k: [] for k in ("url", "chunk_id", "text", "n_subwords")}

    qua_rows: dict[str, list] = {"url": [], "error": []}

    for i in range(n_pages):
        url = _url_for(i)
        lang = _lang_for(i)
        adv = stable_hash64("adv", i) % 20

        if adv == 0:
            # empty page
            urls.append(url)
            tss.append(EPOCH_US + (stable_hash64("ts", i) % 86_400) * 1_000_000)
            htmls.append(b"")
            texts.append("")
            langs.append(lang)
            continue

        if adv == 3:
            # poison page: invalid utf-8 inside the html — quarantined
            # by extract_batch's strict decode (VERDICT r1 item 2: the
            # conformance query must see real quarantined rows). The
            # byte position varies per page so the oracled error string
            # is non-trivial.
            from .stages.extract import format_extract_error

            prefix = "データ" * (1 + stable_hash64("plen", i) % 7)
            bad = bytes([0xFF, 0x80 + stable_hash64("pbyte", i) % 0x40])
            html = (
                b"<html><body><p>" + prefix.encode("utf-8") + bad
                + b"</p></body></html>"
            )
            urls.append(url)
            tss.append(EPOCH_US + (stable_hash64("ts", i) % 86_400) * 1_000_000)
            htmls.append(html)
            texts.append("")
            langs.append("ja")  # passes the lang filter -> reaches extract
            try:
                html.decode("utf-8")
                raise AssertionError(f"poison page {i} decoded cleanly")
            except UnicodeDecodeError as ex:
                qua_rows["url"].append(url)
                qua_rows["error"].append(format_extract_error(ex))
            continue

        if lang == "ja":
            raw_lines, per_sentence_mentions = _compose_page(i)
        else:
            raw_lines, per_sentence_mentions = _compose_en_page(i), []

        # expected normalized text: one output line per normalized sentence
        norm_sentences: list[str] = []
        for raw in raw_lines:
            norm_sentences.extend(normalize_line(raw))
        text = "\n".join(norm_sentences)

        # html: wrap raw lines with markup noise; extraction must invert it
        body = "".join(f"<p>{_xml_escape(ln)}</p>" for ln in raw_lines)
        html = (
            f"<html><head><title>doc {i}</title><style>p{{margin:0}}</style></head>"
            f"<body><script>var n={i};</script>{body}</body></html>"
        ).encode("utf-8")

        urls.append(url)
        tss.append(EPOCH_US + (stable_hash64("ts", i) % 86_400) * 1_000_000)
        htmls.append(html)
        texts.append(text)
        langs.append(lang)

        if lang != "ja":
            continue

        # ---- expected chunks / entities / triples (oracle path) ----
        trunks, lens, assignment = chunk_pack(norm_sentences)
        line_to_chunk: dict[int, int] = {}
        for cid, line_ids in enumerate(assignment):
            for li in line_ids:
                line_to_chunk.setdefault(li, cid)
        for cid, (t, n) in enumerate(zip(trunks, lens)):
            chk_rows["url"].append(url)
            chk_rows["chunk_id"].append(cid)
            chk_rows["text"].append(t)
            chk_rows["n_subwords"].append(n)

        if len(per_sentence_mentions) != len(norm_sentences):
            # adversarial pages compose one sentence per raw line; normal
            # pages compose lines of 1-2 sentences that normalize_line
            # splits back — counts must agree or the oracle is invalid
            raise AssertionError(
                f"fixture invariant broken at page {i}: "
                f"{len(per_sentence_mentions)} mention groups vs "
                f"{len(norm_sentences)} sentences"
            )

        for li, mentions in enumerate(per_sentence_mentions):
            cid = line_to_chunk.get(li)
            if cid is None:
                continue
            mstrs = [mention_string(surf) for surf, _ in mentions]
            mods = [
                modality_for(tag, mstrs[k], k)
                for k, (_, tag) in enumerate(mentions)
            ]
            for k, (surf, tag) in enumerate(mentions):
                ent_rows["url"].append(url)
                ent_rows["chunk_id"].append(cid)
                ent_rows["mention"].append(mstrs[k])
                ent_rows["ner_tag"].append(tag)
                ent_rows["mod"].append(mods[k])
            for a in range(len(mentions)):
                for b in range(len(mentions)):
                    if a == b:
                        continue
                    pred = relation_for(mstrs[a], mstrs[b], a, b)
                    if pred is None:
                        continue
                    tri_rows["subj"].append(mstrs[a])
                    tri_rows["pred"].append(pred)
                    tri_rows["obj"].append(mstrs[b])
                    tri_rows["subj_type"].append(mentions[a][1])
                    tri_rows["obj_type"].append(mentions[b][1])
                    tri_rows["subj_mod"].append(mods[a])
                    tri_rows["url"].append(url)
                    tri_rows["chunk_id"].append(cid)

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    expected_text = pages.select(["url", "text"])
    expected_chunks = pa.table(
        {
            "url": pa.array(chk_rows["url"], pa.string()),
            "chunk_id": pa.array(chk_rows["chunk_id"], pa.int32()),
            "text": pa.array(chk_rows["text"], pa.string()),
            "n_subwords": pa.array(chk_rows["n_subwords"], pa.int32()),
        }
    )
    expected_entities = pa.table(
        {
            "url": pa.array(ent_rows["url"], pa.string()),
            "chunk_id": pa.array(ent_rows["chunk_id"], pa.int32()),
            "mention": pa.array(ent_rows["mention"], pa.string()),
            "ner_tag": pa.array(ent_rows["ner_tag"], pa.string()),
            "mod": pa.array(ent_rows["mod"], pa.string()),
        }
    )
    expected_triples = pa.table(
        {
            "subj": pa.array(tri_rows["subj"], pa.string()),
            "pred": pa.array(tri_rows["pred"], pa.string()),
            "obj": pa.array(tri_rows["obj"], pa.string()),
            "subj_type": pa.array(tri_rows["subj_type"], pa.string()),
            "obj_type": pa.array(tri_rows["obj_type"], pa.string()),
            "subj_mod": pa.array(tri_rows["subj_mod"], pa.string()),
            "url": pa.array(tri_rows["url"], pa.string()),
            "chunk_id": pa.array(tri_rows["chunk_id"], pa.int32()),
        }
    )
    expected_quarantine = pa.table(
        {
            "url": pa.array(qua_rows["url"], pa.string()),
            "error": pa.array(qua_rows["error"], pa.string()),
        }
    )
    return {
        "pages": pages,
        "expected_text": expected_text,
        "expected_chunks": expected_chunks,
        "expected_entities": expected_entities,
        "expected_triples": expected_triples,
        "expected_quarantine": expected_quarantine,
    }


def write_corpus(out_dir: str, n_pages: int, overwrite: bool = False) -> str:
    """Write pages + expected tables as parquet under ``out_dir``.

    Idempotent: skips if the marker for the same ``n_pages`` exists
    (generation is deterministic, so cached files are always valid).
    """
    marker = os.path.join(out_dir, f".complete-v{FIXTURE_VERSION}-{n_pages}")
    if os.path.exists(marker) and not overwrite:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    tables = generate(n_pages)
    for name, table in tables.items():
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    with open(marker, "w") as f:
        f.write(str(n_pages))
    return out_dir
