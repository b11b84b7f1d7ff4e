"""Byte-identical text normalization cascade.

Re-implements, from public Unicode halfwidth/fullwidth-forms semantics,
the exact normalization the reference extractor applies to raw text
(reference: /root/reference/utils.py:299,399 — ``mojimoji.zen_to_han(...,
kana=False)`` before sentence split, ``mojimoji.han_to_zen`` per
sentence/token after — and the char-repair block at
/root/reference/utils.py:735-742). This cascade is the north-rule
per-row invariant: extracted text must be byte-identical per url, so
every mapping here is table-driven and frozen.

No dependency on the ``mojimoji`` package: the tables below implement the
same documented conversions (full-width ASCII U+FF01–U+FF5E ↔ half-width
U+0021–U+007E, ideographic space U+3000 ↔ space, and half-width katakana
U+FF61–U+FF9F → full-width with dakuten/handakuten composition).
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# Width-conversion tables (Unicode Halfwidth and Fullwidth Forms)
# ---------------------------------------------------------------------------

# Full-width ASCII block U+FF01-U+FF5E -> half-width U+0021-U+007E,
# plus ideographic space U+3000 -> U+0020.
_Z2H_ASCII = {0x3000: 0x20}
_Z2H_ASCII.update({cp: cp - 0xFEE0 for cp in range(0xFF01, 0xFF5F)})

_H2Z_ASCII = {0x20: 0x3000}
_H2Z_ASCII.update({cp: cp + 0xFEE0 for cp in range(0x21, 0x7F)})

# Half-width katakana U+FF61-U+FF9F -> full-width (base forms).
_H2Z_KANA_BASE = {
    "｡": "。", "｢": "「", "｣": "」", "､": "、", "･": "・",
    "ｦ": "ヲ", "ｧ": "ァ", "ｨ": "ィ", "ｩ": "ゥ", "ｪ": "ェ", "ｫ": "ォ",
    "ｬ": "ャ", "ｭ": "ュ", "ｮ": "ョ", "ｯ": "ッ", "ｰ": "ー",
    "ｱ": "ア", "ｲ": "イ", "ｳ": "ウ", "ｴ": "エ", "ｵ": "オ",
    "ｶ": "カ", "ｷ": "キ", "ｸ": "ク", "ｹ": "ケ", "ｺ": "コ",
    "ｻ": "サ", "ｼ": "シ", "ｽ": "ス", "ｾ": "セ", "ｿ": "ソ",
    "ﾀ": "タ", "ﾁ": "チ", "ﾂ": "ツ", "ﾃ": "テ", "ﾄ": "ト",
    "ﾅ": "ナ", "ﾆ": "ニ", "ﾇ": "ヌ", "ﾈ": "ネ", "ﾉ": "ノ",
    "ﾊ": "ハ", "ﾋ": "ヒ", "ﾌ": "フ", "ﾍ": "ヘ", "ﾎ": "ホ",
    "ﾏ": "マ", "ﾐ": "ミ", "ﾑ": "ム", "ﾒ": "メ", "ﾓ": "モ",
    "ﾔ": "ヤ", "ﾕ": "ユ", "ﾖ": "ヨ",
    "ﾗ": "ラ", "ﾘ": "リ", "ﾙ": "ル", "ﾚ": "レ", "ﾛ": "ロ",
    "ﾜ": "ワ", "ﾝ": "ン", "ﾞ": "゛", "ﾟ": "゜",
}
# Voiced (dakuten ﾞ) / semi-voiced (handakuten ﾟ) composition.
_DAKUTEN = {
    "ｶ": "ガ", "ｷ": "ギ", "ｸ": "グ", "ｹ": "ゲ", "ｺ": "ゴ",
    "ｻ": "ザ", "ｼ": "ジ", "ｽ": "ズ", "ｾ": "ゼ", "ｿ": "ゾ",
    "ﾀ": "ダ", "ﾁ": "ヂ", "ﾂ": "ヅ", "ﾃ": "デ", "ﾄ": "ド",
    "ﾊ": "バ", "ﾋ": "ビ", "ﾌ": "ブ", "ﾍ": "ベ", "ﾎ": "ボ",
    "ｳ": "ヴ",
}
_HANDAKUTEN = {"ﾊ": "パ", "ﾋ": "ピ", "ﾌ": "プ", "ﾍ": "ペ", "ﾎ": "ポ"}


def zen_to_han(text: str, kana: bool = False) -> str:
    """Full-width -> half-width for the ASCII block (+ideographic space).

    ``kana=False`` matches the reference call site (utils.py:299,703):
    katakana is left untouched. ``kana=True`` is not needed by the
    cascade and is unimplemented on purpose.
    """
    if kana:
        raise NotImplementedError("cascade only uses kana=False")
    return text.translate(_Z2H_ASCII)


def han_to_zen(text: str) -> str:
    """Half-width -> full-width: ASCII block, space, and half-width
    katakana with dakuten/handakuten composition (mojimoji defaults)."""
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        nxt = text[i + 1] if i + 1 < n else ""
        if nxt == "ﾞ" and ch in _DAKUTEN:
            out.append(_DAKUTEN[ch])
            i += 2
            continue
        if nxt == "ﾟ" and ch in _HANDAKUTEN:
            out.append(_HANDAKUTEN[ch])
            i += 2
            continue
        if ch in _H2Z_KANA_BASE:
            out.append(_H2Z_KANA_BASE[ch])
            i += 1
            continue
        cp = ord(ch)
        mapped = _H2Z_ASCII.get(cp)
        out.append(chr(mapped) if mapped is not None else ch)
        i += 1
    return "".join(out)


# ---------------------------------------------------------------------------
# Sentence split (stands in for textformatting.ssplit, utils.py:304,703)
# ---------------------------------------------------------------------------

_SSPLIT_RE = re.compile(r"(?<=[。！？!?])")


def ssplit(line: str) -> list[str]:
    """Deterministic Japanese-style sentence split on 。！？!? boundaries.

    Keeps the terminator with its sentence; drops empty fragments. The
    reference delegates to ``textformatting.ssplit`` (utils.py:304); this
    engine pins its own frozen rule so the per-url byte invariant is
    self-contained.
    """
    return [s for s in (_s for _s in _SSPLIT_RE.split(line)) if s.strip()]


# ---------------------------------------------------------------------------
# Char-repair cascade (utils.py:651-653, 735-742)
# ---------------------------------------------------------------------------

def repair_escapes(line: str, is_raw: bool = True) -> str:
    """The exact replacement cascade of utils.py:735-742, in order."""
    line = line.replace(">>", ">＞").replace("<<", "＜<")
    line = line.replace("＆ａｍｐ；ｇｔ；", "＞").replace("＆ａｍｐ；ｌｔ；", "＜")
    line = line.replace("&gt;", "＞").replace("&lt;", "＜")
    if is_raw:
        line = line.replace("#", "＃")
        line = line.replace("<", "＜")
        line = line.replace(">", "＞")
    return line


def normalize_line(line: str) -> list[str]:
    """Raw line -> list of repaired, width-normalized sentences.

    Mirrors the raw-text path of the reference converter
    (utils.py:703 then 730-742):
      1. ``zen_to_han(line, kana=False)`` then sentence split, then
         ``han_to_zen`` per sentence;
      2. strip + drop ``\\r``;
      3. escape repairs with the raw-text extras.
    """
    sents = [han_to_zen(s) for s in ssplit(zen_to_han(line, kana=False))]
    out = []
    for s in sents:
        s = s.strip().replace("\r", "")
        s = repair_escapes(s, is_raw=True)
        if s:
            out.append(s)
    return out


# ---------------------------------------------------------------------------
# HTML -> text extraction (web-scale front door)
# ---------------------------------------------------------------------------

_TAG_RE = re.compile(r"<[^>]*>")
_BLOCK_TAG_RE = re.compile(
    r"</?(?:p|div|br|li|ul|ol|h[1-6]|tr|table|section|article|header|footer)[^>]*>",
    re.IGNORECASE,
)
_SCRIPT_RE = re.compile(r"<(script|style)[^>]*>.*?</\1>", re.IGNORECASE | re.DOTALL)
_HEAD_RE = re.compile(r"<head[^>]*>.*?</head>", re.IGNORECASE | re.DOTALL)


def html_to_lines(html: str) -> list[str]:
    """Minimal deterministic HTML -> text lines.

    Drops script/style subtrees, turns block-level tags into newlines,
    strips remaining tags, unescapes the three entities the reference
    repairs (&gt; &lt; &amp;), and splits into non-empty lines. This is
    the stage-1 extractor; the per-line normalization cascade
    (:func:`normalize_line`) then produces the byte-pinned text.
    """
    s = _HEAD_RE.sub(" ", html)
    s = _SCRIPT_RE.sub(" ", s)
    s = _BLOCK_TAG_RE.sub("\n", s)
    s = _TAG_RE.sub("", s)
    s = s.replace("&gt;", ">").replace("&lt;", "<").replace("&amp;", "&")
    return [ln for ln in s.split("\n") if ln.strip()]


def extract_text(html: str) -> str:
    """Full html -> normalized text: the byte-identical-per-url surface.

    One output line per normalized sentence, joined with ``\\n``.
    """
    lines: list[str] = []
    for raw in html_to_lines(html):
        lines.extend(normalize_line(raw))
    return "\n".join(lines)
