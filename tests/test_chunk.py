"""Chunker tests: incremental packing parity, split-not-drop, budget."""

from jamie_ray.stages.chunk import (
    DEFAULT_LEN_LIMIT,
    SEP_JOIN,
    chunk_pack,
    parity_check_incremental,
    split_long_line,
)
from jamie_ray.tokenization import analyze, subword_len


def test_pack_joins_with_sep():
    trunks, lens, assign = chunk_pack(["一文目。", "二文目。"])
    assert trunks == ["一文目。" + SEP_JOIN + "二文目。"]
    assert assign == [[0, 1]]
    # [SEP] token must appear when re-analyzed
    assert "[SEP]" in analyze(trunks[0])


def test_incremental_length_matches_reanalysis():
    lines = ["発熱あり。", "ＭＲＩ施行した。", "a b c", "一二三四五六七八。"]
    assert parity_check_incremental(lines)


def test_budget_respected():
    # many medium lines -> multiple trunks, each under the budget
    lines = [f"これは文番号{i}のテキストです。" * 8 for i in range(40)]
    trunks, lens, assign = chunk_pack(lines, len_limit=128)
    assert len(trunks) > 1
    for t, n in zip(trunks, lens):
        assert n + 2 < 128 or len(assign) == 1
        assert subword_len(analyze(t)) == n
    # every line assigned exactly once, in order
    flat = [i for ids in assign for i in ids]
    assert flat == list(range(40))


def test_split_not_drop_overlong_line():
    # reference drops >510-subword trunks (utils.py:841-842); we split
    long_line = "ー".join(["あいうえお"] * 300)
    trunks, lens, assign = chunk_pack([long_line], len_limit=DEFAULT_LEN_LIMIT)
    assert len(trunks) > 1
    assert all(n <= DEFAULT_LEN_LIMIT - 2 for n in lens)
    # no data loss: concatenating the pieces restores the line
    assert "".join(trunks) == long_line
    assert all(ids == [0] for ids in assign)


def test_split_long_line_char_exact():
    line = "abc def ghi " * 50
    pieces = split_long_line(line, budget=40)
    assert "".join(pieces) == line
    for p in pieces:
        assert subword_len(analyze(p)) <= 40


def test_empty_lines():
    trunks, lens, assign = chunk_pack([])
    assert trunks == [] and lens == [] and assign == []


def test_split_unsplittable_token():
    # one giant unbroken alnum run (long URL / base64 blob): wakati
    # cannot split it, so the char-window fallback must kick in
    line = "x" * 2000
    trunks, lens, assign = chunk_pack([line], len_limit=DEFAULT_LEN_LIMIT)
    assert len(trunks) > 1
    assert all(n <= DEFAULT_LEN_LIMIT - 2 for n in lens)
    assert "".join(trunks) == line
    # katakana long run too
    line2 = "ア" * 1800
    trunks2, lens2, _ = chunk_pack([line2], len_limit=DEFAULT_LEN_LIMIT)
    assert all(n <= DEFAULT_LEN_LIMIT - 2 for n in lens2)
    assert "".join(trunks2) == line2


def test_split_long_line_space_dropping_analyzer_byte_exact():
    """A REAL analyzer may drop chars (mecab_real strips ASCII spaces):
    pieces must still join back to the input byte-for-byte, with the
    dropped chars riding inside the slices and the tail never lost."""
    from jamie_ray.tokenization import ANALYZERS

    def dropping(text):
        return [t for t in text.split(" ") if t]

    ANALYZERS["_test_dropping"] = dropping
    try:
        line = "alpha beta gamma delta " * 30 + "tail with trailing spaces   "
        pieces = split_long_line(line, budget=20, analyzer="_test_dropping")
        assert "".join(pieces) == line
        assert len(pieces) > 1
    finally:
        del ANALYZERS["_test_dropping"]


def test_split_long_line_normalizing_analyzer_falls_back_byte_exact():
    """An analyzer whose surfaces aren't in the line verbatim (heavy
    normalization) falls back to char windows — byte identity holds."""
    from jamie_ray.tokenization import ANALYZERS

    ANALYZERS["_test_normalizing"] = lambda text: ["ZZZ"] * 3
    try:
        line = "abcdefghij" * 20
        pieces = split_long_line(line, budget=10, analyzer="_test_normalizing")
        assert "".join(pieces) == line
    finally:
        del ANALYZERS["_test_normalizing"]
