"""Tests for the deterministic segmenter + subword tokenizer.

Contract parity target: /root/reference/utils.py:28-60 (analyzer) and
the WordPiece call sites (utils.py:662,826).
"""

from jamie_ray import tokenization as tk


def test_wakati_classes():
    toks = tk.wakati("発熱ありMRI施行。")
    # kanji run, hiragana run, latin run, kanji run, punct
    assert toks == ["発熱", "あり", "MRI", "施行", "。"]


def test_wakati_kanji_chunking():
    assert tk.wakati("一二三四五") == ["一二", "三四", "五"]


def test_wakati_space_tokens():
    assert tk.wakati("a　b") == ["a", "　", "b"]
    assert tk.wakati("a b") == ["a", "　", "b"]


def test_analyze_jasp_sentinel():
    # ideographic space -> [JASP], consecutive dedup
    assert tk.analyze("発熱　　あり") == ["発熱", "[JASP]", "あり"]


def test_analyze_sep_sentinel():
    # the trunk join sentinel 　SEP　 -> [SEP] (utils.py:49)
    toks = tk.analyze("一文。　SEP　二文。")
    assert "[SEP]" in toks
    assert toks == ["一文", "。", "[SEP]", "二文", "。"]


def test_analyze_han_to_zen_per_token():
    # ascii tokens are width-folded after segmentation (utils.py:50)
    assert tk.analyze("MRI") == ["ＭＲＩ"]
    assert tk.analyze("ab1") == ["ａｂ１"]


def test_subword_tokenize_shapes():
    assert tk.subword_tokenize(["発熱"]) == ["発熱"]
    assert tk.subword_tokenize(["ＡＢＣＤＥ"]) == ["ＡＢＣ", "##ＤＥ"]
    assert tk.subword_tokenize(["[SEP]", "[JASP]"]) == ["[SEP]", "[JASP]"]
    pieces = tk.subword_tokenize(["ａｂｃｄｅｆｇ"])
    assert pieces == ["ａｂｃ", "##ｄｅｆ", "##ｇ"]


def test_subword_len_matches_tokenize():
    for toks in (["発熱", "あり"], ["ＡＢＣＤＥＦＧＨ", "[SEP]", "x"], []):
        assert tk.subword_len(toks) == len(tk.subword_tokenize(toks))


def test_explore_unk():
    # [UNK] restored from original surfaces (utils.py:170-185)
    bpe = ["[CLS]", "ab", "[UNK]", "##cd", "x"]
    ori = ["[CLS]", "ab", "orig", "x"]
    assert tk.explore_unk(bpe, ori) == ["[CLS]", "ab", "orig", "##cd", "x"]
