"""Tests for the deterministic segmenter + subword tokenizer.

Contract parity target: /root/reference/utils.py:28-60 (analyzer) and
the WordPiece call sites (utils.py:662,826).
"""

import pytest

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


# ---- analyzer registry (§2.9 juman|mecab choice point) --------------------

def test_analyzer_registry_golden():
    """Both registered analyzers pinned: mecab keeps alnum runs whole,
    juman segments digit runs from letter runs (utils.py:30-42's choice
    point, deterministic stand-ins)."""
    from jamie_ray import tokenization as tok

    assert tok.wakati("MRI2023") == ["MRI2023"]
    assert tok.wakati_juman("MRI2023") == ["MRI", "2023"]
    s = "本日MRI2023を実施"
    assert tok.analyze(s) == ["本日", "ＭＲＩ２０２３", "を", "実施"]
    assert tok.analyze(s, "juman") == ["本日", "ＭＲＩ", "２０２３", "を", "実施"]
    # default analyzer unchanged (frozen invariant)
    assert tok.analyze(s) == tok.analyze(s, "mecab")

    with pytest.raises(KeyError, match="unknown analyzer"):
        tok.get_analyzer("nope")
    tok.register_analyzer("test_upper", lambda t: [t.upper()])
    try:
        with pytest.raises(ValueError, match="already registered"):
            tok.register_analyzer("test_upper", lambda t: [t])
        assert tok.get_analyzer("test_upper")("ab") == ["AB"]
    finally:
        del tok.ANALYZERS["test_upper"]


def test_analyzer_choice_changes_recall():
    """The analyzer choice is real end-to-end: under juman the scorer
    recovers a gazetteer entity that mecab's coarser segmentation
    glues to a digit run."""
    from jamie_ray.stages.score import MockJointModel

    s = "本日MRI2023を実施"
    ner_mecab = MockJointModel().predict(s)[1]
    ner_juman = MockJointModel(analyzer="juman").predict(s)[1]
    assert "B-t-test" not in ner_mecab
    assert "B-t-test" in ner_juman
    assert "B-TIMEX3" in ner_mecab and "B-TIMEX3" in ner_juman


def test_analyzers_agree_on_fixture_corpus():
    """Fixture text has no digit-letter adjacency, so the two analyzers
    segment it identically — the juman pipeline hits the same oracle."""
    from jamie_ray import fixtures, tokenization as tok

    for i in (0, 7, 23):
        lines, _ = fixtures._compose_page(i)
        for ln in lines:
            assert tok.analyze(ln) == tok.analyze(ln, "juman")


# ---------------------------------------------------------------------------
# genuine tagger adapters (optional MeCab / pyknp bindings)
# ---------------------------------------------------------------------------

def test_real_adapters_registered():
    from jamie_ray import tokenization as tok

    assert {"mecab_real", "juman_real"} <= set(tok.ANALYZERS)


def test_mecab_real_missing_dep_fails_loudly(monkeypatch):
    import builtins
    import sys

    import pytest as _pytest

    from jamie_ray import tokenization as tok

    monkeypatch.delitem(tok._REAL_TAGGERS, "mecab", raising=False)
    monkeypatch.delitem(sys.modules, "MeCab", raising=False)
    real_import = builtins.__import__

    def no_mecab(name, *a, **kw):
        if name == "MeCab":
            raise ImportError("No module named 'MeCab'")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_mecab)
    with _pytest.raises(ImportError, match="mecab-python3"):
        tok.analyze("急性肺炎", "mecab_real")


def test_mecab_real_adapter_glue(monkeypatch):
    """The adapter composed with analyze() reproduces the reference's
    mecab branch (utils.py:36-60) — exercised against a FAKE MeCab
    whose -Owakati output includes the ideographic-space ' SEP '
    pattern, proving ascii-space-only splitting keeps the U+3000
    tokens alive for the [SEP] fold."""
    import sys
    import types

    from jamie_ray import tokenization as tok

    class _FakeTagger:
        def __init__(self, _args):
            pass

        def parse(self, text):
            # a real -Owakati: surface tokens joined by ascii spaces,
            # U+3000 emitted as its own token, latin runs kept whole,
            # trailing newline
            import re

            out = re.findall(r"[A-Za-z]+|.", text)
            return " ".join(out) + " \n"

    fake = types.ModuleType("MeCab")
    fake.Tagger = _FakeTagger
    monkeypatch.setitem(sys.modules, "MeCab", fake)
    monkeypatch.delitem(tok._REAL_TAGGERS, "mecab", raising=False)
    try:
        # "a b" -> space becomes U+3000 before tagging, then [JASP]
        toks = tok.analyze("ａ　ｂ", "mecab_real")
        assert toks == ["ａ", "[JASP]", "ｂ"]
        # the sentence-boundary sentinel round-trips through the fold
        toks = tok.analyze("肺　SEP　癌", "mecab_real")
        assert toks == ["肺", "[SEP]", "癌"]
    finally:
        tok._REAL_TAGGERS.pop("mecab", None)


def test_mecab_real_live():
    """Runs only where the genuine binding is installed."""
    import pytest as _pytest

    _pytest.importorskip("MeCab")
    from jamie_ray import tokenization as tok

    toks = tok.analyze("急性肺炎を認めた。", "mecab_real")
    assert toks and "".join(toks) == "急性肺炎を認めた。"


def test_juman_real_live():
    import pytest as _pytest

    _pytest.importorskip("pyknp")
    from jamie_ray import tokenization as tok

    toks = tok.analyze("急性肺炎を認めた。", "juman_real")
    assert toks
