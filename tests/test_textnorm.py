"""Golden byte-equality tests for the normalization cascade (M1/M3).

Reference semantics: /root/reference/utils.py:299,399,651-653,735-742.
"""

from jamie_ray import textnorm as tn


def test_zen_to_han_ascii_block():
    assert tn.zen_to_han("ＡＢＣ１２３！？") == "ABC123!?"
    assert tn.zen_to_han("　") == " "  # ideographic space
    # kana untouched with kana=False
    assert tn.zen_to_han("カタカナ") == "カタカナ"
    assert tn.zen_to_han("ひらがな漢字") == "ひらがな漢字"


def test_han_to_zen_ascii_and_space():
    assert tn.han_to_zen("ABC123!?") == "ＡＢＣ１２３！？"
    assert tn.han_to_zen(" ") == "　"


def test_han_to_zen_halfwidth_katakana_composition():
    assert tn.han_to_zen("ｶﾞｷﾞｳﾞ") == "ガギヴ"
    assert tn.han_to_zen("ﾊﾟﾋﾟ") == "パピ"
    assert tn.han_to_zen("ｱｲｳｴｵﾝｰ") == "アイウエオンー"
    assert tn.han_to_zen("｡｢｣､･") == "。「」、・"
    # dangling voicing mark maps to the standalone mark
    assert tn.han_to_zen("ｱﾞ") == "ア゛"


def test_roundtrip_width():
    s = "Test 123 テスト！"
    assert tn.han_to_zen(tn.zen_to_han(s)) == tn.han_to_zen(s)


def test_repair_escapes_order():
    # '>>' must be repaired BEFORE the bare '<'/'>' full-width fold
    assert tn.repair_escapes(">>x<<", is_raw=False) == ">＞x＜<"
    assert tn.repair_escapes(">>x<<", is_raw=True) == "＞＞x＜＜"
    assert tn.repair_escapes("a&gt;b&lt;c", is_raw=False) == "a＞b＜c"
    assert tn.repair_escapes("＆ａｍｐ；ｇｔ；", is_raw=False) == "＞"
    assert tn.repair_escapes("a#b", is_raw=True) == "a＃b"


def test_ssplit():
    assert tn.ssplit("一文目。二文目！三文目？残り") == [
        "一文目。",
        "二文目！",
        "三文目？",
        "残り",
    ]
    assert tn.ssplit("   ") == []


def test_normalize_line_goldens():
    # full-width ascii folded to half then sentences re-widened
    assert tn.normalize_line("ＡＢ。ＣＤ！") == ["ＡＢ。", "ＣＤ！"]
    # \r dropped; raw path width-folds the whole sentence (utils.py:703)
    # so ascii incl. '>>' lands full-width before the repair block
    assert tn.normalize_line("a>>b\r") == ["ａ＞＞ｂ"]
    # html-layer unescaping happens in html_to_lines; a literal &gt;
    # reaching the raw cascade is width-folded like any ascii run
    assert tn.normalize_line("x&gt;y") == ["ｘ＆ｇｔ；ｙ"]


def test_extract_text_html():
    html = "<html><body><p>発熱した。</p><script>var x=1;</script><div>A&gt;B</div></body></html>"
    # &gt; unescaped at the html layer, then the cascade width-folds it
    assert tn.extract_text(html) == "発熱した。\nＡ＞Ｂ"


def test_extract_text_deterministic():
    html = "<p>テスト１２３。二回目！</p>"
    assert tn.extract_text(html) == tn.extract_text(html)
    assert tn.extract_text(html) == "テスト１２３。\n二回目！"
