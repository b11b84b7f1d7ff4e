"""Golden tests for the label algebra — hand-computed fixtures per the
reference decode rules (FIXTURES.md §5)."""

import pytest

from jamie_ray import labels as L


# ---- bio_to_spans (data_objects.py:44-70) ---------------------------------

def test_bio_basic():
    assert L.bio_to_spans(["B-d", "I-d", "O", "B-a"]) == [("d", 0, 2), ("a", 3, 4)]


def test_bio_leading_I_accepted():
    # quirk: span may start with I- (no B-)
    assert L.bio_to_spans(["I-d", "I-d", "O"]) == [("d", 0, 2)]


def test_bio_type_switch_inside_I_run():
    assert L.bio_to_spans(["B-d", "I-a", "I-a"]) == [("d", 0, 1), ("a", 1, 3)]


def test_bio_b_after_b():
    assert L.bio_to_spans(["B-d", "B-d"]) == [("d", 0, 1), ("d", 1, 2)]


def test_bio_trailing_entity():
    assert L.bio_to_spans(["O", "B-c", "I-c"]) == [("c", 1, 3)]


def test_bio_all_o():
    assert L.bio_to_spans(["O", "O"]) == []


def test_bio_bad_tag():
    with pytest.raises(ValueError):
        L.bio_to_spans(["O", "X-d"])


# ---- find_entity (model.py:731-747) ---------------------------------------

def test_find_entity_on_b_or_o():
    assert L.find_entity(0, ["B-d", "I-d"]) == [0]
    assert L.find_entity(2, ["B-d", "I-d", "O"]) == [2]


def test_find_entity_walks_back():
    assert L.find_entity(2, ["B-d", "I-d", "I-d"]) == [0, 1, 2]
    # leading-I run without B
    assert L.find_entity(1, ["I-d", "I-d"]) == [0, 1]
    # stops at B regardless of tag type (reference quirk)
    assert L.find_entity(2, ["B-a", "I-d", "I-d"]) == [0, 1, 2]


# ---- selection_decode (model.py:728-770) ----------------------------------

def test_selection_decode():
    tags = ["O", "B-d", "I-d", "O", "B-a"]
    cells = [(2, "rel1", 4), (0, "N", 4), (4, "rel2", 2)]
    out = L.selection_decode(tags, cells)
    assert out == [
        {"subject": [1, 2], "predicate": "rel1", "object": [4]},
        {"subject": [4], "predicate": "rel2", "object": [1, 2]},
    ]


# ---- alignment inverses (utils.py:1831-1892) ------------------------------

SBW = ["[CLS]", "ＡＢＣ", "##ＤＥ", "発熱", "[SEP]"]  # words: [CLS] ＡＢＣＤＥ 発熱 [SEP]


def test_sbwtok2tok_alignment():
    words, ids = L.sbwtok2tok_alignment(SBW)
    assert words == ["[CLS]", "ＡＢＣＤＥ", "発熱", "[SEP]"]
    assert ids == [0, 1, 1, 2, 3]


def test_sbwner2ner_first_wins():
    ner = ["O", "B-d", "I-x", "B-a", "O"]
    _, ids = L.sbwtok2tok_alignment(SBW)
    assert L.sbwner2ner(ner, ids) == ["O", "B-d", "B-a", "O"]


def test_sbwmod2mod_last_wins():
    mod = ["_", "_", "positive", "_", "_"]
    _, ids = L.sbwtok2tok_alignment(SBW)
    assert L.sbwmod2mod(mod, ids) == ["_", "positive", "_", "_"]


def test_sbwrel2head_anchor_minus_one():
    _, ids = L.sbwtok2tok_alignment(SBW)  # [0,1,1,2,3]
    # one relation: subject = subwords [1,2] (word 1), object = [3] (word 2)
    spo = [{"subject": [1, 2], "predicate": "r", "object": [3]}]
    rels, heads = L.sbwrel2head(spo, ids)
    # 2 real words ([CLS]/[SEP] removed by offset)
    assert rels == [["r"], ["N"]]
    assert heads == [[1], [1]]


def test_sbwrel2head_append_after_first():
    _, ids = L.sbwtok2tok_alignment(SBW)
    spo = [
        {"subject": [1], "predicate": "r1", "object": [3]},
        {"subject": [2], "predicate": "r2", "object": [3]},
    ]
    rels, heads = L.sbwrel2head(spo, ids)
    assert rels == [["r1", "r2"], ["N"]]
    assert heads == [[1, 1], [1]]


def test_sbwrel2head_defaults():
    rels, heads = L.sbwrel2head([], [0, 1, 2, 3])
    assert rels == [["N"], ["N"]]
    assert heads == [[0], [1]]


# ---- word -> subword expansion (utils.py:117-159) -------------------------

def test_match_ner_label():
    bpe = ["ＡＢＣ", "##ＤＥ", "発熱"]
    assert L.match_ner_label(bpe, ["B-d", "O"]) == ["B-d", "I-d", "O"]
    assert L.match_ner_label(bpe, ["O", "O"]) == ["O", "O", "O"]


def test_match_mod_label_rides_last_piece():
    bpe = ["ＡＢＣ", "##ＤＥ", "発熱"]
    assert L.match_mod_label(bpe, ["positive", "_"]) == ["_", "positive", "_"]


def test_word_to_sbw_last_index():
    assert L.word_to_sbw_last_index([0, 1, 1, 2, 3]) == {0: 0, 1: 2, 2: 3, 3: 4}


def test_roundtrip_expansion_alignment():
    """word labels -> subword (match_*) -> word (sbw*2*) must be identity."""
    words = ["ＡＢＣＤＥ", "発熱", "ありました"]
    from jamie_ray import tokenization as tk

    sbw = ["[CLS]"] + tk.subword_tokenize(words) + ["[SEP]"]
    w_ner = ["B-d", "I-d", "O"]
    w_mod = ["_", "positive", "_"]
    sbw_ner = ["O"] + L.match_ner_label(tk.subword_tokenize(words), w_ner) + ["O"]
    sbw_mod = ["_"] + L.match_mod_label(tk.subword_tokenize(words), w_mod) + ["_"]
    back_words, ids = L.sbwtok2tok_alignment(sbw)
    assert back_words[1:-1] == words
    assert L.sbwner2ner(sbw_ner, ids)[1:-1] == w_ner
    assert L.sbwmod2mod(sbw_mod, ids)[1:-1] == w_mod
