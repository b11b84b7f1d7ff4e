"""Property-based tests (hypothesis) for the core algebra — the
reference has no randomized testing at all (SURVEY.md §5); these pin
the invariants the whole pipeline depends on for arbitrary input."""

from hypothesis import given, settings, strategies as st

from jamie_ray import labels as L
from jamie_ray import textnorm as tn
from jamie_ray import tokenization as tk
from jamie_ray.stages.chunk import chunk_pack

# -- strategies -------------------------------------------------------------

_tags = st.sampled_from(["d", "a", "f", "TIMEX3"])


@st.composite
def bio_sequences(draw):
    n = draw(st.integers(1, 12))
    out = []
    for _ in range(n):
        kind = draw(st.integers(0, 2))
        if kind == 0:
            out.append("O")
        else:
            out.append(("B-" if kind == 1 else "I-") + draw(_tags))
    return out


_text = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Lo", "Po", "Zs"),
        max_codepoint=0x9FFF,
    ),
    max_size=120,
)

_words = st.lists(
    st.text(alphabet=st.characters(min_codepoint=0x21, max_codepoint=0x7E), min_size=1, max_size=9),
    min_size=1,
    max_size=10,
)


# -- properties -------------------------------------------------------------

@given(bio_sequences())
def test_bio_spans_partition_tagged_positions(tags):
    spans = L.bio_to_spans(tags)
    covered = set()
    for tag, s, e in spans:
        assert 0 <= s < e <= len(tags)
        assert not (set(range(s, e)) & covered), "spans overlap"
        covered |= set(range(s, e))
    # every non-O position is covered; every O position is not
    for i, t in enumerate(tags):
        assert (i in covered) == (t != "O")


@given(bio_sequences())
def test_find_entity_always_contains_anchor(tags):
    for pos in range(len(tags)):
        ent = L.find_entity(pos, tags)
        assert pos in ent
        assert ent == sorted(ent)


@given(_words)
def test_subword_fusion_is_identity(words):
    pieces = tk.subword_tokenize(words)
    fused, aligned = L.sbwtok2tok_alignment(pieces)
    assert fused == words
    assert len(aligned) == len(pieces)
    assert aligned[-1] == len(words) - 1


@given(_words)
def test_subword_len_agrees_with_tokenize(words):
    assert tk.subword_len(words) == len(tk.subword_tokenize(words))


@given(_text)
def test_wakati_preserves_characters(text):
    # tokens partition the input chars (spaces become U+3000 same-length)
    toks = tk.wakati(text)
    rebuilt = "".join(toks)
    assert len(rebuilt) == len(text)
    for a, b in zip(rebuilt, text):
        assert a == b or (a == "　" and b.isspace())


@given(_text)
def test_analyze_deterministic_and_sentinel_clean(text):
    t1 = tk.analyze(text)
    assert t1 == tk.analyze(text)
    # no empty tokens, no consecutive [JASP]
    assert all(t1), t1
    for a, b in zip(t1, t1[1:]):
        assert not (a == b == "[JASP]")


@given(_text)
def test_width_fold_idempotent(text):
    once = tn.han_to_zen(text)
    assert tn.han_to_zen(once) == once


@given(st.lists(_text.filter(lambda s: s.strip()), min_size=0, max_size=8))
@settings(deadline=None, max_examples=40)
def test_chunk_pack_budget_and_no_loss(lines):
    lines = [ln.replace("\n", " ").replace("\r", " ") for ln in lines if ln.strip()]
    trunks, lens, assignment = chunk_pack(lines, len_limit=64)
    # budget: every trunk fits (split fallback included)
    for n in lens:
        assert n <= 62
    # no loss: every line index assigned, in order
    flat = [i for ids in assignment for i in ids]
    assert sorted(set(flat)) == list(range(len(lines)))


@given(st.text(max_size=200))
def test_extract_text_total(html):
    # the extractor must be total on arbitrary input
    out = tn.extract_text(html)
    assert isinstance(out, str)
