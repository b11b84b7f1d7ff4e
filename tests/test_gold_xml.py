"""Gold annotated-XML reader tests (S1/S3 input direction)."""

import pyarrow as pa

from jamie_ray.stages.gold_xml import gold_xml_to_tagged_batch, parse_gold_xml


def test_parse_gold_xml_basic():
    xml = (
        '<d tid="T1" certainty="positive">発熱</d>あり'
        '<t tid="T2" DCT-Rel="on">昨日</t>。\n'
        '<brel rid="R1" arg1="T1" arg2="T2" reltype="on" />\n'
    )
    row = parse_gold_xml(xml)
    toks = row["tokens"]
    # mention tokens tagged B-/I- with modality on the LAST token
    i_hatsu = toks.index("発熱")
    assert row["ner"][i_hatsu] == "B-d"
    assert row["mod"][i_hatsu] == "positive"
    i_kino = toks.index("昨日")
    assert row["ner"][i_kino] == "B-t"
    # DCT-Rel self relation is anchored first, then the brel appends
    assert row["rels"][i_kino] == ["on"]
    assert row["heads"][i_kino] == [i_kino]
    assert row["rels"][i_hatsu] == ["on"]
    assert row["heads"][i_hatsu] == [i_kino]
    # non-mention tokens keep default cells
    o_ix = [i for i, t in enumerate(row["ner"]) if t == "O"]
    assert all(row["rels"][i] == ["N"] and row["heads"][i] == [i] for i in o_ix)


def test_parse_gold_xml_dangling_tid_skips_relation():
    xml = '<d tid="T1">発熱</d>\n<brel rid="R1" arg1="T1" arg2="T9" reltype="on" />\n'
    row = parse_gold_xml(xml)
    assert all(r == ["N"] for r in row["rels"])


def test_parse_gold_xml_sentence_breaks():
    xml = "発熱。\n咳。\n"
    row = parse_gold_xml(xml)
    assert "[SEP]" in row["tokens"]


def test_gold_xml_roundtrip_equals_direct_path(ray_session, tmp_path):
    """scored -> XML writer -> gold reader -> assemble must equal the
    direct scored -> assemble triples (the judge's done-condition)."""
    import pyarrow.parquet as pq
    import ray.data

    from jamie_ray import fixtures
    from jamie_ray.pipelines import kg
    from jamie_ray.stages.assemble import assemble_batch
    from jamie_ray.stages.format_out import tagged_to_xml_batch

    tables = fixtures.generate(80)
    pq.write_table(tables["pages"], tmp_path / "pages.parquet")
    p = str(tmp_path / "pages.parquet")

    chunks = kg.chunk_pages(kg.extracted_pages(kg.read_pages(p)))
    tagged = kg.score_chunks(chunks)
    direct = tagged.map_batches(assemble_batch, batch_format="pyarrow").take_all()

    xml = tagged.map_batches(tagged_to_xml_batch, batch_format="pyarrow")
    back = xml.map_batches(gold_xml_to_tagged_batch, batch_format="pyarrow")
    via_xml = back.map_batches(assemble_batch, batch_format="pyarrow").take_all()

    key = lambda rows: sorted(tuple(sorted(r.items())) for r in rows)
    assert len(direct) > 0
    assert key(direct) == key(via_xml)


def test_auto_tid_never_collides_with_explicit():
    """An entity without a tid must not be overwritten by a later
    explicit tid=\"T1\" (code-review finding)."""
    xml = (
        '<d certainty="positive">発熱</d>と'
        '<t tid="T1">昨日</t>。\n'
        '<brel rid="R1" arg1="T1" arg2="T1" reltype="on" />\n'
    )
    row = parse_gold_xml(xml)
    i_kino = row["tokens"].index("昨日")
    # the brel (T1->T1, a self rel via explicit tid) anchors on 昨日,
    # NOT on the auto-id'd 発熱
    assert row["rels"][i_kino] == ["on"]
    i_hatsu = row["tokens"].index("発熱")
    assert row["rels"][i_hatsu] == ["N"]


# ---- ET-parser capabilities (r3: regex reader replaced) -------------------

def _parse(xml):
    from jamie_ray.stages.gold_xml import parse_gold_xml

    return parse_gold_xml(xml)


def test_gold_xml_attribute_order_and_escapes():
    # rel attributes in non-canonical order parse (regex required
    # rid/arg1/arg2/reltype order); &amp; in text unescapes via ET
    xml = (
        '<d tid="T1">熱</d>と<a tid="T2">肺</a>\n'
        '<brel arg2="T2" reltype="on" rid="R1" arg1="T1" />\n'
    )
    r = _parse(xml)
    assert r["anno_errors"] == 0
    anchors = [i for i, rl in enumerate(r["rels"]) if rl != ["N"]]
    assert len(anchors) == 1
    assert r["rels"][anchors[0]] == ["on"]


def test_gold_xml_nested_tags_and_parse_errors():
    # nested inner tag: both entities' text tokens are labeled (the
    # reference's iter() flattening); regex matched [^<]* and dropped
    nested = '<EVENT tid="T1" DCT="before">手術<d tid="T2">痛</d></EVENT>です'
    r = _parse(nested)
    assert "B-EVENT" in r["ner"] and "B-d" in r["ner"]
    assert r["anno_errors"] == 0
    # EVENT DCT attribute is read as modality (previously unread)
    ev_last = max(i for i, t in enumerate(r["ner"]) if t.endswith("EVENT"))
    assert r["mod"][ev_last] == "before"

    # malformed xml: counted, not crashed or silently dropped
    bad = _parse('<d tid="T1">unclosed')
    assert bad["anno_errors"] == 1 and bad["tokens"] == []

    # dangling rel tid: relation skipped, counted
    dangling = _parse('<d tid="T1">熱</d>\n<brel rid="R1" arg1="T1" arg2="T9" reltype="on" />\n')
    assert dangling["anno_errors"] == 1


def test_gold_xml_modality_precedence():
    # reference utils.py:769-784: state OVERRIDES certainty when both
    # present (sequential assignment, last writer wins)
    both = _parse('<d tid="T1" certainty="positive" state="negated">熱</d>')
    i = both["ner"].index("B-d")
    last = max(j for j, t in enumerate(both["ner"]) if t.endswith("-d"))
    assert both["mod"][last] == "negated"
    # certainty on a non-d tag is ignored (reference conditions on tag)
    other = _parse('<a tid="T1" certainty="positive">肺</a>')
    last_a = max(j for j, t in enumerate(other["ner"]) if t.endswith("-a"))
    assert other["mod"][last_a] == "_"


def test_gold_xml_container_children_document_order():
    """Sentence/p containers with entity children keep DOCUMENT order:
    the container's tail (e.g. the newline that becomes the next
    sentence's [SEP] boundary) must come AFTER its children, not
    before (r3 code-review finding)."""
    xml = (
        '<sentence>あ<d tid="T1" certainty="positive">痛</d>い</sentence>\n'
        "<sentence>ナカ</sentence>"
    )
    r = _parse(xml)
    assert r["anno_errors"] == 0
    d_ix = r["ner"].index("B-d")
    sep_ix = r["tokens"].index("[SEP]")
    assert d_ix < sep_ix, (r["tokens"], r["ner"])
    # tokens read in document order: あ 痛 い [SEP] ナカ
    assert r["tokens"] == ["あ", "痛", "い", "[SEP]", "ナカ"]
    assert r["ner"] == ["O", "B-d", "O", "O", "O"]
    assert r["mod"][d_ix] == "positive"
