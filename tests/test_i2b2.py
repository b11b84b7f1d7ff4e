"""i2b2-style reader tests (S11; reference formater.py:87-176 semantics)."""

from jamie_ray.stages.i2b2 import i2b2_doc_to_rows


TXT = "The Chest pain was BAD .\nan mri was done .\n"


def test_concept_and_assertion():
    con = 'c="chest pain" 1:1 1:2||t="problem"\nc="mri" 2:1 2:1||t="test"\n'
    ast = 'c="chest pain" 1:1 1:2||t="problem"||a="present"\n'
    rows = i2b2_doc_to_rows("i2b2://x/r1", TXT, con, ast, "")
    assert rows[0]["ner"][1:3] == ["B-problem", "I-problem"]
    assert rows[0]["mod"][2] == "present"  # last token of the span
    assert rows[1]["ner"][1] == "B-test"
    assert rows[0]["anno_errors"] == []


def test_span_mismatch_is_recorded_not_silent():
    con = 'c="wrong words" 1:1 1:2||t="problem"\n'
    rows = i2b2_doc_to_rows("i2b2://x/r2", TXT, con, "", "")
    assert rows[0]["ner"] == ["O"] * len(rows[0]["tokens"])
    assert any("mismatch" in e for e in rows[0]["anno_errors"])


def test_relation_or_quirk_and_anchor():
    con = (
        'c="chest pain" 1:1 1:2||t="problem"\n'
        'c="bad" 1:4 1:4||t="problem"\n'
    )
    rel = (
        'c="chest pain" 1:1 1:2||r="PIP"||c="bad" 1:4 1:4\n'
        'c="chest pain" 1:1 1:2||r="TrAP"||c="bad" 1:4 1:4\n'
    )
    rows = i2b2_doc_to_rows("i2b2://x/r3", TXT, con, "", rel)
    # first rel REPLACES the default cell, second APPENDS
    assert rows[0]["rels"][2] == ["PIP", "TrAP"]
    assert rows[0]["heads"][2] == [4, 4]


def test_cross_sentence_relation_skipped():
    con = 'c="chest pain" 1:1 1:2||t="problem"\nc="mri" 2:1 2:1||t="test"\n'
    rel = 'c="chest pain" 1:1 1:2||r="TrAP"||c="mri" 2:1 2:1\n'
    rows = i2b2_doc_to_rows("i2b2://x/r4", TXT, con, "", rel)
    assert rows[0]["rels"][2] == ["N"]
    assert any("cross-sentence" in e for e in rows[0]["anno_errors"])


def test_reader_matches_generator_oracle(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jamie_ray.fixtures import write_i2b2_corpus
    from jamie_ray.stages.assemble import assemble_batch
    from jamie_ray.stages.i2b2 import read_i2b2

    root = str(tmp_path / "i2b2")
    write_i2b2_corpus(root, 25)
    got = pa.Table.from_pylist(
        read_i2b2(root, "beth")
        .map_batches(assemble_batch, batch_format="pyarrow")
        .take_all()
    )
    exp = pq.read_table(f"{root}/expected_triples.parquet")
    key = lambda t: sorted(
        zip(*[t.column(c).to_pylist() for c in sorted(t.column_names)])
    )
    assert got.num_rows > 0
    assert key(got) == key(exp)


def test_empty_txt_with_annotations_is_countable():
    """A doc whose txt is empty/missing but has annotation files must
    surface as one error row — never vanish (code-review finding)."""
    con = 'c="foo" 1:0 1:0||t="problem"\n'
    rows = i2b2_doc_to_rows("i2b2://x/empty", "", con, "", "")
    assert len(rows) == 1
    assert rows[0]["tokens"] == []
    assert any("empty txt" in e for e in rows[0]["anno_errors"])


def test_cli_convert_i2b2_to_triples(ray_session, tmp_path):
    """The convert front door (data_converter.py parity): i2b2 dir ->
    triples parquet equals the generator's expected table."""
    import pyarrow.parquet as pq

    from jamie_ray.__main__ import main
    from jamie_ray.fixtures import write_i2b2_corpus

    root = str(tmp_path / "i2b2cli")
    write_i2b2_corpus(root, 12)
    out = str(tmp_path / "tri_out")
    main(["convert", "--from", "i2b2", "--to", "triples",
          "--in", root, "--out", out])
    import glob

    got = pq.read_table(sorted(glob.glob(f"{out}/*.parquet")))
    exp = pq.read_table(f"{root}/expected_triples.parquet")
    key = lambda t: sorted(
        zip(*[t.column(c).to_pylist() for c in sorted(t.column_names)])
    )
    assert key(got) == key(exp)


def test_cli_convert_conll_roundtrip(ray_session, tmp_path):
    """tagged -> conll parquet (CLI) -> back to triples equals direct."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from jamie_ray.__main__ import main
    from jamie_ray.fixtures import write_i2b2_corpus
    from jamie_ray.stages.assemble import assemble_batch
    from jamie_ray.stages.i2b2 import read_i2b2

    root = str(tmp_path / "i2b2cli2")
    write_i2b2_corpus(root, 8)
    tagged_dir = str(tmp_path / "tagged_out")
    main(["convert", "--from", "i2b2", "--to", "tagged",
          "--in", root, "--out", tagged_dir])
    conll_dir = str(tmp_path / "conll_out")
    main(["convert", "--from", "tagged", "--to", "conll",
          "--in", tagged_dir, "--out", conll_dir])
    back_dir = str(tmp_path / "back_out")
    main(["convert", "--from", "conll", "--to", "triples",
          "--in", conll_dir, "--out", back_dir])
    got = pq.read_table(sorted(glob.glob(f"{back_dir}/*.parquet")))
    direct = pa.Table.from_pylist(
        read_i2b2(root, "beth")
        .map_batches(assemble_batch, batch_format="pyarrow")
        .take_all()
    )
    key = lambda t: sorted(
        zip(*[t.column(c).to_pylist() for c in sorted(t.column_names)])
    ) if t.num_rows else []
    assert key(got) == key(direct)


def test_cli_convert_brat_and_pmhs_roundtrips(ray_session, tmp_path):
    """The r3 reader formats drive through the convert front door:
    tagged -> brat -> triples and tagged -> pmhs -> triples both equal
    the direct assembly (pmhs on the mod-free projection).

    Input is the KG corpus (analyzer-produced tokens): brat/pmhs carry
    no in-band token boundaries, so only analyzer-consistent token
    streams round-trip — i2b2's space-separated Latin tokens fuse
    without separators and are out of these formats' read domain."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from jamie_ray import fixtures
    from jamie_ray.__main__ import main
    from jamie_ray.pipelines import kg
    from jamie_ray.stages.assemble import assemble_batch

    corpus = str(tmp_path / "kgcorpus3")
    fixtures.write_corpus(corpus, 40)
    chunks = kg.chunk_pages(
        kg.extracted_pages(kg.read_pages(f"{corpus}/pages.parquet"))
    )
    tagged_ds = kg.score_chunks(chunks)
    tagged_dir = str(tmp_path / "tagged3")
    tagged_ds.write_parquet(tagged_dir)
    direct = pa.Table.from_pylist(
        kg.score_chunks(
            kg.chunk_pages(
                kg.extracted_pages(kg.read_pages(f"{corpus}/pages.parquet"))
            )
        )
        .map_batches(assemble_batch, batch_format="pyarrow")
        .take_all()
    )
    key = lambda t: sorted(
        zip(*[t.column(c).to_pylist() for c in sorted(t.column_names)])
    ) if t.num_rows else []

    brat_dir = str(tmp_path / "brat3")
    main(["convert", "--from", "tagged", "--to", "brat",
          "--in", tagged_dir, "--out", brat_dir])
    back_brat = str(tmp_path / "brat_back3")
    main(["convert", "--from", "brat", "--to", "triples",
          "--in", brat_dir, "--out", back_brat])
    got_brat = pq.read_table(sorted(glob.glob(f"{back_brat}/*.parquet")))
    assert key(got_brat) == key(direct)

    pmhs_dir = str(tmp_path / "pmhs3")
    main(["convert", "--from", "tagged", "--to", "pmhs",
          "--in", tagged_dir, "--out", pmhs_dir])
    back_pmhs = str(tmp_path / "pmhs_back3")
    main(["convert", "--from", "pmhs", "--to", "triples",
          "--in", pmhs_dir, "--out", back_pmhs])
    got_pmhs = pq.read_table(sorted(glob.glob(f"{back_pmhs}/*.parquet")))
    assert key(got_pmhs.drop_columns(["subj_mod"])) == key(
        direct.drop_columns(["subj_mod"])
    )
