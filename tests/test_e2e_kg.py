"""End-to-end KG pipeline tests on the deterministic fixture corpus.

The expected tables are computed by the fixture generator straight from
sentence structure (no BIO/subword machinery), so equality here is a
real test of the full distributed decode/alignment path. P/R must be
1.0 at this scale (BASELINE.md gate is >= 0.95).
"""

import pyarrow as pa
import pytest

from jamie_ray import fixtures
from jamie_ray.pipelines import kg

N_PAGES = 150


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, ray_session):
    out = tmp_path_factory.mktemp("pages")
    tables = fixtures.generate(N_PAGES)
    import pyarrow.parquet as pq

    for name, tab in tables.items():
        pq.write_table(tab, out / f"{name}.parquet")
    return out, tables


def _rows(table_like, cols):
    if isinstance(table_like, pa.Table):
        tab = table_like
    else:  # ray Dataset
        tab = pa.Table.from_pylist(table_like.take_all())
    return sorted(zip(*[tab.column(c).to_pylist() for c in cols]))


def test_extract_byte_identical(corpus):
    pages_dir, tables = corpus
    ds = kg.extracted_pages(kg.read_pages(str(pages_dir / "pages.parquet")), lang="ja")
    got = {r["url"]: r["text"] for r in ds.take_all()}
    exp_pages = tables["pages"]
    for url, text, lang in zip(
        exp_pages["url"].to_pylist(),
        exp_pages["text"].to_pylist(),
        exp_pages["lang"].to_pylist(),
    ):
        if lang == "ja":
            assert got[url] == text, f"extraction not byte-identical for {url}"


def test_chunks_match_oracle(corpus):
    pages_dir, tables = corpus
    ds = kg.chunk_pages(
        kg.extracted_pages(kg.read_pages(str(pages_dir / "pages.parquet")))
    )
    cols = ["url", "chunk_id", "text", "n_subwords"]
    assert _rows(ds, cols) == _rows(tables["expected_chunks"], cols)


def test_triples_match_oracle(corpus):
    pages_dir, tables = corpus
    ds = kg.build_triples(str(pages_dir / "pages.parquet"))
    cols = ["subj", "pred", "obj", "subj_type", "obj_type", "subj_mod", "url", "chunk_id"]
    got = _rows(ds, cols)
    exp = _rows(tables["expected_triples"], cols)
    assert got == exp, (
        f"P/R != 1.0: {len(set(got) - set(exp))} spurious, "
        f"{len(set(exp) - set(got))} missing of {len(exp)}"
    )


def test_entities_match_oracle(corpus):
    pages_dir, tables = corpus
    ds = kg.build_entities(str(pages_dir / "pages.parquet"))
    cols = ["url", "chunk_id", "mention", "ner_tag", "mod"]
    assert _rows(ds, cols) == _rows(tables["expected_entities"], cols)


def test_graph_dedup_invariants(corpus):
    pages_dir, tables = corpus
    graph = pa.Table.from_pylist(
        kg.build_graph(str(pages_dir / "pages.parquet")).take_all()
    )
    exp = tables["expected_triples"]
    # n_sources conservation: dedup only merges, never drops
    assert sum(graph["n_sources"].to_pylist()) == exp.num_rows
    # keys unique
    keys = list(
        zip(
            graph["subj_id"].to_pylist(),
            graph["pred"].to_pylist(),
            graph["obj_id"].to_pylist(),
        )
    )
    assert len(keys) == len(set(keys))
    # surface-level dedup upper-bounds the id-level row count (linking
    # can only merge more)
    surf_keys = {
        (s, p, o)
        for s, p, o in zip(
            exp["subj"].to_pylist(), exp["pred"].to_pylist(), exp["obj"].to_pylist()
        )
    }
    assert len(keys) <= len(surf_keys)


def test_graph_ids_match_oracle(corpus):
    """Full value check of the deduplicated graph INCLUDING canonical
    entity ids vs the generator's independently-derived expected_graph
    (keeps the id-level check the driver lost when kg_graph was folded
    into kg_graph_surface — the surface query drops subj_id/obj_id)."""
    pages_dir, tables = corpus
    graph = kg.build_graph(str(pages_dir / "pages.parquet"))
    cols = [
        "subj_id", "pred", "obj_id", "subj", "obj", "subj_type",
        "obj_type", "subj_mod", "n_sources", "url", "chunk_id",
    ]
    assert _rows(graph, cols) == _rows(tables["expected_graph"], cols)


def test_writer_sinks_match_fixture_oracle(corpus):
    """The generator's expected writer strings (computed straight from
    sentence structure, fixtures._expected_format_rows) equal the
    pipeline's score->decode->writer output BYTE-EXACTLY — the r4
    value oracle for kg_xml_out / kg_brat_out / kg_pmhs_out."""
    from jamie_ray.stages.format_out import (
        tagged_to_brat_batch,
        tagged_to_xml_batch,
    )
    from jamie_ray.stages.pmhs import tagged_to_pmhs_batch

    pages_dir, tables = corpus
    chunks = kg.chunk_pages(
        kg.extracted_pages(kg.read_pages(str(pages_dir / "pages.parquet")))
    )
    tagged = kg.score_chunks(chunks).materialize()
    xml = tagged.map_batches(tagged_to_xml_batch, batch_format="pyarrow")
    assert _rows(xml, ["url", "chunk_id", "xml"]) == _rows(
        tables["expected_xml"], ["url", "chunk_id", "xml"]
    )
    brat = tagged.map_batches(tagged_to_brat_batch, batch_format="pyarrow")
    assert _rows(brat, ["url", "chunk_id", "brat_txt", "brat_ann"]) == _rows(
        tables["expected_brat"], ["url", "chunk_id", "brat_txt", "brat_ann"]
    )
    pmhs = tagged.map_batches(tagged_to_pmhs_batch, batch_format="pyarrow")
    assert _rows(pmhs, ["url", "chunk_id", "pmhs"]) == _rows(
        tables["expected_pmhs"], ["url", "chunk_id", "pmhs"]
    )


def test_config_attrib_task(corpus):
    """PipelineConfig.attrib_task (reference clinical_cert.py -a):
    graph subj_mod carries ONLY the selected family's attribute."""
    from jamie_ray.config import PipelineConfig, build_graph_with_config

    pages_dir, _ = corpus
    graph = build_graph_with_config(
        str(pages_dir / "pages.parquet"), PipelineConfig(attrib_task="cert")
    )
    rows = graph.select_columns(["subj_type", "subj_mod"]).take_all()
    assert any(r["subj_type"] == "d" and r["subj_mod"] != "_" for r in rows)
    assert all(
        r["subj_mod"] == "_" for r in rows if r["subj_type"] != "d"
    )


def test_materialize_resumable(corpus, tmp_path):
    pages_dir, _ = corpus
    out = tmp_path / "graph_out"
    s1 = kg.materialize_graph(
        str(pages_dir / "pages.parquet"), str(out), n_shards=3
    )
    assert s1["shards_run"] == 3
    # rerun: all shards skipped, identical final rows
    s2 = kg.materialize_graph(
        str(pages_dir / "pages.parquet"), str(out), n_shards=3
    )
    assert s2["shards_run"] == 0 and s2["shards_skipped"] == 3
    assert s1["n_triples"] == s2["n_triples"] > 0
    # lineage records carry the blocking-cap truncation counts (empty
    # dict = no recall lost to caps on this corpus)
    from jamie_ray.state.lineage import read_manifest

    recs = read_manifest(str(out))
    assert all("n_truncated_candidates" in r for r in recs.values())
    assert all(
        isinstance(r["n_truncated_candidates"], dict) for r in recs.values()
    )


def test_materialize_resume_rejects_changed_shards(corpus, tmp_path):
    """A rerun with a different n_shards (or input path) must refuse to
    resume: the old partitioning's manifest shards would be skipped and
    the finalize pass would silently drop their triples."""
    import pytest

    pages_dir, _ = corpus
    out = tmp_path / "graph_guard"
    kg.materialize_graph(str(pages_dir / "pages.parquet"), str(out), n_shards=3)
    with pytest.raises(ValueError, match="different run configuration"):
        kg.materialize_graph(
            str(pages_dir / "pages.parquet"), str(out), n_shards=2
        )
    with pytest.raises(ValueError, match="different run configuration"):
        kg.materialize_graph("/some/other/pages.parquet", str(out), n_shards=3)


def test_build_triples_pipeline_mode_rejects_model_args(ray_session):
    import pytest

    with pytest.raises(ValueError, match="mode='pipeline'"):
        kg.build_triples("/nonexistent", mode="pipeline", model="hf:/ckpt")


def test_materialize_survives_kill(corpus, tmp_path, monkeypatch):
    """Kill mid-run (after 1 shard) -> rerun -> identical final graph."""
    pages_dir, _ = corpus
    out = tmp_path / "graph_kill"
    calls = {"n": 0}
    import jamie_ray.pipelines.kg as kgmod

    real_append = kgmod.append_manifest

    def dying_append(out_dir, record):
        real_append(out_dir, record)
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash after first shard")

    monkeypatch.setattr(kgmod, "append_manifest", dying_append)
    with pytest.raises(RuntimeError):
        kg.materialize_graph(str(pages_dir / "pages.parquet"), str(out), n_shards=3)
    monkeypatch.setattr(kgmod, "append_manifest", real_append)

    s = kg.materialize_graph(str(pages_dir / "pages.parquet"), str(out), n_shards=3)
    assert s["shards_skipped"] == 1 and s["shards_run"] == 2

    # final graph must equal a clean single-pass run
    clean = tmp_path / "graph_clean"
    s2 = kg.materialize_graph(str(pages_dir / "pages.parquet"), str(clean), n_shards=3)
    import ray.data

    a = sorted(map(tuple, (tuple(r.values()) for r in
               ray.data.read_parquet(str(out / "graph")).take_all())))
    b = sorted(map(tuple, (tuple(r.values()) for r in
               ray.data.read_parquet(str(clean / "graph")).take_all())))
    assert a == b and s["n_triples"] == s2["n_triples"]


def test_materialize_survives_pre_manifest_kill(corpus, tmp_path, monkeypatch):
    """Crash AFTER the shard parquet write but BEFORE its manifest
    append: the rerun must clear the orphan files, not read two copies
    (which would double n_sources / inflate lineage counters)."""
    pages_dir, _ = corpus
    out = tmp_path / "graph_orphan"
    calls = {"n": 0}
    import jamie_ray.pipelines.kg as kgmod

    real_append = kgmod.append_manifest

    def dying_append(out_dir, record):
        calls["n"] += 1
        if calls["n"] == 1:  # die with the parquet already on disk
            raise RuntimeError("simulated crash before manifest append")
        real_append(out_dir, record)

    monkeypatch.setattr(kgmod, "append_manifest", dying_append)
    with pytest.raises(RuntimeError):
        kg.materialize_graph(str(pages_dir / "pages.parquet"), str(out), n_shards=3)
    monkeypatch.setattr(kgmod, "append_manifest", real_append)

    s = kg.materialize_graph(str(pages_dir / "pages.parquet"), str(out), n_shards=3)
    assert s["shards_skipped"] == 0 and s["shards_run"] == 3

    clean = tmp_path / "graph_orphan_clean"
    s2 = kg.materialize_graph(str(pages_dir / "pages.parquet"), str(clean), n_shards=3)
    import ray.data

    a = sorted(map(tuple, (tuple(r.values()) for r in
               ray.data.read_parquet(str(out / "graph")).take_all())))
    b = sorted(map(tuple, (tuple(r.values()) for r in
               ray.data.read_parquet(str(clean / "graph")).take_all())))
    assert a == b and s["n_triples"] == s2["n_triples"]


def test_materialize_midshard_resume(corpus, tmp_path, monkeypatch):
    """Kill landing MID-shard, after the score checkpoint but before
    link/dedup: the rerun must resume that shard AT link — zero pages
    re-scored — and still produce the clean-run graph."""
    pages_dir, _ = corpus
    out = tmp_path / "graph_midshard"
    with pytest.raises(RuntimeError, match="injected kill"):
        kg.materialize_graph(
            str(pages_dir / "pages.parquet"), str(out), n_shards=3,
            _fail_after_checkpoint=0,
        )
    # the expensive half of shard 0 is on disk with its marker
    ck = out / "shard=0.triples"
    assert (ck / "_SCORED.json").exists()
    assert any(f.suffix == ".parquet" for f in ck.iterdir())

    # count scoring-pipeline constructions on the rerun: shard 0 must
    # NOT re-score (resume goes straight to link from the checkpoint)
    import jamie_ray.pipelines.kg as kgmod

    calls = {"n": 0}
    real_score = kgmod.score_chunks

    def counting_score(*a, **kw):
        calls["n"] += 1
        return real_score(*a, **kw)

    monkeypatch.setattr(kgmod, "score_chunks", counting_score)
    s = kg.materialize_graph(
        str(pages_dir / "pages.parquet"), str(out), n_shards=3
    )
    assert s["shards_run"] == 3 and calls["n"] == 2  # shards 1, 2 only
    # checkpoints are cleaned up once manifests land
    assert not ck.exists()

    # lineage totals for shard 0 came from the checkpoint marker, not a
    # re-run tap: the manifest still carries real page/chunk counts
    from jamie_ray.state.lineage import read_manifest

    rec0 = read_manifest(str(out))[0]
    assert rec0["n_pages"] > 0 and rec0["n_chunks"] > 0

    clean = tmp_path / "graph_midshard_clean"
    s2 = kg.materialize_graph(
        str(pages_dir / "pages.parquet"), str(clean), n_shards=3
    )
    import ray.data

    a = sorted(map(tuple, (tuple(r.values()) for r in
               ray.data.read_parquet(str(out / "graph")).take_all())))
    b = sorted(map(tuple, (tuple(r.values()) for r in
               ray.data.read_parquet(str(clean / "graph")).take_all())))
    assert a == b and s["n_triples"] == s2["n_triples"]


def test_materialize_file_sharded(corpus, tmp_path):
    """Multi-file input -> shards prune at the file level (no rescans)
    and produce the same graph as the single-file path."""
    import pyarrow.parquet as pq

    pages_dir, tables = corpus
    multi = tmp_path / "pages_multi"
    multi.mkdir()
    pages = tables["pages"]
    step = (pages.num_rows + 3) // 4
    for i in range(4):
        pq.write_table(pages.slice(i * step, step), multi / f"part-{i}.parquet")

    out = tmp_path / "graph_files"
    s = kg.materialize_graph(str(multi), str(out), n_shards=4)
    assert s["shards_run"] == 4

    from jamie_ray.state.lineage import read_manifest

    recs = read_manifest(str(out))
    assert all("files[" in r["input_fingerprint"] for r in recs.values())

    single = tmp_path / "graph_single"
    s2 = kg.materialize_graph(str(pages_dir / "pages.parquet"), str(single), n_shards=3)
    import ray.data

    a = sorted(map(tuple, (tuple(r.values()) for r in
               ray.data.read_parquet(str(out / "graph")).take_all())))
    b = sorted(map(tuple, (tuple(r.values()) for r in
               ray.data.read_parquet(str(single / "graph")).take_all())))
    assert a == b


def test_quarantine_counters(corpus, tmp_path):
    """Lineage records carry the quarantine counter; a scorer failure
    quarantines the chunk instead of killing the task."""
    pages_dir, tables = corpus
    out = tmp_path / "graph_q"
    kg.materialize_graph(str(pages_dir / "pages.parquet"), str(out), n_shards=2)
    from jamie_ray.state.lineage import read_manifest

    recs = read_manifest(str(out))
    assert all("n_quarantined_pages" in r for r in recs.values())
    # the fixture plants poison pages (invalid utf-8, class adv==3);
    # shard counters must add up to exactly the planted set
    planted = tables["expected_quarantine"].num_rows
    assert planted > 0
    assert sum(r["n_quarantined_pages"] for r in recs.values()) == planted
    assert all(r["n_pages"] > 0 and r["n_chunks"] > 0 for r in recs.values())

    # scorer poison-chunk path: force a failure, row survives with error
    import pyarrow as pa

    from jamie_ray.stages.score import JointScorer

    scorer = JointScorer()
    orig = scorer.model.predict
    scorer.model.predict = lambda text: (_ for _ in ()).throw(ValueError("boom"))
    batch = pa.table(
        {
            "url": pa.array(["u"], pa.string()),
            "chunk_id": pa.array([0], pa.int32()),
            "text": pa.array(["発熱あり。"], pa.string()),
        }
    )
    out_tab = scorer(batch)
    assert out_tab.num_rows == 1
    assert out_tab.column("score_error")[0].as_py().startswith("ValueError")
    assert out_tab.column("tokens")[0].as_py() == []
    scorer.model.predict = orig
