"""Pipeline-mode (3-stage) scoring must agree with the joint scorer —
the reference's two architectures emit the same CoNLL shape."""

import pyarrow as pa
import pytest

from jamie_ray import fixtures
from jamie_ray.pipelines import kg


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, ray_session):
    out = tmp_path_factory.mktemp("pages_pm")
    tables = fixtures.generate(80)
    import pyarrow.parquet as pq

    pq.write_table(tables["pages"], out / "pages.parquet")
    return out, tables


def _triples(ds):
    cols = ["subj", "pred", "obj", "subj_type", "obj_type", "subj_mod", "url", "chunk_id"]
    tab = pa.Table.from_pylist(ds.take_all())
    return sorted(zip(*[tab.column(c).to_pylist() for c in cols]))


def test_pipeline_mode_matches_joint(corpus):
    pages_dir, tables = corpus
    p = str(pages_dir / "pages.parquet")
    joint = _triples(kg.build_triples(p, mode="joint"))
    pipeline = _triples(kg.build_triples(p, mode="pipeline"))
    assert joint == pipeline
    assert len(joint) > 0


def test_pipeline_mode_matches_oracle(corpus):
    pages_dir, tables = corpus
    p = str(pages_dir / "pages.parquet")
    got = _triples(kg.build_triples(p, mode="pipeline"))
    exp_tab = tables["expected_triples"]
    cols = ["subj", "pred", "obj", "subj_type", "obj_type", "subj_mod", "url", "chunk_id"]
    exp = sorted(zip(*[exp_tab.column(c).to_pylist() for c in cols]))
    assert got == exp
