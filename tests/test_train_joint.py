"""Training path (stages/train_joint.py) — the reference ``--do_train``
loop re-expressed Ray-native.

Training data is the engine's own mock-tagged fixture corpus, so the
targets are deterministic and learnable; the tests pin the loop's
contracts (loss decreases, dev-F1 best-model selection, checkpoint
layout, determinism, worker-count consistency) and the trained
checkpoint's integration with the scorer seam (``model="trained:<dir>"``).
"""

import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from jamie_ray import fixtures
from jamie_ray.pipelines import kg
from jamie_ray.stages.train_joint import (
    TrainedJointModel,
    load_joint_checkpoint,
    pair_examples,
    train_joint,
)

N_PAGES = 60


@pytest.fixture(scope="module")
def tagged_corpus(tmp_path_factory, ray_session):
    """Mock-tagged chunks of a small fixture corpus, spilled to parquet
    (training input in its production shape)."""
    out = tmp_path_factory.mktemp("train_pages")
    tables = fixtures.generate(N_PAGES)
    pq.write_table(tables["pages"], out / "pages.parquet")
    chunks = kg.chunk_pages(
        kg.extracted_pages(kg.read_pages(str(out / "pages.parquet")))
    )
    tagged_dir = tmp_path_factory.mktemp("tagged")
    kg.score_chunks(chunks).write_parquet(str(tagged_dir))
    return str(tagged_dir)


@pytest.fixture(scope="module")
def trained(tagged_corpus, tmp_path_factory):
    import ray.data

    out_dir = str(tmp_path_factory.mktemp("ckpt"))
    history = train_joint(
        ray.data.read_parquet(tagged_corpus),
        out_dir,
        epochs=25,
        batch_size=32,
        num_workers=2,
        lr=0.15,
        dev_ratio=0.2,
        eval_every=5,
    )
    return out_dir, history


def test_loss_decreases_and_dev_f1_improves(trained):
    _, history = trained
    assert history["n_train"] > 0 and history["n_dev"] > 0
    # joint loss falls by an order of magnitude on the learnable fixture
    assert history["loss"][-1] < history["loss"][0] * 0.1
    # the optimizer reaches a (near-)perfect train fit through the full
    # predicted-entity decode path — NER spans, anchored MOD, REL pairs
    for facet in ("ner", "mod", "rel"):
        assert history["train_fit"][facet] >= 0.95, history["train_fit"]
    # G7: best-model selection tracked the dev mean F1
    assert history["best"]["mean_f1"] >= 0.45
    assert history["best"]["ner"] >= 0.8  # gazetteer generalizes to dev
    assert history["best"]["mod"] >= 0.5  # (surface, ordinal) keys recur
    # dev REL is capped by fixture design: relation labels are
    # pseudo-random over (surf, surf, ord, ord) pair keys, and those
    # keys almost never recur across sentences — no assertion beyond
    # the train fit above (which proves the head + loop work)


def test_checkpoint_layout_and_roundtrip(trained):
    out_dir, _ = trained
    # the reference's artifact layout (clinical_joint.py:441-455)
    for fname in ("ner2ix.json", "mod2ix.json", "rel2ix.json", "heads.npz", "meta.json"):
        assert os.path.exists(os.path.join(out_dir, fname)), fname
    params, vocabs, meta = load_joint_checkpoint(out_dir)
    assert params["W_ner"].shape[0] == len(vocabs["ner2ix"])
    assert params["W_rel"].shape[0] == len(vocabs["rel2ix"])
    assert meta["encoder"] == "hash-bilstm-v2"
    with open(os.path.join(out_dir, "meta.json")) as f:
        assert json.load(f)["analyzer"] == "mecab"


def test_trained_backend_predict_contract(trained):
    out_dir, _ = trained
    model = TrainedJointModel(out_dir)
    toks, ner, mod, cells = model.predict("頭痛が出現した。")
    assert toks[0] == "[CLS]" and toks[-1] == "[SEP]"
    assert len(toks) == len(ner) == len(mod)
    for s, p, o in cells:
        assert 0 < s < len(toks) - 1 and 0 < o < len(toks) - 1
        assert p != "N"
    # empty input keeps the wrap-only contract
    assert model.predict("")[0] == ["[CLS]", "[SEP]"]


def test_scorer_restores_checkpoint_analyzer(trained):
    """JointScorer(model='trained:<dir>') with no explicit analyzer
    restores the checkpoint's RECORDED analyzer from meta.json instead
    of silently overriding it with a scorer-level default (train/
    inference tokenization must agree)."""
    from jamie_ray.stages.score import JointScorer

    out_dir, _ = trained
    scorer = JointScorer(model=f"trained:{out_dir}")
    with open(os.path.join(out_dir, "meta.json")) as f:
        assert scorer.model.analyzer == json.load(f)["analyzer"]
    # an explicit analyzer still wins (the caller's pipeline must
    # chunk and score with the same one)
    assert JointScorer(
        model=f"trained:{out_dir}", analyzer="juman"
    ).model.analyzer == "juman"


def test_trained_backend_through_scorer_pipeline(trained, tagged_corpus, ray_session):
    """The checkpoint plugs into the scorer seam and scores a corpus
    end to end (actor pool, load-once-per-actor)."""
    import ray.data

    out_dir, _ = trained

    # score a few fixture chunks through the actor-pool path
    tables = fixtures.generate(12)
    import tempfile

    tmp = tempfile.mkdtemp(prefix="trained_pages_")
    pq.write_table(tables["pages"], os.path.join(tmp, "pages.parquet"))
    chunks = kg.chunk_pages(
        kg.extracted_pages(kg.read_pages(os.path.join(tmp, "pages.parquet")))
    )
    scored = kg.score_chunks(chunks, model=f"trained:{out_dir}", concurrency=2)
    rows = scored.take_all()
    assert len(rows) == chunks.count()
    assert all(r["score_error"] == "" for r in rows)
    # decoded BIO is valid (constrained decode) on every chunk
    from jamie_ray.labels import bio_to_spans

    for r in rows:
        bio_to_spans(list(r["ner"]))  # raises on invalid tags


def test_two_runs_bit_identical(tagged_corpus, tmp_path):
    import ray.data

    outs = []
    for name in ("a", "b"):
        out = str(tmp_path / name)
        train_joint(
            ray.data.read_parquet(tagged_corpus),
            out,
            epochs=3,
            batch_size=16,
            num_workers=2,
            lr=0.1,
            dev_ratio=0.25,
            eval_every=3,
        )
        outs.append(out)
    pa_, _, _ = load_joint_checkpoint(outs[0])
    pb_, _, _ = load_joint_checkpoint(outs[1])
    for k in pa_:
        assert np.array_equal(pa_[k], pb_[k]), k


def test_worker_count_consistency_full_batch(tagged_corpus, tmp_path):
    """With full-batch steps the gradient is a global sum, so 1-worker
    and 3-worker training agree to float64 rounding (the data-parallel
    average is exact)."""
    import ray.data

    params = []
    for w in (1, 3):
        out = str(tmp_path / f"w{w}")
        train_joint(
            ray.data.read_parquet(tagged_corpus),
            out,
            epochs=3,
            batch_size=100_000,
            num_workers=w,
            lr=0.1,
            dev_ratio=0.0,
        )
        p, _, _ = load_joint_checkpoint(out)
        params.append(p)
    for k in params[0]:
        np.testing.assert_allclose(params[0][k], params[1][k], rtol=1e-9, atol=1e-12)


def test_cli_train_from_conll(tagged_corpus, tmp_path, capsys):
    """CLI front door: multihead CoNLL file in, checkpoint dir out."""
    from jamie_ray.__main__ import main
    from jamie_ray.stages.conll import chunk_to_conll

    rows = pq.read_table(tagged_corpus).to_pylist()[:20]
    conll_path = tmp_path / "train.conll"
    conll_path.write_text(
        "".join(
            chunk_to_conll(
                r["url"], r["chunk_id"], r["tokens"], r["ner"], r["mod"],
                r["rels"], r["heads"],
            )
            for r in rows
        ),
        encoding="utf-8",
    )
    out = tmp_path / "ckpt"
    main(
        [
            "train", "--conll", str(conll_path), "--out", str(out),
            "--epochs", "2", "--workers", "1", "--dev-ratio", "0.2",
        ]
    )
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["command"] == "train"
    assert payload["n_train"] > 0
    assert os.path.exists(out / "heads.npz")


def test_pair_examples_reference_semantics():
    """utils.py:1637-1661: ordered pairs over entity last words, self
    pairs included, 'N' default, deterministic down_neg draw."""
    ner = ["B-D", "I-D", "O", "B-T"]
    # positive: tail last=1 (the D entity) -> head last=3 (the T entity)
    rels = [["N"], ["value"], ["N"], ["N"]]
    heads = [[0], [3], [2], [3]]
    got = pair_examples(ner, rels, heads, down_neg=1.0)
    assert set(got) == {
        (1, 1, "N"),
        (1, 3, "value"),
        (3, 1, "N"),
        (3, 3, "N"),
    }
    # down_neg=0 keeps only the positives
    assert pair_examples(ner, rels, heads, down_neg=0.0) == [(1, 3, "value")]
    # the draw is keyed, hence reproducible
    a = pair_examples(ner, rels, heads, down_neg=0.5, key="k", seed=7)
    b = pair_examples(ner, rels, heads, down_neg=0.5, key="k", seed=7)
    assert a == b
