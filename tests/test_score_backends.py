"""Real-model seam tests: the predict() contract is backend-agnostic.

The sandbox has no torch/transformers, so the HF backend is covered at
three seams: (1) its pure-numpy decode half runs for real, (2) backend
injection through JointScorer/score_chunks produces output identical to
the mock path, (3) missing extras fail with a clean install message.
"""

import numpy as np
import pyarrow as pa
import pytest

from jamie_ray.mockmodel import REL_VOCAB
from jamie_ray.stages.hf_model import decode_forward_outputs
from jamie_ray.stages.score import JointScorer, MockJointModel


def test_decode_forward_outputs_matches_reference_order():
    """Cells come out row-major on (s, rel_index, o) — the reference's
    selection nonzero order (model.py:751)."""
    ner_labels = ["O", "B-d", "I-d"]
    mod_labels = ["_", "positive"]
    T, R = 5, len(REL_VOCAB)
    sel = np.zeros((T, R, T))
    sel[3, 1, 1] = 0.9
    sel[1, 0, 3] = 0.8
    sel[1, 2, 2] = 0.7
    sel[1, 0, 2] = 0.6  # same (s, p) as (1,0,3): o ascending
    ner, mod, cells = decode_forward_outputs(
        [0, 1, 2, 1, 0],
        [0, 0, 1, 0, 0],
        sel,
        ner_labels=ner_labels,
        mod_labels=mod_labels,
    )
    assert ner == ["O", "B-d", "I-d", "B-d", "O"]
    assert mod == ["_", "_", "positive", "_", "_"]
    assert cells == [
        (1, REL_VOCAB[0], 2),
        (1, REL_VOCAB[0], 3),
        (1, REL_VOCAB[2], 2),
        (3, REL_VOCAB[1], 1),
    ]
    # threshold is strict
    _, _, none = decode_forward_outputs(
        [0], [0], np.zeros((1, R, 1)), ner_labels=ner_labels, mod_labels=mod_labels
    )
    assert none == []


class _InjectedBackend:
    """Stand-in for a real transformer: same contract, delegates to the
    mock so output equality is checkable bit-for-bit."""

    def __init__(self) -> None:
        self.inner = MockJointModel()
        self.calls = 0

    def predict(self, text):
        self.calls += 1
        return self.inner.predict(text)


def _chunk_batch():
    return pa.table(
        {
            "url": pa.array(["u1", "u2"], pa.string()),
            "chunk_id": pa.array([0, 0], pa.int32()),
            "text": pa.array(["発熱あり。", "これは発熱と咳。"], pa.string()),
        }
    )


def test_injected_backend_equals_mock():
    mock_out = JointScorer()(_chunk_batch())
    inj = _InjectedBackend()
    inj_out = JointScorer(model=inj)(_chunk_batch())
    assert inj.calls == 2
    assert mock_out.equals(inj_out)


def test_injected_backend_through_actor_pool(ray_session):
    """A non-mock backend routes through the actor-pool shape and the
    full pipeline output is unchanged.

    The backend class is function-LOCAL on purpose: cloudpickle then
    ships it by value to the actor (a module-level class in ``tests.*``
    would pickle by reference, which workers cannot import)."""
    import ray.data

    from jamie_ray.pipelines.kg import score_chunks

    class LocalInjected:
        def __init__(self) -> None:
            self.inner = MockJointModel()

        def predict(self, text):
            return self.inner.predict(text)

    chunks = ray.data.from_arrow(_chunk_batch())
    base = sorted(
        map(tuple, (tuple(r.values()) for r in
            score_chunks(ray.data.from_arrow(_chunk_batch())).take_all()))
    )
    via_obj = sorted(
        map(tuple, (tuple(r.values()) for r in
            score_chunks(chunks, model=LocalInjected(), concurrency=1).take_all()))
    )
    assert base == via_obj


def test_hf_backend_missing_extras_message():
    try:
        import transformers  # noqa: F401

        pytest.skip("transformers installed; ImportError path not reachable")
    except ImportError:
        pass
    from jamie_ray.stages.hf_model import HFJointModel

    with pytest.raises(ImportError, match="pip install torch transformers"):
        HFJointModel("/nonexistent", ner_labels=["O"], mod_labels=["_"])


def test_unknown_backend_rejected():
    with pytest.raises(ValueError, match="unknown scorer model"):
        JointScorer(model="bert-base")


def test_config_carries_scorer_model():
    from jamie_ray.config import PipelineConfig

    cfg = PipelineConfig(scorer_model="hf:/ckpt")
    assert cfg.scorer_model == "hf:/ckpt"
