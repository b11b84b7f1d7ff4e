"""Model-artifact contract: vocab JSONs + config (reference S13).

The reference persists three label vocabularies next to each model
checkpoint (``ner2ix.json``, ``mod2ix.json``, ``rel2ix.json`` —
/root/reference/clinical_joint.py:443-453) and reloads them at
inference (clinical_joint.py:468-485). This engine keeps the same
contract: vocabularies are **frozen artifacts shipped with the model**,
broadcast to scorer workers via constructor args — never inferred from
data at run time (SURVEY.md §1.3).

``build_vocab`` reproduces ``get_label2ix``'s insertion-ordered
distinct->dense-id semantics (/root/reference/utils.py:72-78) for the
training-side path that creates the artifacts in the first place.
"""

from __future__ import annotations

import json
import os
from typing import Iterable

VOCAB_FILES = ("ner2ix.json", "mod2ix.json", "rel2ix.json")


def build_vocab(
    label_rows: Iterable[Iterable[str]],
    default: dict[str, int] | None = None,
    ignore_lab: str | None = None,
) -> dict[str, int]:
    """Insertion-ordered label -> dense id (utils.py:72-78 semantics)."""
    vocab = dict(default) if default is not None else {}
    for row in label_rows:
        for label in row:
            if label != ignore_lab and label not in vocab:
                vocab[label] = len(vocab)
    return vocab


def default_vocabs() -> dict[str, dict[str, int]]:
    """The engine's frozen label sets (mock model inventory), with the
    reference's pinned defaults ({'O':0}, {'_':0}, {'N':0} —
    utils.py:1717-1723)."""
    from ..mockmodel import (
        CERTAINTY,
        GAZETTEER_SURFACES,
        REL_VOCAB,
        STATE,
        TIMEX_TYPE,
    )

    tags = sorted(set(GAZETTEER_SURFACES.values()))
    ner = build_vocab(
        [[f"B-{t}" for t in tags], [f"I-{t}" for t in tags]], default={"O": 0}
    )
    mod = build_vocab([CERTAINTY, STATE, TIMEX_TYPE], default={"_": 0})
    rel = build_vocab([REL_VOCAB], default={"N": 0})
    return {"ner2ix": ner, "mod2ix": mod, "rel2ix": rel}


def save_artifacts(model_dir: str, vocabs: dict[str, dict[str, int]] | None = None) -> str:
    """Write the three vocab JSONs (+ a config stamp) under model_dir."""
    os.makedirs(model_dir, exist_ok=True)
    vocabs = vocabs or default_vocabs()
    for name, fname in zip(("ner2ix", "mod2ix", "rel2ix"), VOCAB_FILES):
        with open(os.path.join(model_dir, fname), "w", encoding="utf-8") as f:
            json.dump(vocabs[name], f, ensure_ascii=False, indent=1)
    with open(os.path.join(model_dir, "config.json"), "w", encoding="utf-8") as f:
        json.dump({"engine": "jamie_ray", "model": "mock", "version": 1}, f)
    return model_dir


def load_artifacts(model_dir: str) -> dict[str, dict[str, int]]:
    """Load the vocab JSONs (clinical_joint.py:468-485 contract)."""
    out: dict[str, dict[str, int]] = {}
    for name, fname in zip(("ner2ix", "mod2ix", "rel2ix"), VOCAB_FILES):
        with open(os.path.join(model_dir, fname), "r", encoding="utf-8") as f:
            out[name] = json.load(f)
    return out


def save_w2v(model_dir: str, vocab: dict[str, int], matrix) -> str:
    """Persist a word-embedding artifact (the reference's pre-trained
    w2v input, clinical_pipeline_ner.py:82-89): ``w2v_vocab.json``
    (token -> row) + ``embeddings.npz`` (float array [V, D])."""
    import numpy as np

    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "w2v_vocab.json"), "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    np.savez(os.path.join(model_dir, "embeddings.npz"), matrix=np.asarray(matrix))
    return model_dir


def load_w2v(model_dir: str):
    """Load the w2v artifact pair -> (token->row dict, [V, D] matrix).
    Loaded once per scorer actor in ``__init__`` (S12 pattern)."""
    import numpy as np

    with open(os.path.join(model_dir, "w2v_vocab.json"), "r", encoding="utf-8") as f:
        vocab = json.load(f)
    matrix = np.load(os.path.join(model_dir, "embeddings.npz"))["matrix"]
    return vocab, matrix
