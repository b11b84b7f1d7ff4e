"""Model-backed document classifiers — the production seam beside the
deterministic heuristics in :mod:`text_analysis`.

A real web-corpus pipeline gates language and quality with a trained
classifier (CCNet / Gopher use fastText models, one ~100-MB .bin); the
in-repo heuristics (:func:`~jamie_ray.functions.text_analysis.
lang_id_batch`, ``quality_score_batch``) stay the DEFAULT because they
are deterministic and oracle-checkable. This module provides the
optional-dependency adapters, following the ``mecab_real`` pattern
(tokenization.py:141-188): loud ImportError when the package is
missing, skip-if-missing live tests, nothing else changes.

Scale shape: the model file is read ONCE on the driver and broadcast
via ``ray.put``; each actor materializes it to a process-local temp
file and loads it in ``__init__`` (fastText only loads from a path) —
once per actor, never per batch. Use as

    docs.map_batches(FastTextLangID(ref), concurrency=8, batch_size=1024,
                     batch_format="pyarrow")

or through :func:`lang_id_stage` / ``clean_corpus(keep_lang=...,
lang_backend="fasttext", lang_model_path=...)``.
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa

import ray

_FT_HELP = (
    "needs the optional `fasttext` package (pip install fasttext-wheel) "
    "and a trained model file (e.g. lid.176.bin); the in-repo "
    "deterministic heuristic backend needs nothing"
)


def broadcast_model_bytes(model_path: str):
    """Read a model file once and ``ray.put`` it — the broadcast ref to
    hand every :class:`FastTextLangID` actor (ship bytes through the
    object store once, not the path N times to N nodes that may not
    share a filesystem)."""
    with open(model_path, "rb") as f:
        return ray.put(f.read())


class FastTextLangID:
    """Actor-pool ``map_batches`` stage: fastText language ID over a
    text column, appending ``lang_pred`` (ISO code, e.g. ``en``) and
    ``lang_conf`` (the model's probability, float64).

    ``model`` is either a broadcast bytes ref from
    :func:`broadcast_model_bytes` or a filesystem path (single-node
    convenience). The model loads ONCE per actor in ``__init__``.

    Same output-column contract as the heuristic
    ``lang_id_batch`` (plus ``lang_conf``), so the two backends are
    interchangeable downstream. Raises a loud ImportError without the
    optional ``fasttext`` package.
    """

    def __init__(self, model, text_col: str = "text", labels_prefix: str = "__label__"):
        try:
            import fasttext  # type: ignore[import-not-found]
        except ImportError as ex:
            raise ImportError(f"FastTextLangID {_FT_HELP}") from ex
        self.text_col = text_col
        self.labels_prefix = labels_prefix
        if isinstance(model, (str, os.PathLike)):
            path = os.fspath(model)
        else:
            blob = ray.get(model) if not isinstance(model, bytes) else model
            fd, path = tempfile.mkstemp(suffix=".bin", prefix="ftlid-")
            with os.fdopen(fd, "wb") as f:
                f.write(blob)
        # fasttext prints a deprecation warning on load; the handle is
        # process-local and NOT picklable — hence actor state
        self.model = fasttext.load_model(path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [
            # fastText predicts one line at a time — newlines are a
            # hard error in its API, fold them to spaces
            (t or "").replace("\n", " ")
            for t in batch.column(self.text_col).to_pylist()
        ]
        if texts:
            labels, probs = self.model.predict(texts, k=1)
            preds = [
                (ls[0][len(self.labels_prefix):] if ls else "") for ls in labels
            ]
            confs = [float(ps[0]) if len(ps) else 0.0 for ps in probs]
        else:
            preds, confs = [], []
        return batch.append_column(
            "lang_pred", pa.array(preds, pa.string())
        ).append_column("lang_conf", pa.array(confs, pa.float64()))


def lang_id_stage(
    docs,
    *,
    backend: str = "heuristic",
    model=None,
    text_col: str = "text",
    concurrency: int = 4,
    batch_size: int = 1024,
):
    """documents -> + ``lang_pred`` via the selected backend.

    - ``backend="heuristic"`` (default): the deterministic vectorized
      CJK/latin-fraction kernel (oracle-checkable, zero dependencies).
    - ``backend="fasttext"``: actor pool of :class:`FastTextLangID`;
      ``model`` is a path or a :func:`broadcast_model_bytes` ref.
      Fails loudly without the optional package.
    """
    if backend == "heuristic":
        from .text_analysis import lang_id_batch

        return docs.map_batches(
            lambda b: lang_id_batch(b, text_col=text_col), batch_format="pyarrow"
        )
    if backend == "fasttext":
        if model is None:
            raise ValueError("lang_id_stage: backend='fasttext' needs model=")
        return docs.map_batches(
            FastTextLangID,
            fn_constructor_args=(model, text_col),
            concurrency=concurrency,
            batch_size=batch_size,
            batch_format="pyarrow",
        )
    raise ValueError(
        f"lang_id_stage: unknown backend {backend!r} (heuristic|fasttext)"
    )
