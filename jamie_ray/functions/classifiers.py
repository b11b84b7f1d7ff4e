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


class FastTextClassifier:
    """Actor-pool ``map_batches`` stage: any supervised fastText model
    over a text column, appending ``<out_prefix>_pred`` (the top label,
    ``__label__`` stripped) and ``<out_prefix>_conf`` (its probability,
    float64). Language ID is the ``out_prefix="lang"`` instance
    (:class:`FastTextLangID`); a CCNet/GPT-3-style quality classifier
    (labels like ``hq``/``lq``) is the same stage with
    ``out_prefix="quality"``.

    ``model`` is either a broadcast bytes ref from
    :func:`broadcast_model_bytes` or a filesystem path (single-node
    convenience). The model loads ONCE per actor in ``__init__``.
    Raises a loud ImportError without the optional ``fasttext``
    package.
    """

    out_prefix = "label"

    def __init__(
        self,
        model,
        text_col: str = "text",
        labels_prefix: str = "__label__",
        out_prefix: str | None = None,
    ):
        try:
            import fasttext  # type: ignore[import-not-found]
        except ImportError as ex:
            raise ImportError(f"FastTextLangID {_FT_HELP}") from ex
        self.text_col = text_col
        self.labels_prefix = labels_prefix
        if out_prefix is not None:
            self.out_prefix = out_prefix
        tmp_path: str | None = None
        if isinstance(model, (str, os.PathLike)):
            path = os.fspath(model)
        else:
            blob = ray.get(model) if not isinstance(model, bytes) else model
            fd, path = tempfile.mkstemp(suffix=".bin", prefix="ftlid-")
            tmp_path = path
            with os.fdopen(fd, "wb") as f:
                f.write(blob)
        # fasttext prints a deprecation warning on load; the handle is
        # process-local and NOT picklable — hence actor state
        try:
            self.model = fasttext.load_model(path)
        finally:
            if tmp_path is not None:
                # fasttext reads the file fully at load — unlink so
                # actor restarts don't strand ~100 MB blobs in /tmp
                os.unlink(tmp_path)

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
            f"{self.out_prefix}_pred", pa.array(preds, pa.string())
        ).append_column(f"{self.out_prefix}_conf", pa.array(confs, pa.float64()))


class FastTextLangID(FastTextClassifier):
    """:class:`FastTextClassifier` emitting ``lang_pred``/``lang_conf``
    — drop-in beside the heuristic ``lang_id_batch`` columns."""

    out_prefix = "lang"


def fasttext_classify(
    docs,
    model,
    *,
    out_prefix: str = "label",
    keep: str | None = None,
    text_col: str = "text",
    concurrency: int = 4,
    batch_size: int = 1024,
):
    """documents -> + ``<out_prefix>_pred``/``_conf`` via a supervised
    fastText model (actor pool, broadcast-once weights); ``keep=``
    additionally filters to documents predicted as that label — the
    GPT-3/CCNet quality-classifier gate shape
    (``out_prefix="quality"``, ``keep="hq"``)."""
    import pyarrow.compute as pc

    out = docs.map_batches(
        FastTextClassifier,
        fn_constructor_args=(model, text_col),
        fn_constructor_kwargs={"out_prefix": out_prefix},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
    if keep is not None:
        out = out.map_batches(
            lambda b: b.filter(pc.equal(b.column(f"{out_prefix}_pred"), keep)),
            batch_format="pyarrow",
        )
    return out


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
