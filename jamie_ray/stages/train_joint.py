"""Training path: the reference's ``--do_train`` loop, Ray-native.

Re-expresses /root/reference/clinical_joint.py:229-467 — the one
reference entry point the engine did not previously cover — as
synchronous data-parallel training over Ray actors:

- entity-pair enumeration with ``'N'`` negatives + ``down_neg``
  subsampling (utils.py:1637-1661, incl. the commented-out self-pair
  filter: self pairs ARE enumerated) -> :func:`pair_examples`. The
  reference draws ``random.random()`` per negative; the engine keys
  the draw by ``(seed, chunk, tail, head)`` so corpora resample
  bit-identically run to run (no RNG state — the determinism rule);
- the dense relation matrix ``gen_relmat`` (utils.py:2616-2632, §2
  row M18) -> kept SPARSE: one softmax example per enumerated ordered
  pair, exactly the ``del_neg=False`` cell semantics ('N' default,
  positives overwrite);
- ``DataLoader(shuffle=True)`` (§2 row O5) -> deterministic per-epoch
  hash shuffle of example keys;
- ``AdamW(eps=1e-8, correct_bias=False)`` + joint ``ner+mod+rel``
  loss (clinical_joint.py:330-334,384-388) -> :class:`AdamW` in
  numpy, sum of three mean cross-entropies;
- periodic dev evaluation + best-mean-F1 model selection + checkpoint
  save (§2 row G7, clinical_joint.py:419-455) -> per-epoch dev F1
  partials summed across workers, best checkpoint written in the
  reference's artifact layout (``ner2ix/mod2ix/rel2ix.json`` via
  ``state/artifacts.py`` + ``heads.npz`` + ``meta.json``).

Model — the honest in-sandbox mapping: the encoder is FROZEN (hash
embeddings + the deterministic BiLSTM reservoir of
``stages/w2v_lstm.py`` + window/bigram lexical features); training
fits three softmax heads: NER per token, MOD per predicted-entity
anchor, REL per ordered entity pair. The MOD/REL heads see classic
lexicalized conjunction features (feature-hashed mention surface x
in-segment ordinal, and surface-pair x ordinal-pair — the pre-neural
relation-extraction feature family, Vowpal-Wabbit-style hashing), so
the heads can memorize observed keys and generalize exactly to keys
seen in training. The reference fine-tunes BERT end to end; that half
lives behind the ``hf:<dir>`` seam (``scripts/export_torchscript.py``)
— what this module re-expresses is the training LOOP and its artifact
contract. (The reference itself freezes encoder layers after
``--freeze_after_epoch`` via ``utils.freeze_bert_layers``,
clinical_joint.py:368-369.)

Physical shape (the 100-TB story): the tagged corpus is hash-sharded
once to parquet (one partition per worker); each
:class:`GradEvalWorker` actor reads ITS shard in ``__init__``, runs
the frozen encoder over every sentence ONCE (features are
training-invariant), and caches the numpy arrays — per-step work is
then pure BLAS on the cache. Steps are synchronous gradient averages
in fixed worker order (bit-deterministic for a fixed ``num_workers``;
across worker counts gradients agree to float64 rounding). Horizontal
scale = more shards/workers (the per-worker feature cache is the
memory budget — shard accordingly); the head parameter vector is
small, so per-step parameter shipping is negligible — a
transformer-scale variant would swap the driver loop for a
parameter-server actor, which changes none of the data plumbing.
"""

from __future__ import annotations

import json
import math
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..hashing import stable_hash64
from ..labels import (
    bio_to_spans,
    match_mod_label,
    match_ner_label,
    sbwtok2tok_alignment,
    word_to_sbw_last_index,
)
from ..state.artifacts import build_vocab, load_artifacts, save_artifacts
from ..tokenization import analyze, subword_tokenize
from .w2v_lstm import _hash_vector, _LSTMCell

DEFAULT_EMB = 256
DEFAULT_HIDDEN = 64
DEFAULT_MOD_KEY = 256
DEFAULT_REL_KEY = 768
HEAD_KEYS = ("W_ner", "b_ner", "W_mod", "b_mod", "W_rel", "b_rel")


def _key_vector(dim: int, *parts) -> np.ndarray:
    """Feature-hashed dense embedding of a lexical conjunction key."""
    return _hash_vector("\x1f".join(str(p) for p in parts), dim, salt="lexkey")


# ---------------------------------------------------------------------------
# Frozen encoder (shared bit-exactly by training workers and the
# trained-model inference backend)
# ---------------------------------------------------------------------------


class FrozenEncoder:
    """Deterministic frozen token encoder: hash embeddings + BiLSTM
    reservoir (w2v_lstm weights, seeds 11/13) + the +-1 token window +
    hashed neighbor-bigram embeddings (left/right conjunctions).

    ``feat_dim = 3*emb_dim + 2*hidden``. Built once per actor/backend;
    ``encode`` is per sentence.
    """

    VERSION = "hash-bilstm-v2"

    def __init__(
        self, emb_dim: int = DEFAULT_EMB, hidden: int = DEFAULT_HIDDEN
    ) -> None:
        self.emb_dim = emb_dim
        self.hidden = hidden
        self.fwd = _LSTMCell(emb_dim, hidden, seed=11)
        self.bwd = _LSTMCell(emb_dim, hidden, seed=13)
        self.feat_dim = 3 * emb_dim + 2 * hidden

    def encode(self, words: list[str]) -> np.ndarray:
        d = self.emb_dim
        x = np.stack([_hash_vector(w, d) for w in words])
        h_f = self.fwd.run(x)
        h_b = self.bwd.run(x[::-1])[::-1]
        bg_l = np.stack(
            [
                _key_vector(d, "bg", words[i - 1] if i else "^", w)
                for i, w in enumerate(words)
            ]
        )
        bg_r = np.stack(
            [
                _key_vector(d, "bg", w, words[i + 1] if i + 1 < len(words) else "$")
                for i, w in enumerate(words)
            ]
        )
        return np.concatenate([x, h_f, h_b, bg_l, bg_r], axis=1)


# ---------------------------------------------------------------------------
# Entity / pair example construction (utils.py:1637-1712 semantics)
# ---------------------------------------------------------------------------


def entity_meta(
    words: list[str], bio: list[str]
) -> list[tuple[int, str, int, int]]:
    """Entities of a BIO sequence with their lexical keys:
    ``(last_word_idx, surface, segment_id, ordinal_in_segment)``.
    Segments are ``[SEP]``-delimited (the reference's sentence-batch
    collation unit, M15/M16); the ordinal is the mention's rank within
    its segment — the key the annotation attributes are conditioned on.
    """
    sep_before = np.cumsum([1 if w == "[SEP]" else 0 for w in words])
    out: list[tuple[int, str, int, int]] = []
    seg_counts: dict[int, int] = {}
    for (_, s, e) in bio_to_spans(list(bio)):
        seg = int(sep_before[s - 1]) if s > 0 else 0
        k = seg_counts.get(seg, 0)
        seg_counts[seg] = k + 1
        out.append((e - 1, "".join(words[s:e]), seg, k))
    return out


def pair_examples(
    ner: list[str],
    rels: list[list[str]],
    heads: list[list[int]],
    *,
    down_neg: float = 1.0,
    seed: int = 1029,
    key: str = "",
) -> list[tuple[int, int, str]]:
    """Ordered entity-pair enumeration with 'N' negatives.

    Mirrors ``extract_rels_from_conll_sent`` (utils.py:1637-1661):
    every ordered pair of entity LAST-word anchors — self pairs
    included (the reference's ``tail_id != head_id`` guard is
    commented out) — labeled from the gold multihead columns, 'N'
    otherwise; negatives kept iff a deterministic per-pair hash draw
    falls under ``down_neg``. Returns ``[(tail_last, head_last, rel)]``.
    """
    lasts = [e - 1 for (_, _, e) in bio_to_spans(list(ner))]
    pos: dict[tuple[int, int], str] = {}
    for i, (rr, hh) in enumerate(zip(rels, heads)):
        for r, h in zip(rr, hh):
            if r != "N":
                # first relation wins on a doubly-labeled ordered pair
                # (the engine's sparse cells carry at most one per pair)
                pos.setdefault((i, int(h)), r)
    out: list[tuple[int, int, str]] = []
    for t in lasts:
        for h in lasts:
            r = pos.get((t, h))
            if r is None:
                if down_neg < 1.0:
                    u = stable_hash64("downneg", seed, key, t, h) % 1_000_000
                    if u / 1_000_000.0 >= down_neg:
                        continue
                r = "N"
            out.append((t, h, r))
    return out


def _mod_features(
    feats: np.ndarray,
    ents: list[tuple[int, str, int, int]],
    d_key: int,
) -> np.ndarray:
    """Per-entity MOD features: anchor token features + the hashed
    (surface, ordinal) conjunction."""
    rows = [
        np.concatenate([feats[last], _key_vector(d_key, "modk", surf, k)])
        for (last, surf, _seg, k) in ents
    ]
    return np.stack(rows) if rows else np.zeros((0, feats.shape[1] + d_key))


def _pair_feature_row(
    feats: np.ndarray,
    a: tuple[int, str, int, int],
    b: tuple[int, str, int, int],
    d_key: int,
) -> np.ndarray:
    """REL features for the ordered pair (a=tail, b=head): endpoint
    token features + same-segment flag + the hashed
    (surf_a, surf_b, ord_a, ord_b) conjunction (zeroed across
    segments — cross-segment pairs are categorically unrelated)."""
    same = a[2] == b[2]
    kv = (
        _key_vector(d_key, "relk", a[1], b[1], a[3], b[3])
        if same
        else np.zeros(d_key)
    )
    return np.concatenate([feats[a[0]], feats[b[0]], [1.0 if same else -1.0], kv])


def _label_vocabs(tagged) -> dict[str, dict[str, int]]:
    """Distributed label-vocabulary build: per-block distinct labels
    (tiny rows) -> driver union -> sorted insertion into the pinned
    defaults ({'O':0}/{'_':0}/{'N':0}, utils.py:1717-1723). Sorted, not
    file-ordered: ids must only be deterministic, and the corpus is
    unordered at scale."""

    def kern(batch: pa.Table) -> pa.Table:
        ner: set[str] = set()
        mod: set[str] = set()
        rel: set[str] = set()
        for row in batch.column("ner").to_pylist():
            ner.update(row)
        for row in batch.column("mod").to_pylist():
            mod.update(row)
        for row in batch.column("rels").to_pylist():
            for rr in row:
                rel.update(rr)
        kinds = ["ner"] * len(ner) + ["mod"] * len(mod) + ["rel"] * len(rel)
        labels = sorted(ner) + sorted(mod) + sorted(rel)
        return pa.table(
            {"kind": pa.array(kinds, pa.string()), "label": pa.array(labels)}
        )

    rows = tagged.map_batches(kern, batch_format="pyarrow").take_all()
    by_kind: dict[str, set[str]] = {"ner": set(), "mod": set(), "rel": set()}
    for r in rows:
        by_kind[r["kind"]].add(r["label"])
    return {
        "ner2ix": build_vocab([sorted(by_kind["ner"])], default={"O": 0}),
        "mod2ix": build_vocab([sorted(by_kind["mod"])], default={"_": 0}),
        "rel2ix": build_vocab([sorted(by_kind["rel"])], default={"N": 0}),
    }


# ---------------------------------------------------------------------------
# Optimizer (clinical_joint.py:330-334 config)
# ---------------------------------------------------------------------------


class AdamW:
    """numpy AdamW with the reference's knobs: ``eps=1e-8``,
    ``correct_bias=False`` (no bias correction — the huggingface
    variant the reference constructs), decoupled weight decay."""

    def __init__(
        self,
        params: dict[str, np.ndarray],
        lr: float,
        betas: tuple[float, float] = (0.9, 0.999),
        eps: float = 1e-8,
        weight_decay: float = 0.0,
    ) -> None:
        self.lr = lr
        self.b1, self.b2 = betas
        self.eps = eps
        self.weight_decay = weight_decay
        self.m = {k: np.zeros_like(v) for k, v in params.items()}
        self.v = {k: np.zeros_like(v) for k, v in params.items()}

    def step(self, params: dict[str, np.ndarray], grads: dict[str, np.ndarray]) -> None:
        for k in sorted(params):
            g = grads[k]
            self.m[k] = self.b1 * self.m[k] + (1.0 - self.b1) * g
            self.v[k] = self.b2 * self.v[k] + (1.0 - self.b2) * g * g
            upd = self.m[k] / (np.sqrt(self.v[k]) + self.eps)
            if self.weight_decay:
                upd = upd + self.weight_decay * params[k]
            params[k] -= self.lr * upd


def _softmax_grad(
    feats: np.ndarray, y: np.ndarray, w: np.ndarray, b: np.ndarray
) -> tuple[np.ndarray, np.ndarray, float]:
    """Cross-entropy gradient SUMS (unnormalized) + loss sum."""
    z = feats @ w.T + b
    z -= z.max(axis=1, keepdims=True)
    e = np.exp(z)
    p = e / e.sum(axis=1, keepdims=True)
    idx = np.arange(len(y))
    loss = float(-np.log(np.maximum(p[idx, y], 1e-300)).sum())
    p[idx, y] -= 1.0
    return p.T @ feats, p.sum(axis=0), loss


def _constrained_decode(scores: np.ndarray, labels: list[str]) -> list[str]:
    """Greedy BIO decode under the hard transition constraint (``I-x``
    only after ``B-x``/``I-x``) — same rule as the w2v backend."""
    out: list[str] = []
    prev = "O"
    for row in scores:
        for ix in np.argsort(-row):
            lab = labels[int(ix)]
            if lab.startswith("I-") and prev[2:] != lab[2:]:
                continue
            out.append(lab)
            prev = lab
            break
    return out


# ---------------------------------------------------------------------------
# Gradient / evaluation worker (one Ray actor per shard)
# ---------------------------------------------------------------------------


class GradEvalWorker:
    """Holds one hash-shard of the tagged corpus: shard parquet is read
    and encoded ONCE here in ``__init__`` (the actor-pool state rule);
    ``grad``/``eval_dev`` are pure numpy over the cached features."""

    def __init__(
        self,
        shard_dir: str,
        vocabs: dict[str, dict[str, int]],
        *,
        emb_dim: int = DEFAULT_EMB,
        hidden: int = DEFAULT_HIDDEN,
        d_mod_key: int = DEFAULT_MOD_KEY,
        d_rel_key: int = DEFAULT_REL_KEY,
        down_neg: float = 1.0,
        seed: int = 1029,
    ) -> None:
        self.seed = seed
        self.encoder = FrozenEncoder(emb_dim, hidden)
        self.d_mod_key = d_mod_key
        self.d_rel_key = d_rel_key
        self.ner2ix = vocabs["ner2ix"]
        self.mod2ix = vocabs["mod2ix"]
        self.rel2ix = vocabs["rel2ix"]
        self.ner_labels = _by_id(self.ner2ix)
        self.train: list[dict] = []
        self.dev: list[dict] = []
        if os.path.isdir(shard_dir):
            table = pq.read_table(shard_dir)
            for row in table.to_pylist():
                ex = self._prep(row, down_neg)
                if ex is None:
                    continue
                (self.dev if row["is_dev"] else self.train).append(ex)
        # fixed deterministic base order (shard files may arrive in any
        # layout; keys make the epoch shuffle layout-independent)
        self.train.sort(key=lambda e: e["key"])
        self.dev.sort(key=lambda e: e["key"])

    def _prep(self, row: dict, down_neg: float) -> dict | None:
        words = row["tokens"]
        if not words:
            return None
        key = f"{row['url']}#{row['chunk_id']}"
        feats = self.encoder.encode(words)
        ents = entity_meta(words, row["ner"])
        by_last = {e[0]: e for e in ents}

        pairs = pair_examples(
            row["ner"], row["rels"], row["heads"],
            down_neg=down_neg, seed=self.seed, key=key,
        )
        pair_x = (
            np.stack(
                [
                    _pair_feature_row(feats, by_last[t], by_last[h], self.d_rel_key)
                    for t, h, _ in pairs
                ]
            )
            if pairs
            else np.zeros((0, 2 * feats.shape[1] + 1 + self.d_rel_key))
        )
        gold_rels = sorted(
            (i, int(h), r)
            for i, (rr, hh) in enumerate(zip(row["rels"], row["heads"]))
            for r, h in zip(rr, hh)
            if r != "N"
        )
        return {
            "key": key,
            "words": list(words),
            "feats": feats,
            "y_ner": np.array([self.ner2ix[t] for t in row["ner"]], dtype=np.int64),
            "ner": list(row["ner"]),
            "mod": list(row["mod"]),
            "mod_x": _mod_features(feats, ents, self.d_mod_key),
            "y_mod": np.array(
                [self.mod2ix[row["mod"][e[0]]] for e in ents], dtype=np.int64
            ),
            "pair_x": pair_x,
            "y_rel": np.array([self.rel2ix[p[2]] for p in pairs], dtype=np.int64),
            "gold_rels": gold_rels,
        }

    def counts(self) -> tuple[int, int]:
        return len(self.train), len(self.dev)

    def _epoch_order(self, epoch: int) -> list[int]:
        # cached per epoch: grad() is called once per STEP, and
        # re-hashing + re-sorting the whole shard every step would
        # dominate the BLAS work on large shards
        cached = getattr(self, "_order_cache", None)
        if cached is not None and cached[0] == epoch:
            return cached[1]
        order = sorted(
            range(len(self.train)),
            key=lambda i: stable_hash64(
                "shuffle", self.seed, epoch, self.train[i]["key"]
            ),
        )
        self._order_cache = (epoch, order)
        return order

    def grad(
        self,
        params: dict[str, np.ndarray],
        epoch: int,
        step: int,
        batch_size: int,
    ) -> dict:
        """Gradient SUMS over this worker's batch ``step`` of epoch
        ``epoch`` (deterministic hash-shuffled order, O5). Returns sums
        + counts so the driver normalizes exactly once."""
        order = self._epoch_order(epoch)
        batch = [self.train[i] for i in order[step * batch_size : (step + 1) * batch_size]]
        out = {k: np.zeros_like(params[k]) for k in HEAD_KEYS}
        stats = {"ner_loss": 0.0, "mod_loss": 0.0, "rel_loss": 0.0,
                 "n_tokens": 0, "n_ents": 0, "n_pairs": 0}
        if not batch:
            return {"grads": out, **stats}
        feats = np.concatenate([ex["feats"] for ex in batch])
        y_ner = np.concatenate([ex["y_ner"] for ex in batch])
        gw, gb, loss = _softmax_grad(feats, y_ner, params["W_ner"], params["b_ner"])
        out["W_ner"] += gw
        out["b_ner"] += gb
        stats["ner_loss"] += loss
        stats["n_tokens"] += len(y_ner)

        mod_x = np.concatenate([ex["mod_x"] for ex in batch])
        y_mod = np.concatenate([ex["y_mod"] for ex in batch])
        if len(y_mod):
            gw, gb, loss = _softmax_grad(mod_x, y_mod, params["W_mod"], params["b_mod"])
            out["W_mod"] += gw
            out["b_mod"] += gb
            stats["mod_loss"] += loss
            stats["n_ents"] += len(y_mod)

        pair_x = np.concatenate([ex["pair_x"] for ex in batch])
        y_rel = np.concatenate([ex["y_rel"] for ex in batch])
        if len(y_rel):
            gw, gb, loss = _softmax_grad(pair_x, y_rel, params["W_rel"], params["b_rel"])
            out["W_rel"] += gw
            out["b_rel"] += gb
            stats["rel_loss"] += loss
            stats["n_pairs"] += len(y_rel)
        return {"grads": out, **stats}

    def eval_split(self, params: dict[str, np.ndarray], split: str = "dev") -> dict:
        """tp/fp/fn partials over this worker's ``split`` examples:
        span-level NER, anchor-level MOD (non-'_'), and REL triples —
        MOD/REL decoded from PREDICTED entities (the reference
        evaluates its dev output file the same way: predictions all
        the way down). ``split="train"`` measures fit through the same
        full decode path."""
        mod_labels = _by_id(self.mod2ix)
        rel_labels = _by_id(self.rel2ix)
        c = {f"{facet}_{k}": 0 for facet in ("ner", "mod", "rel") for k in ("tp", "fp", "fn")}
        for ex in self.dev if split == "dev" else self.train:
            feats = ex["feats"]
            pred_ner = _constrained_decode(
                feats @ params["W_ner"].T + params["b_ner"], self.ner_labels
            )
            gold_spans = set(bio_to_spans(ex["ner"]))
            pred_spans = set(bio_to_spans(pred_ner))
            c["ner_tp"] += len(gold_spans & pred_spans)
            c["ner_fp"] += len(pred_spans - gold_spans)
            c["ner_fn"] += len(gold_spans - pred_spans)

            pred_ents = entity_meta(ex["words"], pred_ner)
            pred_mod, pred_rels = _decode_mod_rel(
                feats, pred_ents, params, mod_labels, rel_labels,
                self.d_mod_key, self.d_rel_key, len(ex["words"]),
            )
            gold_mod = ex["mod"]
            for g, p in zip(gold_mod, pred_mod):
                if g == p:
                    if g != "_":
                        c["mod_tp"] += 1
                else:
                    if p != "_":
                        c["mod_fp"] += 1
                    if g != "_":
                        c["mod_fn"] += 1

            gold_rels = set(ex["gold_rels"])
            c["rel_tp"] += len(gold_rels & pred_rels)
            c["rel_fp"] += len(pred_rels - gold_rels)
            c["rel_fn"] += len(gold_rels - pred_rels)
        return c


def _by_id(vocab: dict[str, int]) -> list[str]:
    return [k for k, _ in sorted(vocab.items(), key=lambda kv: kv[1])]


def _decode_mod_rel(
    feats: np.ndarray,
    ents: list[tuple[int, str, int, int]],
    params: dict[str, np.ndarray],
    mod_labels: list[str],
    rel_labels: list[str],
    d_mod_key: int,
    d_rel_key: int,
    n_words: int,
) -> tuple[list[str], set[tuple[int, int, str]]]:
    """Shared MOD/REL decode over a (gold or predicted) entity set:
    word-level mod tags ('_' off-anchor) + the predicted relation set
    ``{(tail_last, head_last, rel)}``."""
    pred_mod = ["_"] * n_words
    pred_rels: set[tuple[int, int, str]] = set()
    if not ents:
        return pred_mod, pred_rels
    mod_x = _mod_features(feats, ents, d_mod_key)
    mix = np.argmax(mod_x @ params["W_mod"].T + params["b_mod"], axis=1)
    for e, ix in zip(ents, mix):
        pred_mod[e[0]] = mod_labels[int(ix)]
    pair_x = np.stack(
        [
            _pair_feature_row(feats, a, b, d_rel_key)
            for a in ents
            for b in ents
        ]
    )
    best = np.argmax(pair_x @ params["W_rel"].T + params["b_rel"], axis=1)
    k = 0
    for a in ents:
        for b in ents:
            lab = rel_labels[int(best[k])]
            k += 1
            if lab != "N":
                pred_rels.add((a[0], b[0], lab))
    return pred_mod, pred_rels


# ---------------------------------------------------------------------------
# Checkpoint IO (reference artifact layout, clinical_joint.py:441-455)
# ---------------------------------------------------------------------------


def save_joint_checkpoint(
    out_dir: str,
    params: dict[str, np.ndarray],
    vocabs: dict[str, dict[str, int]],
    meta: dict,
) -> str:
    os.makedirs(out_dir, exist_ok=True)
    save_artifacts(out_dir, vocabs)
    np.savez(os.path.join(out_dir, "heads.npz"), **params)
    with open(os.path.join(out_dir, "meta.json"), "w", encoding="utf-8") as f:
        json.dump(meta, f, sort_keys=True)
    return out_dir


def load_joint_checkpoint(model_dir: str) -> tuple[dict, dict, dict]:
    vocabs = load_artifacts(model_dir)
    with open(os.path.join(model_dir, "meta.json"), "r", encoding="utf-8") as f:
        meta = json.load(f)
    npz = np.load(os.path.join(model_dir, "heads.npz"))
    params = {k: npz[k] for k in HEAD_KEYS}
    return params, vocabs, meta


# ---------------------------------------------------------------------------
# Driver loop
# ---------------------------------------------------------------------------


def _f1(tp: int, fp: int, fn: int) -> float:
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    return 2 * p * r / (p + r) if p + r else 0.0


def train_joint(
    tagged,
    out_dir: str,
    *,
    epochs: int = 20,
    batch_size: int = 16,
    num_workers: int = 2,
    down_neg: float = 1.0,
    lr: float = 0.05,
    weight_decay: float = 0.0,
    seed: int = 1029,
    dev_ratio: float = 0.2,
    emb_dim: int = DEFAULT_EMB,
    hidden: int = DEFAULT_HIDDEN,
    d_mod_key: int = DEFAULT_MOD_KEY,
    d_rel_key: int = DEFAULT_REL_KEY,
    eval_every: int = 1,
    spill_dir: str | None = None,
    analyzer: str = "mecab",
) -> dict:
    """Train the joint heads on a tagged corpus; returns the history.

    ``tagged`` is a tagged-chunks Dataset (url, chunk_id, tokens, ner,
    mod, rels, heads) or a path to a multihead CoNLL file. The dev
    split is hash-keyed by (url, chunk_id) — shuffle-free, stable
    across runs and cluster sizes (state/splits.py discipline). The
    best-dev-mean-F1 checkpoint lands in ``out_dir`` (G7); if there is
    no dev split (``dev_ratio=0``), the final parameters are saved.
    """
    import ray
    import ray.data

    if isinstance(tagged, str):
        with open(tagged, "r", encoding="utf-8") as f:
            from .conll import conll_to_chunks

            tagged = ray.data.from_items(conll_to_chunks(f.read()))

    vocabs = _label_vocabs(tagged)

    # hash-shard the corpus once to parquet: one partition per worker,
    # dev membership as a column (workers split internally)
    spill = spill_dir or tempfile.mkdtemp(prefix="jamie_train_")

    def assign(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        cids = batch.column("chunk_id").to_pylist()
        shard = [
            stable_hash64("trainshard", u, c) % num_workers
            for u, c in zip(urls, cids)
        ]
        is_dev = [
            (stable_hash64("dev", seed, u, c) % 1_000_000) / 1_000_000.0 < dev_ratio
            for u, c in zip(urls, cids)
        ]
        cols = ["url", "chunk_id", "tokens", "ner", "mod", "rels", "heads"]
        return (
            batch.select([c for c in cols if c in batch.column_names])
            .append_column("shard", pa.array(shard, pa.int32()))
            .append_column("is_dev", pa.array(is_dev, pa.bool_()))
        )

    tagged.map_batches(assign, batch_format="pyarrow").write_parquet(
        spill, partition_cols=["shard"]
    )

    worker_cls = ray.remote(num_cpus=1)(GradEvalWorker)
    workers = [
        worker_cls.remote(
            os.path.join(spill, f"shard={w}"),
            vocabs,
            emb_dim=emb_dim,
            hidden=hidden,
            d_mod_key=d_mod_key,
            d_rel_key=d_rel_key,
            down_neg=down_neg,
            seed=seed,
        )
        for w in range(num_workers)
    ]
    counts = ray.get([w.counts.remote() for w in workers])
    n_train = sum(c[0] for c in counts)
    n_dev = sum(c[1] for c in counts)
    if n_train == 0:
        raise ValueError("train_joint: no training sentences after the dev split")
    steps_per_epoch = max(math.ceil(c[0] / batch_size) for c in counts)

    feat_dim = FrozenEncoder(emb_dim, hidden).feat_dim
    params: dict[str, np.ndarray] = {
        "W_ner": np.zeros((len(vocabs["ner2ix"]), feat_dim)),
        "b_ner": np.zeros(len(vocabs["ner2ix"])),
        "W_mod": np.zeros((len(vocabs["mod2ix"]), feat_dim + d_mod_key)),
        "b_mod": np.zeros(len(vocabs["mod2ix"])),
        "W_rel": np.zeros((len(vocabs["rel2ix"]), 2 * feat_dim + 1 + d_rel_key)),
        "b_rel": np.zeros(len(vocabs["rel2ix"])),
    }
    opt = AdamW(params, lr=lr, weight_decay=weight_decay)
    meta = {
        "encoder": FrozenEncoder.VERSION,
        "emb_dim": emb_dim,
        "hidden": hidden,
        "d_mod_key": d_mod_key,
        "d_rel_key": d_rel_key,
        "analyzer": analyzer,
        "seed": seed,
        "down_neg": down_neg,
    }

    history: dict = {
        "loss": [], "ner_loss": [], "mod_loss": [], "rel_loss": [],
        "dev": [], "n_train": n_train, "n_dev": n_dev,
        "checkpoint": out_dir,
    }
    best = {"mean_f1": float("-inf"), "epoch": 0}
    for epoch in range(1, epochs + 1):
        tot = {"ner_loss": 0.0, "mod_loss": 0.0, "rel_loss": 0.0,
               "n_tokens": 0, "n_ents": 0, "n_pairs": 0}
        for step in range(steps_per_epoch):
            parts = ray.get(
                [w.grad.remote(params, epoch, step, batch_size) for w in workers]
            )
            # fixed worker-order summation -> bit-deterministic runs
            grads = {k: np.zeros_like(params[k]) for k in HEAD_KEYS}
            n_tokens = sum(p["n_tokens"] for p in parts)
            n_ents = sum(p["n_ents"] for p in parts)
            n_pairs = sum(p["n_pairs"] for p in parts)
            for p in parts:
                for k in HEAD_KEYS:
                    grads[k] += p["grads"][k]
                for k in tot:
                    tot[k] += p[k]
            if n_tokens == 0:
                continue
            for k in ("W_ner", "b_ner"):
                grads[k] /= n_tokens
            for k in ("W_mod", "b_mod"):
                if n_ents:
                    grads[k] /= n_ents
            for k in ("W_rel", "b_rel"):
                if n_pairs:
                    grads[k] /= n_pairs
            opt.step(params, grads)
        ner_l = tot["ner_loss"] / max(tot["n_tokens"], 1)
        mod_l = tot["mod_loss"] / max(tot["n_ents"], 1)
        rel_l = tot["rel_loss"] / max(tot["n_pairs"], 1)
        history["ner_loss"].append(ner_l)
        history["mod_loss"].append(mod_l)
        history["rel_loss"].append(rel_l)
        history["loss"].append(ner_l + mod_l + rel_l)

        if n_dev and (epoch % eval_every == 0 or epoch == epochs):
            parts = ray.get([w.eval_split.remote(params, "dev") for w in workers])
            c = {k: sum(p[k] for p in parts) for k in parts[0]}
            f1s = {
                facet: _f1(c[f"{facet}_tp"], c[f"{facet}_fp"], c[f"{facet}_fn"])
                for facet in ("ner", "mod", "rel")
            }
            mean_f1 = sum(f1s.values()) / 3.0
            history["dev"].append({"epoch": epoch, "mean_f1": mean_f1, **f1s})
            if mean_f1 > best["mean_f1"]:
                best = {"mean_f1": mean_f1, "epoch": epoch, **f1s}
                save_joint_checkpoint(out_dir, params, vocabs, meta)
    if not n_dev:
        save_joint_checkpoint(out_dir, params, vocabs, meta)
        best = {"mean_f1": None, "epoch": epochs}
    history["best"] = best

    # train-split fit through the same predicted-entity decode path
    # (the reference prints a final train/dev evaluation per epoch too)
    parts = ray.get([w.eval_split.remote(params, "train") for w in workers])
    c = {k: sum(p[k] for p in parts) for k in parts[0]}
    history["train_fit"] = {
        facet: _f1(c[f"{facet}_tp"], c[f"{facet}_fp"], c[f"{facet}_fn"])
        for facet in ("ner", "mod", "rel")
    }
    return history


# ---------------------------------------------------------------------------
# Inference backend over a trained checkpoint (predict() contract)
# ---------------------------------------------------------------------------


class TrainedJointModel:
    """predict()-contract backend over a ``train_joint`` checkpoint
    (``model="trained:<dir>"`` in the joint scorer): frozen encoder +
    the trained heads, word-level decode expanded to the subword
    contract exactly like the mock scorer (score.py MockJointModel)."""

    def __init__(self, model_dir: str, analyzer: str | None = None) -> None:
        # once-per-actor artifact load (S12/S13 pattern)
        self.params, vocabs, meta = load_joint_checkpoint(model_dir)
        if meta["encoder"] != FrozenEncoder.VERSION:
            raise ValueError(
                f"checkpoint encoder {meta['encoder']!r} != {FrozenEncoder.VERSION!r}"
            )
        self.analyzer = analyzer or meta["analyzer"]
        self.encoder = FrozenEncoder(meta["emb_dim"], meta["hidden"])
        self.d_mod_key = meta["d_mod_key"]
        self.d_rel_key = meta["d_rel_key"]
        self.ner_labels = _by_id(vocabs["ner2ix"])
        self.mod_labels = _by_id(vocabs["mod2ix"])
        self.rel_labels = _by_id(vocabs["rel2ix"])
        self.rel2ix = vocabs["rel2ix"]

    def predict(
        self, text: str
    ) -> tuple[list[str], list[str], list[str], list[tuple[int, str, int]]]:
        words = analyze(text, self.analyzer)
        if not words:
            return ["[CLS]", "[SEP]"], ["O", "O"], ["_", "_"], []
        feats = self.encoder.encode(words)
        p = self.params
        w_ner = _constrained_decode(feats @ p["W_ner"].T + p["b_ner"], self.ner_labels)
        ents = entity_meta(words, w_ner)
        w_mod, pred_rels = _decode_mod_rel(
            feats, ents, p, self.mod_labels, self.rel_labels,
            self.d_mod_key, self.d_rel_key, len(words),
        )

        pieces = subword_tokenize(words)
        sbw_ner = ["O"] + match_ner_label(pieces, w_ner) + ["O"]
        sbw_mod = ["_"] + match_mod_label(pieces, w_mod) + ["_"]
        sbw_toks = ["[CLS]"] + pieces + ["[SEP]"]
        _, aligned_ids = sbwtok2tok_alignment(sbw_toks)
        w2last = word_to_sbw_last_index(aligned_ids)
        cells = [
            (w2last[t + 1], pred, w2last[h + 1])  # +1: [CLS] is word 0
            for t, h, pred in sorted(pred_rels)
        ]
        cells.sort(key=lambda c: (c[0], self.rel2ix[c[1]], c[2]))
        return sbw_toks, sbw_ner, sbw_mod, cells
