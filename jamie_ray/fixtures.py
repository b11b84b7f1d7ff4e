"""Deterministic synthetic ``pages`` corpus + expected-output oracles.

Implements FIXTURES.md §1: every value is a pure function of the page
index via ``stable_hash64`` (never RNG state), so two runs — or a
resumed run — produce identical bytes at any scale.

The generator composes each sentence from an explicit segment structure
(hiragana filler / gazetteer mention / filler / ... / ``。``) and derives
the expected entity + triple set DIRECTLY from that structure (no BIO
tags, no subwords, no selection decode). The Ray pipeline recovers the
same set through the full reference algebra (gazetteer tagging ->
subword expansion -> selection cells -> decode -> alignment -> span
assembly), which makes `expected == produced` a real end-to-end test of
the decode/alignment machinery (P/R gate, BASELINE.md).

Class boundaries guarantee oracle exactness: fillers are hiragana-only,
mention surfaces are kanji/katakana/latin, so wakati can never merge a
mention token into its context and the gazetteer can never match across
segment boundaries.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from .hashing import stable_hash64
from .mockmodel import (
    GAZETTEER_SURFACES,
    mention_string,
    modality_for,
    relation_for,
)
from .stages.chunk import chunk_pack
from .textnorm import normalize_line

SURFACES = sorted(GAZETTEER_SURFACES)

FILLERS = (
    "これは", "そして", "ただし", "について", "ところで", "いわゆる",
    "とても", "やや", "ほとんど", "あきらか", "すみやかに", "ときどき",
)

EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds

# bump when generation rules change so stale cached corpora regenerate
FIXTURE_VERSION = 15  # v15: documents_c4 planted C4 line-cleaning corpus

_HOT_DOMAIN = "hot.example.com"


def _xml_escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _url_for(i: int) -> str:
    h = stable_hash64("dom", i)
    # zipf-ish skew: one hot domain takes ~30% of rows (exercises salting)
    domain = _HOT_DOMAIN if h % 10 < 3 else f"site{h % 97:02d}.example.org"
    return f"https://{domain}/p/{i:08d}"


def _lang_for(i: int) -> str:
    h = stable_hash64("lang", i)
    m = h % 25
    return "ja" if m < 23 else ("en" if m == 23 else "")


def _compose_sentence(i: int, l: int, s: int) -> tuple[str, list[tuple[str, str]]]:
    """Return (raw sentence text, ordered [(surface, tag), ...])."""
    hs = stable_hash64("sent", i, l, s)
    n_mentions = hs % 4
    parts: list[str] = []
    mentions: list[tuple[str, str]] = []
    parts.append(FILLERS[stable_hash64("fill", i, l, s, 0) % len(FILLERS)])
    for k in range(n_mentions):
        surf = SURFACES[stable_hash64("men", i, l, s, k) % len(SURFACES)]
        mentions.append((surf, GAZETTEER_SURFACES[surf]))
        parts.append(surf)
        parts.append(FILLERS[stable_hash64("fill", i, l, s, k + 1) % len(FILLERS)])
    return "".join(parts) + "。", mentions


def _compose_page(i: int) -> tuple[list[str], list[list[tuple[str, str]]]]:
    """Return (raw lines, mentions per *sentence* in order)."""
    adv = stable_hash64("adv", i) % 20
    if adv == 1:
        # over-budget single line: exercises split-not-drop (no mentions)
        n = 260
        words = [FILLERS[stable_hash64("lf", i, k) % len(FILLERS)] for k in range(n)]
        # interleave punctuation-free katakana runs to defeat run merging
        line = "ー".join(words)
        return [line], [[]]
    if adv == 2:
        # specials: ascii spaces -> [JASP], '>>' repairs, a mention
        surf = SURFACES[stable_hash64("sm", i) % len(SURFACES)]
        line = f"データ >> {surf} << 確認 # テスト。"
        return [line], [[(surf, GAZETTEER_SURFACES[surf])]]

    n_lines = 1 + stable_hash64("nl", i) % 5
    lines: list[str] = []
    per_sentence: list[list[tuple[str, str]]] = []
    for l in range(n_lines):
        n_sents = 1 + stable_hash64("ns", i, l) % 2
        sents = []
        for s in range(n_sents):
            text, mentions = _compose_sentence(i, l, s)
            sents.append(text)
            per_sentence.append(mentions)
        lines.append("".join(sents))
    return lines, per_sentence


# ---------------------------------------------------------------------------
# synthetic i2b2-style corpus (oracle for the S11 reader path)
# ---------------------------------------------------------------------------

I2B2_TAGS = ("problem", "treatment", "test")
I2B2_ASTS = ("present", "absent", "possible", "_")
I2B2_RELS = ("TrIP", "TrAP", "PIP")


def write_i2b2_corpus(root: str, n_docs: int, collection: str = "beth") -> str:
    """Write a deterministic i2b2-style corpus (txt/concept/ast/rel
    file quartets) plus ``expected_triples.parquet`` computed straight
    from the generated annotation structure (independent of the
    reader): the reader -> assemble path must reproduce it exactly.

    Layout + line formats follow /root/reference/formater.py:87-176;
    some filler tokens are uppercased to exercise the reader's
    lowercased span check.
    """
    marker = os.path.join(root, f".complete-v{FIXTURE_VERSION}-{n_docs}")
    if os.path.exists(marker):
        return root
    for sub in ("txt", "concept", "ast", "rel"):
        os.makedirs(os.path.join(root, collection, sub), exist_ok=True)

    tri_rows: dict[str, list] = {
        k: []
        for k in ("subj", "pred", "obj", "subj_type", "obj_type", "subj_mod", "url", "chunk_id")
    }
    for d in range(n_docs):
        name = f"record-{d:04d}"
        url = f"i2b2://{collection}/{name}"
        txt_lines: list[str] = []
        con_lines: list[str] = []
        ast_lines: list[str] = []
        rel_lines: list[str] = []
        n_sents = 2 + stable_hash64("i2s", d) % 3
        for s in range(n_sents):
            toks: list[str] = []
            concepts: list[tuple[int, int, str, str]] = []  # (tb, te, tag, ast)
            n_parts = 1 + stable_hash64("i2p", d, s) % 3
            for k in range(n_parts):
                filler = f"w{stable_hash64('i2f', d, s, k) % 97}"
                if stable_hash64("i2u", d, s, k) % 4 == 0:
                    filler = filler.upper()  # exercises .lower() check
                toks.append(filler)
                if stable_hash64("i2c", d, s, k) % 3 != 0:
                    width = 1 + stable_hash64("i2w", d, s, k) % 2
                    tb = len(toks)
                    ctoks = [f"c{d}s{s}k{k}x{j}" for j in range(width)]
                    toks.extend(ctoks)
                    tag = I2B2_TAGS[stable_hash64("i2t", d, s, k) % len(I2B2_TAGS)]
                    a = I2B2_ASTS[stable_hash64("i2a", d, s, k) % len(I2B2_ASTS)]
                    concepts.append((tb, tb + width - 1, tag, a))
            toks.append("eol.")
            txt_lines.append(" ".join(toks))

            def ptr(tb: int, te: int) -> str:
                text = " ".join(toks[tb : te + 1]).lower()
                return f'c="{text}" {s + 1}:{tb} {s + 1}:{te}'

            for tb, te, tag, a in concepts:
                con_lines.append(f'{ptr(tb, te)}||t="{tag}"')
                if a != "_":
                    ast_lines.append(f'{ptr(tb, te)}||t="{tag}"||a="{a}"')
            # relations between consecutive concept pairs in the sentence
            for i in range(len(concepts) - 1):
                t = concepts[i]
                h = concepts[i + 1]
                r = I2B2_RELS[stable_hash64("i2r", d, s, i) % len(I2B2_RELS)]
                rel_lines.append(f'{ptr(t[0], t[1])}||r="{r}"||{ptr(h[0], h[1])}')
                tri_rows["subj"].append("".join(toks[t[0] : t[1] + 1]))
                tri_rows["pred"].append(r)
                tri_rows["obj"].append("".join(toks[h[0] : h[1] + 1]))
                tri_rows["subj_type"].append(t[2])
                tri_rows["obj_type"].append(h[2])
                tri_rows["subj_mod"].append(t[3])
                tri_rows["url"].append(url)
                tri_rows["chunk_id"].append(s)

        def write(sub: str, ext: str, lines: list[str]) -> None:
            with open(
                os.path.join(root, collection, sub, f"{name}.{ext}"),
                "w",
                encoding="utf-8",
            ) as f:
                f.write("\n".join(lines) + ("\n" if lines else ""))

        write("txt", "txt", txt_lines)
        write("concept", "con", con_lines)
        write("ast", "ast", ast_lines)
        write("rel", "rel", rel_lines)

    expected = pa.table(
        {
            "subj": pa.array(tri_rows["subj"], pa.string()),
            "pred": pa.array(tri_rows["pred"], pa.string()),
            "obj": pa.array(tri_rows["obj"], pa.string()),
            "subj_type": pa.array(tri_rows["subj_type"], pa.string()),
            "obj_type": pa.array(tri_rows["obj_type"], pa.string()),
            "subj_mod": pa.array(tri_rows["subj_mod"], pa.string()),
            "url": pa.array(tri_rows["url"], pa.string()),
            "chunk_id": pa.array(tri_rows["chunk_id"], pa.int32()),
        }
    )
    pq.write_table(expected, os.path.join(root, "expected_triples.parquet"))
    with open(marker, "w") as f:
        f.write(str(n_docs))
    return root


# ---------------------------------------------------------------------------
# planted near-duplicate embeddings (oracle for embedding_near_dup)
# ---------------------------------------------------------------------------

EMB_DIM = 64
EMB_TWIN_EVERY = 37  # every 37th base vector gets a planted near-dup twin
NEAR_DUP_THRESHOLD = 0.9  # the conformance query's threshold


def generate_embeddings(n_vec: int) -> dict[str, pa.Table]:
    """Deterministic embeddings with PLANTED near-duplicate pairs plus
    the exact expected (id_a, id_b, cosine) output of
    ``similarity.embedding_near_dup`` at :data:`NEAR_DUP_THRESHOLD`.

    Guarantees that make the oracle exact rather than probabilistic:

    - each twin is retried (deterministically) until it lands in the
      SAME LSH bucket as its base, so the engine's bucket blocking has
      recall 1.0 on the planted set;
    - a brute-force all-pairs check asserts NO unplanted pair reaches
      within 0.02 of the threshold, so the engine cannot emit extras;
    - expected cosines are computed from the float32-ingested values
      (what the engine reads back from parquet), rounded like the
      engine rounds.
    """
    import math

    import numpy as np

    from .functions.similarity import _planes, lsh_bucket
    from .hashing import mix64

    idx = np.arange(n_vec * EMB_DIM, dtype=np.uint64)
    base = (
        (mix64(idx, seed=4242).astype(np.float64) / float(1 << 64)) * 2.0 - 1.0
    ).reshape(n_vec, EMB_DIM).astype(np.float32)
    planes = _planes(EMB_DIM)

    twins: list[np.ndarray] = []
    pair_rows: dict[str, list] = {"id_a": [], "id_b": [], "cosine": []}
    next_id = n_vec
    for i in range(0, n_vec, EMB_TWIN_EVERY):
        v = base[i].astype(np.float64)
        vu = v / np.linalg.norm(v)
        # target cosine in [0.93, 0.99): clear of the 0.9 threshold;
        # attempts shrink the angle toward the base (cosine -> 1) so a
        # base sitting close to an LSH hyperplane still finds a
        # same-bucket twin; a base essentially ON a plane is skipped
        # (the oracle includes only successfully planted pairs)
        target_c = 0.93 + (stable_hash64("ndc", i) % 600) / 10000.0
        w32 = None
        for attempt in range(96):
            c_att = 1.0 - (1.0 - target_c) * (0.5 ** (attempt // 12))
            t = math.sqrt(1.0 / c_att**2 - 1.0)
            seed = stable_hash64("ndn", i, attempt) % (1 << 32)
            nidx = np.arange(EMB_DIM, dtype=np.uint64) + np.uint64(seed)
            noise = (mix64(nidx, seed=97).astype(np.float64) / float(1 << 64)) * 2.0 - 1.0
            n_perp = noise - (noise @ vu) * vu
            norm = np.linalg.norm(n_perp)
            if norm < 1e-9:
                continue
            cand = ((vu + t * (n_perp / norm)) * np.linalg.norm(v)).astype(np.float32)
            if lsh_bucket(cand.astype(np.float64), planes) == lsh_bucket(v, planes):
                w32 = cand
                break
        if w32 is None:
            continue
        twins.append(w32)
        b = w32.astype(np.float64)
        # normalize-then-dot, the engine's expression tree
        # (similarity.py verify: unit rows, then gram product) — NOT
        # dot-then-divide, whose last-ulp difference could flip a
        # round(,6) boundary
        cos = float((v / np.linalg.norm(v)) @ (b / np.linalg.norm(b)))
        pair_rows["id_a"].append(i)
        pair_rows["id_b"].append(next_id)
        pair_rows["cosine"].append(round(cos, 6))
        next_id += 1

    all_vecs = np.vstack([base] + [t[None, :] for t in twins]).astype(np.float64)
    n_all = all_vecs.shape[0]
    norms = np.linalg.norm(all_vecs, axis=1)
    norms[norms == 0.0] = 1.0
    unit = all_vecs / norms[:, None]
    planted = set(zip(pair_rows["id_a"], pair_rows["id_b"]))
    # blockwise brute force: no UNPLANTED pair may approach the threshold
    block = 2048
    for s in range(0, n_all, block):
        sims = unit[s : s + block] @ unit.T
        hot = np.argwhere(sims >= NEAR_DUP_THRESHOLD - 0.02)
        for r, c in hot:
            a, b = sorted((int(r) + s, int(c)))
            if a != b and (a, b) not in planted:
                raise AssertionError(
                    f"unplanted near-dup pair ({a},{b}) cos={sims[r, c]:.4f}"
                )

    ids = list(range(n_vec)) + [n_vec + k for k in range(len(twins))]
    emb_col = pa.array(
        [v.tolist() for v in base] + [t.tolist() for t in twins],
        pa.list_(pa.float32()),
    )
    embeddings = pa.table(
        {"vec_id": pa.array(ids, pa.int64()), "embedding": emb_col}
    )
    expected = pa.table(
        {
            "id_a": pa.array(pair_rows["id_a"], pa.int64()),
            "id_b": pa.array(pair_rows["id_b"], pa.int64()),
            "cosine": pa.array(pair_rows["cosine"], pa.float64()),
        }
    )

    # expected knn_lsh result for query = vec_id 0 (single probe,
    # default planes, k=10): the LSH result is DETERMINISTIC — the
    # bucket-restricted exact top-k — so even the approximate operator
    # gets a value oracle on this corpus. Score math mirrors the
    # engine's _cosine exactly: unit query, dot, divide by row norm,
    # round(6); ties by id ascending.
    q = all_vecs[0]
    qn = q / (np.linalg.norm(q) or 1.0)
    q_bucket = lsh_bucket(q, planes)
    in_bucket = [
        j for j in range(n_all) if lsh_bucket(all_vecs[j], planes) == q_bucket
    ]
    scores = []
    for j in in_bucket:
        nj = np.linalg.norm(all_vecs[j]) or 1.0
        scores.append((round(float((all_vecs[j] @ qn) / nj), 6), j))
    scores.sort(key=lambda t: (-t[0], t[1]))
    top = scores[:10]  # row index == vec_id by construction
    expected_knn = pa.table(
        {
            "vec_id": pa.array([j for _, j in top], pa.int64()),
            "score": pa.array([s for s, _ in top], pa.float64()),
        }
    )

    # expected knn_ivf for the same query (n_centroids=16, n_probe=2,
    # n_iter=3): the engine's distributed k-means accumulates
    # INTEGER-SCALED partial sums, so its centroids are bit-identical
    # to this single-machine replay (same seeds from id hashes, same
    # assignment expression, same scaled-integer sums) — the IVF result
    # is deterministic, hence value-checkable.
    n_cent, n_probe, n_iter = 16, 2, 3
    seed_order = sorted(range(n_all), key=lambda j: (stable_hash64("ivf", j), j))
    cents = all_vecs[seed_order[:n_cent]].copy()
    scale = 1_000_000.0
    for _ in range(n_iter):
        d2 = ((all_vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        scaled = np.floor(all_vecs * scale + 0.5).astype(np.int64)
        for c in range(n_cent):
            sel = scaled[assign == c]
            if sel.shape[0]:
                cents[c] = sel.sum(axis=0) / (scale * sel.shape[0])
    qd2 = ((cents - q[None, :]) ** 2).sum(axis=1)
    probe_set = set(int(p) for p in np.argsort(qd2, kind="stable")[:n_probe])
    d2 = ((all_vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)
    ivf_scores = []
    for j in range(n_all):
        if int(assign[j]) in probe_set:
            nj = np.linalg.norm(all_vecs[j]) or 1.0
            ivf_scores.append((round(float((all_vecs[j] @ qn) / nj), 6), j))
    ivf_scores.sort(key=lambda t: (-t[0], t[1]))
    ivf_top = ivf_scores[:10]
    expected_ivf = pa.table(
        {
            "vec_id": pa.array([j for _, j in ivf_top], pa.int64()),
            "score": pa.array([s for s, _ in ivf_top], pa.float64()),
        }
    )

    # expected semantic_dedup (SemDeDup keep-first) at the near-dup
    # threshold over the SAME deterministic k-means clusters (`cents`/
    # `assign` above are bit-identical to the engine's ivf_centroids —
    # proven by the knn_ivf oracle): replay the engine's within-cluster
    # id-sorted unit-gram expression exactly. Row index == vec_id.
    sem_ids: list[int] = []
    sem_cluster: list[int] = []
    sem_dup: list[int] = []
    for c in range(n_cent):
        members = [j for j in range(n_all) if int(assign[j]) == c]  # ids ascend
        if not members:
            continue
        m = all_vecs[members]
        mnorms = np.linalg.norm(m, axis=1)
        mnorms[mnorms == 0.0] = 1.0
        munit = m / mnorms[:, None]
        msims = munit @ munit.T
        # greedy leader walk, matching the engine: dup only of a
        # lower-id KEEPER (never of a row that is itself a dup)
        keeper_jj: list[int] = []
        for jj, j in enumerate(members):
            d = -1
            for ii in keeper_jj:
                if msims[ii, jj] >= NEAR_DUP_THRESHOLD:
                    d = members[ii]
                    break  # keepers ascend: first hit is the minimum
            if d == -1:
                keeper_jj.append(jj)
            sem_ids.append(j)
            sem_cluster.append(c)
            sem_dup.append(d)
    expected_sem = pa.table(
        {
            "vec_id": pa.array(sem_ids, pa.int64()),
            "cluster": pa.array(sem_cluster, pa.int64()),
            "dup_of": pa.array(sem_dup, pa.int64()),
        }
    )

    return {
        "embeddings_nd": embeddings,
        "expected_near_dup": expected,
        "expected_knn_lsh": expected_knn,
        "expected_knn_ivf": expected_ivf,
        "expected_semantic_dedup": expected_sem,
    }


# ---------------------------------------------------------------------------
# planted near-duplicate documents (oracles for minhash clusters +
# simhash pairs)
# ---------------------------------------------------------------------------

DOC_GROUP_EVERY = 23  # every 23rd doc seeds a near-dup group
MINHASH_THRESHOLD = 0.8
SIMHASH_MAX_HAMMING = 8


def _popcount64(x):
    """Vectorized SWAR popcount over a uint64 numpy array."""
    import numpy as np

    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def generate_docs_nd(n_docs: int) -> dict[str, pa.Table]:
    """Deterministic documents with PLANTED near-duplicate groups plus
    exact expected outputs for ``minhash_clusters`` (threshold
    :data:`MINHASH_THRESHOLD`) and ``simhash_pairs`` (budget
    :data:`SIMHASH_MAX_HAMMING`).

    Exactness argument:

    - every doc draws tokens from its own disjoint vocabulary
      (``d{i}w{k}``), so cross-doc word-shingle Jaccard is 0 for every
      unplanted pair — LSH band collisions can create candidates but
      the exact-Jaccard verify always rejects them;
    - each planted member is retried (deterministic edit choices) until
      it (a) shares at least one minhash band with the group seed and
      (b) has Jaccard >= threshold vs the seed — so the required edges
      are guaranteed found and expected clusters are exactly the
      planted components (extra intra-group edges cannot change them);
    - expected simhash pairs are brute-forced over ALL docs with the
      shared ``simhash64`` (pair discovery is banding-free here, so
      the check is independent of the engine's pigeonhole blocking).
    """
    import numpy as np

    from .functions.dedup_docs import _doc_bands, ngram_jaccard, simhash64

    texts: list[str] = []
    ids: list[int] = []
    cluster_of: dict[int, int] = {}

    i = 0
    doc_id = 0
    while doc_id < n_docs:
        n_tok = 20 + stable_hash64("dlen", i) % 30
        toks = [f"d{i}w{k}" for k in range(n_tok)]
        seed_text = " ".join(toks)
        seed_id = doc_id
        ids.append(seed_id)
        texts.append(seed_text)
        doc_id += 1
        if i % DOC_GROUP_EVERY == 0 and doc_id < n_docs:
            group_n = 1 + stable_hash64("gn", i) % 3  # 1-3 extra members
            for m in range(group_n):
                if doc_id >= n_docs:
                    break
                for attempt in range(32):
                    # deterministic small edit: replace one token near the
                    # end (position varies by attempt) with a member token
                    pos = n_tok - 1 - (stable_hash64("gpos", i, m, attempt) % max(1, n_tok // 4))
                    etoks = list(toks)
                    etoks[pos] = f"d{i}m{m}a{attempt}"
                    member_text = " ".join(etoks)
                    if (
                        ngram_jaccard(seed_text, member_text) >= MINHASH_THRESHOLD
                        and set(_doc_bands(seed_text)) & set(_doc_bands(member_text))
                    ):
                        break
                else:
                    raise AssertionError(f"no valid near-dup member for doc {i}")
                ids.append(doc_id)
                texts.append(member_text)
                cluster_of[doc_id] = seed_id
                cluster_of.setdefault(seed_id, seed_id)
                doc_id += 1
        i += 1

    documents = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
    )
    expected_clusters = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "cluster_id": pa.array(
                [cluster_of.get(d, d) for d in ids], pa.int64()
            ),
        }
    )

    # simhash expected pairs: brute force over all docs (independent of
    # the engine's banding)
    sigs = np.array([simhash64(t) for t in texts], dtype=np.uint64)
    a_out, b_out, d_out = [], [], []
    block = 1024
    n = len(sigs)
    for s in range(0, n, block):
        xor = sigs[s : s + block, None] ^ sigs[None, :]
        ham = _popcount64(xor)
        hot = np.argwhere(ham <= SIMHASH_MAX_HAMMING)
        for r, c in hot:
            a, b = int(r) + s, int(c)
            if a < b:
                a_out.append(ids[a])
                b_out.append(ids[b])
                d_out.append(int(ham[r, c]))
    order = sorted(range(len(a_out)), key=lambda k: (a_out[k], b_out[k]))
    expected_simhash = pa.table(
        {
            "id_a": pa.array([a_out[k] for k in order], pa.int64()),
            "id_b": pa.array([b_out[k] for k in order], pa.int64()),
            "hamming": pa.array([d_out[k] for k in order], pa.int64()),
        }
    )
    # per-doc simhash signatures + winnowing fingerprints, computed by
    # the independent scalar implementations (see _simhash_expected /
    # _winnow_expected) — value oracles for docs_simhash / doc_winnow
    sig_rows = [_simhash_expected(t) for t in texts]
    win_rows: dict[str, list] = {"doc_id": [], "pos": [], "fingerprint": []}
    for d, t in zip(ids, texts):
        for p, fp in enumerate(_winnow_expected(t)):
            win_rows["doc_id"].append(d)
            win_rows["pos"].append(p)
            win_rows["fingerprint"].append(fp)
    expected_sigs = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "simhash": pa.array(sig_rows, pa.int64()),
        }
    )
    expected_winnow = pa.table(
        {
            "doc_id": pa.array(win_rows["doc_id"], pa.int64()),
            "pos": pa.array(win_rows["pos"], pa.int64()),
            "fingerprint": pa.array(win_rows["fingerprint"], pa.int64()),
        }
    )
    return {
        "documents_nd": documents,
        "expected_minhash_clusters": expected_clusters,
        "expected_simhash_pairs": expected_simhash,
        "expected_simhash_sigs": expected_sigs,
        "expected_winnow": expected_winnow,
    }


# ---------------------------------------------------------------------------
# expected tables for the formerly no-oracle deterministic family:
# simhash signatures, winnowing fingerprints, multimodal fake-decode
# features (VERDICT r2 item 4)
# ---------------------------------------------------------------------------

N_MEDIA_IMAGE = 200
N_MEDIA_VIDEO = 60
N_MEDIA_AUDIO = 60
VIDEO_STRIDE = 4
RESIZE_TARGET = 16


def _simhash_expected(text: str) -> int:
    """Independent scalar simhash: per-token bit-vote loops (the
    engine's ``simhash64`` is vectorized numpy — shared token hash,
    separate structure)."""
    toks = text.split()
    if not toks:
        return 0
    votes = [0] * 64
    for t in toks:
        h = stable_hash64("simh", t)
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(64):
        if votes[b] > 0:
            out |= 1 << b
    return out - (1 << 64) if out >= (1 << 63) else out


def _winnow_expected(text: str, k: int = 8, window: int = 16) -> list[int]:
    """Independent winnowing: explicit per-position Horner hash +
    window-min scan (the engine's ``winnow_fingerprints`` uses
    cumulative powers and stride tricks)."""
    n = len(text)
    if n < k:
        return []
    base, mask = 1_000_003, (1 << 64) - 1

    def signed(v: int) -> int:
        return v - (1 << 64) if v >= (1 << 63) else v

    grams = []
    for i in range(n - k + 1):
        h = 0
        for ch in text[i : i + k]:
            h = (h * base + ord(ch)) & mask
        grams.append(h)
    m = len(grams)
    if m <= window:
        return [signed(min(grams))]
    out: list[int] = []
    prev = None
    for s in range(m - window + 1):
        v = min(grams[s : s + window])
        if prev is None or v != prev:
            out.append(signed(v))
            prev = v
    return out


def _image_features_expected(px: "object") -> list[float]:
    import numpy as np

    a = np.asarray(px, dtype=np.float64)
    hist, _ = np.histogram(a, bins=8, range=(0, 256))
    return [float(a.mean()), float(a.std())] + (hist / max(len(a), 1)).tolist()


BPE_N_MERGES = 40
BPE_MIN_FREQ = 2
# BPE trains on a bounded deterministic sample (doc_id < cap) — the
# standard tokenizer-training practice at corpus scale (a tokenizer is
# trained on a few GB sample, never the full 100 TB); also bounds the
# oracle-generation cost at every sf
BPE_DOC_SAMPLE = 600


def _bpe_expected(texts: list[str]) -> pa.Table:
    """Independent occurrence-level BPE replay (vs the engine's
    word-frequency-table formulation in ``functions/bpe.py``): every
    word occurrence is its own symbol list, pair counts are literal
    scans — same math, structurally different code path. Tie rule:
    max count, then lexicographically smallest (lhs, rhs)."""
    import re as _re

    occs: list[list[str]] = []
    ws = _re.compile("[\t\n\x0c\r ]+")  # RE2-\s-exact, same as ws_tokens
    for t in texts:
        for w in ws.split(t):
            if w:
                occs.append(list(w))
    rows: dict[str, list] = {"rank": [], "lhs": [], "rhs": [], "freq": []}
    for rank in range(BPE_N_MERGES):
        cnt: dict[tuple[str, str], int] = {}
        for syms in occs:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                cnt[p] = cnt.get(p, 0) + 1
        if not cnt:
            break
        best: tuple[str, str] | None = None
        freq = -1
        for p, c in cnt.items():
            if c > freq or (c == freq and (best is None or p < best)):
                best, freq = p, c
        if freq < BPE_MIN_FREQ or best is None:
            break
        rows["rank"].append(rank)
        rows["lhs"].append(best[0])
        rows["rhs"].append(best[1])
        rows["freq"].append(freq)
        a, b = best
        fused = a + b
        new_occs: list[list[str]] = []
        for syms in occs:
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(fused)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_occs.append(out)
        occs = new_occs
    return pa.table(
        {
            "rank": pa.array(rows["rank"], pa.int64()),
            "lhs": pa.array(rows["lhs"], pa.string()),
            "rhs": pa.array(rows["rhs"], pa.string()),
            "freq": pa.array(rows["freq"], pa.int64()),
        }
    )


def generate_docs_para(n_docs: int) -> dict[str, pa.Table]:
    """Deterministic documents with PLANTED repeated paragraphs
    (newline-joined) for ``paragraph_dedup``: a shared boilerplate pool
    recurs across documents (and sometimes twice within one document),
    unique paragraphs never recur, and whitespace-only paragraphs
    exercise the always-keep rule. No expected table is generated — the
    oracle for this family is PURE SQL (DuckDB recomputes keep-first
    dedup from the raw text with window functions), the strongest
    oracle form."""
    n_boiler = 24
    boiler = [
        " ".join(f"bp{j}t{k}" for k in range(6 + stable_hash64("blen", j) % 8))
        for j in range(n_boiler)
    ]
    ids: list[int] = []
    texts: list[str] = []
    for i in range(n_docs):
        n_paras = 3 + stable_hash64("plen", i) % 5
        paras: list[str] = []
        for s in range(n_paras):
            kind = stable_hash64("pkind", i, s) % 10
            if kind < 4:
                paras.append(boiler[stable_hash64("pboil", i, s) % n_boiler])
            elif kind == 4:
                # whitespace-only (always kept, never deduped)
                paras.append("" if s % 2 else "  ")
            elif kind == 5 and paras:
                # within-doc repeat of an earlier paragraph
                paras.append(paras[stable_hash64("prep", i, s) % len(paras)])
            else:
                paras.append(
                    " ".join(
                        f"d{i}p{s}t{k}"
                        for k in range(5 + stable_hash64("ulen", i, s) % 6)
                    )
                )
        ids.append(i)
        texts.append("\n".join(paras))
    # a fully-empty document exercises the ''.split boundary
    if n_docs:
        texts[-1] = ""
    return {
        "documents_para": pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        "expected_bpe_merges": _bpe_expected(texts[:BPE_DOC_SAMPLE]),
        "documents_c4": _generate_docs_c4(n_docs),
    }


def _generate_docs_c4(n_docs: int) -> pa.Table:
    """Deterministic multi-line documents with PLANTED C4 features for
    ``text_analysis.c4_line_clean``: good lines per terminal-punct
    flavor (. ! ? \") including trailing-RE2-blank tails, short lines,
    no-terminal-punct lines, ASCII-case-variant javascript lines,
    whitespace-only lines, curly-brace docs, lorem-ipsum docs (mixed
    case), docs with exactly min_kept_lines-1 survivors, and one empty
    doc. No expected table: the oracle is PURE SQL (the DuckDB twin in
    ``__ray_entry__`` recomputes every rule from the raw text)."""
    puncts = [".", "!", "?", '"']
    js = ["javascript", "JavaScript", "JAVASCRIPT"]
    lorem = ["lorem ipsum", "Lorem Ipsum", "LOREM IPSUM"]
    ids: list[int] = []
    texts: list[str] = []
    for i in range(n_docs):
        n_lines = 3 + stable_hash64("c4len", i) % 6
        lines: list[str] = []
        for s in range(n_lines):
            kind = stable_hash64("c4kind", i, s) % 10
            words = [
                f"c{i}l{s}w{k}"
                for k in range(5 + stable_hash64("c4wlen", i, s) % 5)
            ]
            p = puncts[stable_hash64("c4punct", i, s) % len(puncts)]
            if kind < 4:
                line = " ".join(words) + p
                if kind == 3:
                    line += " \t"  # trailing RE2 blanks after the punct
            elif kind == 4:
                line = " ".join(words[:2]) + p  # too few words
            elif kind == 5:
                line = " ".join(words)  # no terminal punct
            elif kind == 6:
                line = " ".join(
                    words + [js[stable_hash64("c4js", i, s) % len(js)]]
                ) + p
            elif kind == 7:
                line = "  " if s % 2 else ""  # whitespace-only
            else:
                line = " ".join(words) + p
            lines.append(line)
        dockind = stable_hash64("c4doc", i) % 12
        if dockind in (0, 10):
            lines.append("if (x) { y(); } " + " ".join(
                f"c{i}bw{k}" for k in range(5)
            ) + ".")
        elif dockind in (1, 11):
            lines.append(
                lorem[stable_hash64("c4lor", i) % len(lorem)]
                + " dolor sit amet consectetur."
            )
        ids.append(i)
        texts.append("\n".join(lines))
    if n_docs:
        texts[-1] = ""  # the ''.split boundary
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def generate_media_expected() -> dict[str, pa.Table]:
    """Expected outputs of the three multimodal conformance pipelines.

    The fake decodes are pure hash functions of (payload, shape), so
    every downstream feature is generator-computable; the compared
    outputs are EXPLODED to scalar rows (media_id, [frame_idx,]
    feat_idx, value) — no list columns in the oracle surface. Shared
    per-item hash math, independently driven loops: what this oracle
    actually checks is the Ray-side plumbing (actor stages, batch
    boundaries, row alignment, explode order)."""
    import numpy as np

    from .functions.multimodal import synthetic_media
    from .hashing import mix64

    def payload_seed(payload: bytes, extra: int = 0) -> int:
        return (int.from_bytes(payload[:8] or b"\0" * 8, "little") + extra) % (1 << 31)

    def fake_pixels(payload: bytes, w: int, h: int, frame: int | None = None) -> np.ndarray:
        extra = 0 if frame is None else frame * 1_000_003
        u = mix64(np.arange(int(w) * int(h), dtype=np.uint64), seed=payload_seed(payload, extra))
        return (u & np.uint64(0xFF)).astype(np.uint8)

    def resize(px: np.ndarray, w: int, h: int, target: int) -> np.ndarray:
        a = px.reshape(int(h), int(w))
        ys = (np.arange(target) * h // target).astype(int)
        xs = (np.arange(target) * w // target).astype(int)
        return a[np.ix_(ys, xs)].flatten()

    # ---- images: decode -> resize -> features ----
    img = synthetic_media(N_MEDIA_IMAGE)
    img_rows: dict[str, list] = {"media_id": [], "feat_idx": [], "value": []}
    for mid, payload, w, h in zip(
        img["media_id"].to_pylist(), img["payload"].to_pylist(),
        img["width"].to_pylist(), img["height"].to_pylist(),
    ):
        feats = _image_features_expected(
            resize(fake_pixels(payload, w, h), w, h, RESIZE_TARGET)
        )
        for fi, v in enumerate(feats):
            img_rows["media_id"].append(mid)
            img_rows["feat_idx"].append(fi)
            img_rows["value"].append(v)

    # ---- video: frame sampling -> per-frame features ----
    vid = synthetic_media(N_MEDIA_VIDEO, kind="video")
    vid_rows: dict[str, list] = {
        "media_id": [], "frame_idx": [], "feat_idx": [], "value": []
    }
    for mid, payload, w, h, nf in zip(
        vid["media_id"].to_pylist(), vid["payload"].to_pylist(),
        vid["width"].to_pylist(), vid["height"].to_pylist(),
        vid["n_frames"].to_pylist(),
    ):
        for frame in range(0, int(nf), VIDEO_STRIDE):
            feats = _image_features_expected(fake_pixels(payload, w, h, frame))
            for fi, v in enumerate(feats):
                vid_rows["media_id"].append(mid)
                vid_rows["frame_idx"].append(frame)
                vid_rows["feat_idx"].append(fi)
                vid_rows["value"].append(v)

    # ---- audio: decode -> windowed RMS + zero-cross features ----
    aud = synthetic_media(N_MEDIA_AUDIO, kind="audio")
    aud_rows: dict[str, list] = {"media_id": [], "feat_idx": [], "value": []}
    window = 1024
    for mid, payload, sr in zip(
        aud["media_id"].to_pylist(), aud["payload"].to_pylist(),
        aud["sample_rate"].to_pylist(),
    ):
        n = max(int(sr), 1)
        u = mix64(np.arange(n, dtype=np.uint64), seed=payload_seed(payload))
        wave = ((u >> np.uint64(11)).astype(np.float32) / float(1 << 53)) * 2.0 - 1.0
        a = wave.astype(np.float64)
        n_win = max(len(a) // window, 1)
        a = a[: n_win * window].reshape(n_win, -1)
        rms = np.sqrt((a**2).mean(axis=1))
        zcr = (np.abs(np.diff(np.sign(a), axis=1)) > 0).mean(axis=1)
        for fi, v in enumerate(np.concatenate([rms, zcr]).tolist()):
            aud_rows["media_id"].append(mid)
            aud_rows["feat_idx"].append(fi)
            aud_rows["value"].append(v)

    def t(rows: dict[str, list], cols: dict[str, pa.DataType]) -> pa.Table:
        return pa.table({c: pa.array(rows[c], ty) for c, ty in cols.items()})

    return {
        "expected_media_features": t(
            img_rows,
            {"media_id": pa.int64(), "feat_idx": pa.int64(), "value": pa.float64()},
        ),
        "expected_video_features": t(
            vid_rows,
            {
                "media_id": pa.int64(),
                "frame_idx": pa.int64(),
                "feat_idx": pa.int64(),
                "value": pa.float64(),
            },
        ),
        "expected_audio_features": t(
            aud_rows,
            {"media_id": pa.int64(), "feat_idx": pa.int64(), "value": pa.float64()},
        ),
    }


def _compose_en_page(i: int) -> list[str]:
    words = ["this", "page", "has", "plain", "english", "words", "only"]
    n = 3 + stable_hash64("en", i) % 4
    return [" ".join(words[: n + 2]) + "."]


def _expected_format_rows(
    trunks: list[str],
    assignment: list[list[int]],
    per_sentence_mentions: list[list[tuple[str, str]]],
) -> list[tuple[int, str, str, str]]:
    """Expected writer-output strings per chunk, built DIRECTLY from
    sentence structure (no scorer, no BIO/subword machinery): tokens via
    the analyzer, entity spans by positional search of each planted
    mention's token tuple, relations via the generator's own (a, b)
    enumeration sorted per the selection-cell contract
    (score.py predict: (subj_last, rel_index, obj_last)), and the
    word-level rels/heads lists via the replace-then-append default rule
    of ``sbwrel2head`` (labels.py:161-173 / reference utils.py:1873-92).
    The string kernels themselves (``chunk_to_xml``/``chunk_to_brat``)
    are shared with the engine — golden tests in test_formats.py pin
    their literal output — so what this oracle value-checks end-to-end
    is the full score -> decode -> realign algebra at string
    granularity.

    Returns [(chunk_id, xml, brat_txt, brat_ann, pmhs)].
    """
    from .mockmodel import REL_VOCAB
    from .stages.format_out import chunk_to_brat, chunk_to_xml
    from .stages.pmhs import chunk_to_pmhs
    from .tokenization import analyze

    rel_index = {r: i for i, r in enumerate(REL_VOCAB)}
    out: list[tuple[int, str, str, str]] = []
    for cid, (trunk, line_ids) in enumerate(zip(trunks, assignment)):
        toks = analyze(trunk)
        # [SEP]-delimited segments, one per packed sentence
        segs: list[tuple[int, int]] = []
        start = 0
        for j, t in enumerate(toks):
            if t == "[SEP]":
                segs.append((start, j))
                start = j + 1
        segs.append((start, len(toks)))
        if len(segs) != len(line_ids):
            raise AssertionError(
                f"fixture format oracle: {len(segs)} segments vs "
                f"{len(line_ids)} packed lines in chunk {cid}"
            )
        ner = ["O"] * len(toks)
        mod = ["_"] * len(toks)
        relations: list[tuple[tuple[int, int], str, tuple[int, int]]] = []
        for (s0, s1), li in zip(segs, line_ids):
            mentions = per_sentence_mentions[li]
            spans: list[tuple[int, int, str]] = []
            cursor = s0
            for surf, tag in mentions:
                key = tuple(analyze(surf))
                found = -1
                for p in range(cursor, s1 - len(key) + 1):
                    if tuple(toks[p : p + len(key)]) == key:
                        found = p
                        break
                if found < 0:
                    raise AssertionError(
                        f"fixture format oracle: mention {surf!r} not "
                        f"found in chunk {cid} segment tokens"
                    )
                spans.append((found, found + len(key), tag))
                cursor = found + len(key)
            mstrs = ["".join(toks[s:e]) for s, e, _ in spans]
            for k, (s, e, tag) in enumerate(spans):
                ner[s] = f"B-{tag}"
                for j in range(s + 1, e):
                    ner[j] = f"I-{tag}"
                mod[e - 1] = modality_for(tag, mstrs[k], k)
            for a in range(len(spans)):
                for b in range(len(spans)):
                    if a == b:
                        continue
                    pred = relation_for(mstrs[a], mstrs[b], a, b)
                    if pred is not None:
                        relations.append(
                            (spans[a][:2], pred, spans[b][:2])
                        )
        relations.sort(
            key=lambda r: (r[0][1] - 1, rel_index[r[1]], r[2][1] - 1)
        )
        rels: list[list[str]] = [["N"] for _ in toks]
        heads: list[list[int]] = [[i] for i in range(len(toks))]
        for (_ss, se), pred, (_os, oe) in relations:
            t, h = se - 1, oe - 1
            if heads[t] == [t] and rels[t] == ["N"]:
                heads[t] = [h]
                rels[t] = [pred]
            else:
                heads[t].append(h)
                rels[t].append(pred)
        xml = chunk_to_xml(toks, ner, mod, rels, heads)
        txt, ann = chunk_to_brat(toks, ner, mod, rels, heads)
        pmhs = chunk_to_pmhs(toks, ner, rels, heads)
        out.append((cid, xml, txt, ann, pmhs))
    return out


def generate(n_pages: int) -> dict[str, pa.Table]:
    """Generate pages + expected tables for ``n_pages`` synthetic pages.

    Returns dict with keys: ``pages``, ``expected_text``,
    ``expected_chunks``, ``expected_entities``, ``expected_triples``
    (plus quarantine/graph and the ``expected_xml`` / ``expected_brat``
    writer-output oracles).
    """
    urls: list[str] = []
    tss: list[int] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []

    ent_rows: dict[str, list] = {k: [] for k in ("url", "chunk_id", "mention", "ner_tag", "mod")}
    tri_rows: dict[str, list] = {
        k: []
        for k in ("subj", "pred", "obj", "subj_type", "obj_type", "subj_mod", "url", "chunk_id")
    }
    chk_rows: dict[str, list] = {k: [] for k in ("url", "chunk_id", "text", "n_subwords")}

    qua_rows: dict[str, list] = {"url": [], "error": []}
    fmt_rows: dict[str, list] = {
        k: []
        for k in ("url", "chunk_id", "xml", "brat_txt", "brat_ann", "pmhs")
    }

    for i in range(n_pages):
        url = _url_for(i)
        lang = _lang_for(i)
        adv = stable_hash64("adv", i) % 20

        if adv == 0:
            # empty page
            urls.append(url)
            tss.append(EPOCH_US + (stable_hash64("ts", i) % 86_400) * 1_000_000)
            htmls.append(b"")
            texts.append("")
            langs.append(lang)
            continue

        if adv == 3:
            # poison page: invalid utf-8 inside the html — quarantined
            # by extract_batch's strict decode (VERDICT r1 item 2: the
            # conformance query must see real quarantined rows). The
            # byte position varies per page so the oracled error string
            # is non-trivial.
            from .stages.extract import format_extract_error

            prefix = "データ" * (1 + stable_hash64("plen", i) % 7)
            bad = bytes([0xFF, 0x80 + stable_hash64("pbyte", i) % 0x40])
            html = (
                b"<html><body><p>" + prefix.encode("utf-8") + bad
                + b"</p></body></html>"
            )
            urls.append(url)
            tss.append(EPOCH_US + (stable_hash64("ts", i) % 86_400) * 1_000_000)
            htmls.append(html)
            texts.append("")
            langs.append("ja")  # passes the lang filter -> reaches extract
            try:
                html.decode("utf-8")
                raise AssertionError(f"poison page {i} decoded cleanly")
            except UnicodeDecodeError as ex:
                qua_rows["url"].append(url)
                qua_rows["error"].append(format_extract_error(ex))
            continue

        if lang == "ja":
            raw_lines, per_sentence_mentions = _compose_page(i)
        else:
            raw_lines, per_sentence_mentions = _compose_en_page(i), []

        # expected normalized text: one output line per normalized sentence
        norm_sentences: list[str] = []
        for raw in raw_lines:
            norm_sentences.extend(normalize_line(raw))
        text = "\n".join(norm_sentences)

        # html: wrap raw lines with markup noise; extraction must invert it
        body = "".join(f"<p>{_xml_escape(ln)}</p>" for ln in raw_lines)
        html = (
            f"<html><head><title>doc {i}</title><style>p{{margin:0}}</style></head>"
            f"<body><script>var n={i};</script>{body}</body></html>"
        ).encode("utf-8")

        urls.append(url)
        tss.append(EPOCH_US + (stable_hash64("ts", i) % 86_400) * 1_000_000)
        htmls.append(html)
        texts.append(text)
        langs.append(lang)

        if lang != "ja":
            continue

        # ---- expected chunks / entities / triples (oracle path) ----
        trunks, lens, assignment = chunk_pack(norm_sentences)
        line_to_chunk: dict[int, int] = {}
        for cid, line_ids in enumerate(assignment):
            for li in line_ids:
                line_to_chunk.setdefault(li, cid)
        for cid, (t, n) in enumerate(zip(trunks, lens)):
            chk_rows["url"].append(url)
            chk_rows["chunk_id"].append(cid)
            chk_rows["text"].append(t)
            chk_rows["n_subwords"].append(n)

        if len(per_sentence_mentions) != len(norm_sentences):
            # adversarial pages compose one sentence per raw line; normal
            # pages compose lines of 1-2 sentences that normalize_line
            # splits back — counts must agree or the oracle is invalid
            raise AssertionError(
                f"fixture invariant broken at page {i}: "
                f"{len(per_sentence_mentions)} mention groups vs "
                f"{len(norm_sentences)} sentences"
            )

        for cid, xml, btxt, bann, pmhs in _expected_format_rows(
            trunks, assignment, per_sentence_mentions
        ):
            fmt_rows["url"].append(url)
            fmt_rows["chunk_id"].append(cid)
            fmt_rows["xml"].append(xml)
            fmt_rows["brat_txt"].append(btxt)
            fmt_rows["brat_ann"].append(bann)
            fmt_rows["pmhs"].append(pmhs)

        for li, mentions in enumerate(per_sentence_mentions):
            cid = line_to_chunk.get(li)
            if cid is None:
                continue
            mstrs = [mention_string(surf) for surf, _ in mentions]
            mods = [
                modality_for(tag, mstrs[k], k)
                for k, (_, tag) in enumerate(mentions)
            ]
            for k, (surf, tag) in enumerate(mentions):
                ent_rows["url"].append(url)
                ent_rows["chunk_id"].append(cid)
                ent_rows["mention"].append(mstrs[k])
                ent_rows["ner_tag"].append(tag)
                ent_rows["mod"].append(mods[k])
            for a in range(len(mentions)):
                for b in range(len(mentions)):
                    if a == b:
                        continue
                    pred = relation_for(mstrs[a], mstrs[b], a, b)
                    if pred is None:
                        continue
                    tri_rows["subj"].append(mstrs[a])
                    tri_rows["pred"].append(pred)
                    tri_rows["obj"].append(mstrs[b])
                    tri_rows["subj_type"].append(mentions[a][1])
                    tri_rows["obj_type"].append(mentions[b][1])
                    tri_rows["subj_mod"].append(mods[a])
                    tri_rows["url"].append(url)
                    tri_rows["chunk_id"].append(cid)

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    expected_text = pages.select(["url", "text"])
    expected_chunks = pa.table(
        {
            "url": pa.array(chk_rows["url"], pa.string()),
            "chunk_id": pa.array(chk_rows["chunk_id"], pa.int32()),
            "text": pa.array(chk_rows["text"], pa.string()),
            "n_subwords": pa.array(chk_rows["n_subwords"], pa.int32()),
        }
    )
    expected_entities = pa.table(
        {
            "url": pa.array(ent_rows["url"], pa.string()),
            "chunk_id": pa.array(ent_rows["chunk_id"], pa.int32()),
            "mention": pa.array(ent_rows["mention"], pa.string()),
            "ner_tag": pa.array(ent_rows["ner_tag"], pa.string()),
            "mod": pa.array(ent_rows["mod"], pa.string()),
        }
    )
    expected_triples = pa.table(
        {
            "subj": pa.array(tri_rows["subj"], pa.string()),
            "pred": pa.array(tri_rows["pred"], pa.string()),
            "obj": pa.array(tri_rows["obj"], pa.string()),
            "subj_type": pa.array(tri_rows["subj_type"], pa.string()),
            "obj_type": pa.array(tri_rows["obj_type"], pa.string()),
            "subj_mod": pa.array(tri_rows["subj_mod"], pa.string()),
            "url": pa.array(tri_rows["url"], pa.string()),
            "chunk_id": pa.array(tri_rows["chunk_id"], pa.int32()),
        }
    )
    expected_quarantine = pa.table(
        {
            "url": pa.array(qua_rows["url"], pa.string()),
            "error": pa.array(qua_rows["error"], pa.string()),
        }
    )

    # expected deduplicated graph WITH canonical ids: fixture linking is
    # surface-identity (pinned by test_fixture_linking_is_identity), so
    # ids are entity_id(surface) and the dedup partition by id equals
    # the partition by surface; representative = lexicographic min over
    # (url, chunk_id, subj_mod, subj_type, obj_type) — stages/dedup.py's
    # rule, replayed here with plain sorting
    from .stages.link import entity_id

    graph_groups: dict[tuple[str, str, str], list[tuple]] = {}
    for k in range(len(tri_rows["subj"])):
        key = (tri_rows["subj"][k], tri_rows["pred"][k], tri_rows["obj"][k])
        graph_groups.setdefault(key, []).append(
            (
                tri_rows["url"][k], tri_rows["chunk_id"][k],
                tri_rows["subj_mod"][k], tri_rows["subj_type"][k],
                tri_rows["obj_type"][k],
            )
        )
    gr_rows: dict[str, list] = {
        k: []
        for k in (
            "subj_id", "pred", "obj_id", "subj", "obj", "subj_type",
            "obj_type", "subj_mod", "n_sources", "url", "chunk_id",
        )
    }
    for (subj, pred, obj), occs in graph_groups.items():
        url_r, cid_r, mod_r, st_r, ot_r = min(occs)
        gr_rows["subj_id"].append(entity_id(subj))
        gr_rows["pred"].append(pred)
        gr_rows["obj_id"].append(entity_id(obj))
        gr_rows["subj"].append(subj)
        gr_rows["obj"].append(obj)
        gr_rows["subj_type"].append(st_r)
        gr_rows["obj_type"].append(ot_r)
        gr_rows["subj_mod"].append(mod_r)
        gr_rows["n_sources"].append(len(occs))
        gr_rows["url"].append(url_r)
        gr_rows["chunk_id"].append(cid_r)
    expected_graph = pa.table(
        {
            "subj_id": pa.array(gr_rows["subj_id"], pa.int64()),
            "pred": pa.array(gr_rows["pred"], pa.string()),
            "obj_id": pa.array(gr_rows["obj_id"], pa.int64()),
            "subj": pa.array(gr_rows["subj"], pa.string()),
            "obj": pa.array(gr_rows["obj"], pa.string()),
            "subj_type": pa.array(gr_rows["subj_type"], pa.string()),
            "obj_type": pa.array(gr_rows["obj_type"], pa.string()),
            "subj_mod": pa.array(gr_rows["subj_mod"], pa.string()),
            "n_sources": pa.array(gr_rows["n_sources"], pa.int64()),
            "url": pa.array(gr_rows["url"], pa.string()),
            "chunk_id": pa.array(gr_rows["chunk_id"], pa.int32()),
        }
    )
    out = {
        "pages": pages,
        "expected_text": expected_text,
        "expected_chunks": expected_chunks,
        "expected_entities": expected_entities,
        "expected_triples": expected_triples,
        "expected_quarantine": expected_quarantine,
        "expected_graph": expected_graph,
        "expected_xml": pa.table(
            {
                "url": pa.array(fmt_rows["url"], pa.string()),
                "chunk_id": pa.array(fmt_rows["chunk_id"], pa.int32()),
                "xml": pa.array(fmt_rows["xml"], pa.string()),
            }
        ),
        "expected_brat": pa.table(
            {
                "url": pa.array(fmt_rows["url"], pa.string()),
                "chunk_id": pa.array(fmt_rows["chunk_id"], pa.int32()),
                "brat_txt": pa.array(fmt_rows["brat_txt"], pa.string()),
                "brat_ann": pa.array(fmt_rows["brat_ann"], pa.string()),
            }
        ),
        "expected_pmhs": pa.table(
            {
                "url": pa.array(fmt_rows["url"], pa.string()),
                "chunk_id": pa.array(fmt_rows["chunk_id"], pa.int32()),
                "pmhs": pa.array(fmt_rows["pmhs"], pa.string()),
            }
        ),
    }
    out.update(generate_embeddings(n_pages))
    out.update(generate_docs_nd(max(30, n_pages // 2)))
    out.update(generate_docs_para(max(40, n_pages // 2)))
    out.update(generate_media_expected())
    return out


def write_corpus(out_dir: str, n_pages: int, overwrite: bool = False) -> str:
    """Write pages + expected tables as parquet under ``out_dir``.

    Idempotent: skips if the marker for the same ``n_pages`` exists
    (generation is deterministic, so cached files are always valid).
    """
    marker = os.path.join(out_dir, f".complete-v{FIXTURE_VERSION}-{n_pages}")
    if os.path.exists(marker) and not overwrite:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    tables = generate(n_pages)
    for name, table in tables.items():
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    with open(marker, "w") as f:
        f.write(str(n_pages))
    return out_dir
