"""N-gram LM perplexity: independent pure-Python oracle, pruning
semantics, block-layout determinism, planted quality ordering, cap."""

import math
import re
from collections import Counter

import pyarrow as pa
import pytest
import ray

from jamie_ray.functions.lm import (
    NgramLM,
    ngram_counts,
    score_perplexity,
    train_ngram_lm,
)

DOCS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "the cat and the dog sat",
    "zx qv zzyx glorp",          # rare types -> high perplexity
    "the the the the the",       # common type -> low perplexity
    "",                          # empty doc
]


def _independent_lm(texts, min_freq=1, k=1.0):
    """Oracle twin built without jamie_ray code: RE2-blank split via
    re, plain Counters."""
    split = re.compile(r"[\t\n\f\r ]+")
    uni, bi = Counter(), Counter()
    for t in texts:
        toks = [x for x in split.split(t) if x]
        uni.update(toks)
        bi.update(
            toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)
        )
    total, v = sum(uni.values()), len(uni) + 1
    uni = {g: n for g, n in uni.items() if n >= min_freq}
    bi = {g: n for g, n in bi.items() if n >= min_freq}
    return uni, bi, total, v, k


def _independent_logprob(lm_tuple, text):
    uni, bi, total, v, k = lm_tuple
    split = re.compile(r"[\t\n\f\r ]+")
    toks = [x for x in split.split(text) if x]
    if not toks:
        return 0.0
    lp = math.log((uni.get(toks[0], 0) + k) / (total + k * v))
    for i in range(1, len(toks)):
        lp += math.log(
            (bi.get(toks[i - 1] + " " + toks[i], 0) + k)
            / (uni.get(toks[i - 1], 0) + k * v)
        )
    return lp


def _docs_ds():
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(DOCS)), pa.int64()),
                "text": pa.array(DOCS, pa.string()),
            }
        )
    )


def test_train_matches_independent_counts(ray_session):
    lm = train_ngram_lm(_docs_ds())
    uni, bi, total, v, _ = _independent_lm(DOCS)
    assert lm.uni == dict(uni)
    assert lm.bi == dict(bi)
    assert (lm.total, lm.v) == (total, v)


def test_pruning_keeps_unpruned_denominators(ray_session):
    lm = train_ngram_lm(_docs_ds(), min_freq=2)
    uni, bi, total, v, _ = _independent_lm(DOCS, min_freq=2)
    assert lm.uni == uni
    assert lm.bi == bi
    # total/v reflect the UNPRUNED stream, not the surviving tables
    assert (lm.total, lm.v) == (total, v)
    assert lm.total > sum(lm.uni.values())


def test_scores_match_independent_oracle(ray_session):
    ds = _docs_ds()
    lm = train_ngram_lm(ds)
    oracle = _independent_lm(DOCS)
    rows = {r["doc_id"]: r for r in score_perplexity(ds, lm).take_all()}
    for i, text in enumerate(DOCS):
        want = round(_independent_logprob(oracle, text) * 1_000_000)
        assert rows[i]["logprob_micro"] == want, text
    # empty doc: zero tokens, NaN perplexity
    assert rows[5]["n_tokens"] == 0
    assert math.isnan(rows[5]["ppl"])
    # planted ordering: gibberish scores worse than the common-token doc
    assert rows[3]["ppl"] > rows[4]["ppl"]
    assert rows[0]["ppl"] < rows[3]["ppl"]


def test_block_layout_determinism(ray_session):
    ds = _docs_ds()
    lm = train_ngram_lm(ds)
    one = {
        r["doc_id"]: r["logprob_micro"]
        for r in score_perplexity(ds, lm).take_all()
    }
    many = {
        r["doc_id"]: r["logprob_micro"]
        for r in score_perplexity(ds.repartition(5), lm).take_all()
    }
    assert one == many
    # training is layout-independent too (integer count algebra)
    lm2 = train_ngram_lm(ds.repartition(4))
    assert (lm2.uni, lm2.bi, lm2.total, lm2.v) == (lm.uni, lm.bi, lm.total, lm.v)


def test_ngram_counts_summary_rows(ray_session):
    t = pa.Table.from_pylist(ngram_counts(_docs_ds(), min_freq=3).take_all())
    by_order = {o: 0 for o in (0, 1, 2)}
    for o in t.column("order").to_pylist():
        by_order[o] += 1
    assert by_order[0] >= 2  # summary rows survive pruning
    total = sum(
        n
        for g, n in zip(t.column("gram").to_pylist(), t.column("n").to_pylist())
        if g == "__total__"
    )
    assert total == sum(len([x for x in d.split() if x]) for d in DOCS)
    # pruned rows really gone
    assert all(
        n >= 3
        for o, n in zip(t.column("order").to_pylist(), t.column("n").to_pylist())
        if o > 0
    )


def test_vocab_cap_raises(ray_session):
    from jamie_ray.state.collect import EdgeCapExceeded

    with pytest.raises(EdgeCapExceeded):
        train_ngram_lm(_docs_ds(), vocab_cap=3)


def test_score_accepts_put_ref(ray_session):
    ds = _docs_ds()
    lm = train_ngram_lm(ds)
    ref = ray.put(lm)
    via_ref = {
        r["doc_id"]: r["logprob_micro"]
        for r in score_perplexity(ds, ref).take_all()
    }
    direct = {
        r["doc_id"]: r["logprob_micro"]
        for r in score_perplexity(ds, lm).take_all()
    }
    assert via_ref == direct


def test_ppl_buckets_ccnet_split(ray_session, tmp_path):
    """CCNet head/middle/tail: exact tercile thresholds over the scored
    perplexities, empty docs bucketed -1 with a null label."""
    import math

    from jamie_ray.functions.lm import ppl_buckets

    docs = DOCS * 3 + [""]  # enough rows for three buckets + one empty
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        )
    )
    lm = train_ngram_lm(ds)
    got = {
        r["doc_id"]: (r["ppl"], r["ppl_bucket"], r["ppl_bucket_label"])
        for r in ppl_buckets(ds, lm, spill_dir=str(tmp_path / "spill")).take_all()
    }
    assert len(got) == len(docs)

    # independent replay: rank-based thresholds, ties to the lower bucket
    ppls = sorted(p for p, _, _ in got.values() if not math.isnan(p))
    n = len(ppls)
    thr = [ppls[int(q * (n - 1))] for q in (1.0 / 3.0, 2.0 / 3.0)]
    labels = ("head", "middle", "tail")
    for doc_id, (p, b, lab) in got.items():
        if math.isnan(p):
            assert (b, lab) == (-1, None)
            continue
        expect = sum(1 for t in thr if t < p)
        assert b == expect, (doc_id, p, thr)
        assert lab == labels[expect]
    # every non-empty bucket label appears (terciles over 3x-repeated docs)
    assert {lab for _, _, lab in got.values() if lab} == set(labels)


def test_quantile_buckets_raises_on_nan_by_default(ray_session):
    from jamie_ray.functions.sketch import quantile_buckets

    ds = ray.data.from_arrow(
        pa.table({"v": pa.array([1.0, float("nan"), 2.0], pa.float64())})
    )
    with pytest.raises(Exception, match="NaN"):
        quantile_buckets(ds, "v", (0.5,)).take_all()


def test_quantile_buckets_label_arity(ray_session):
    from jamie_ray.functions.sketch import quantile_buckets

    ds = ray.data.from_arrow(pa.table({"v": pa.array([1.0, 2.0], pa.float64())}))
    with pytest.raises(ValueError, match="len\\(qs\\)\\+1"):
        quantile_buckets(ds, "v", (0.5,), labels=("just-one",))


def test_quantile_buckets_approx_method(ray_session):
    """method='approx' with k >= n chooses the SAME thresholds as the
    exact path (the reservoir is the whole column), so the tagged
    buckets agree row for row; a bogus method fails loudly."""
    from jamie_ray.functions.sketch import quantile_buckets

    rows = [{"doc_id": i, "v": float((i * 13) % 97)} for i in range(300)]
    exact = quantile_buckets(ray.data.from_items(rows), "v").take_all()
    approx = quantile_buckets(
        ray.data.from_items(rows), "v", method="approx", k=300
    ).take_all()
    e = {r["doc_id"]: r["bucket"] for r in exact}
    a = {r["doc_id"]: r["bucket"] for r in approx}
    assert e == a
    with pytest.raises(ValueError, match="exact\\|approx"):
        quantile_buckets(ray.data.from_items(rows), "v", method="nope")


def test_ppl_buckets_spill_dir_reuse_is_clean(ray_session, tmp_path):
    """A reused spill_dir is CLEARED before the scored rows land —
    stale rows from a previous corpus must not contaminate the
    thresholds or the output (code-review finding)."""
    from jamie_ray.functions.lm import ppl_buckets, train_ngram_lm

    big = ray.data.from_items(
        [{"doc_id": i, "text": f"alpha beta gamma d{i}"} for i in range(9)]
    )
    lm = train_ngram_lm(big)
    spill = str(tmp_path / "spill")
    first = ppl_buckets(big, lm, spill_dir=spill).take_all()
    assert len(first) == 9
    small = ray.data.from_items(
        [{"doc_id": i, "text": f"alpha beta gamma d{i}"} for i in range(3)]
    )
    second = ppl_buckets(small, lm, spill_dir=spill).take_all()
    assert len(second) == 3  # not 12: stale rows cleared
