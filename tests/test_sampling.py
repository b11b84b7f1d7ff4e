"""Deterministic sampling / corpus mixing: edge rates, nesting,
layout determinism, salt independence, rate accuracy, mixture
epochs/tags, string ids, null rejection."""

import pyarrow as pa
import pytest
import ray

from jamie_ray.functions.sampling import hash_sample, mix_corpora

N = 1000


def _ids_ds(n=N):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array([f"doc {i}" for i in range(n)], pa.string()),
            }
        )
    )


def _kept(ds):
    return {r["doc_id"] for r in ds.take_all()}


def test_edge_rates(ray_session):
    ds = _ids_ds(50)
    assert len(_kept(hash_sample(ds, 1.0))) == 50
    assert len(_kept(hash_sample(ds, 0.0))) == 0
    with pytest.raises(ValueError):
        hash_sample(ds, 1.5)
    with pytest.raises(ValueError):
        hash_sample(ds, -0.1)


def test_nesting_and_rate_accuracy(ray_session):
    ds = _ids_ds()
    k2 = _kept(hash_sample(ds, 0.2, salt="s"))
    k5 = _kept(hash_sample(ds, 0.5, salt="s"))
    k8 = _kept(hash_sample(ds, 0.8, salt="s"))
    assert k2 <= k5 <= k8  # nested at one salt
    # binomial sanity (N=1000; ~4 sigma windows)
    assert 140 <= len(k2) <= 260
    assert 440 <= len(k5) <= 560
    assert 740 <= len(k8) <= 860


def test_layout_determinism_and_salt_independence(ray_session):
    ds = _ids_ds()
    a = _kept(hash_sample(ds, 0.4, salt="a"))
    a2 = _kept(hash_sample(ds.repartition(7), 0.4, salt="a"))
    assert a == a2
    b = _kept(hash_sample(ds, 0.4, salt="b"))
    assert a != b  # different family
    # overlap of two independent 0.4 samples ~ 0.16*N
    assert 60 <= len(a & b) <= 280


def test_string_ids_and_null_rejection(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([f"u{i}" for i in range(200)], pa.string())})
    )
    k = {r["doc_id"] for r in hash_sample(ds, 0.5).take_all()}
    assert 40 <= len(k) <= 160
    k2 = {
        r["doc_id"]
        for r in hash_sample(ds.repartition(3), 0.5).take_all()
    }
    assert k == k2
    bad = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1, None], pa.int64())})
    )
    with pytest.raises(Exception, match="nulls"):
        hash_sample(bad, 0.5).take_all()


def test_mix_corpora_epochs_and_tags(ray_session):
    a = _ids_ds(100)
    b = _ids_ds(100)
    mixed = mix_corpora([("a", a, 2.5), ("b", b, 0.5)])
    rows = mixed.take_all()
    by = {}
    for r in rows:
        by.setdefault((r["source"], r["epoch"]), set()).add(r["doc_id"])
    # two FULL epochs of a: identical complete id sets
    assert by[("a", 0)] == by[("a", 1)] == set(range(100))
    # fractional epoch 2 of a: proper subset, ~50
    assert by[("a", 2)] < set(range(100))
    assert 20 <= len(by[("a", 2)]) <= 80
    # b: single fractional epoch 0
    assert set(e for s, e in by if s == "b") == {0}
    assert 20 <= len(by[("b", 0)]) <= 80
    # re-weighting a never perturbs b's selection (independent salts)
    again = mix_corpora([("a", a, 0.1), ("b", b, 0.5)]).take_all()
    b_again = {r["doc_id"] for r in again if r["source"] == "b"}
    assert b_again == by[("b", 0)]


def test_mix_corpora_validation(ray_session):
    ds = _ids_ds(10)
    with pytest.raises(ValueError):
        mix_corpora([])
    with pytest.raises(ValueError):
        mix_corpora([("a", ds, -1.0)])
    with pytest.raises(ValueError):
        mix_corpora([("a", ds, 0.0)])


def _lang_ds(n=300):
    langs = ["en", "ja", "de"]
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "lang": pa.array([langs[i % 3] for i in range(n)], pa.string()),
                "text": pa.array([f"doc {i}" for i in range(n)], pa.string()),
            }
        )
    )


def test_group_sample_counts_and_selection(ray_session):
    from jamie_ray.functions.sampling import group_sample
    from jamie_ray.hashing import stable_hash64, uniform01
    import numpy as np

    ds = _lang_ds()
    rows = group_sample(ds, 7, "lang", salt="s").take_all()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    assert {len(v) for v in by_lang.values()} == {7}
    # exact selection: the 7 smallest uniforms per group (same public
    # hash family as hash_sample)
    seed = stable_hash64("group_sample", "s") & ((1 << 32) - 1)
    u = uniform01(np.arange(300, dtype=np.uint64), seed)
    langs = ["en", "ja", "de"]
    for li, lang in enumerate(langs):
        ids = [i for i in range(300) if i % 3 == li]
        want = set(sorted(ids, key=lambda i: (u[i], i))[:7])
        assert by_lang[lang] == want, lang
    # full original rows survive the filter pass
    assert all("text" in r for r in rows)


def test_group_sample_nested_and_small_groups(ray_session):
    from jamie_ray.functions.sampling import group_sample

    ds = _lang_ds(9)  # 3 docs per lang
    all_rows = group_sample(ds, 10, "lang").take_all()
    assert len(all_rows) == 9  # k > group size keeps everything
    k2 = {r["doc_id"] for r in group_sample(_lang_ds(), 2, "lang", salt="x").take_all()}
    k5 = {r["doc_id"] for r in group_sample(_lang_ds(), 5, "lang", salt="x").take_all()}
    assert k2 <= k5
    a = {r["doc_id"] for r in group_sample(_lang_ds(), 4, "lang").take_all()}
    b = {
        r["doc_id"]
        for r in group_sample(_lang_ds().repartition(7), 4, "lang").take_all()
    }
    assert a == b


def test_group_sample_id_replicated_across_groups(ray_session):
    """An id appearing under several keys keeps only the rows of the
    groups where it won — membership is (key, id), not bare id."""
    from jamie_ray.functions.sampling import group_sample

    rows = [
        {"doc_id": i, "lang": lang, "text": f"{lang} {i}"}
        for i in range(60)
        for lang in ("en", "ja", "de")
    ]
    ds = ray.data.from_items(rows)
    out = group_sample(ds, 5, "lang", salt="r").take_all()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    assert {len(v) for v in by_lang.values()} == {5}
    assert len(out) == 15
    # same id space per group -> same per-id uniforms -> identical
    # winner ids per group (the expected degenerate case)
    assert (
        sorted(by_lang["en"]) == sorted(by_lang["ja"]) == sorted(by_lang["de"])
    )


def test_group_sample_validation_and_cap(ray_session):
    from jamie_ray.functions.sampling import group_sample
    from jamie_ray.state.collect import EdgeCapExceeded

    with pytest.raises(ValueError):
        group_sample(_lang_ds(), 0, "lang")
    with pytest.raises(EdgeCapExceeded):
        group_sample(_lang_ds(), 50, "lang", edge_cap=10).take_all()


def test_mix_corpora_rejects_pretagged_input(ray_session):
    """Re-mixing a mixture would append duplicate source/epoch columns
    and silently corrupt the tags — must fail loudly instead."""
    mixed = mix_corpora([("a", _ids_ds(10), 1.0)])
    with pytest.raises(Exception, match="source"):
        mix_corpora([("b", mixed, 1.0)]).take_all()


def _shuffle_order(ds, salt):
    from jamie_ray.functions.sampling import deterministic_shuffle

    rows = deterministic_shuffle(ds, salt=salt).take_all()
    return [r["doc_id"] for r in rows]


def test_deterministic_shuffle_layout_invariant(ray_session):
    """Same salt => bit-identical ORDER on any block layout; the output
    is a permutation of the input with payload intact."""
    ds1 = _ids_ds(200)
    ds2 = _ids_ds(200).repartition(7)
    o1, o2 = _shuffle_order(ds1, "e1"), _shuffle_order(ds2, "e1")
    assert o1 == o2
    assert sorted(o1) == list(range(200))
    assert o1 != list(range(200))  # it actually reorders
    rows = {
        r["doc_id"]: r["text"]
        for r in __import__("jamie_ray.functions.sampling", fromlist=["x"])
        .deterministic_shuffle(_ids_ds(200), salt="e1")
        .take_all()
    }
    assert rows[7] == "doc 7"
    assert "__shuffle_key" not in _ids_ds(1).take_all()[0]


def test_deterministic_shuffle_salts_independent(ray_session):
    o1, o2 = _shuffle_order(_ids_ds(200), "e1"), _shuffle_order(_ids_ds(200), "e2")
    assert o1 != o2
    assert sorted(o1) == sorted(o2)


def test_deterministic_shuffle_rejects_key_collision(ray_session):
    from jamie_ray.functions.sampling import deterministic_shuffle

    ds = ray.data.from_items(
        [{"doc_id": 1, "__shuffle_key": 0.5}]
    )
    with pytest.raises(Exception, match="__shuffle_key"):
        deterministic_shuffle(ds).take_all()


def test_shuffle_cli(ray_session, tmp_path, capsys):
    import json as _json

    import pyarrow.parquet as pq

    from jamie_ray.__main__ import main

    src = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(30), pa.int64()),
                "text": pa.array([f"d{i}" for i in range(30)], pa.string()),
            }
        ),
        str(src),
    )
    out = str(tmp_path / "shuffled")
    main(["shuffle", "--docs", str(src), "--out", out, "--salt", "e1"])
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["n_rows"] == 30 and res["command"] == "shuffle"
    t = pq.read_table(out)
    ids = t.column("doc_id").to_pylist()
    assert sorted(ids) == list(range(30)) and ids != list(range(30))
    assert "__shuffle_key" not in t.column_names
