"""Evaluator parity tests — hand-counted fixtures per TupleEvaluator
(/root/reference/clinical_eval.py:54-108)."""

import pytest

from jamie_ray import evalx


def test_calculate_f1_guards():
    assert evalx.calculate_f1(0, 0, 0) == (0.0, 0.0, 0.0)
    p, r, f1 = evalx.calculate_f1(2, 1, 1)
    assert (p, r) == (2 / 3, 2 / 3)
    assert f1 == pytest.approx(2 / 3)


def test_match_tuples_multiset_removal():
    gold = [("a", "x", "r1"), ("a", "x", "r1"), ("b", "y", "r2")]
    pred = [("a", "x", "r1"), ("c", "z", "r1")]
    counts = evalx.match_tuples(gold, pred)
    # one of the two duplicate golds matches (removal!), one is a fn
    assert counts["r1"] == [1, 1, 1]
    assert counts["r2"] == [0, 0, 1]


def test_match_tuples_skips_n_o_classes():
    gold = [("a", "x", "N"), ("b", "y", "O"), ("c", "z", "_")]
    pred = [("q", "w", "OO")]
    assert evalx.match_tuples(gold, pred) == {}


def test_match_tuples_rel_col():
    gold = [("r1", "a"), ("r2", "b")]
    pred = [("r1", "a")]
    counts = evalx.match_tuples(gold, pred, rel_col=0)
    assert counts["r1"] == [1, 0, 0]
    assert counts["r2"] == [0, 0, 1]


def test_evaluate_datasets_distributed(ray_session):
    import ray.data

    gold = ray.data.from_items(
        [
            {"url": "u1", "chunk_id": 0, "subj": "a", "obj": "b", "pred": "r1"},
            {"url": "u1", "chunk_id": 0, "subj": "a", "obj": "c", "pred": "r2"},
            {"url": "u2", "chunk_id": 1, "subj": "d", "obj": "e", "pred": "r1"},
        ]
    )
    pred = ray.data.from_items(
        [
            {"url": "u1", "chunk_id": 0, "subj": "a", "obj": "b", "pred": "r1"},
            # wrong sentence — must NOT match u2's gold (grouping matters)
            {"url": "u1", "chunk_id": 0, "subj": "d", "obj": "e", "pred": "r1"},
        ]
    )
    res = evalx.evaluate_triples(gold, pred)
    assert res["counts"] == {"tps": 1, "fps": 1, "fns": 2}
    p, r, f1 = res["micro"]
    assert p == 0.5 and r == pytest.approx(1 / 3)
    assert res["per_class"]["r1"][3:] == (1, 1, 1)
    assert res["per_class"]["r2"][3:] == (0, 0, 1)


def test_self_evaluation_is_perfect(ray_session):
    import ray.data

    rows = [
        {"url": "u", "chunk_id": i % 3, "subj": f"s{i}", "obj": "o", "pred": "r"}
        for i in range(20)
    ]
    ds1 = ray.data.from_items(rows)
    ds2 = ray.data.from_items(list(reversed(rows)))
    res = evalx.evaluate_triples(ds1, ds2)
    assert res["micro"] == (1.0, 1.0, 1.0)
