"""Benchmark decontamination: planted-overlap flags, hashed-path
equivalence, gram convention, cap guard rail."""

import pyarrow as pa
import pytest
import ray

from jamie_ray.functions.decontam import (
    benchmark_ngram_set,
    decontaminate,
    doc_grams,
)
from jamie_ray.state.collect import EdgeCapExceeded

BENCH_DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
]
CORPUS = [
    # id, text, expected contaminated at n=3 (shares a bench 3-gram?)
    (1, "he saw the quick brown fox yesterday", 1),  # "the quick brown"
    (2, "quick brown dogs are rare", 0),
    (3, "with five dozen reasons to stay", 1),  # "with five dozen"
    (4, "completely unrelated sentence here", 0),
    (5, "", 0),  # empty: zero grams, never contaminated
    (6, "pack my box", 1),  # short doc -> single whole-doc gram, which
    #    is also a full 3-gram of the 8-token bench doc -> contaminated
]
_EXPECTED = {c[0]: c[2] for c in CORPUS}


def _corpus_ds():
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([c[0] for c in CORPUS], pa.int64()),
                "text": pa.array([c[1] for c in CORPUS], pa.string()),
            }
        )
    )


def _bench_ds():
    return ray.data.from_arrow(pa.table({"text": pa.array(BENCH_DOCS)}))


def test_doc_grams_convention():
    assert doc_grams(None) == set()
    assert doc_grams("") == set()
    assert doc_grams("   ") == set()
    assert doc_grams("a b", n=3) == {"a b"}  # <= n tokens: whole doc
    assert doc_grams("a b c", n=3) == {"a b c"}
    assert doc_grams("a b c d", n=3) == {"a b c", "b c d"}
    # RE2 whitespace only: U+3000 is NOT a separator
    assert doc_grams("a　b", n=3) == {"a　b"}


def test_benchmark_ngram_set(ray_session):
    grams = benchmark_ngram_set(_bench_ds(), n=3)
    assert "the quick brown" in grams
    assert "pack my box" in grams
    assert "quick brown dogs" not in grams
    # distinct across blocks (both docs share no 3-gram, so sum holds)
    assert len(grams) == (9 - 2) + (8 - 2)


def test_decontaminate_planted(ray_session):
    grams = benchmark_ngram_set(_bench_ds(), n=3)
    out = pa.Table.from_pylist(decontaminate(_corpus_ds(), grams, n=3).take_all())
    flags = dict(
        zip(out.column("doc_id").to_pylist(), out.column("contaminated").to_pylist())
    )
    assert flags == _EXPECTED
    hits = dict(zip(out.column("doc_id").to_pylist(), out.column("n_hits").to_pylist()))
    # doc 1 shares TWO bench grams: "the quick brown", "quick brown fox"
    assert hits[1] == 2 and hits[4] == 0 and hits[5] == 0
    assert "text" not in out.column_names  # text never leaves the stage


def _rows(t: pa.Table):
    cols = sorted(t.column_names)
    return sorted(map(tuple, zip(*[t.column(c).to_pylist() for c in cols])))


def test_hashed_path_matches_exact(ray_session):
    grams = benchmark_ngram_set(_bench_ds(), n=3)
    exact = pa.Table.from_pylist(
        decontaminate(_corpus_ds(), grams, n=3, hashed=False).take_all()
    )
    hashed = pa.Table.from_pylist(
        decontaminate(_corpus_ds(), grams, n=3, hashed=True).take_all()
    )
    assert _rows(exact) == _rows(hashed)


def test_hashed_accepts_precomputed_int_hashes(ray_session):
    import numpy as np

    from jamie_ray.functions.decontam import gram_hash

    grams = benchmark_ngram_set(_bench_ds(), n=3)
    # both plain ints and np.uint64 (e.g. hash_str_array output) work
    as_ints = {gram_hash(g) for g in grams}
    as_np = {np.uint64(h) for h in as_ints}
    exact = pa.Table.from_pylist(
        decontaminate(_corpus_ds(), grams, n=3, hashed=False).take_all()
    )
    for bench in (as_ints, as_np):
        got = pa.Table.from_pylist(
            decontaminate(_corpus_ds(), bench, n=3, hashed=True).take_all()
        )
        assert _rows(got) == _rows(exact)


def test_objectref_benchmark_reused(ray_session):
    ref = ray.put(benchmark_ngram_set(_bench_ds(), n=3))
    out = pa.Table.from_pylist(decontaminate(_corpus_ds(), ref, n=3).take_all())
    assert out.num_rows == len(CORPUS)


def test_benchmark_cap_guard_rail(ray_session):
    with pytest.raises(EdgeCapExceeded):
        benchmark_ngram_set(_bench_ds(), n=3, cap=3)


def test_cli_decontam(ray_session, tmp_path, capsys):
    import glob
    import json

    import pyarrow.parquet as pq

    from jamie_ray.__main__ import main

    # non-default text column: regression for the benchmark pass
    # dropping --text-col (review finding)
    docs = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([c[0] for c in CORPUS], pa.int64()),
                "body": pa.array([c[1] for c in CORPUS], pa.string()),
            }
        ),
        docs,
    )
    bench = str(tmp_path / "bench.parquet")
    pq.write_table(pa.table({"body": pa.array(BENCH_DOCS)}), bench)

    out = str(tmp_path / "flags")
    main(
        ["decontam", "--docs", docs, "--bench", bench, "--out", out,
         "--n", "3", "--text-col", "body"]
    )
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_docs"] == len(CORPUS)
    assert stats["n_contaminated"] == sum(_EXPECTED.values())
    flags = {
        r["doc_id"]: r["contaminated"]
        for f in sorted(glob.glob(f"{out}/*.parquet"))
        for r in pq.read_table(f).to_pylist()
    }
    assert flags == _EXPECTED


def test_hashed_accepts_lenless_iterable(ray_session):
    """decontaminate(hashed=True) advertises Iterable[str]; a len-less
    generator must work (r4 ADVICE: np.fromiter(count=len(...)) threw
    TypeError)."""
    import pyarrow as pa

    from jamie_ray.functions.decontam import decontaminate, gram_hash

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(
                    ["secret bench gram here today", "totally clean text row"],
                    pa.string(),
                ),
            }
        )
    )
    grams = (g for g in [gram_hash("secret bench gram")])  # generator
    out = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(docs, grams, n=3, hashed=True).take_all()
    }
    assert out == {1: 1, 2: 0}
