"""Token-window exact-substring dedup (span_dedup): independent
brute-force replay oracle, keep-first winner, overlap merge,
self-repeats, short docs, layout determinism, cap."""

import re

import pyarrow as pa
import pytest
import ray

from jamie_ray.functions.dedup_docs import span_dedup

SHARED = "the license text is identical in every crawl of the site"


def _toks(t):
    return [x for x in re.split(r"[\t\n\f\r ]+", t) if x]


def _expected(docs_by_id, L):
    """Brute-force replay: window tuples -> occurrence lists -> cut
    sets. No hashing, no interval arithmetic shared with the impl."""
    occ = {}
    for d in sorted(docs_by_id):
        toks = _toks(docs_by_id[d])
        for p in range(len(toks) - L + 1):
            occ.setdefault(tuple(toks[p : p + L]), []).append((d, p))
    cuts = {d: set() for d in docs_by_id}
    for lst in occ.values():
        if len(lst) > 1:
            for d, p in lst[1:]:
                cuts[d].update(range(p, p + L))
    out = {}
    for d in docs_by_id:
        toks = _toks(docs_by_id[d])
        kept = [t for i, t in enumerate(toks) if i not in cuts[d]]
        out[d] = (" ".join(kept), len(toks), len(cuts[d]))
    return out


def _ds(docs_by_id):
    ids = sorted(docs_by_id)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([docs_by_id[i] for i in ids], pa.string()),
            }
        )
    )


def _got(ds_out):
    return {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_cut_tokens"])
        for r in ds_out.take_all()
    }


def test_shared_block_cut_from_second_doc(ray_session):
    docs = {
        1: f"alpha beta {SHARED} gamma delta",
        2: f"completely different lead in words {SHARED} and a different tail",
        3: "no shared content at all in this one document here",
    }
    got = _got(span_dedup(_ds(docs), min_len=4))
    want = _expected(docs, 4)
    assert got == want
    # doc 1 (first) keeps everything; doc 2 lost exactly the shared run
    assert got[1][2] == 0
    assert got[2][2] == len(_toks(SHARED))
    assert SHARED not in got[2][0]
    assert SHARED in got[1][0]
    assert got[3][2] == 0


def test_self_repeat_within_one_doc(ray_session):
    block = "one two three four five"
    docs = {7: f"{block} filler a b c d e {block} tail words here"}
    got = _got(span_dedup(_ds(docs), min_len=5))
    assert got == _expected(docs, 5)
    assert got[7][2] == 5  # second occurrence excised


def test_no_dups_and_short_docs(ray_session):
    docs = {
        1: "short doc",                       # < min_len: untouched
        2: "plenty of perfectly unique words in this longer document",
        3: "",
    }
    got = _got(span_dedup(_ds(docs), min_len=4))
    assert got == _expected(docs, 4)
    for d in docs:
        assert got[d][2] == 0
        assert got[d][0] == " ".join(_toks(docs[d]))


def test_layout_determinism(ray_session):
    docs = {
        i: (f"doc {i} unique preamble {SHARED} unique tail {i}") for i in range(8)
    }
    a = _got(span_dedup(_ds(docs), min_len=4))
    b = _got(span_dedup(_ds(docs).repartition(5), min_len=4))
    assert a == b
    # only doc 0 keeps the shared run
    assert SHARED in a[0][0]
    for i in range(1, 8):
        assert SHARED not in a[i][0]


def test_no_window_aliasing_across_separator_bytes(ray_session):
    """Tokens may contain \\x1f (RE2 whitespace is only [\\t\\n\\f\\r ]);
    the window join must stay injective — 'x a\\x1fb y z' and
    'x a b\\x1fy z' are DIFFERENT windows and neither may be cut."""
    docs = {
        1: "x a\x1fb y z lead padding words one",
        2: "x a b\x1fy z other padding words two",
    }
    got = _got(span_dedup(_ds(docs), min_len=4))
    assert got == _expected(docs, 4)
    assert got[1][2] == 0 and got[2][2] == 0


def test_cap_and_validation(ray_session):
    from jamie_ray.state.collect import EdgeCapExceeded

    docs = {i: f"same words repeated over and over again {i}" for i in range(6)}
    with pytest.raises(EdgeCapExceeded):
        span_dedup(_ds(docs), min_len=3, edge_cap=2).take_all()
    with pytest.raises(ValueError):
        span_dedup(_ds(docs), min_len=1)
