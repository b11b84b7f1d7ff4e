"""Sequence packing: independent token-stream replay oracle, docs
spanning sequences, layout determinism, presorted order, remainder
drop, fullness/partition invariants, empty input."""

import re

import pyarrow as pa
import pytest
import ray

from jamie_ray.functions.packing import pack_sequences

DOCS = {
    1: "a b c d e",          # 5 tokens
    2: "",                    # empty: occupies nothing
    3: "f g h",               # 3
    4: "i j k l m n o p q",   # 9 -> spans sequences at max_len=4
    5: "r",                   # 1
}


def _expected(docs_by_id, max_len, order=None, drop_remainder=False):
    """Independent replay: build the literal (doc, token) stream, slice
    it into sequences, and group contiguous runs — no span arithmetic
    shared with the implementation."""
    split = re.compile(r"[\t\n\f\r ]+")
    order = order if order is not None else sorted(docs_by_id)
    stream = []
    for did in order:
        toks = [t for t in split.split(docs_by_id[did]) if t]
        stream.extend((did, j) for j in range(len(toks)))
    n_seq_full = len(stream) // max_len
    chunks = [
        stream[k * max_len : (k + 1) * max_len]
        for k in range(n_seq_full + (0 if len(stream) % max_len == 0 else 1))
    ]
    if drop_remainder:
        chunks = chunks[:n_seq_full]
    rows = set()
    for k, chunk in enumerate(chunks):
        i = 0
        while i < len(chunk):
            did = chunk[i][0]
            j = i
            while j < len(chunk) and chunk[j][0] == did:
                j += 1
            rows.add((k, did, chunk[i][1], chunk[j - 1][1] + 1, i))
            i = j
    return rows


def _docs_ds(docs_by_id, order=None):
    order = order if order is not None else sorted(docs_by_id)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(order, pa.int64()),
                "text": pa.array([docs_by_id[i] for i in order], pa.string()),
            }
        )
    )


def _rows(ds):
    return {
        (r["seq_id"], r["doc_id"], r["tok_start"], r["tok_end"], r["seq_tok_start"])
        for r in ds.take_all()
    }


def test_matches_independent_replay(ray_session, tmp_path):
    got, n_seq = pack_sequences(
        _docs_ds(DOCS), 4, spill_dir=str(tmp_path / "s1")
    )
    want = _expected(DOCS, 4)
    assert _rows(got) == want
    # 18 tokens at max_len 4 -> 5 sequences incl. the partial tail
    assert n_seq == 5
    # doc 4 spans more than one sequence
    assert len({r for r in want if r[1] == 4}) > 1
    # empty doc 2 never appears
    assert not {r for r in want if r[1] == 2}


def test_layout_determinism(ray_session, tmp_path):
    a, _ = pack_sequences(_docs_ds(DOCS), 4, spill_dir=str(tmp_path / "a"))
    b, _ = pack_sequences(
        _docs_ds(DOCS).repartition(5), 4, spill_dir=str(tmp_path / "b")
    )
    assert _rows(a) == _rows(b)


def test_unsorted_input_packs_in_id_order(ray_session, tmp_path):
    shuffled = _docs_ds(DOCS, order=[4, 1, 5, 3, 2])
    got, _ = pack_sequences(shuffled, 4, spill_dir=str(tmp_path / "s"))
    assert _rows(got) == _expected(DOCS, 4)


def test_presorted_keeps_input_order(ray_session, tmp_path):
    order = [3, 5, 1, 4, 2]
    got, _ = pack_sequences(
        _docs_ds(DOCS, order=order),
        4,
        spill_dir=str(tmp_path / "p"),
        presorted=True,
    )
    assert _rows(got) == _expected(DOCS, 4, order=order)


def test_drop_remainder(ray_session, tmp_path):
    got, n_seq = pack_sequences(
        _docs_ds(DOCS), 4, spill_dir=str(tmp_path / "d"), drop_remainder=True
    )
    rows = _rows(got)
    assert rows == _expected(DOCS, 4, drop_remainder=True)
    assert n_seq == 4
    assert max(r[0] for r in rows) == 3


def test_fullness_and_partition_invariants(ray_session, tmp_path):
    got, n_seq = pack_sequences(
        _docs_ds(DOCS), 4, spill_dir=str(tmp_path / "f")
    )
    rows = sorted(_rows(got))
    per_seq = {}
    per_doc = {}
    for k, did, lo, hi, off in rows:
        per_seq[k] = per_seq.get(k, 0) + (hi - lo)
        per_doc.setdefault(did, []).append((lo, hi))
    # every sequence but the last is exactly full
    for k in range(n_seq - 1):
        assert per_seq[k] == 4
    assert 0 < per_seq[n_seq - 1] <= 4
    # per-doc spans partition [0, n_tokens)
    for did, spans in per_doc.items():
        spans.sort()
        assert spans[0][0] == 0
        for (l1, h1), (l2, h2) in zip(spans, spans[1:]):
            assert l2 == h1
        assert spans[-1][1] == len(DOCS[did].split())


def test_all_empty_leading_block(ray_session, tmp_path):
    """A spill file holding only empty docs emits zero rows — its
    empty doc_id array must keep int64 (bare inference gives null and
    breaks cross-block schema)."""
    docs = {i: "" for i in range(40)}
    docs.update({100 + i: f"word{i} alpha beta gamma" for i in range(4)})
    ds = _docs_ds(docs).repartition(8)
    got, n_seq = pack_sequences(ds, 4, spill_dir=str(tmp_path / "eb"))
    assert _rows(got) == _expected(docs, 4)
    assert n_seq == 4


def test_empty_string_id_corpus_keeps_id_type(ray_session, tmp_path):
    """The total==0 early return must carry the spill's real id type
    (string here), not a hardcoded int64."""
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["u1", "u2"], pa.string()),
                "text": pa.array(["", "  "], pa.string()),
            }
        )
    )
    got, n_seq = pack_sequences(ds, 4, spill_dir=str(tmp_path / "sid"))
    assert n_seq == 0
    tab = pa.Table.from_pylist(got.take_all(), schema=got.schema().base_schema)
    assert tab.schema.field("doc_id").type == pa.string()


def test_empty_and_validation(ray_session, tmp_path):
    empty = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    got, n_seq = pack_sequences(empty, 8, spill_dir=str(tmp_path / "e"))
    assert n_seq == 0
    assert got.count() == 0
    with pytest.raises(ValueError):
        pack_sequences(_docs_ds(DOCS), 0, spill_dir=str(tmp_path / "v"))
