"""Sliding-window passage splitter (``text_analysis.passage_split``):
exact DuckDB replay (same integer-ceil start rule, same RE2 token
split), hand-built edge cases, coverage/overlap invariants, a
hypothesis sweep vs DuckDB, and the Dataset wrapper."""

import duckdb
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from jamie_ray.functions.text_analysis import (
    passage_split,
    passage_split_batch,
    ws_tokens,
)

# integer-exact twin of the start rule: ceil(max(n-W,0)/S)+1 passages,
# starts at pid*S, last passage may be short; token-free docs emit none
_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                     x -> x <> '') AS t
  FROM t
), sized AS (
  SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0
), p AS (
  SELECT doc_id, t, n,
         unnest(generate_series(
           0, (greatest(n - {W}, 0) + {S} - 1) // {S}, 1)) AS pid
  FROM sized
)
SELECT doc_id,
       pid AS passage_id,
       pid * {S} AS start_tok,
       least({W}, n - pid * {S}) AS n_tok,
       array_to_string(
         t[pid * {S} + 1 : pid * {S} + least({W}, n - pid * {S})],
         ' ') AS passage_text
FROM p
ORDER BY doc_id, passage_id
"""


def _run_sql(tbl: pa.Table, window: int, stride: int) -> pa.Table:
    con = duckdb.connect()
    con.register("t", tbl)
    out = con.execute(_SQL.format(W=window, S=stride)).fetch_arrow_table()
    con.close()
    return out


def _assert_match(tbl: pa.Table, window: int, stride: int) -> None:
    got = passage_split_batch(tbl, window=window, stride=stride)
    got = got.sort_by([("doc_id", "ascending"), ("passage_id", "ascending")])
    exp = _run_sql(tbl, window, stride)
    assert got.num_rows == exp.num_rows
    for col in ("doc_id", "passage_id", "start_tok", "n_tok", "passage_text"):
        assert got.column(col).to_pylist() == exp.column(col).to_pylist(), col


def _docs(texts) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def test_passages_match_duckdb_basic():
    tbl = _docs(
        [
            "a b c d e f g h i j",  # multiple full windows + tail
            "one two three",  # shorter than the window
            None,  # null -> no passages
            "",  # empty -> no passages
            " \t\n  ",  # all-blank -> no passages
            "x",  # single token
            "w1  w2\tw3\nw4   w5 w6 w7",  # mixed whitespace runs
        ]
    )
    _assert_match(tbl, window=4, stride=2)
    _assert_match(tbl, window=3, stride=3)  # contiguous, no overlap
    _assert_match(tbl, window=100, stride=1)  # window >> every doc


def test_passages_exact_boundary():
    # (n - window) % stride == 0: the last window is exactly full and
    # must not be followed by an empty one (the stride>window hazard)
    tbl = _docs(["t0 t1 t2 t3 t4 t5 t6 t7"])  # n=8, W=4, S=2 -> starts 0,2,4
    got = passage_split_batch(tbl, window=4, stride=2)
    assert got.column("start_tok").to_pylist() == [0, 2, 4]
    assert got.column("n_tok").to_pylist() == [4, 4, 4]
    assert (got.column("passage_text").to_pylist()
            == ["t0 t1 t2 t3", "t2 t3 t4 t5", "t4 t5 t6 t7"])
    _assert_match(tbl, window=4, stride=2)


def test_passages_coverage_and_overlap_invariants():
    texts = ["w%d" % i for i in range(23)]
    tbl = _docs([" ".join(texts)])
    got = passage_split_batch(tbl, window=5, stride=3)
    spans = list(
        zip(got.column("start_tok").to_pylist(), got.column("n_tok").to_pylist())
    )
    # every token covered, consecutive starts exactly stride apart,
    # only the last passage may be short
    covered = set()
    for s, ln in spans:
        assert 1 <= ln <= 5
        covered.update(range(s, s + ln))
    assert covered == set(range(23))
    starts = [s for s, _ in spans]
    assert starts == list(range(0, 3 * len(starts), 3))
    assert all(ln == 5 for _, ln in spans[:-1])


def test_passages_stride_gap_rejected():
    tbl = _docs(["a b c"])
    with pytest.raises(ValueError):
        passage_split_batch(tbl, window=2, stride=5)
    with pytest.raises(ValueError):
        passage_split_batch(tbl, window=2, stride=0)


def test_passages_empty_batch_schema():
    got = passage_split_batch(_docs([]), window=4, stride=2)
    assert got.num_rows == 0
    assert got.schema.names == [
        "doc_id", "passage_id", "start_tok", "n_tok", "passage_text",
    ]
    assert got.schema.field("passage_text").type == pa.string()


def test_passages_text_is_token_rejoin():
    # passage text is the ws_tokens slice joined by single spaces
    raw = "  a\t\tb \n c  d "
    tbl = _docs([raw])
    got = passage_split_batch(tbl, window=3, stride=2)
    toks = ws_tokens(raw)
    exp = [" ".join(toks[s : s + ln]) for s, ln in zip(
        got.column("start_tok").to_pylist(), got.column("n_tok").to_pylist()
    )]
    assert got.column("passage_text").to_pylist() == exp


@settings(max_examples=40, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from(list("ab \t\n\x0c\r.")), max_size=40
        ),
        max_size=8,
    ),
    window=st.integers(min_value=1, max_value=6),
    over=st.integers(min_value=0, max_value=5),
)
def test_passages_hypothesis_vs_duckdb(texts, window, over):
    stride = max(1, window - over)
    _assert_match(_docs(texts), window=window, stride=stride)


def test_passage_split_dataset_wrapper(ray_session):
    import ray.data

    tbl = _docs(["a b c d e f", "x y", None])
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = passage_split(ds, window=3, stride=2).take_all()
    got = sorted((r["doc_id"], r["passage_id"], r["passage_text"]) for r in out)
    assert got == [
        (0, 0, "a b c"),
        (0, 1, "c d e"),
        (0, 2, "e f"),
        (1, 0, "x y"),
    ]


def test_cli_passages_roundtrip(tmp_path, ray_session):
    import json as _json
    import subprocess
    import sys

    import pyarrow.parquet as pq

    src = tmp_path / "docs.parquet"
    pq.write_table(_docs(["a b c d e f", "x y", None]), src)
    out = tmp_path / "out"
    r = subprocess.run(
        [
            sys.executable, "-m", "jamie_ray", "passages",
            "--docs", str(src), "--out", str(out),
            "--window", "3", "--stride", "2",
        ],
        capture_output=True,
        text=True,
        check=True,
    )
    info = _json.loads(r.stdout.strip().splitlines()[-1])
    assert info["n_passages"] == 4
    got = pq.read_table(out).to_pylist()
    got = sorted((x["doc_id"], x["passage_id"], x["passage_text"]) for x in got)
    assert got == [
        (0, 0, "a b c"),
        (0, 1, "c d e"),
        (0, 2, "e f"),
        (1, 0, "x y"),
    ]
