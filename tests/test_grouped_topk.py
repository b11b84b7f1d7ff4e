"""Generic bounded top-k per group (``skew.grouped_topk``): exact
DuckDB window-function replay, tie determinism, null-key grouping,
null-value rejection, layout determinism, k >= group size."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray

from jamie_ray.functions.skew import grouped_topk


def _tbl(n=200, n_keys=7, seed=11):
    rng = np.random.default_rng(seed)
    keys = [f"k{int(i)}" for i in rng.integers(0, n_keys, n)]
    vals = rng.integers(0, 25, n).astype("int64")  # many ties
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "key": pa.array(keys, pa.string()),
            "value": pa.array(vals, pa.int64()),
        }
    )


_SQL = """
SELECT doc_id, key, value FROM (
  SELECT *, row_number() OVER (
    PARTITION BY key ORDER BY value {dir}, doc_id
  ) AS rn FROM t
) WHERE rn <= {k}
ORDER BY doc_id
"""


def _oracle(tbl, k, descending=True):
    con = duckdb.connect()
    con.register("t", tbl)
    out = con.execute(
        _SQL.format(k=k, dir="DESC" if descending else "ASC")
    ).fetch_arrow_table()
    con.close()
    return out


def _run(tbl, k, *, parts=4, **kw):
    ds = ray.data.from_arrow(tbl).repartition(parts)
    rows = grouped_topk(ds, "key", "value", k, **kw).take_all()
    if not rows:  # from_pylist([]) would lose the schema
        return tbl.slice(0, 0).select(["doc_id", "key", "value"])
    got = pa.Table.from_pylist(rows)
    return got.select(["doc_id", "key", "value"]).sort_by("doc_id")


def test_grouped_topk_matches_duckdb_window(ray_session):
    tbl = _tbl()
    for k in (1, 3, 10):
        exp = _oracle(tbl, k)
        got = _run(tbl, k)
        assert got.equals(exp.cast(got.schema)), k


def test_grouped_topk_ascending(ray_session):
    tbl = _tbl(seed=5)
    exp = _oracle(tbl, 2, descending=False)
    got = _run(tbl, 2, descending=False)
    assert got.equals(exp.cast(got.schema))


def test_grouped_topk_layout_determinism(ray_session):
    tbl = _tbl(seed=23)
    a = _run(tbl, 3, parts=2)
    b = _run(tbl, 3, parts=9)
    assert a.equals(b)


def test_grouped_topk_k_exceeds_group(ray_session):
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "key": pa.array(["a", "a", "b"], pa.string()),
            "value": pa.array([5, 7, 1], pa.int64()),
        }
    )
    got = _run(tbl, 10)
    assert got.num_rows == 3  # every row survives


def test_grouped_topk_null_keys_form_one_group(ray_session):
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "key": pa.array(["a", None, None, None], pa.string()),
            "value": pa.array([5, 9, 7, 8], pa.int64()),
        }
    )
    got = _run(tbl, 2)
    # null group keeps its top-2 (ids 2 and 4: values 9, 8)
    assert got.column("doc_id").to_pylist() == [1, 2, 4]


def test_grouped_topk_rejects_null_values(ray_session):
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "key": pa.array(["a", "a"], pa.string()),
            "value": pa.array([5, None], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    with pytest.raises(Exception, match="NULL"):
        grouped_topk(ds, "key", "value", 1).take_all()


def test_grouped_topk_rejects_bad_k(ray_session):
    ds = ray.data.from_arrow(_tbl(10))
    with pytest.raises(ValueError):
        grouped_topk(ds, "key", "value", 0)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=60),
    n_keys=st.integers(min_value=1, max_value=5),
    vmax=st.integers(min_value=1, max_value=4),  # tiny range -> many ties
    k=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_grouped_topk_hypothesis_vs_duckdb(ray_session, n, n_keys, vmax, k, seed):
    rng = np.random.default_rng(seed)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "key": pa.array(
                [f"k{int(i)}" for i in rng.integers(0, n_keys, n)], pa.string()
            ),
            "value": pa.array(
                rng.integers(0, vmax, n).astype("int64"), pa.int64()
            ),
        }
    )
    got = _run(tbl, k, parts=3)
    exp = _oracle(tbl, k)
    assert got.equals(exp.cast(got.schema))
