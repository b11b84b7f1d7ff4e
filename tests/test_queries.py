"""Driver-style conformance harness: every ``queries()`` entry with an
``oracle_sql()`` twin is run at sf0.01 and compared as an
order-insensitive row multiset with name-sorted columns — the same
contract the graft driver applies."""

import math

import duckdb
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _to_table(result) -> pa.Table:
    if isinstance(result, pa.Table):
        return result
    try:
        import pandas as pd

        if isinstance(result, pd.DataFrame):
            return pa.Table.from_pandas(result, preserve_index=False)
    except ImportError:
        pass
    return pa.Table.from_pylist(result.take_all())  # ray Dataset


def _norm_cell(v):
    # strict: no rounding — the driver's value-hash doesn't round either
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    return v


def _row_multiset(tab: pa.Table):
    cols = sorted(tab.column_names)
    data = [tab.column(c).to_pylist() for c in cols]
    return cols, sorted(
        tuple(_norm_cell(col[i]) for col in data) for i in range(tab.num_rows)
    )


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()
CHECKED = sorted(set(QUERIES) & set(ORACLES))


@pytest.mark.parametrize("name", CHECKED)
def test_query_matches_oracle(name, con, ray_session):
    got = _to_table(QUERIES[name](SF_DIR))
    exp = pa.Table.from_pandas(con.execute(ORACLES[name]).df(), preserve_index=False)
    got_cols, got_rows = _row_multiset(got)
    exp_cols, exp_rows = _row_multiset(exp)
    assert got_cols == exp_cols, f"{name}: columns differ: {got_cols} vs {exp_cols}"
    assert len(got_rows) == len(exp_rows), (
        f"{name}: row count {len(got_rows)} vs {len(exp_rows)}"
    )
    if got_rows != exp_rows:
        diff_g = [r for r in got_rows if r not in exp_rows][:3]
        diff_e = [r for r in exp_rows if r not in got_rows][:3]
        raise AssertionError(f"{name}: rows differ; got-only={diff_g} exp-only={diff_e}")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, ray_session):
    got = _to_table(QUERIES[name](SF_DIR))
    assert got.num_rows >= 0
    if name in (
        "docs_minhash_clusters",
        "docs_simhash_suite",
        "doc_winnow",
        "multimodal_suite",
    ):
        assert got.num_rows > 0, f"{name}: expected non-empty result"
