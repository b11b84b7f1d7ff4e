"""Driver-contract tests for __ray_entry__ and bench.py."""

import json
import os
import subprocess
import sys

import duckdb
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def test_entry_smoke(ray_session):
    res = entrymod.entry()
    n = res.num_rows if isinstance(res, pa.Table) else res.count()
    assert n > 0
    names = res.schema.names if isinstance(res, pa.Table) else res.schema().names
    assert {"subj_id", "pred", "obj_id", "n_sources"} <= set(names)


def test_every_oracle_has_a_query():
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    missing = set(osql) - set(qs)
    assert not missing, f"oracles without queries: {missing}"


def test_registration_fits_driver_window():
    """The graft driver checks only the FIRST 50 queries() entries, so
    the registry must never exceed 50 — overflowed entries would run
    with no correctness row (the r3 regression)."""
    qs = entrymod.queries()
    assert len(qs) <= 50, f"{len(qs)} registered queries; driver checks 50"


def test_all_oracle_sql_parses():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    # KG oracles read /tmp fixture files; ensure the sf0.01 corpus the
    # oracles point at exists (oracle_sql generates it eagerly)
    for name, sql in entrymod.oracle_sql().items():
        con.execute(f"EXPLAIN {sql}")


def test_graph_layout_independence(ray_session, tmp_path):
    """build_graph twice (fresh lineage each time) -> identical rows:
    dedup representatives and canonical ids must not depend on block
    layout or scheduling."""
    import pyarrow.parquet as pq

    from jamie_ray import fixtures
    from jamie_ray.pipelines import kg

    tables = fixtures.generate(60)
    pq.write_table(tables["pages"], tmp_path / "pages.parquet")
    p = str(tmp_path / "pages.parquet")

    def rows():
        tab = pa.Table.from_pylist(kg.build_graph(p).take_all())
        cols = sorted(tab.column_names)
        return sorted(zip(*[tab.column(c).to_pylist() for c in cols]))

    assert rows() == rows()


@pytest.mark.slow
def test_bench_json_contract():
    """bench.py must print exactly one valid JSON line with the
    driver-contract keys."""
    env = dict(os.environ, GRAFT_SF_DIR=SF, RAY_GRAFT_CPUS="4",
               JAMIE_BENCH_LAYERS="0")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=420, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    obj = json.loads(line)
    for key in ("metric", "value", "unit", "queries", "sf", "num_cpus"):
        assert key in obj, f"missing {key}"
    assert obj["unit"] == "sec" and obj["value"] > 0
