"""Column profiler (`functions/profile.py`): exact counts/nulls/
min-max/distinct vs a DuckDB cross-check, layout determinism, the KMV
estimate regime, and the CLI."""

import json

import duckdb
import pyarrow as pa
import pytest

import ray.data

from jamie_ray.functions.profile import profile_columns


def _table():
    return pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, None, 7, 8], pa.int64()),
            "lang": pa.array(
                ["en", "ja", None, "en", "de", "en", None, "ja"], pa.string()
            ),
            "score": pa.array(
                [0.5, 1.5, 2.5, None, 4.5, 5.5, 6.5, 7.5], pa.float64()
            ),
        }
    )


def test_profile_exact_vs_duckdb(ray_session):
    t = _table()
    got = {
        r["column"]: r
        for r in profile_columns(
            ray.data.from_arrow(t).repartition(3)
        ).to_pylist()
    }
    con = duckdb.connect()
    con.register("t", t)
    for c in ("doc_id", "lang", "score"):
        n, n_null, nd, mn, mx = con.execute(
            f"SELECT count(*), sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END), "
            f"count(DISTINCT {c}), min({c}), max({c}) FROM t"
        ).fetchone()
        r = got[c]
        assert r["n"] == n and r["n_null"] == n_null
        assert r["n_distinct"] == nd and r["distinct_exact"]
        assert r["min"] == str(mn) and r["max"] == str(mx)


def test_profile_layout_determinism(ray_session):
    t = _table()
    base = None
    for nblocks in (1, 4, 8):
        got = profile_columns(ray.data.from_arrow(t).repartition(nblocks)).to_pylist()
        if base is None:
            base = got
        assert got == base


def test_profile_kmv_estimate_regime(ray_session):
    n = 5000
    t = pa.table({"v": pa.array(list(range(n)), pa.int64())})
    (r,) = profile_columns(
        ray.data.from_arrow(t).repartition(5), kmv_k=64
    ).to_pylist()
    assert not r["distinct_exact"]
    assert abs(r["n_distinct"] - n) / n < 0.5  # k=64 KMV ~12.5% stderr


def test_profile_unknown_column_raises(ray_session):
    with pytest.raises(KeyError, match="nope"):
        profile_columns(ray.data.from_arrow(_table()), cols=["nope"])


def test_profile_cli(ray_session, tmp_path, capsys):
    import pyarrow.parquet as pq

    from jamie_ray.__main__ import main

    pq.write_table(_table(), tmp_path / "t.parquet")
    main(["profile", "--in", str(tmp_path / "t.parquet"), "--cols", "doc_id,lang"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    by = {r["column"]: r for r in out["columns"]}
    assert by["doc_id"]["n_null"] == 1 and by["lang"]["n_distinct"] == 3
