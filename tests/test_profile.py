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


def test_corpus_report_values_vs_duckdb(ray_session):
    """The card's integer aggregates recompute exactly in DuckDB; the
    language histogram matches the per-doc heuristic; quantiles are
    exact in the k >= n regime."""
    import duckdb
    import ray.data

    from jamie_ray.functions.profile import corpus_report
    from jamie_ray.functions.text_analysis import (
        lang_id_batch,
        token_count_batch,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "a b c",
        "",
        None,
        "こんにちは 世界 です こんにちは 世界 です",
        "short one.",
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    rep = corpus_report(ds)

    assert rep["n_docs"] == len(texts)
    con = duckdb.connect()
    con.register("t", tbl)
    sum_tokens = con.execute(
        r"SELECT coalesce(sum(len(list_filter(string_split_regex("
        r"coalesce(text,''), '\s+'), x -> x <> ''))), 0) FROM t"
    ).fetchone()[0]
    assert rep["text"]["sum_tokens"] == sum_tokens
    assert rep["text"]["mean_tokens_micro"] == sum_tokens * 1_000_000 // len(texts)

    # language histogram == per-doc kernel counts
    preds = lang_id_batch(tbl).column("lang_pred").to_pylist()
    want = {"ja": 0, "en": 0, "other": 0, "empty": 0}
    for p_ in preds:
        want[p_ or "empty"] += 1
    assert rep["text"]["lang_counts"] == want

    # k >= n: the reservoir holds every row, quantiles are exact
    counts = sorted(
        c or 0 for c in token_count_batch(tbl).column("n_tokens").to_pylist()
    )
    q = rep["text"]["token_count_quantiles_approx"]
    assert q["p50"] == counts[(len(counts) - 1) // 2]
    assert q["p99"] == counts[-1] or q["p99"] == counts[int(0.99 * (len(counts) - 1))]

    # column profile present for both columns
    cols = {r["column"]: r for r in rep["columns"]}
    assert cols["text"]["n_null"] == 1
    assert cols["doc_id"]["n_distinct"] == len(texts)

    # layout determinism
    rep2 = corpus_report(ray.data.from_arrow(tbl).repartition(6))
    assert rep2 == rep


def test_corpus_report_empty(ray_session):
    import ray.data

    from jamie_ray.functions.profile import corpus_report

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
            }
        )
    )
    rep = corpus_report(ds)
    assert rep["n_docs"] == 0
    assert rep["text"]["token_count_quantiles_approx"] == {}
    assert rep["text"]["sum_tokens"] == 0


def test_cli_report(tmp_path, ray_session):
    import json as _json
    import subprocess
    import sys

    import pyarrow.parquet as pq

    src = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["hello world today", "another page here"], pa.string()),
            }
        ),
        src,
    )
    out = tmp_path / "card.json"
    r = subprocess.run(
        [
            sys.executable, "-m", "jamie_ray", "report",
            "--docs", str(src), "--out", str(out),
        ],
        capture_output=True,
        text=True,
        check=True,
    )
    info = _json.loads(r.stdout.strip().splitlines()[-1])
    assert info["n_docs"] == 2
    card = _json.loads(out.read_text())
    assert card["text"]["sum_tokens"] == 6
    assert card["text"]["lang_counts"]["en"] == 2


def test_corpus_report_top_domains(ray_session):
    import ray.data

    from jamie_ray.functions.profile import corpus_report

    rows = []
    for i in range(40):
        dom = "big.example.org" if i < 25 else f"site{i}.example.org"
        rows.append(
            {
                "doc_id": i,
                "text": f"document number {i} with several ordinary words",
                "url": f"https://{dom}/p{i}",
            }
        )
    rows.append({"doc_id": 99, "text": "no url row", "url": None})
    ds = ray.data.from_items(rows).repartition(4)
    rep = corpus_report(ds, url_col="url", domain_phi=0.25)
    # only the dominant domain clears phi=0.25 of 41 rows (count 25)
    assert rep["top_domains"] == [{"domain": "big.example.org", "n": 25}]
    # url_col omitted -> no section
    rep2 = corpus_report(ds)
    assert "top_domains" not in rep2
