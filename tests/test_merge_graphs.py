"""merge-graphs CLI: provenance-summing union of materialized graph
outputs — same corpus merged with itself keeps the exact triple set,
doubles every n_sources, and preserves the sorted finalize order."""

import json

import pyarrow.parquet as pq

from jamie_ray.__main__ import main


def _run(capsys, *argv):
    main(list(argv))
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_merge_graphs_sums_provenance(ray_session, tmp_path, capsys):
    corpus = str(tmp_path / "corpus")
    _run(capsys, "synth", "--out", corpus, "--pages-n", "80")
    g1, g2 = str(tmp_path / "g1"), str(tmp_path / "g2")
    r1 = _run(capsys, "graph", "--pages", f"{corpus}/pages.parquet",
              "--out", g1, "--shards", "2")
    _run(capsys, "graph", "--pages", f"{corpus}/pages.parquet",
         "--out", g2, "--shards", "2")

    out = str(tmp_path / "merged")
    res = _run(capsys, "merge-graphs", "--graph", g1, "--graph", g2, "--out", out)
    assert res["n_graphs"] == 2
    assert res["n_triples"] == r1["n_triples"]  # same triple set, no dupes

    single = pq.read_table(f"{g1}/graph")
    merged = pq.read_table(out)
    key_cols = ["subj_id", "pred", "obj_id"]

    def by_key(t):
        ks = list(zip(*(t.column(c).to_pylist() for c in key_cols)))
        return dict(zip(ks, t.column("n_sources").to_pylist()))

    s, m = by_key(single), by_key(merged)
    assert set(s) == set(m)
    assert all(m[k] == 2 * s[k] for k in s)  # provenance counts summed
    # flagship finalize order preserved
    keys = list(zip(*(merged.column(c).to_pylist() for c in key_cols)))
    assert keys == sorted(keys)
