"""compact CLI: rewrite a parquet dir at a target file size —
row-preserving, value-preserving, file count derived from bytes."""

import json

import pyarrow as pa
import pyarrow.parquet as pq

from jamie_ray.__main__ import main


def _run(capsys, *argv):
    main(list(argv))
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_compact_merges_tiny_files(ray_session, tmp_path, capsys):
    src = tmp_path / "tiny"
    src.mkdir()
    for i in range(20):  # 20 tiny files
        pq.write_table(
            pa.table({"doc_id": [i * 10 + j for j in range(10)],
                      "text": [f"doc {i}-{j}" for j in range(10)]}),
            src / f"part-{i:03d}.parquet",
        )
    out = str(tmp_path / "compacted")
    res = _run(capsys, "compact", "--in", str(src), "--out", out, "--target-mb", "256")
    assert res["n_rows"] == 200
    assert res["n_files_target"] == 1  # 20 tiny files fit one 256 MiB target
    t = pq.read_table(out)
    assert t.num_rows == 200
    assert sorted(t.column("doc_id").to_pylist()) == list(range(200))
    import os

    n_files = sum(
        f.endswith(".parquet") for f in os.listdir(out)
    )
    assert n_files == 1
