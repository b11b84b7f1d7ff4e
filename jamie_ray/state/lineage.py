"""Manifest + lineage records for resumable runs (SURVEY.md §4).

Every completed shard appends one JSON line to ``manifest.jsonl`` in the
output directory; resume = read the manifest, skip finished shards at
the input filter. Writes are atomic (tmp + rename) so a killed run never
leaves a half-written manifest entry.
"""

from __future__ import annotations

import json
import os
import tempfile


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest.jsonl")


def read_manifest(out_dir: str) -> dict[int, dict]:
    """shard -> lineage record for all completed shards."""
    path = manifest_path(out_dir)
    if not os.path.exists(path):
        return {}
    records: dict[int, dict] = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            records[int(rec["shard"])] = rec
    return records


def append_manifest(out_dir: str, record: dict) -> None:
    """Atomically append one lineage record."""
    os.makedirs(out_dir, exist_ok=True)
    path = manifest_path(out_dir)
    existing = ""
    if os.path.exists(path):
        with open(path, "r", encoding="utf-8") as f:
            existing = f.read()
    fd, tmp = tempfile.mkstemp(dir=out_dir, prefix=".manifest-")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            f.write(existing)
            f.write(json.dumps(record, sort_keys=True) + "\n")
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
