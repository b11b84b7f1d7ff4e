"""Arrow schemas for every logical table in the engine (SURVEY.md §1.3).

One logical table = one ``ray.data.Dataset``; all per-row state is
columns (never list position), so every stage is shuffle-safe and
resumable. The ``pages`` shape is pinned by BASELINE.json's input hint.
"""

from __future__ import annotations

import pyarrow as pa

PAGES = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

# chunker output: one row per trunk (reference "trunk" = sentences packed
# under the subword budget, utils.py:700-722)
CHUNKS = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("chunk_id", pa.int32()),
        pa.field("text", pa.string()),
        pa.field("n_subwords", pa.int32()),
    ]
)

# scorer output: the Arrow translation of the multihead-CoNLL row
# (utils.py:835-840) — nested per-chunk columns, never one row per token
TAGGED_CHUNKS = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("chunk_id", pa.int32()),
        pa.field("tokens", pa.list_(pa.string())),
        pa.field("ner", pa.list_(pa.string())),
        pa.field("mod", pa.list_(pa.string())),
        pa.field("rels", pa.list_(pa.list_(pa.string()))),
        pa.field("heads", pa.list_(pa.list_(pa.int32()))),
    ]
)

# assembled raw triples (mention level, pre-linking)
TRIPLES = pa.schema(
    [
        pa.field("subj", pa.string()),
        pa.field("pred", pa.string()),
        pa.field("obj", pa.string()),
        pa.field("subj_type", pa.string()),
        pa.field("obj_type", pa.string()),
        pa.field("subj_mod", pa.string()),
        pa.field("url", pa.string()),
        pa.field("chunk_id", pa.int32()),
    ]
)

# post-linking: canonical entity ids + canonical surfaces
LINKED_TRIPLES = TRIPLES.append(pa.field("subj_id", pa.int64())).append(
    pa.field("obj_id", pa.int64())
)

# final deduplicated graph rows
GRAPH_TRIPLES = pa.schema(
    [
        pa.field("subj_id", pa.int64()),
        pa.field("pred", pa.string()),
        pa.field("obj_id", pa.int64()),
        pa.field("subj", pa.string()),
        pa.field("obj", pa.string()),
        pa.field("subj_type", pa.string()),
        pa.field("obj_type", pa.string()),
        pa.field("subj_mod", pa.string()),
        pa.field("n_sources", pa.int64()),
        pa.field("url", pa.string()),       # first provenance (min (url, chunk_id))
        pa.field("chunk_id", pa.int32()),
    ]
)

# per-partition lineage record (resume + metrics, SURVEY.md §4)
LINEAGE = pa.schema(
    [
        pa.field("shard", pa.int32()),
        pa.field("n_pages", pa.int64()),
        pa.field("n_chunks", pa.int64()),
        pa.field("n_triples", pa.int64()),
        pa.field("input_fingerprint", pa.string()),
        pa.field("wall_time_s", pa.float64()),
    ]
)
