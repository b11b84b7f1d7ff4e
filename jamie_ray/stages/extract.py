"""Extraction stage: pages(html) -> pages(text) — the byte-pinned surface.

Stateless zero-copy-in ``map_batches`` kernel over Arrow batches. The
per-url output must be byte-identical to the reference extractor's
normalization cascade (north-rule invariant; see ``textnorm``).

Reads only the columns it needs — pair with
``read_parquet(columns=["url", "html", "lang"])`` so page text/html
bytes for filtered-out languages never leave storage.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..textnorm import extract_text


def extract_batch(batch: pa.Table) -> pa.Table:
    """map_batches kernel: (url, html, ...) -> (url, text)."""
    urls = batch.column("url")
    htmls = batch.column("html").to_pylist()
    texts = [
        extract_text(h.decode("utf-8", errors="replace")) if h else ""
        for h in htmls
    ]
    return pa.table({"url": urls, "text": pa.array(texts, pa.string())})


def filter_lang_batch(batch: pa.Table, lang: str = "ja") -> pa.Table:
    """Vectorized language filter (pyarrow.compute, no Python rows)."""
    return batch.filter(pc.equal(batch.column("lang"), lang))
