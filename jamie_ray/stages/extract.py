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


def format_extract_error(ex: Exception) -> str:
    """Deterministic quarantine error string (shared with the fixture
    generator so expected_quarantine.parquet is oracle-exact)."""
    return f"{type(ex).__name__}: {ex}"[:500]


def extract_batch(batch: pa.Table, decode_errors: str = "strict") -> pa.Table:
    """map_batches kernel: (url, html, ...) -> (url, text, error).

    Poison-page quarantine (SURVEY.md §4): the reference prints and
    skips failing files (/root/reference/utils.py:868-880 — silent data
    loss); here a page that fails extraction keeps its row with empty
    text and a non-empty ``error`` column, so failures are counted,
    inspectable and re-processable instead of vanishing.

    ``decode_errors`` selects the utf-8 policy (compatibility note —
    round 1 shipped ``replace``, round 2+ defaults to ``strict``):

    - ``"strict"`` (default): mojibake bytes quarantine the page rather
      than silently corrupting the byte-pinned text invariant with
      U+FFFD — the conformance-oracle behavior;
    - ``"replace"``: lossy-but-present extraction for operators with
      dirty-but-valuable corpora where a stray byte should degrade one
      character, not drop the whole page from the graph.
    """
    urls = batch.column("url")
    htmls = batch.column("html").to_pylist()
    texts: list[str] = []
    errors: list[str] = []
    for h in htmls:
        try:
            texts.append(
                extract_text(h.decode("utf-8", errors=decode_errors)) if h else ""
            )
            errors.append("")
        except Exception as ex:  # total by design; belt-and-braces
            texts.append("")
            errors.append(format_extract_error(ex))
    return pa.table(
        {
            "url": urls,
            "text": pa.array(texts, pa.string()),
            "error": pa.array(errors, pa.string()),
        }
    )


def quarantined_batch(batch: pa.Table) -> pa.Table:
    """Filter to the quarantined rows (url, error) of an extract batch."""
    mask = pc.not_equal(batch.column("error"), "")
    return batch.select(["url", "error"]).filter(mask)


def healthy_batch(batch: pa.Table) -> pa.Table:
    """Drop quarantined rows and the error column."""
    mask = pc.equal(batch.column("error"), "")
    return batch.filter(mask).drop_columns(["error"])


def filter_lang_batch(batch: pa.Table, lang: str = "ja") -> pa.Table:
    """Vectorized language filter (pyarrow.compute, no Python rows)."""
    return batch.filter(pc.equal(batch.column("lang"), lang))
