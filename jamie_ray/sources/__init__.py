"""Source surface: everything that brings data INTO the engine.

Thin, stable re-exports (the round-1 layout contract): parquet pages
readers, the multihead-CoNLL text reader (reference-format interop),
and the deterministic synthetic corpus generator.
"""

from ..fixtures import generate as generate_corpus
from ..fixtures import write_corpus
from ..pipelines.kg import read_pages
from ..stages.conll import conll_text_to_tagged_batch, conll_to_chunks

__all__ = [
    "read_pages",
    "conll_to_chunks",
    "conll_text_to_tagged_batch",
    "generate_corpus",
    "write_corpus",
]
