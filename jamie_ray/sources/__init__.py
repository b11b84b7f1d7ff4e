"""Source surface: everything that brings data INTO the engine.

Thin, stable re-exports (the round-1 layout contract): parquet pages
readers, every annotation-format reader (multihead-CoNLL, gold
annotated-XML, brat standoff, pmhs JSONL, i2b2 file quartets), and the
deterministic synthetic corpus generator.
"""

from ..fixtures import generate as generate_corpus
from ..fixtures import write_corpus
from ..pipelines.kg import read_pages
from ..stages.brat import brat_to_tagged_batch
from ..stages.conll import conll_text_to_tagged_batch, conll_to_chunks
from ..stages.gold_xml import gold_xml_to_tagged_batch
from ..stages.i2b2 import read_i2b2
from ..stages.pmhs import pmhs_to_tagged_batch

__all__ = [
    "read_pages",
    "conll_to_chunks",
    "conll_text_to_tagged_batch",
    "gold_xml_to_tagged_batch",
    "brat_to_tagged_batch",
    "pmhs_to_tagged_batch",
    "read_i2b2",
    "generate_corpus",
    "write_corpus",
]
