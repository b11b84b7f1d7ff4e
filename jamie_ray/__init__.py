"""jamie_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch re-expression of the capabilities of the reference system
(racerandom/JaMIE: joint entity / modality / relation extraction over
documents, see /root/reference) as a streaming (subj, pred, obj) triple
factory over Common-Crawl-style web pages stored in Parquet, built on
``ray.data.Dataset`` + Arrow ``map_batches`` with actor pools for the
stateful scoring stage.

Layout
------
- ``textnorm``      byte-identical normalization cascade (reference
                    ``utils.py:299,399,735-742`` semantics)
- ``tokenization``  deterministic segmenter + subword tokenizer (stands in
                    for MeCab wakati + WordPiece; same output algebra)
- ``stages``        Dataset -> Dataset transforms: extract, chunk, score,
                    assemble, link, dedup, materialize
- ``functions``     training-data ops: dedup family, similarity search,
                    text analysis, multimodal stubs
- ``pipelines``     composed end-to-end pipelines
- ``state``         union-find, lineage/manifest helpers
"""

__version__ = "0.1.0"
