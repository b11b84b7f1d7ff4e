"""Training-data-pipeline operations: text analysis, dedup family,
similarity search, multimodal plumbing. All vectorized ``map_batches``
kernels over Arrow batches unless a stage is inherently stateful."""
