"""Shared-state helpers: union-find merging, lineage/manifest records."""
