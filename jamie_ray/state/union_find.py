"""Driver-side union-find for entity-cluster merging (SURVEY.md §2.4 J5).

Union-find is inherently sequential; the engine keeps it trivial by
making the LSH blocking stage precise enough that the surviving edge
list is small (SURVEY.md §7.4). Edges are collected to the driver,
merged here, and the resulting canonical map is broadcast back via
``ray.put`` for a stateless ``map_batches`` id rewrite.
"""

from __future__ import annotations


class UnionFind:
    def __init__(self) -> None:
        self.parent: dict = {}

    def find(self, x):
        parent = self.parent
        if x not in parent:
            parent[x] = x
            return x
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    def union(self, a, b) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        # deterministic: smaller key wins as root (no rank heuristics —
        # output must not depend on edge arrival order)
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra

    def components(self) -> dict:
        """member -> root (fully compressed)."""
        return {x: self.find(x) for x in list(self.parent)}
