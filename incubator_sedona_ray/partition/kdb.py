"""K-D-B-tree partitioner fit (the reference's default grid,
``sedona.join.gridtype=kdbtree``).

Same policies as ``core/.../spatialPartitioning/KDB.java:41-400``:

* node capacity = ``len(samples) // num_partitions``; max depth =
  ``num_partitions`` (``SpatialRDD.java:269-274``)
* a full node splits on its longer side at the median item's minX/minY;
  falls back to the other axis; refuses when the median sits on the extent
  edge (crowded edge) and then keeps accepting items
* items route to the child whose extent contains their (minX, minY); the
  split predicate for redistribution is ``min <= split`` (left/bottom child
  first)
* leaf ids assigned in depth-first pre-order (child 0 before child 1)

Fit happens on the driver over the collected envelope sample (tiny) and the
resulting leaf-extent array is broadcast — O(leaves) state, independent of
dataset size.
"""

from __future__ import annotations

import numpy as np

from .base import SpatialPartitioner


class _Node:
    __slots__ = ("extent", "level", "items", "children", "split_x", "split_val")

    def __init__(self, extent, level):
        self.extent = extent  # (minx, miny, maxx, maxy)
        self.level = level
        self.items: list[tuple[float, float, float, float]] = []
        self.children: list["_Node"] | None = None
        self.split_x = False
        self.split_val = 0.0


class KDBTree(SpatialPartitioner):
    def __init__(self, samples: np.ndarray, boundary: tuple[float, float, float, float], num_partitions: int):
        """``samples``: (n, 4) envelope array; ``boundary``: padded extent."""
        samples = np.asarray(samples, dtype=np.float64).reshape(-1, 4)
        cap = max(1, len(samples) // max(1, num_partitions))
        max_levels = num_partitions
        self._root = _Node(tuple(float(v) for v in boundary), 0)
        self._cap = cap
        self._max_levels = max_levels
        for env in samples:
            self._insert(self._root, tuple(env))
        leaves: list[tuple[float, float, float, float]] = []
        self._collect_leaves(self._root, leaves)
        self.leaves = np.array(leaves, dtype=np.float64).reshape(-1, 4)
        self._build_index()

    # -- fit ------------------------------------------------------------
    def _insert(self, node: _Node, env: tuple[float, float, float, float]) -> None:
        while True:
            if node.children is None:
                if len(node.items) < self._cap or node.level >= self._max_levels:
                    node.items.append(env)
                    return
                if not self._split(node, node.extent[2] - node.extent[0] > node.extent[3] - node.extent[1]):
                    if not self._split(node, not (node.extent[2] - node.extent[0] > node.extent[3] - node.extent[1])):
                        node.items.append(env)  # all envelopes identical — can't split
                        return
            # route to the child whose extent contains (minX, minY), first match
            placed = False
            for child in node.children:
                e = child.extent
                if e[0] <= env[0] <= e[2] and e[1] <= env[1] <= e[3]:
                    node = child
                    placed = True
                    break
            if not placed:
                return  # outside boundary — reference silently drops from fit

    def _split(self, node: _Node, split_x: bool) -> bool:
        items = node.items
        if split_x:
            order = sorted(items, key=lambda e: (e[0], e[1]))
            mid = order[len(order) // 2][0]
            lo, hi = node.extent[0], node.extent[2]
            if not (lo < mid < hi):
                return False
            exts = (
                (node.extent[0], node.extent[1], mid, node.extent[3]),
                (mid, node.extent[1], node.extent[2], node.extent[3]),
            )
            pred = lambda e: e[0] <= mid  # noqa: E731  (XSplitter: minX <= x)
        else:
            order = sorted(items, key=lambda e: (e[1], e[0]))
            mid = order[len(order) // 2][1]
            lo, hi = node.extent[1], node.extent[3]
            if not (lo < mid < hi):
                return False
            exts = (
                (node.extent[0], node.extent[1], node.extent[2], mid),
                (node.extent[0], mid, node.extent[2], node.extent[3]),
            )
            pred = lambda e: e[1] <= mid  # noqa: E731
        node.children = [_Node(exts[0], node.level + 1), _Node(exts[1], node.level + 1)]
        node.split_x = split_x
        node.split_val = mid
        for it in items:
            self._insert(node.children[0] if pred(it) else node.children[1], it)
        node.items = []
        return True

    def _collect_leaves(self, node: _Node, out: list) -> None:
        if node.children is None:
            out.append(node.extent)
            return
        for child in node.children:
            self._collect_leaves(child, out)
