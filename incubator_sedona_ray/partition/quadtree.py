"""Quadtree partitioner fit.

Same policies as ``core/.../spatialPartitioning/quadtree/StandardQuadTree.java``
(via ``QuadtreePartitioning.java:45-74``):

* capacity = ``len(samples) // num_partitions``; maxLevel = num_partitions
* a node delegates to a child only when it has reached capacity AND the
  inserted rectangle fits entirely in one child zone; otherwise the item
  stays at this node (``findRegion``, ``StandardQuadTree.java:77-100``)
* on reaching capacity the node's items are redispatched
  (``insert``, ``:179-201``)
* child order NW, NE, SW, SE; leaf partition ids in depth-first pre-order
  (``assignPartitionIds:411-427``)
* leaf *lineage* strings (sequence of child indices root->leaf,
  ``assignPartitionLineage:429-442``) — reused as our stable checkpoint
  partition names
* EQUALGRID = quadtree over zero samples force-grown to
  ``ceil(log4(num_partitions))`` levels (``SpatialRDD.java:252-259``)
"""

from __future__ import annotations

import math

import numpy as np

from .base import SpatialPartitioner

_REGION_SELF = -1
# child build order NW, NE, SW, SE (StandardQuadTree.split:123-160)


class _QNode:
    __slots__ = ("x", "y", "w", "h", "level", "items", "node_num", "regions")

    def __init__(self, x, y, w, h, level):
        self.x, self.y, self.w, self.h = x, y, w, h
        self.level = level
        self.items: list[tuple[float, float, float, float]] = []
        self.node_num = 0
        self.regions: list["_QNode"] | None = None

    def contains_rect(self, e) -> bool:
        return (
            e[0] >= self.x
            and e[2] <= self.x + self.w
            and e[1] >= self.y
            and e[3] <= self.y + self.h
        )

    def split(self) -> None:
        nw, nh = self.w / 2, self.h / 2
        nl = self.level + 1
        self.regions = [
            _QNode(self.x, self.y + nh, nw, nh, nl),        # NW
            _QNode(self.x + nw, self.y + nh, nw, nh, nl),   # NE
            _QNode(self.x, self.y, nw, nh, nl),             # SW
            _QNode(self.x + nw, self.y, nw, nh, nl),        # SE
        ]


class QuadTree(SpatialPartitioner):
    def __init__(
        self,
        samples: np.ndarray,
        boundary: tuple[float, float, float, float],
        num_partitions: int,
        min_tree_level: int = -1,
    ):
        samples = np.asarray(samples, dtype=np.float64).reshape(-1, 4)
        self._cap = max(0, len(samples) // max(1, num_partitions))
        self._max_level = num_partitions
        minx, miny, maxx, maxy = (float(v) for v in boundary)
        self._root = _QNode(minx, miny, maxx - minx, maxy - miny, 0)
        if min_tree_level > 0:
            self._force_grow(self._root, min_tree_level)
        for env in samples:
            self._insert(self._root, tuple(env))
        leaves: list[tuple[float, float, float, float]] = []
        lineages: list[str] = []
        self._collect(self._root, "", leaves, lineages)
        self.leaves = np.array(leaves, dtype=np.float64).reshape(-1, 4)
        self.lineages = lineages
        self._build_index()

    def _force_grow(self, node: _QNode, min_level: int) -> None:
        node.split()
        node.node_num = self._cap
        if node.level + 1 >= min_level:
            return
        for r in node.regions:
            self._force_grow(r, min_level)

    def _find_region(self, node: _QNode, env, do_split: bool) -> int:
        if node.node_num >= self._cap and node.level < self._max_level:
            if node.regions is None and do_split:
                node.split()
            if node.regions is not None:
                for i, r in enumerate(node.regions):
                    if r.contains_rect(env):
                        return i
        return _REGION_SELF

    def _insert(self, node: _QNode, env) -> None:
        region = self._find_region(node, env, True)
        if region == _REGION_SELF or node.level == self._max_level:
            # stored locally -> return WITHOUT redispatch (insert:179-186)
            node.items.append(env)
            node.node_num += 1
            return
        self._insert(node.regions[region], env)
        # delegated to a child -> redispatch own items when at capacity;
        # node_num deliberately NOT reset (matches insert:190-200)
        if node.node_num >= self._cap and node.level < self._max_level:
            tmp = node.items
            node.items = []
            for it in tmp:
                self._insert(node, it)

    def _collect(self, node: _QNode, lineage: str, leaves: list, lineages: list) -> None:
        if node.regions is None:
            leaves.append((node.x, node.y, node.x + node.w, node.y + node.h))
            lineages.append(lineage)
            return
        for i, r in enumerate(node.regions):
            self._collect(r, lineage + str(i), leaves, lineages)


def equal_grid(boundary: tuple[float, float, float, float], num_partitions: int) -> QuadTree:
    """EQUALGRID: quadtree force-grown to ceil(log4 n) levels, no samples
    (``SpatialRDD.java:252-259``)."""
    min_level = int(max(math.log(num_partitions) / math.log(4), 0))
    return QuadTree(np.empty((0, 4)), boundary, num_partitions, min_tree_level=max(min_level, 1))
