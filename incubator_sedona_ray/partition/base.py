"""Partitioner protocol + shared placement machinery.

Mirrors ``core/.../spatialPartitioning/SpatialPartitioner.java:36-78``:
``placeObject(geom) -> Iterator<(partId, geom)>`` — one partition for
points (half-open rectangle rule), >= 1 for extended geometries (boundary
duplication) — and ``getDedupParams()`` (partition-id-indexed extents,
``DedupParams.java:31-49``).

Placement here is vectorized: a fitted tree exposes its leaf extents as an
(n, 4) array; an STRtree over those extents answers whole batches at once.
"""

from __future__ import annotations

import numpy as np

from ..geom.strtree import STRtree

PADDING = 0.01  # SpatialRDD.java:247-249 — pad maxX/maxY so half-open rects cover all points


def pad_boundary(env: tuple[float, float, float, float]) -> tuple[float, float, float, float]:
    return (env[0], env[1], env[2] + PADDING, env[3] + PADDING)


def get_sample_count(num_partitions: int, total: int, given: int = -1) -> int:
    """Port of ``RDDSampleUtils.getSampleNumbers`` (``RDDSampleUtils.java:49-69``)."""
    if given > 0:
        if given > total:
            raise ValueError(f"sample count {given} > total records {total}")
        return given
    if num_partitions > (total + 1) // 2:
        raise ValueError(f"partitions {num_partitions} > half of total records {total}")
    if total < 1000:
        return int(total)
    min_sample = min(num_partitions * 2, total)
    return int(max(min_sample, min(total // 100, 2**31 - 1)))


class SpatialPartitioner:
    """Base: subclasses set ``self.leaves`` (n, 4 float64, indexed by part_id)."""

    leaves: np.ndarray

    def _build_index(self) -> None:
        self._tree = STRtree(self.leaves)

    @property
    def num_partitions(self) -> int:
        return int(self.leaves.shape[0])

    def dedup_extents(self) -> np.ndarray:
        """DedupParams: partition extents indexed by part id."""
        return self.leaves

    # -- vectorized placement ------------------------------------------------
    def place_points(self, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
        """Each point -> exactly one part_id via the half-open rule
        (x in [minx, maxx) and y in [miny, maxy)); -1 if outside the grid
        (reference drops such records at the shuffle)."""
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        pi, li = self._tree.query_points(xs, ys)
        lv = self.leaves[li]
        keep = (xs[pi] >= lv[:, 0]) & (xs[pi] < lv[:, 2]) & (ys[pi] >= lv[:, 1]) & (ys[pi] < lv[:, 3])
        pi, li = pi[keep], li[keep]
        out = np.full(len(xs), -1, dtype=np.int64)
        out[pi] = li  # half-open rects are disjoint -> at most one hit each
        return out

    def place_envelopes(self, envs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Each envelope -> all leaf partitions it intersects (inclusive, =
        reference ``findLeafNodes``/``findZones`` boundary duplication).
        Returns (row_idx, part_id) pair arrays."""
        return self._tree.query_batch(np.asarray(envs, dtype=np.float64))

    def place_mixed(self, envs: np.ndarray, is_point: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Envelope placement with the point rule applied to point rows."""
        envs = np.asarray(envs, dtype=np.float64)
        is_point = np.asarray(is_point, dtype=bool)
        ri, pid = self._tree.query_batch(envs)
        pt = is_point[ri]
        lv = self.leaves[pid]
        x, y = envs[ri, 0], envs[ri, 1]
        half_open = (x >= lv[:, 0]) & (x < lv[:, 2]) & (y >= lv[:, 1]) & (y < lv[:, 3])
        keep = ~pt | half_open
        return ri[keep], pid[keep]
