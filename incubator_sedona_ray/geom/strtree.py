"""STR-packed R-tree with vectorized batch envelope queries.

Replaces JTS ``STRtree`` (used by the reference's ``IndexBuilder.java:34-64``
and every join judgement) for candidate generation. Built once per join
partition / broadcast side; queried with WHOLE probe batches at a time —
each tree level is processed as one numpy filter over all surviving
(probe, node) pairs, so cost is O(levels × surviving pairs) with no Python
per-row loop.
"""

from __future__ import annotations

import numpy as np

DEFAULT_NODE_CAPACITY = 10  # JTS STRtree default


class STRtree:
    """Bulk-loaded Sort-Tile-Recursive R-tree over item envelopes."""

    def __init__(self, envelopes: np.ndarray, node_capacity: int = DEFAULT_NODE_CAPACITY):
        env = np.asarray(envelopes, dtype=np.float64).reshape(-1, 4)
        self.n_items = env.shape[0]
        self.cap = int(node_capacity)
        if self.n_items == 0:
            self.perm = np.empty(0, dtype=np.int64)
            self.levels: list[np.ndarray] = []
            return
        # STR packing: sort by center-x, slice into sqrt(S) slabs, sort slabs by center-y
        cx = (env[:, 0] + env[:, 2]) * 0.5
        cy = (env[:, 1] + env[:, 3]) * 0.5
        n = self.n_items
        n_leaves = int(np.ceil(n / self.cap))
        n_slabs = max(1, int(np.ceil(np.sqrt(n_leaves))))
        slab_size = int(np.ceil(n / n_slabs)) * 1
        order_x = np.argsort(cx, kind="stable")
        perm = np.empty(n, dtype=np.int64)
        pos = 0
        for s in range(0, n, max(1, slab_size)):
            sl = order_x[s : s + slab_size]
            sl = sl[np.argsort(cy[sl], kind="stable")]
            perm[pos : pos + len(sl)] = sl
            pos += len(sl)
        self.perm = perm
        # bottom-up level build; level 0 = items in packed order
        levels = [env[perm]]
        while levels[-1].shape[0] > 1:
            child = levels[-1]
            m = child.shape[0]
            n_parent = int(np.ceil(m / self.cap))
            parent = np.empty((n_parent, 4), dtype=np.float64)
            pad = n_parent * self.cap - m
            if pad:
                mins = np.vstack([child[:, :2], np.full((pad, 2), np.inf)])
                maxs = np.vstack([child[:, 2:], np.full((pad, 2), -np.inf)])
            else:
                mins, maxs = child[:, :2], child[:, 2:]
            parent[:, :2] = mins.reshape(n_parent, self.cap, 2).min(axis=1)
            parent[:, 2:] = maxs.reshape(n_parent, self.cap, 2).max(axis=1)
            levels.append(parent)
        self.levels = levels  # levels[0] = leaf items, levels[-1] = root

    @property
    def total_bounds(self) -> tuple[float, float, float, float]:
        if not self.levels:
            return (np.nan, np.nan, np.nan, np.nan)
        r = self.levels[-1][0]
        return (float(r[0]), float(r[1]), float(r[2]), float(r[3]))

    def query_batch(self, q: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Find all (probe, item) envelope intersections.

        ``q``: (m, 4) probe envelopes. Returns (probe_idx, item_idx) int64
        arrays (unsorted).

        Point probes (minx==maxx and miny==maxy — the dominant case in
        point-in-polygon joins and point partitioning) take a uniform-grid
        candidate index instead of the level walk: the level expansion
        materializes O(pairs x levels) fancy-indexed copies (~9 us/point
        measured), while the grid is O(points x avg candidates/cell).
        """
        q = np.asarray(q, dtype=np.float64).reshape(-1, 4)
        m = q.shape[0]
        if m == 0 or self.n_items == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        is_pt = (q[:, 0] == q[:, 2]) & (q[:, 1] == q[:, 3])
        if is_pt.all():
            return self._grid_query_points(q[:, 0], q[:, 1])
        if is_pt.any():
            pt_idx = np.nonzero(is_pt)[0]
            ext_idx = np.nonzero(~is_pt)[0]
            pp, pi = self._grid_query_points(q[pt_idx, 0], q[pt_idx, 1])
            ep, ei = self._walk_query(q[ext_idx])
            return (
                np.concatenate([pt_idx[pp], ext_idx[ep]]),
                np.concatenate([pi, ei]),
            )
        return self._walk_query(q)

    # -- uniform-grid index for point probes ---------------------------------
    def _build_grid(self) -> None:
        env = self.levels[0]  # items in packed order; map back via self.perm
        L = env.shape[0]
        gx0, gy0 = float(env[:, 0].min()), float(env[:, 1].min())
        gx1, gy1 = float(env[:, 2].max()), float(env[:, 3].max())
        R = int(np.clip(np.ceil(np.sqrt(4.0 * L)), 4, 512))
        cw = max((gx1 - gx0) / R, 1e-300)
        ch = max((gy1 - gy0) / R, 1e-300)
        ix0 = np.clip(np.floor((env[:, 0] - gx0) / cw).astype(np.int64), 0, R - 1)
        iy0 = np.clip(np.floor((env[:, 1] - gy0) / ch).astype(np.int64), 0, R - 1)
        ix1 = np.clip(np.floor((env[:, 2] - gx0) / cw).astype(np.int64), 0, R - 1)
        iy1 = np.clip(np.floor((env[:, 3] - gy0) / ch).astype(np.int64), 0, R - 1)
        nx, ny = ix1 - ix0 + 1, iy1 - iy0 + 1
        ncell = nx * ny
        item = np.repeat(np.arange(L, dtype=np.int64), ncell)
        off = _ranges(ncell)
        nyr = ny[item]
        cell = (ix0[item] + off // nyr) * R + (iy0[item] + off % nyr)
        order = np.argsort(cell, kind="stable")
        cell, item = cell[order], item[order]
        counts = np.bincount(cell, minlength=R * R)
        starts = np.concatenate([[0], np.cumsum(counts)])
        self._grid = (gx0, gy0, cw, ch, R, starts, item, counts)

    def _grid_query_points(self, xs: np.ndarray, ys: np.ndarray):
        if getattr(self, "_grid", None) is None:
            self._build_grid()
        gx0, gy0, cw, ch, R, starts, item, counts = self._grid
        # closed bounds: a point exactly on the grid's max edge still
        # intersects the last row/column of items (envelope test is closed)
        gx1, gy1 = gx0 + cw * R, gy0 + ch * R
        inside = (xs >= gx0) & (xs <= gx1) & (ys >= gy0) & (ys <= gy1)
        pid0 = np.nonzero(inside)[0]
        ix = np.minimum(np.floor((xs[pid0] - gx0) / cw).astype(np.int64), R - 1)
        iy = np.minimum(np.floor((ys[pid0] - gy0) / ch).astype(np.int64), R - 1)
        cell = ix * R + iy
        cnt = counts[cell]
        probe = np.repeat(pid0, cnt)
        cand = item[np.repeat(starts[cell], cnt) + _ranges(cnt)]
        env = self.levels[0]
        x, y = xs[probe], ys[probe]
        keep = (
            (env[cand, 0] <= x) & (x <= env[cand, 2])
            & (env[cand, 1] <= y) & (y <= env[cand, 3])
        )
        return probe[keep], self.perm[cand[keep]]

    def _walk_query(self, q: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        m = q.shape[0]
        top = self.levels[-1]
        probe = np.repeat(np.arange(m, dtype=np.int64), top.shape[0])
        node = np.tile(np.arange(top.shape[0], dtype=np.int64), m)
        keep = _env_intersects(q[probe], top[node])
        probe, node = probe[keep], node[keep]
        for lvl in range(len(self.levels) - 2, -1, -1):
            child_env = self.levels[lvl]
            n_child = child_env.shape[0]
            # children of node i are packed at [i*cap, min((i+1)*cap, n_child))
            starts = node * self.cap
            counts = np.minimum(starts + self.cap, n_child) - starts
            probe = np.repeat(probe, counts)
            offsets = _ranges(counts)
            node = np.repeat(starts, counts) + offsets
            keep = _env_intersects(q[probe], child_env[node])
            probe, node = probe[keep], node[keep]
        return probe, self.perm[node]

    def query_points(self, xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        return self.query_batch(np.column_stack([xs, ys, xs, ys]))

    def query(self, env: tuple[float, float, float, float]) -> np.ndarray:
        _, items = self.query_batch(np.array([env], dtype=np.float64))
        return items


def _env_intersects(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (
        (a[:, 0] <= b[:, 2])
        & (b[:, 0] <= a[:, 2])
        & (a[:, 1] <= b[:, 3])
        & (b[:, 1] <= a[:, 3])
    )


def _ranges(counts: np.ndarray) -> np.ndarray:
    """[3,1,2] -> [0,1,2,0,0,1] — per-group aranges, vectorized."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    idx = np.arange(total, dtype=np.int64)
    starts = np.repeat(np.cumsum(counts) - counts, counts)
    return idx - starts
