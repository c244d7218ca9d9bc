"""Salted repartition for hot cells (north-rule skew handling).

The reference relies only on sample-adaptive tree splits (SURVEY.md §4
"Skew"); at web scale a single hot cell (one mega-domain geocoding to one
point) can still swamp a partition, so we add explicit salting:

* after the fit, leaves whose SAMPLE share exceeds ``threshold`` x the mean
  are split into ``ceil(share/mean)`` salts (capped)
* probe-side rows (the many side) hash into exactly ONE salt
  (deterministic coordinate hash);
* build-side rows (windows/zones, the replicated side) go to ALL salts of
  the leaf — the same boundary-duplication idiom as the spatial shuffle
  itself.
* reference-point dedup still works unchanged: all salts of a leaf share
  the leaf's half-open extent, and a probe row exists in exactly one salt,
  so a candidate pair appears in exactly one (leaf, salt) group.

``SaltedPartitioner`` wraps any fitted :class:`SpatialPartitioner`;
salted part ids are ``base_part_id * max_salt + salt``.
"""

from __future__ import annotations

import numpy as np

from .base import SpatialPartitioner


def _coord_hash(xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Deterministic per-row 64-bit mix of the coordinate bits."""
    xb = np.asarray(xs, dtype=np.float64).view(np.uint64)
    yb = np.asarray(ys, dtype=np.float64).view(np.uint64)
    h = xb * np.uint64(0x9E3779B97F4A7C15) ^ (yb + np.uint64(0xD1B54A32D192ED03))
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    return h


class SaltedPartitioner(SpatialPartitioner):
    def __init__(self, base: SpatialPartitioner, sample_counts: np.ndarray, threshold: float = 4.0, max_salt: int = 16):
        """``sample_counts``: per-leaf sample hit counts from the fit."""
        self.base = base
        counts = np.asarray(sample_counts, dtype=np.float64)
        mean = max(counts.mean(), 1e-9)
        salts = np.ceil(counts / (mean * threshold)).astype(np.int64)
        self.salts = np.clip(salts, 1, max_salt)
        self.max_salt = int(self.salts.max())
        # salted leaves: each (leaf, salt) keeps the LEAF extent (dedup rule)
        self.leaves = np.repeat(base.leaves, self.max_salt, axis=0)
        self._tree = base._tree  # placement still routes through the base tree

    @property
    def num_partitions(self) -> int:
        return int(self.base.num_partitions * self.max_salt)

    def dedup_extents(self) -> np.ndarray:
        return self.leaves

    def _salted_id(self, leaf_id: np.ndarray, salt: np.ndarray) -> np.ndarray:
        return leaf_id * self.max_salt + salt

    def place_points(self, xs, ys) -> np.ndarray:
        pid = self.base.place_points(xs, ys)
        ok = pid >= 0
        salt = np.zeros(len(pid), dtype=np.int64)
        n_salt = self.salts[pid[ok]]
        # round-robin by row position (mixed with the coordinate hash): an
        # ATOMIC hot key (millions of rows at one exact coordinate) must
        # still spread across salts, so the salt cannot be a pure function
        # of the coordinates. Any assignment is correct — probe rows join
        # against windows replicated into every salt, and each probe row
        # exists exactly once.
        h = _coord_hash(np.asarray(xs)[ok], np.asarray(ys)[ok]) + np.arange(int(ok.sum()), dtype=np.uint64)
        salt[ok] = (h % n_salt.astype(np.uint64)).astype(np.int64)
        out = np.where(ok, self._salted_id(pid, salt), -1)
        return out

    def place_envelopes(self, envs):
        """Extended geometries replicate into EVERY salt of each leaf they
        touch (the build/window side)."""
        ri, pid = self.base.place_envelopes(envs)
        reps = self.salts[pid]
        ri2 = np.repeat(ri, reps)
        base2 = np.repeat(pid, reps)
        from ..geom.strtree import _ranges

        salt = _ranges(reps)
        return ri2, self._salted_id(base2, salt)

    def place_mixed(self, envs, is_point):
        envs = np.asarray(envs, dtype=np.float64)
        is_point = np.asarray(is_point, dtype=bool)
        # points: one salted partition
        pi = np.nonzero(is_point)[0]
        p_pid = self.place_points(envs[pi, 0], envs[pi, 1]) if len(pi) else np.empty(0, np.int64)
        keep = p_pid >= 0
        out_ri = [pi[keep]]
        out_pid = [p_pid[keep]]
        # extended: all salts of all touched leaves
        ei = np.nonzero(~is_point)[0]
        if len(ei):
            ri, pid = self.place_envelopes(envs[ei])
            out_ri.append(ei[ri])
            out_pid.append(pid)
        return np.concatenate(out_ri), np.concatenate(out_pid)


def leaf_sample_counts(base: SpatialPartitioner, samples: np.ndarray) -> np.ndarray:
    """How many fit samples landed in each leaf (hotness estimate).

    Point-like samples (degenerate envelopes) use the half-open POINT rule —
    an identical hot point often sits exactly on the median split line and
    an inclusive envelope query would double-count it into both neighbours,
    hiding the skew. Extended samples count once per touched leaf."""
    samples = np.asarray(samples, dtype=np.float64)
    counts = np.zeros(base.num_partitions, dtype=np.int64)
    is_pt = (samples[:, 0] == samples[:, 2]) & (samples[:, 1] == samples[:, 3])
    if is_pt.any():
        pid = base.place_points(samples[is_pt, 0], samples[is_pt, 1])
        np.add.at(counts, pid[pid >= 0], 1)
    if (~is_pt).any():
        _, pid = base.place_envelopes(samples[~is_pt])
        np.add.at(counts, pid, 1)
    return counts
