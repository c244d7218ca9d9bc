"""Per-partition join metrics, mirroring the reference's accumulators
(``core/.../monitoring/Metrics.scala:24-30``: buildCount / streamCount /
candidateCount / resultCount keyed by partition id, wired in
``JoinQuery.java:538-541``).

Ray translation: a named metrics ACTOR the group-join kernels report to;
the driver snapshots it after execution and persists it into the run
manifest."""

from __future__ import annotations

import ray


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self):
        self.per_partition: dict[int, dict[str, int]] = {}

    def report(self, part_id: int, build: int, stream: int, candidates: int, results: int):
        m = self.per_partition.setdefault(int(part_id), {"build": 0, "stream": 0, "candidates": 0, "results": 0})
        m["build"] += int(build)
        m["stream"] += int(stream)
        m["candidates"] += int(candidates)
        m["results"] += int(results)

    def snapshot(self) -> dict:
        return dict(self.per_partition)

    def reset(self):
        self.per_partition = {}


class JoinMetrics:
    """Driver-side handle; pass ``handle.actor`` into join kernels."""

    def __init__(self):
        self.actor = MetricsActor.options(name=None).remote()

    def snapshot(self) -> dict:
        return ray.get(self.actor.snapshot.remote())

    def totals(self) -> dict:
        snap = self.snapshot()
        out = {"build": 0, "stream": 0, "candidates": 0, "results": 0}
        for m in snap.values():
            for k in out:
                out[k] += m[k]
        return out
