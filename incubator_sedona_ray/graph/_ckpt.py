"""Mid-job checkpoint/resume for compiled-topology BSP iterations
(pagerank/hits — per the project brief, iterative jobs at cluster scale
must RESUME, not restart).

Layout: one parquet per (name, range) slice + a ``_META.json`` written
LAST and atomically — its presence certifies a complete checkpoint; a
crash mid-write leaves the previous META (or none) and stale slice
files are simply overwritten. Resume accepts a checkpoint only when the
caller's parameter fingerprint matches exactly; anything else is
ignored and the job starts fresh. The fingerprint deliberately excludes
the iteration target: resuming a crashed 50-round job or extending a
5-round run to 10 are the use cases.

Slice writes/reads run as raw Ray tasks on workers — slice data never
passes through the driver.

**ckpt_dir must be a shared filesystem on multi-node clusters** (NFS,
FUSE-mounted object store, ...): slice parquets are written by worker
tasks on whichever node runs them while ``_META.json`` is written on
the driver, and resume reads are scheduled on arbitrary nodes. On a
cluster with more than one node, :func:`validate_shared_dir` probes
this (driver writes a marker, a worker task asserts visibility) and
callers invoke it before trusting a checkpoint; a node-local path
fails fast there instead of producing an unusable checkpoint.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa


def validate_shared_dir(ckpt_dir: str) -> None:
    """Fail fast when ``ckpt_dir`` is not visible cluster-wide.

    The driver drops a probe file, then a worker task (scheduled
    anywhere) must see it. On a single-node cluster this is trivially
    true and the probe is skipped entirely — the check only costs a
    task when ``ray.nodes()`` reports >1 alive node, exactly the case
    where a node-local ckpt_dir would silently produce checkpoints
    that cannot be resumed.
    """
    import uuid

    import ray

    try:
        nodes = [n for n in ray.nodes() if n.get("Alive")]
    except Exception:
        nodes = []
    try:
        here = ray.get_runtime_context().get_node_id()
    except Exception:
        here = None
    others = [n["NodeID"] for n in nodes if n.get("NodeID") and n["NodeID"] != here]
    if not others:
        return  # single-node: trivially visible
    os.makedirs(ckpt_dir, exist_ok=True)
    probe = os.path.join(ckpt_dir, f"_probe_{uuid.uuid4().hex}")
    with open(probe, "w") as fh:
        fh.write("x")

    @ray.remote(num_cpus=0)
    def _seen(path: str) -> bool:
        return os.path.exists(path)

    from ray.util.scheduling_strategies import NodeAffinitySchedulingStrategy

    try:
        # one probe PINNED to every non-driver node (an unconstrained
        # task prefers the driver's node, where a node-local dir would
        # pass vacuously) — all of them must see the file
        ok = all(
            ray.get(
                [
                    _seen.options(
                        scheduling_strategy=NodeAffinitySchedulingStrategy(
                            node_id=nid, soft=True
                        )
                    ).remote(probe)
                    for nid in others
                ]
            )
        )
    finally:
        os.unlink(probe)
    if not ok:
        raise RuntimeError(
            f"checkpoint_dir {ckpt_dir!r} is not visible from worker "
            "nodes — use a shared filesystem (NFS / mounted object "
            "store) for multi-node checkpoint/resume"
        )


def read_meta(ckpt_dir: str, meta_want: dict) -> tuple[int, dict]:
    """(iter_done, extras) when a complete checkpoint matches the
    fingerprint, else (0, {}). ``extras`` is scalar state the writer
    stored beside the fingerprint (e.g. renormalization denominators)."""
    path = os.path.join(ckpt_dir, "_META.json")
    if not os.path.exists(path):
        return 0, {}
    with open(path) as fh:
        got = json.load(fh)
    done = got.pop("iter_done", 0)
    extras = got.pop("extras", {})
    if got == meta_want and done > 0:
        return int(done), extras
    return 0, {}


def write_meta(ckpt_dir: str, meta_want: dict, iter_done: int, extras: dict | None = None):
    """Atomic META commit — call AFTER every slice write completed."""
    os.makedirs(ckpt_dir, exist_ok=True)
    tmp = os.path.join(ckpt_dir, "_META.json.tmp")
    with open(tmp, "w") as fh:
        json.dump({**meta_want, "iter_done": int(iter_done), "extras": extras or {}}, fh)
    os.replace(tmp, os.path.join(ckpt_dir, "_META.json"))


def slice_writer():
    """Remote task: persist one int64 slice as parquet (worker-side)."""
    import ray

    @ray.remote
    def _write(ckpt_dir, name, rid, arr):
        import pyarrow.parquet as pq

        os.makedirs(ckpt_dir, exist_ok=True)
        pq.write_table(
            pa.table({name: pa.array(np.asarray(arr, dtype=np.int64))}),
            os.path.join(ckpt_dir, f"{name}_{rid}.parquet"),
        )
        return rid

    return _write


def slice_reader():
    """Remote task: load one int64 slice back (worker-side)."""
    import ray

    @ray.remote
    def _read(ckpt_dir, name, rid):
        import pyarrow.parquet as pq

        t = pq.read_table(os.path.join(ckpt_dir, f"{name}_{rid}.parquet"))
        return t[name].to_numpy(zero_copy_only=False).astype(np.int64)

    return _read
