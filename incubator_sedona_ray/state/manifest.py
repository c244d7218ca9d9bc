"""Resumable partitioned output.

The reference has NO checkpointing (RDD lineage only, SURVEY.md §4); the
north rule requires it, so this is designed fresh:

* output laid out one directory per partition key
  (``out/part=<key>/data.parquet``), written atomically (tmp file + rename)
  with a ``_SUCCESS`` marker per partition
* a driver-side ``manifest.json`` records the run config, per-partition
  lineage names (quadtree lineage strings when available — stable across
  runs because the partitioner fit is deterministic) and per-partition
  metrics (rows, bytes)
* resume = call :func:`checkpointed_write` again with the same out_dir:
  completed partitions are filtered out BEFORE the shuffle, so a rerun
  only re-executes unfinished partitions
"""

from __future__ import annotations

import json
import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _done_partitions(out_dir: str, part_col: str) -> set[str]:
    """Completed partition keys as their canonical STRING form (the
    directory-name encoding) — a single type, so the resume filter's Arrow
    value set never mixes int and str."""
    done: set[str] = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if name.startswith(f"{part_col}=") and os.path.exists(os.path.join(out_dir, name, "_SUCCESS")):
            done.add(name.split("=", 1)[1])
    return done


def _key_out(raw: str):
    try:
        return int(raw)
    except ValueError:
        return raw


def checkpointed_write(
    ds,
    out_dir: str,
    part_col: str = "part_id",
    *,
    lineage: dict | None = None,
    manifest_extra: dict | None = None,
    expected_parts=None,
):
    """Write ``ds`` partitioned by ``part_col``; skip already-completed
    partitions (resume). Returns the manifest dict (incl. per-partition
    metrics and which partitions were skipped).

    ``expected_parts``: optional iterable of ALL partition ids the
    partitioner can produce (e.g. ``range(partitioner.num_partitions)``).
    Partitions whose group is EMPTY produce no groupby output, so without
    this they would get no ``_SUCCESS`` marker and be re-executed (full
    upstream re-run) on every resume; with it, empty partitions are marked
    complete after the write."""
    os.makedirs(out_dir, exist_ok=True)
    done = _done_partitions(out_dir, part_col)

    if done:
        done_arr = pa.array(sorted(done))

        def drop_done(batch: pa.Table) -> pa.Table:
            as_str = pa.compute.cast(batch[part_col], pa.string())
            mask = pa.compute.invert(pa.compute.is_in(as_str, value_set=done_arr))
            return batch.filter(mask)

        ds = ds.map_batches(drop_done, batch_format="pyarrow")

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        pid = g[part_col].iloc[0]
        pdir = os.path.join(out_dir, f"{part_col}={pid}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, ".data.parquet.tmp")
        final = os.path.join(pdir, "data.parquet")
        tbl = pa.Table.from_pandas(g, preserve_index=False)
        pq.write_table(tbl, tmp)
        os.replace(tmp, final)  # atomic on POSIX
        with open(os.path.join(pdir, "_SUCCESS"), "w") as fh:
            fh.write(str(time.time()))
        return pd.DataFrame(
            {
                "part": [pid],
                "rows": [len(g)],
                "bytes": [os.path.getsize(final)],
            }
        )

    metrics = ds.groupby(part_col).map_groups(write_group, batch_format="pandas").to_pandas()
    if "part" not in metrics.columns:  # everything already complete -> empty result
        metrics = pd.DataFrame({"part": [], "rows": [], "bytes": []})
    written = {str(p) for p in metrics["part"]}
    if expected_parts is not None:
        for pid in expected_parts:
            key = str(pid)
            if key in written or key in done:
                continue
            # empty partition: mark complete so resume never re-runs it
            pdir = os.path.join(out_dir, f"{part_col}={key}")
            os.makedirs(pdir, exist_ok=True)
            with open(os.path.join(pdir, "_SUCCESS"), "w") as fh:
                fh.write(str(time.time()))
            written.add(key)
    manifest = {
        "part_col": part_col,
        "completed": sorted((_key_out(p) for p in written.union(done)), key=str),
        "skipped_resume": sorted((_key_out(p) for p in done), key=str),
        "metrics": metrics.to_dict("records"),
        "lineage": lineage or {},
        "extra": manifest_extra or {},
        "written_at": time.time(),
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, default=str)
    return manifest


def read_manifest(out_dir: str) -> dict:
    with open(os.path.join(out_dir, "manifest.json")) as fh:
        return json.load(fh)


def read_checkpointed(out_dir: str, part_col: str = "part_id"):
    """Read back a checkpointed output as one Dataset."""
    import ray

    paths = []
    for name in sorted(os.listdir(out_dir)):
        f = os.path.join(out_dir, name, "data.parquet")
        if name.startswith(f"{part_col}=") and os.path.exists(f):
            paths.append(f)
    return ray.data.read_parquet(paths)
