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

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _done_partitions(out_dir: str, part_col: str) -> set:
    done = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if name.startswith(f"{part_col}=") and os.path.exists(os.path.join(out_dir, name, "_SUCCESS")):
            raw = name.split("=", 1)[1]
            try:
                done.add(int(raw))
            except ValueError:
                done.add(raw)
    return done


def checkpointed_write(
    ds,
    out_dir: str,
    part_col: str = "part_id",
    *,
    lineage: dict | None = None,
    manifest_extra: dict | None = None,
):
    """Write ``ds`` partitioned by ``part_col``; skip already-completed
    partitions (resume). Returns the manifest dict (incl. per-partition
    metrics and which partitions were skipped)."""
    os.makedirs(out_dir, exist_ok=True)
    done = _done_partitions(out_dir, part_col)

    if done:
        done_arr = pa.array(list(done))

        def drop_done(batch: pa.Table) -> pa.Table:
            mask = pa.compute.invert(pa.compute.is_in(batch[part_col], value_set=done_arr))
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
    manifest = {
        "part_col": part_col,
        "completed": sorted(
            [int(p) if isinstance(p, (int, np.integer)) else p for p in set(metrics["part"]).union(done)],
            key=str,
        ),
        "skipped_resume": sorted([int(p) if isinstance(p, (int, np.integer)) else p for p in done], key=str),
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
