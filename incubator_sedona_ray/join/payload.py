"""Payload re-attachment — the wide-row rule (SURVEY.md §7.3).

At 100 TB, ``html``/``text`` must NOT ride through the spatial shuffle: join
on a slim projection (key + geometry), then hash-join the result back to the
payload table by key. Two strategies:

* ``broadcast``: collect the (small) slim result's keys+columns to the
  driver, broadcast, and map over the payload table — zero shuffle of the
  payload; right for join results far smaller than the payload table.
* ``hash``: ``Dataset.join`` (hash-partitioned) — both sides large.
  The payload table moves through the object store once, which is the
  unavoidable lower bound when the payload itself must be in the output.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def attach_payload(
    slim_result,
    payload_ds,
    key: str,
    *,
    payload_key: str | None = None,
    strategy: str = "auto",
    broadcast_row_limit: int = 2_000_000,
    num_partitions: int | None = None,
    scrub_payload: bool = False,
):
    """Inner-join ``slim_result`` (rows to keep, e.g. spatial-join output)
    with ``payload_ds`` (wide rows) on ``key``. Output = payload columns +
    slim columns (slim's key column wins on name clashes).

    ``scrub_payload``: the payload side is normally a fresh parquet read
    (non-empty schema-bearing blocks), so it streams straight into the
    hash join WITHOUT the empty-block scrub — scrubbing would materialize
    the full 100 TB payload into the object store before the join even
    starts. Pass ``True`` only when the payload is itself join-derived."""
    payload_key = payload_key or key
    if num_partitions is None:
        # one hash-aggregator actor per partition — cap by cluster CPUs or
        # a small session deadlocks waiting for actor resources
        try:
            num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)
        except Exception:
            num_partitions = 4
    if strategy == "auto":
        # materialize before sizing: count() and the downstream join/refs
        # would otherwise EACH re-execute slim_result's upstream
        slim_result = slim_result.materialize()
        n = slim_result.count()
        strategy = "broadcast" if n <= broadcast_row_limit else "hash"
    if strategy == "hash":
        from ..state.blocks import safe_hash_join

        return safe_hash_join(
            payload_ds,
            slim_result,
            "inner",
            num_partitions,
            on=(payload_key,),
            right_on=(key,),
            scrub_left=scrub_payload,
        )
    # broadcast: ship the slim rows once, stream the payload table
    slim_tbl = pa.concat_tables([ray.get(r) for r in slim_result.to_arrow_refs()])
    ref = ray.put(slim_tbl)

    def probe(batch: pa.Table, slim: pa.Table) -> pa.Table:
        keys = slim[key].to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        sorted_keys = keys[order]
        bk = batch[payload_key].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(sorted_keys, bk, side="left")
        pos_clip = np.minimum(pos, len(sorted_keys) - 1)
        hit = (len(sorted_keys) > 0) & (sorted_keys[pos_clip] == bk)
        # one output row per matching (payload, slim) pair — keys may repeat
        out_b, out_s = [], []
        right = np.searchsorted(sorted_keys, bk, side="right")
        for i in np.nonzero(hit)[0]:
            for j in range(pos[i], right[i]):
                out_b.append(i)
                out_s.append(order[j])
        out = batch.take(pa.array(out_b, type=pa.int64()))
        for name in slim.column_names:
            if name == key and payload_key == key:
                continue
            col = slim[name].take(pa.array(out_s, type=pa.int64()))
            out = out.append_column(name if name not in out.column_names else "slim_" + name, col)
        return out

    from ..partition.assign import broadcast_map_batches

    return broadcast_map_batches(payload_ds, probe, {"slim": ref})
