"""As-of join (time-series lookup join).

Not in the reference (SURVEY.md §2.4: "no as-of/range(1-D)/lookup join") —
provided as a first-class extension because training-data event pipelines
need it constantly. Pattern per the Ray guide: bucket both sides by key,
sort within bucket, ``pd.merge_asof`` per group. One shuffle
(groupby key), no driver-side state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def asof_join(
    left,
    right,
    *,
    by: str,
    on: str = "ts",
    right_prefix: str = "r_",
    direction: str = "backward",
    allow_exact_matches: bool = True,
):
    """For each left row, attach the latest right row with
    ``right.on <= left.on`` (direction="backward") within the same ``by``
    key. Right columns come back prefixed; left rows without a match keep
    nulls (left-outer semantics, matching DuckDB ASOF LEFT JOIN).
    """
    l_cols = left.schema().names
    r_cols = right.schema().names

    def tag(side_val):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column("__side", pa.array(np.full(batch.num_rows, side_val, dtype=np.int8)))

        return fn

    lt = left.map_batches(tag(0), batch_format="pyarrow")
    rt = right.map_batches(tag(1), batch_format="pyarrow")

    # pad to a common schema for the union; an EMPTY side's post-map schema
    # is None (and a pandas-block schema has no .field) — pad its columns
    # as null-typed then (they carry no values, only union compatibility)
    def _arrow_schema_of(tagged):
        s = tagged.schema()
        base = getattr(s, "base_schema", None)
        return base if hasattr(base, "field") else None

    l_schema = _arrow_schema_of(lt)
    r_schema = _arrow_schema_of(rt)

    def _field_type(schema, name):
        return schema.field(name).type if schema is not None else pa.null()

    def pad(missing, order):
        def fn(batch: pa.Table) -> pa.Table:
            cols = dict(zip(batch.column_names, batch.columns))
            for name, typ in missing:
                cols[name] = pa.nulls(batch.num_rows, type=typ)
            return pa.table({k: cols[k] for k in order})

        return fn

    l_only = [c for c in l_cols if c not in r_cols]
    r_only = [c for c in r_cols if c not in l_cols]
    shared = [c for c in l_cols if c in r_cols]
    order = shared + l_only + r_only + ["__side"]
    lp = lt.map_batches(pad([(n, _field_type(r_schema, n)) for n in r_only], order), batch_format="pyarrow")
    rp = rt.map_batches(pad([(n, _field_type(l_schema, n)) for n in l_only], order), batch_format="pyarrow")
    unioned = lp.union(rp)

    out_r = [c for c in r_cols if c != by]

    # shuffle by a COARSE hash of the key, not the key itself: merge_asof's
    # ``by=`` handles every key inside a partition in one vectorized call,
    # so the Python-call count is O(partitions), not O(distinct keys)
    num_parts = _default_parts()

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column("__apart", pa.array(_part_of(batch[by], num_parts)))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == 0][l_cols].sort_values(on, kind="mergesort")
        rg = g[g["__side"] == 1][r_cols].sort_values(on, kind="mergesort")
        if len(lg) == 0:
            return pd.DataFrame(columns=l_cols + [right_prefix + c for c in out_r])
        rg2 = rg.rename(columns={c: right_prefix + c for c in out_r})
        merged = pd.merge_asof(
            lg,
            rg2,
            left_on=on,
            right_on=right_prefix + on,
            left_by=by,
            right_by=by,
            direction=direction,
            allow_exact_matches=allow_exact_matches,
        )
        return merged

    parted = unioned.map_batches(add_part, batch_format="pyarrow")
    return parted.groupby("__apart").map_groups(per_part, batch_format="pandas")


def _default_parts() -> int:
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(4, min(256, cpus * 4))


def _part_of(col: pa.ChunkedArray, num_parts: int) -> np.ndarray:
    """Deterministic partition of a key column (int or string) — process-
    stable (never python ``hash``, which is salted per process)."""
    vals = col.to_numpy(zero_copy_only=False)
    if np.issubdtype(vals.dtype, np.integer):
        k = vals.astype(np.int64)
        return ((k * np.int64(0x9E3779B1)) % num_parts + num_parts) % num_parts
    from ..dedup.ngram import fnv_tokens

    h = fnv_tokens([str(v).encode() for v in vals])
    return (h % np.uint64(num_parts)).astype(np.int64)
