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

    # pad to a common schema for the union
    l_schema = lt.schema().base_schema
    r_schema = rt.schema().base_schema

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
    lp = lt.map_batches(pad([(n, r_schema.field(n).type) for n in r_only], order), batch_format="pyarrow")
    rp = rt.map_batches(pad([(n, l_schema.field(n).type) for n in l_only], order), batch_format="pyarrow")
    unioned = lp.union(rp)

    out_r = [c for c in r_cols if c != by]

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == 0][l_cols].sort_values(on, kind="mergesort")
        rg = g[g["__side"] == 1][r_cols].sort_values(on, kind="mergesort")
        if len(lg) == 0:
            return pd.DataFrame(columns=l_cols + [right_prefix + c for c in out_r])
        rg2 = rg.rename(columns={c: right_prefix + c for c in out_r}).drop(columns=[by])
        merged = pd.merge_asof(
            lg,
            rg2,
            left_on=on,
            right_on=right_prefix + on,
            direction=direction,
            allow_exact_matches=allow_exact_matches,
        )
        return merged

    return unioned.groupby(by).map_groups(per_key, batch_format="pandas")
