"""Block-level hygiene for cascaded hash joins.

Ray 2.49's hash-shuffle join emits SCHEMA-LESS empty blocks for hash
partitions that received no rows. Maps skip those blocks (so they survive
`map_batches` untouched), and when one lands on exactly one side of a
LATER join's partition, Acero raises ``ArrowInvalid: No match ... for key
field reference`` — i.e. any join whose input derives from a previous
join can crash whenever key cardinality is small relative to
``num_partitions`` (3 keys x 16 partitions reproduces it every time).

:func:`scrub_empty_blocks` removes those blocks by reference — no data
moves; only block metadata is inspected. Apply it between a join output
and any downstream join (connected-components label loops, ssjoin's
two-stage verification join, survivors handed back to user pipelines).
"""

from __future__ import annotations

import pyarrow as pa


def scrub_empty_blocks(ds, schema: pa.Schema | None = None):
    """Materialize ``ds`` and rebuild it from only its NON-EMPTY blocks
    (by object ref — zero copy). Empty no-schema blocks from upstream hash
    joins are dropped; if every block is empty the result is a one-block
    empty dataset with ``schema`` (or the dataset's schema when known).

    The input is materialized (it usually already is at the call sites —
    label-propagation rounds and survivor sets); do not call it
    mid-stream on a dataset you want to keep lazy."""
    import ray
    from ray.data import from_arrow_refs

    mat = ds if _is_materialized(ds) else ds.materialize()
    refs = [
        ref
        for bundle in mat.iter_internal_ref_bundles()
        for ref, meta in bundle.blocks
        if meta.num_rows
    ]
    if refs:
        out = from_arrow_refs(refs)
        # the materialized dataset OWNS the blocks; if it is GC'd Ray may
        # eagerly free them and the refs above would dangle — pin it to
        # the returned dataset's lifetime
        out._scrub_block_owner = mat
        return out
    if schema is None:
        s = mat.schema()
        base = getattr(s, "base_schema", None)
        if isinstance(base, pa.Schema):
            schema = base
        else:
            # derive from the first (empty) block — arrow or pandas
            all_refs = [r for b in mat.iter_internal_ref_bundles() for r, _ in b.blocks]
            if all_refs:
                blk = ray.get(all_refs[0])
                if isinstance(blk, pa.Table) and blk.num_columns:
                    schema = blk.schema
                elif hasattr(blk, "dtypes"):
                    schema = pa.Schema.from_pandas(blk)
            schema = schema if schema is not None else pa.schema([])
    return ray.data.from_arrow(schema.empty_table())


def _is_materialized(ds) -> bool:
    from ray.data.dataset import MaterializedDataset

    return isinstance(ds, MaterializedDataset)


def safe_hash_join(
    left,
    right,
    join_type: str,
    num_partitions: int,
    *,
    on: tuple,
    right_on: tuple | None = None,
    left_suffix: str | None = None,
    right_suffix: str | None = None,
    left_schema: "pa.Schema | None" = None,
    right_schema: "pa.Schema | None" = None,
    scrub_left: bool = True,
    scrub_right: bool = True,
):
    """``Dataset.join`` hardened against two Ray 2.49 hash-shuffle faults:

    1. An EMPTY first block on either side silently consumes the one-shot
       schema broadcast (`hash_shuffle.py:224` returns before fan-out, yet
       the operator marks schemas as broadcast), so aggregators build
       0-column partition tables and Acero raises ``ArrowInvalid: No match
       ... for key field reference`` — scrubbing all empty blocks off both
       inputs makes the first block always carry the schema.
    2. A FULLY EMPTY side cannot broadcast any schema at all — the join is
       short-circuited instead of executed: empty LEFT ⇒ the (schema-
       correct) empty left is the answer for all three join types; empty
       RIGHT ⇒ ``left`` itself for ``left_anti`` (nothing matches) and the
       empty left for ``left_semi``. For ``inner`` with an empty right the
       right side is padded with ONE all-null row (null keys never match
       in Acero — verified incl. null-vs-null) so the output keeps the
       full joined schema. A null pad row is never placed on the LEFT: it
       would be emitted by ``left_anti`` as a spurious all-null row.

    Supported join types: ``inner``, ``left_semi``, ``left_anti`` (a null
    pad row would leak into ``left_outer`` output). ``left_schema`` /
    ``right_schema`` are only needed when a side can be BOTH empty and of
    unknown schema.

    ``scrub_left`` / ``scrub_right``: pass ``False`` for a side that is
    known to stream non-empty schema-bearing blocks (e.g. a fresh
    ``read_parquet`` projection) — skipping the scrub keeps that side
    fully streaming instead of materializing it into the object store.
    The caller asserts the side is non-empty; an all-empty unscrubbed
    side falls back to Ray's raw join behavior."""
    import ray

    if join_type not in ("inner", "left_semi", "left_anti"):
        raise ValueError(f"safe_hash_join supports inner/left_semi/left_anti, got {join_type!r}")
    if scrub_left:
        left = scrub_empty_blocks(left, schema=left_schema)
        if left.count() == 0:
            return left  # empty left ⇒ empty output (left schema) for all 3 types
    if scrub_right:
        right = scrub_empty_blocks(right, schema=right_schema)
        if right.count() == 0:
            if join_type == "left_anti":
                return left  # nothing on the right ⇒ every left row is unmatched
            if join_type == "left_semi":
                return left.limit(0)
            right = _null_pad_row(right)  # inner: keep the joined output schema
    kwargs = {"on": on}
    if right_on is not None:
        kwargs["right_on"] = right_on
    if left_suffix is not None:
        kwargs["left_suffix"] = left_suffix
    if right_suffix is not None:
        kwargs["right_suffix"] = right_suffix
    return left.join(right, join_type, num_partitions, **kwargs)


def _null_pad_row(empty_ds):
    """One all-null row with ``empty_ds``'s schema."""
    import ray

    s = empty_ds.schema()
    base = getattr(s, "base_schema", None)
    if not isinstance(base, pa.Schema):
        raise ValueError("cannot pad an empty dataset of unknown schema — pass a schema hint")
    cols = {f.name: pa.array([None], type=f.type) for f in base}
    return ray.data.from_arrow(pa.table(cols))


def equi_join_auto(
    left,
    right,
    join_type: str,
    num_partitions: int,
    *,
    on: tuple,
    right_on: tuple | None = None,
    threshold_bytes: int | None = None,
    right_suffix: str = "_r",
    **kw,
):
    """Size-adaptive equi-join: if the RIGHT (build) side drains under
    ``threshold_bytes`` (default ``SedonaConf.auto_broadcast_threshold_
    bytes``, the reference's sedona.join.autoBroadcastJoinThreshold), run
    a ZERO-SHUFFLE broadcast probe — the build table is sorted once on
    the driver, ``ray.put`` once, and every left block probes it with one
    ``index_in`` (nulls never match, any key multiplicity, exact inner /
    left_semi / left_anti semantics). Otherwise fall back to
    :func:`safe_hash_join` (the all-to-all path for big-big joins).

    The drain executes the right pipeline once; on fallback it re-executes
    inside the hash join — acceptable: the drain stops at the threshold,
    so at most ``threshold_bytes`` of work is repeated.

    Single-column keys only (the composite-key case falls back)."""
    if threshold_bytes is None:
        from ..conf import DEFAULT_CONF

        threshold_bytes = DEFAULT_CONF.auto_broadcast_threshold_bytes
    # any extra safe_hash_join kwarg (left_suffix, schema hints, scrub
    # flags) is not implemented on the broadcast path — route those to
    # the hash join so the output schema never depends on build-side size
    if join_type not in ("inner", "left_semi", "left_anti") or len(on) != 1 or (
        right_on is not None and len(right_on) != 1
    ) or kw:
        return safe_hash_join(
            left, right, join_type, num_partitions, on=on, right_on=right_on,
            right_suffix=right_suffix, **kw
        )
    build = _drain_up_to(right, threshold_bytes)
    if build is None:
        return safe_hash_join(
            left, right, join_type, num_partitions, on=on, right_on=right_on,
            right_suffix=right_suffix, **kw
        )
    rkey = (right_on or on)[0]
    return broadcast_equi_join(
        left, build, join_type, on[0], rkey, right_suffix=right_suffix
    )


def _drain_up_to(ds, cap_bytes: int):
    """Collect ``ds`` into one pyarrow Table, or None once the running
    size exceeds ``cap_bytes`` (the stream is abandoned — backpressure
    stops the rest of the pipeline)."""
    parts, size = [], 0
    for t in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        if t.num_rows == 0:
            continue
        parts.append(t)
        size += t.nbytes
        if size > cap_bytes:
            return None
    if not parts:
        return None  # empty build side: let safe_hash_join's guards run
    return pa.concat_tables(parts).combine_chunks()


def broadcast_equi_join(
    left,
    build: pa.Table,
    join_type: str,
    key: str,
    rkey: str,
    *,
    right_suffix: str = "_r",
):
    """Zero-shuffle equi-join of Dataset ``left`` against an in-memory
    build Table: sort build by ``rkey``, dictionary-encode the sorted key
    column (runs are contiguous -> unique keys + starts + counts), probe
    each left block with ``pc.index_in`` and gather matched build rows by
    grouped-arange. Matches Acero semantics: null keys never match."""
    import numpy as np
    import pyarrow.compute as pc
    import ray

    build = build.filter(pc.is_valid(build[rkey]))
    order = pc.sort_indices(build, sort_keys=[(rkey, "ascending")])
    build = build.take(order).combine_chunks()
    sk = build[rkey]
    if isinstance(sk, pa.ChunkedArray):
        sk = sk.combine_chunks()
    enc = sk.dictionary_encode()
    # sorted input => dictionary order (first appearance) == sorted unique
    uniq = enc.dictionary if isinstance(enc, pa.Array) else enc.chunk(0).dictionary
    codes = (
        enc.indices if isinstance(enc, pa.Array) else enc.combine_chunks().indices
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    # match Ray Dataset.join's inner-join schema: the right key column is
    # not emitted (its values equal the left key), and colliding build
    # column names get the right suffix
    build = build.drop_columns([rkey])
    ren = []
    left_names = set(left.schema().names) if left.schema() is not None else set()
    for name in build.column_names:
        ren.append(name + right_suffix if name in left_names else name)
    build = build.rename_columns(ren)
    # semi/anti only test membership — don't ship build rows or offsets
    if join_type == "inner":
        state = {"uniq": uniq, "starts": starts, "counts": counts, "build": build}
    else:
        state = {"uniq": uniq, "starts": None, "counts": None, "build": None}
    state_ref = ray.put(state)

    def probe(batch: pa.Table) -> pa.Table:
        st = ray.get(state_ref)
        uid = (
            pc.index_in(batch[key], value_set=st["uniq"])
            .fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        if join_type == "left_semi":
            return batch.filter(pa.array(uid >= 0))
        if join_type == "left_anti":
            return batch.filter(pa.array(uid < 0))
        if len(st["counts"]):
            cnt = np.where(uid >= 0, st["counts"][np.maximum(uid, 0)], 0)
            lo = np.where(uid >= 0, st["starts"][np.maximum(uid, 0)], 0)
        else:
            # build side held only null keys: nothing ever matches, but
            # the joined schema (empty build columns) is still emitted
            cnt = np.zeros(len(uid), dtype=np.int64)
            lo = cnt
        tot = int(cnt.sum())
        rep = np.repeat(np.arange(len(cnt), dtype=np.int64), cnt)
        ends = np.cumsum(cnt)
        offs = np.arange(tot, dtype=np.int64) - np.repeat(ends - cnt, cnt)
        ridx = np.repeat(lo, cnt) + offs
        out = batch.take(pa.array(rep))
        for i, name in enumerate(st["build"].column_names):
            out = out.append_column(name, st["build"].column(i).take(pa.array(ridx)))
        return out

    return left.map_batches(probe, batch_format="pyarrow", batch_size=None)
