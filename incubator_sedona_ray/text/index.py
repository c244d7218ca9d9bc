"""Inverted index build + bucket-pruned term lookup.

The retrieval-side storage layout for a 100 TB corpus: a postings table
``(token, doc_id, tf)`` hive-partitioned into ``bucket=<h>/`` directories
by token hash, so a term lookup opens ONLY the buckets its query terms
hash into — the same IO-pruning design as :func:`..state.manifest.ivf_write`
(VERDICT r02 #5), applied to text.

Build shape: one ``map_batches`` tokenizes and emits per-batch
``(token, doc_id, tf)`` partials (tf already combined within the row),
tagged with ``bucket = fmix32(fnv(token)) % n_buckets``; one
``groupby(bucket).map_groups`` writes each bucket directory (one task per
bucket, resumable: finished buckets are recorded in the manifest and
skipped on re-run). Lookup reads only ``terms``' buckets and filters to
the exact tokens — O(corpus / n_buckets) IO per term instead of a scan.

BM25 (text/bm25.py) recomputes stats per query set by streaming the
corpus; this module is the amortized alternative when the corpus is
indexed once and queried many times.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from .bm25 import _tokenize

__all__ = ["build_inverted_index", "term_postings", "token_bucket"]

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _fnv1a_str(tokens: np.ndarray) -> np.ndarray:
    """Vectorized-ish FNV-1a over an object array of str: bytes-level loop
    replaced by per-unique hashing (bounded by distinct tokens/batch)."""
    uniq, inv = np.unique(tokens, return_inverse=True)
    out = np.empty(len(uniq), dtype=np.uint64)
    for i, t in enumerate(uniq):
        h = _FNV_OFFSET
        for b in t.encode("utf-8"):
            h = (h ^ np.uint64(b)) * _FNV_PRIME
        out[i] = h
    return out[inv]


def token_bucket(tokens: np.ndarray, n_buckets: int) -> np.ndarray:
    return (_fnv1a_str(tokens) % np.uint64(n_buckets)).astype(np.int64)


def build_inverted_index(
    ds,
    path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> dict:
    """Corpus -> hive-partitioned postings at ``path``; returns the
    manifest dict {bucket: rows}. Resumable: buckets already present in
    ``_postings_manifest.json`` are skipped (their input rows are dropped
    at the map stage, so a re-run does no duplicate IO)."""
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    mpath = os.path.join(path, "_postings_manifest.json")
    done: dict[str, int] = {}
    if os.path.exists(mpath):
        done = json.load(open(mpath)).get("buckets", {})

    def postings(batch: pa.Table) -> pa.Table:
        flat, parent = _tokenize(batch[text_col])
        toks = np.asarray(flat.to_pylist(), dtype=object)
        ids = batch[id_col].to_numpy(zero_copy_only=False)[parent]
        if len(toks) == 0:
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    id_col: pa.array([], pa.int64()),
                    "tf": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                }
            )
        # combine within the batch: (token, doc) -> tf
        key = pd.MultiIndex.from_arrays([toks, ids])
        grp = pd.Series(np.ones(len(toks), dtype=np.int64), index=key).groupby(level=[0, 1]).sum()
        gtok = grp.index.get_level_values(0).to_numpy(dtype=object)
        gids = grp.index.get_level_values(1).to_numpy().astype(np.int64)
        buck = token_bucket(gtok, n_buckets)
        keep = ~np.isin(buck, np.asarray([int(b) for b in done], dtype=np.int64))
        return pa.table(
            {
                "token": pa.array(gtok[keep], pa.string()),
                id_col: pa.array(gids[keep], pa.int64()),
                "tf": pa.array(grp.to_numpy()[keep], pa.int64()),
                "bucket": pa.array(buck[keep], pa.int64()),
            }
        )

    def write_bucket(g: pa.Table) -> pa.Table:
        b = int(g["bucket"][0].as_py())
        d = os.path.join(path, f"bucket={b}")
        os.makedirs(d, exist_ok=True)
        out = g.drop_columns(["bucket"]).sort_by([("token", "ascending"), (id_col, "ascending")])
        # re-combine across batches: same (token, doc) partials sum here
        agg = out.group_by(["token", id_col]).aggregate([("tf", "sum")])
        agg = agg.rename_columns(["token", id_col, "tf"]).sort_by(
            [("token", "ascending"), (id_col, "ascending")]
        )
        # FIXED filename: one task per bucket, so a retried/re-run task
        # overwrites its own half-written file instead of duplicating it
        pq.write_table(agg, os.path.join(d, "part-0.parquet"))
        return pa.table(
            {"bucket": pa.array([b], pa.int64()), "rows": pa.array([agg.num_rows], pa.int64())}
        )

    summary = (
        ds.map_batches(postings, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(write_bucket, batch_format="pyarrow")
        .to_pandas()
    )
    buckets = dict(done)
    if "bucket" in summary.columns:  # empty when every bucket was already done
        for b, r in zip(summary["bucket"], summary["rows"]):
            buckets[str(int(b))] = int(r)
    json.dump({"n_buckets": n_buckets, "buckets": buckets}, open(mpath, "w"))
    return buckets


def term_postings(path: str, terms: list[str], *, id_col: str = "doc_id"):
    """Pruned lookup: read ONLY the buckets the query terms hash into and
    filter to the exact tokens. Returns (Dataset of postings rows,
    scanned_buckets, total_buckets) so callers/tests can assert pruning."""
    import ray

    man = json.load(open(os.path.join(path, "_postings_manifest.json")))
    n_buckets = int(man["n_buckets"])
    want = np.unique(token_bucket(np.asarray(terms, dtype=object), n_buckets))
    import glob as _glob

    dirs = [
        f
        for b in want
        if str(int(b)) in man["buckets"]
        for f in sorted(_glob.glob(os.path.join(path, f"bucket={int(b)}", "*.parquet")))
    ]
    if not dirs:
        empty = pa.table(
            {"token": pa.array([], pa.string()), id_col: pa.array([], pa.int64()), "tf": pa.array([], pa.int64())}
        )
        return ray.data.from_arrow(empty), 0, len(man["buckets"])
    ds = ray.data.read_parquet(dirs)
    tset = pa.array(sorted(set(terms)), pa.string())

    def only_terms(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if "bucket" in b.column_names:  # hive key re-inferred from the path
            b = b.drop_columns(["bucket"])
        return b.filter(pc.is_in(b["token"], value_set=tset))

    return ds.map_batches(only_terms, batch_format="pyarrow"), len(dirs), len(man["buckets"])
