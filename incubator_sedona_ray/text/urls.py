"""URL canonicalization + keep-latest URL-level dedup.

A Common-Crawl-style corpus carries the same page many times: recrawls
(different ``warc_ts``), tracking-parameter variants (``?utm_…``), and
case/trailing-slash variants of one canonical URL. The standard prep pass
canonicalizes and keeps the LATEST capture per canonical URL.

Canonical form (applied in this order, each a single RE2 pass that DuckDB's
``regexp_replace``/``regexp_extract`` reproduce byte-identically):
  1. strip query string and fragment (``[?#].*$`` -> "")
  2. lowercase the scheme+host head (``^scheme://host`` — path case is
     significant and preserved)
  3. strip one trailing slash

Dedup is one coarse-partitioned shuffle: partition by a vectorized
polynomial hash of the canonical URL (value-consistent, so every variant
group lands in one partition), then a per-partition Arrow ``sort_by``
(canon asc, ts desc, url asc) + adjacent-inequality first-row mask —
Python calls O(partitions), not O(urls).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_HEAD_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/]*"

# 31^k mod 2^64 weight table for the partition hash (cycle length caps the
# table; same-value rows always hash alike, which is all partitioning needs)
_POW_CYCLE = 1024
_W = np.empty(_POW_CYCLE, dtype=np.uint64)
_w = 1
for _i in range(_POW_CYCLE):
    _W[_i] = _w
    _w = (_w * 31) % (1 << 64)  # intended mod-2^64 wraparound


def canonicalize_batch(batch: pa.Table, url_col: str = "url", out_col: str = "canon_url") -> pa.Table:
    """Append the canonical form of ``url_col``. Pure Arrow kernels."""
    u = batch[url_col]
    u = pc.replace_substring_regex(u, pattern=r"[?#].*$", replacement="")
    head = pc.extract_regex(u, pattern=f"(?P<head>{_HEAD_RE})(?P<rest>.*)")
    head_s = pc.struct_field(head, "head")
    rest_s = pc.struct_field(head, "rest")
    lowered = pc.binary_join_element_wise(pc.utf8_lower(head_s), rest_s, "")
    # rows with no scheme://host head pass through unchanged
    u = pc.coalesce(lowered, u)
    u = pc.replace_substring_regex(u, pattern=r"/$", replacement="")
    return batch.append_column(out_col, u)


def _poly_hash(col) -> np.ndarray:
    """Vectorized per-row polynomial byte hash of a string column (uint64).
    Value-consistent across batches/processes — safe as a partition key."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    bufs = arr.buffers()
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=odt)[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    offs = offs - offs[0]
    u8 = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    u8 = u8[: offs[-1]] if len(u8) > offs[-1] else u8
    lens = np.diff(offs)
    pos = np.arange(len(u8), dtype=np.int64) - np.repeat(offs[:-1], lens)
    terms = u8.astype(np.uint64) * _W[pos % _POW_CYCLE]
    c = np.concatenate(([np.uint64(0)], np.cumsum(terms, dtype=np.uint64)))
    return c[offs[1:]] - c[offs[:-1]]


def dedup_urls(
    ds,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    num_parts: int = 64,
):
    """Dataset -> Dataset keeping, per canonical URL, the row with the
    latest ``ts_col`` (ties broken by ascending raw URL — matches the SQL
    ``row_number() OVER (PARTITION BY canon ORDER BY ts DESC, url)``).
    All input columns are carried through, plus ``canon_url``."""

    def add_keys(batch: pa.Table) -> pa.Table:
        batch = canonicalize_batch(batch, url_col=url_col)
        part = (_poly_hash(batch["canon_url"]) % np.uint64(num_parts)).astype(np.int32)
        return batch.append_column("upart", pa.array(part))

    def kernel(g: pa.Table) -> pa.Table:
        g = g.sort_by(
            [("canon_url", "ascending"), (ts_col, "descending"), (url_col, "ascending")]
        )
        canon = g["canon_url"].combine_chunks()
        if len(canon) == 0:
            return g.drop_columns(["upart"])
        neq = pc.not_equal(canon.slice(1), canon.slice(0, len(canon) - 1))
        first = np.concatenate(([True], neq.to_numpy(zero_copy_only=False).astype(bool)))
        return g.filter(pa.array(first)).drop_columns(["upart"])

    keyed = ds.map_batches(add_keys, batch_format="pyarrow")
    return keyed.groupby("upart").map_groups(kernel, batch_format="pyarrow")


# second labels of two-part public suffixes (public-suffix-lite): a host
# ending ".<one-of-these>.<tld>" has a three-label registrable domain
MULTI_2LD = ("ac", "co", "com", "edu", "gov", "net", "org")


def parse_urls_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Append ``scheme``, ``host``, ``domain`` (registrable domain via the
    public-suffix-lite rule), and ``path_depth`` (non-empty path segments).
    Pure Arrow RE2 kernels, byte-replayable in SQL (the domain_stats oracle
    runs the identical regexes through DuckDB)."""
    u = batch[url_col]
    parts = pc.extract_regex(
        pc.utf8_lower(u), pattern=r"^(?P<scheme>[a-z][a-z0-9+.\-]*)://(?P<host>[^/:?#]+)"
    )
    scheme = pc.struct_field(parts, "scheme")
    host = pc.struct_field(parts, "host")
    last2 = pc.struct_field(pc.extract_regex(host, pattern=r"(?P<d>[^.]+\.[^.]+)$"), "d")
    last3 = pc.struct_field(pc.extract_regex(host, pattern=r"(?P<d>[^.]+\.[^.]+\.[^.]+)$"), "d")
    sld = pc.struct_field(pc.extract_regex(last2, pattern=r"^(?P<a>[^.]+)\."), "a")
    use3 = pc.and_kleene(pc.is_in(sld, value_set=pa.array(list(MULTI_2LD))), pc.is_valid(last3))
    domain = pc.coalesce(pc.if_else(pc.fill_null(use3, False), last3, last2), host)
    # path: strip query/fragment, then everything after the authority
    path = pc.replace_substring_regex(u, pattern=r"[?#].*$", replacement="")
    path = pc.replace_substring_regex(path, pattern=f"{_HEAD_RE}", replacement="")
    segs = pc.split_pattern(path, pattern="/")
    flat = pc.list_flatten(segs)
    parent = pc.list_parent_indices(segs).to_numpy(zero_copy_only=False)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    depth = np.bincount(parent[nonempty], minlength=batch.num_rows).astype(np.int64)
    for name, col in (
        ("scheme", scheme),
        ("host", host),
        ("domain", domain),
        ("path_depth", pa.array(depth)),
    ):
        batch = batch.append_column(name, col)
    return batch


def parse_urls(ds, url_col: str = "url"):
    """Dataset -> Dataset + (scheme, host, domain, path_depth). Stateless
    vectorized map_batches, zero shuffle."""
    return ds.map_batches(lambda b: parse_urls_batch(b, url_col), batch_format="pyarrow")


def domain_stats(ds, *, url_col: str = "url", chars_col: str = "n_chars"):
    """Per-registrable-domain corpus stats (RefinedWeb-style domain-level
    accounting): doc count, total chars, mean chars. Map-side partial
    aggregation (one Arrow group_by per batch) shuffles only the tiny
    (domain, n, chars) partials, then one small groupby-sum finalizes."""

    def partial(batch: pa.Table) -> pa.Table:
        b = parse_urls_batch(batch, url_col)
        g = (
            pa.table({"domain": b["domain"], chars_col: b[chars_col]})
            .group_by("domain")
            .aggregate([(chars_col, "sum"), ([], "count_all")])
        )
        return g.rename_columns(["domain", "sum_chars", "n_docs"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby("domain").sum(["sum_chars", "n_docs"])

    def finalize(b: pa.Table) -> pa.Table:
        n = pc.cast(b["sum(n_docs)"], pa.int64())
        s = pc.cast(b["sum(sum_chars)"], pa.int64())
        mean = pc.divide(pc.cast(s, pa.float64()), pc.cast(n, pa.float64()))
        return pa.table({"domain": b["domain"], "n_docs": n, "sum_chars": s, "mean_chars": mean})

    return agg.map_batches(finalize, batch_format="pyarrow")
