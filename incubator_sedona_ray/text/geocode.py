"""Deterministic geocoder — defines the spatial join inputs (SURVEY.md §7.0).

``geocode(url) -> (lon, lat)`` is a pure function of the URL's registrable
domain and ccTLD: the ccTLD selects a country bounding box; sha256 of the
registrable domain picks a stable offset inside that box; non-cc TLDs map to
the global box. Pure + vectorizable -> "same matched pairs" is well-defined
and the expected join results are computable in closed form by an oracle.

``geocode_doc_ids`` is the SQL-expressible sibling used for the DuckDB
correctness oracle over the driver's ``documents`` table: plain int64
arithmetic that DuckDB evaluates bit-identically (see ``sql_exprs``).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

# ccTLD -> (minlon, minlat, maxlon, maxlat), a coarse public-knowledge country box
CC_BBOX: dict[str, tuple[float, float, float, float]] = {
    "de": (6.0, 47.0, 15.0, 55.0),
    "fr": (-5.0, 42.0, 8.0, 51.0),
    "uk": (-8.0, 50.0, 2.0, 59.0),
    "nl": (3.0, 50.7, 7.2, 53.6),
    "it": (6.6, 36.6, 18.5, 47.1),
    "es": (-9.3, 36.0, 3.3, 43.8),
    "pl": (14.1, 49.0, 24.2, 54.8),
    "se": (11.0, 55.3, 24.2, 69.1),
    "no": (4.6, 57.9, 31.1, 71.2),
    "fi": (20.6, 59.8, 31.6, 70.1),
    "dk": (8.0, 54.5, 15.2, 57.8),
    "ch": (5.9, 45.8, 10.5, 47.8),
    "at": (9.5, 46.4, 17.2, 49.0),
    "be": (2.5, 49.5, 6.4, 51.5),
    "pt": (-9.5, 37.0, -6.2, 42.2),
    "cz": (12.1, 48.6, 18.9, 51.1),
    "gr": (19.4, 34.8, 28.3, 41.7),
    "ru": (27.0, 41.2, 69.0, 77.0),
    "jp": (129.5, 31.0, 145.8, 45.5),
    "cn": (73.5, 18.2, 135.1, 53.6),
    "kr": (126.1, 33.1, 129.6, 38.6),
    "in": (68.1, 6.5, 97.4, 35.5),
    "br": (-73.9, -33.8, -34.7, 5.3),
    "ar": (-73.6, -55.1, -53.6, -21.8),
    "mx": (-117.1, 14.5, -86.7, 32.7),
    "ca": (-141.0, 41.7, -52.6, 73.0),
    "au": (112.9, -43.6, 153.6, -10.7),
    "nz": (166.4, -47.3, 178.6, -34.4),
    "za": (16.5, -34.8, 32.9, -22.1),
    "eg": (24.7, 22.0, 36.9, 31.7),
    "ng": (2.7, 4.3, 14.7, 13.9),
    "tr": (26.0, 36.0, 44.8, 42.1),
    "ir": (44.0, 25.1, 63.3, 39.8),
    "id": (95.0, -11.0, 141.0, 6.1),
    "th": (97.3, 5.6, 105.6, 20.5),
    "vn": (102.1, 8.6, 109.5, 23.4),
    "ph": (117.2, 5.6, 126.6, 18.6),
    "my": (99.6, 0.9, 119.3, 7.4),
    "sg": (103.6, 1.2, 104.1, 1.5),
    "ua": (22.1, 44.4, 40.2, 52.4),
    "ro": (20.3, 43.6, 29.7, 48.3),
}
GLOBAL_BBOX = (-180.0, -60.0, 180.0, 75.0)  # non-cc TLDs: populated-world box

_DOMAIN_RE = re.compile(r"^[a-z]+://(?:[^/@]*@)?([^/:?#]+)", re.I)
_HOST_CACHE: dict[str, tuple[float, float]] = {}
_HOST_CACHE_MAX = 2_000_000
# second-level public suffixes where the registrable domain is one label deeper
_SECOND_LEVEL = {"co", "com", "org", "net", "ac", "gov", "edu"}


def registrable_domain(url: str) -> str:
    m = _DOMAIN_RE.match(url)
    host = (m.group(1) if m else url).lower().rstrip(".")
    parts = host.split(".")
    if len(parts) <= 2:
        return host
    if parts[-2] in _SECOND_LEVEL and len(parts) >= 3:
        return ".".join(parts[-3:])
    return ".".join(parts[-2:])


def tld_of(url: str) -> str:
    return registrable_domain(url).rsplit(".", 1)[-1]


def _host_point(host: str, cache: dict) -> tuple[float, float]:
    """(lon, lat) of one already-extracted host (lowercased, no trailing
    dot) — same domain/bbox/sha256 rule as :func:`registrable_domain`."""
    parts = host.split(".")
    if len(parts) <= 2:
        dom = host
    elif parts[-2] in _SECOND_LEVEL:
        dom = ".".join(parts[-3:])
    else:
        dom = ".".join(parts[-2:])
    hit = cache.get(dom)
    if hit is None:
        h = hashlib.sha256(dom.encode()).digest()
        fx = int.from_bytes(h[0:4], "big") / 2**32
        fy = int.from_bytes(h[4:8], "big") / 2**32
        box = CC_BBOX.get(dom.rsplit(".", 1)[-1], GLOBAL_BBOX)
        hit = (box[0] + fx * (box[2] - box[0]), box[1] + fy * (box[3] - box[1]))
        cache[dom] = hit
    return hit


def geocode_urls(urls) -> tuple[np.ndarray, np.ndarray]:
    """url column -> (lon, lat): sha256(registrable domain) gives two
    uniform u32 fractions inside the TLD's bbox.

    Host extraction runs as ONE Arrow RE2 kernel over the column; the
    Python domain/shasum work then touches only the DICTIONARY of unique
    hosts (~50 pages per domain in real crawls), not every row."""
    arr = urls if isinstance(urls, (pa.Array, pa.ChunkedArray)) else pa.array(list(urls), type=pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    import pyarrow.compute as pc

    m = pc.extract_regex(arr, r"^[a-zA-Z]+://(?:[^/@]*@)?(?P<host>[^/:?#]+)")
    host = pc.coalesce(pc.struct_field(m, "host"), arr)
    host = pc.utf8_rtrim(pc.utf8_lower(host), characters=".")
    enc = pc.dictionary_encode(host)
    uniq = enc.dictionary.to_pylist()
    inv = enc.indices.to_numpy(zero_copy_only=False)
    lon_u = np.empty(len(uniq), dtype=np.float64)
    lat_u = np.empty(len(uniq), dtype=np.float64)
    # per-WORKER-PROCESS host cache: Ray reuses worker processes across
    # tasks and executions, so after warm-up the sha256/domain work is a
    # dict hit per unique host; bounded so 100 TB of distinct hosts can't
    # exhaust worker memory
    cache = _HOST_CACHE
    if len(cache) > _HOST_CACHE_MAX:
        cache.clear()
    dom_cache: dict[str, tuple[float, float]] = {}
    for j, h in enumerate(uniq):
        hit = cache.get(h)
        if hit is None:
            hit = cache[h] = _host_point(h, dom_cache)
        lon_u[j], lat_u[j] = hit
    return lon_u[inv], lat_u[inv]


def geocode_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """map_batches stage: append lon/lat derived from the url column."""
    lon, lat = geocode_urls(batch[url_col])
    return batch.append_column("lon", pa.array(lon)).append_column("lat", pa.array(lat))


# ---------------------------------------------------------------------------
# SQL-expressible variant over integer ids (DuckDB oracle parity)
# ---------------------------------------------------------------------------

LON_MULT, LAT_MULT = 9973, 7919  # primes; doc_id arithmetic is exact in int64


def geocode_doc_ids(doc_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """doc_id -> (lon, lat) with pure int64 arithmetic + one exact float
    division; DuckDB computes the identical bits (see ``sql_exprs``)."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    lon = (ids * LON_MULT % 36000).astype(np.float64) / 100.0 - 180.0
    lat = (ids * LAT_MULT % 18000).astype(np.float64) / 100.0 - 90.0
    return lon, lat


def sql_exprs(id_col: str = "doc_id") -> tuple[str, str]:
    """(lon_sql, lat_sql) mirroring geocode_doc_ids bit-for-bit."""
    lon = f"(CAST(({id_col} * {LON_MULT}) % 36000 AS DOUBLE) / 100.0 - 180.0)"
    lat = f"(CAST(({id_col} * {LAT_MULT}) % 18000 AS DOUBLE) / 100.0 - 90.0)"
    return lon, lat


def geocode_docs_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    lon, lat = geocode_doc_ids(batch[id_col].to_numpy(zero_copy_only=False))
    return batch.append_column("lon", pa.array(lon)).append_column("lat", pa.array(lat))
