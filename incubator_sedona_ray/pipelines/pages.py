"""The flagship pipeline: Common-Crawl-style pages -> geocode -> cell encode
-> PIP join vs country-bbox zones -> tile assign (north rule end-to-end).

``synth_pages_fn`` deterministically lifts the driver's ``documents`` table
into the BASELINE.json input shape (url:string, warc_ts:timestamp,
html:binary, text:string, lang:string) — no external data; ``text`` flows
through every stage byte-identical (checked by tests via sha256).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..geom.core import Geometry
from ..geom.wkb import to_wkb
from ..encoders import s2 as _s2
from ..join.broadcast import broadcast_spatial_join
from ..raster.tile import tile_assign_batch_fn
from ..text.geocode import CC_BBOX, geocode_batch

_LANG_TLDS = {
    "en": ["com", "org", "uk", "au", "ca"],
    "zh": ["cn", "sg"],
    "es": ["es", "mx", "ar"],
    "de": ["de", "at", "ch"],
    "fr": ["fr", "be", "net"],
}
_BASE_TS = np.datetime64("2024-01-01T00:00:00", "us")

WORLD = (-180.0, -90.0, 180.0, 90.0)


def synth_pages_fn(batch: pa.Table) -> pa.Table:
    """documents row -> page row (deterministic; url unique via doc_id)."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    langs = batch["lang"].to_pylist()
    sources = batch["source"].to_pylist()
    texts = batch["text"].to_pylist()
    urls = []
    for i, lang, src in zip(ids, langs, sources):
        tlds = _LANG_TLDS.get(lang, ["com"])
        urls.append(f"https://{src}-{int(i)}.{tlds[int(i) % len(tlds)]}/p/{int(i)}")
    # realistic chrome: head/title/style/script/comment wrap the body text;
    # text.extract strip-mode must recover `text` byte-identically from this
    # (the north-star invariant, checked by the html_extract query)
    html = [
        b"<html><head><title>" + u.encode() + b"</title><style>p{margin:0}</style></head>"
        b"<body><script>var n=1;</script><!-- warc --><p>" + t.encode() + b"</p></body></html>"
        for u, t in zip(urls, texts)
    ]
    ts = _BASE_TS + (ids * np.timedelta64(1, "s")).astype("timedelta64[us]")
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(html, type=pa.binary()),
            "text": batch["text"],
            "lang": batch["lang"],
        }
    )


def country_zones_table() -> pa.Table:
    """Polygon layer: one zone per ccTLD country bbox (geocoder closed-form
    oracle: a page geocoded from ccTLD X lands inside zone X, excepting
    overlapping boxes where membership is still deterministic)."""
    ids, wkbs = [], []
    for cc, (minx, miny, maxx, maxy) in sorted(CC_BBOX.items()):
        ids.append(cc)
        wkbs.append(to_wkb(Geometry.box(minx, miny, maxx, maxy)))
    return pa.table({"zone_cc": pa.array(ids), "geom": pa.array(wkbs, type=pa.binary())})


def flagship_pipeline(documents_ds, *, s2_level: int = 10, res: int = 1024, tiles: int = 8):
    """documents -> pages -> geocode(url) -> s2 cells -> broadcast PIP join
    vs country zones (left_outer keeps every page) -> tile assignment.

    All stateless map_batches except the broadcast join probe; zero
    shuffles — the scale-linear path. Returns a Dataset with the original
    page payload plus (lon, lat, s2_cell, zone_cc, pixel/tile columns).
    """
    pages = documents_ds.map_batches(synth_pages_fn, batch_format="pyarrow")
    geo = pages.map_batches(geocode_batch, batch_format="pyarrow")

    def add_cells(batch: pa.Table) -> pa.Table:
        cells = _s2.cells_for_points(
            batch["lon"].to_numpy(zero_copy_only=False),
            batch["lat"].to_numpy(zero_copy_only=False),
            s2_level,
        )
        return batch.append_column("s2_cell", pa.array(cells))

    with_cells = geo.map_batches(add_cells, batch_format="pyarrow")
    joined = broadcast_spatial_join(
        with_cells,
        country_zones_table(),
        "covered_by",
        big_geom=("lon", "lat"),
        small_geom="geom",
        how="left_outer",
        small_prefix="zone_",
        small_columns=["zone_cc"],
    )
    tiled = joined.map_batches(
        tile_assign_batch_fn(WORLD, res, res // 2, tiles, tiles), batch_format="pyarrow"
    )
    return tiled


def run_flagship_checkpointed(documents_ds, out_dir: str, *, s2_level: int = 10, res: int = 1024, tiles: int = 8, metrics=None):
    """Flagship pipeline -> tile-partitioned checkpointed parquet output.

    Output layout: one directory per tile_id with atomic data + _SUCCESS
    marker and a manifest carrying per-partition metrics; re-running with
    the same out_dir skips completed tiles (north-rule "resumable from
    checkpoint with per-partition lineage + metrics"). Tile ids are the
    stable lineage names (deterministic pixel->tile formula)."""
    from ..state.manifest import checkpointed_write

    tiled = flagship_pipeline(documents_ds, s2_level=s2_level, res=res, tiles=tiles)
    lineage = {str(t): f"tile:{t % tiles}x{t // tiles}" for t in range(tiles * tiles)}
    return checkpointed_write(tiled, out_dir, "tile_id", lineage=lineage)
