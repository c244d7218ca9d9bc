"""Geometry -> pixel rasterization (the reference's RasterizationUtils).

Ports ``viz/.../utils/RasterizationUtils.java`` semantics:

* point -> its single pixel (``FindOnePixelCoordinate``, exact port in
  :func:`..tile.world_to_pixel`)
* linestring -> Bresenham walk per segment between the segment endpoints'
  pixel coordinates (``FindPixelCoordinates(LineString):438``)
* polygon OUTLINE -> Bresenham per shell edge
  (``FindPixelCoordinates(Polygon):293`` — the ScatterPlot path)
* polygon FILL -> every integer pixel STRICTLY inside the pixel-space
  shell (``FindPixelCoordinates(Polygon, weight):323-357``: JTS
  ``contains`` over the vertex-truncated pixel polygon — the
  ChoroplethMap path); the strict-interior test reuses the vectorized
  point-locate kernel from :mod:`..geom.predicates`

All functions return (px, py) int64 arrays, deduplicated, clipped to the
raster; they run per geometry inside ``map_batches`` stages
(:func:`rasterize_batch_fn`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import wkb as _wkb
from ..geom.core import Geometry, GeometryType
from ..geom.predicates import INTERIOR, locate_points_in_polygon
from .tile import world_to_pixel


def bresenham(x0: int, y0: int, x1: int, y1: int) -> tuple[np.ndarray, np.ndarray]:
    """Integer pixels touched by the segment (standard Bresenham, the
    algorithm the reference names at ``RasterizationUtils.java:371``)."""
    dx, dy = abs(x1 - x0), abs(y1 - y0)
    n = max(dx, dy) + 1
    xs = np.rint(np.linspace(x0, x1, n)).astype(np.int64)
    ys = np.rint(np.linspace(y0, y1, n)).astype(np.int64)
    return xs, ys


def _ring_pixel_coords(ring: np.ndarray, boundary, res_x: int, res_y: int):
    px, py = world_to_pixel(ring[:, 0], ring[:, 1], boundary, res_x, res_y)
    return px, py


def _path_pixels(px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    xs_all, ys_all = [], []
    for i in range(len(px) - 1):
        xs, ys = bresenham(int(px[i]), int(py[i]), int(px[i + 1]), int(py[i + 1]))
        xs_all.append(xs)
        ys_all.append(ys)
    if not xs_all:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(xs_all), np.concatenate(ys_all)


def _clip_dedup(px: np.ndarray, py: np.ndarray, res_x: int, res_y: int):
    ok = (px >= 0) & (px < res_x) & (py >= 0) & (py < res_y)
    flat = px[ok] * res_y + py[ok]
    uniq = np.unique(flat)
    return uniq // res_y, uniq % res_y


def polygon_fill_pixels(g: Geometry, boundary, res_x: int, res_y: int):
    """Strictly-interior pixels of the VERTEX-TRUNCATED pixel-space polygon
    (reference ``:323-357``: pixel centers tested with JTS contains, which
    excludes the boundary)."""
    rings = g.coords if isinstance(g.coords, list) else [g.coords]
    pix_rings = []
    for r in rings:
        px, py = _ring_pixel_coords(np.asarray(r, dtype=np.float64), boundary, res_x, res_y)
        ring = np.column_stack([px, py]).astype(np.float64)
        if not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        pix_rings.append(ring)
    shell = pix_rings[0]
    x0, x1 = int(shell[:, 0].min()), int(shell[:, 0].max())
    y0, y1 = int(shell[:, 1].min()), int(shell[:, 1].max())
    if x1 < x0 or y1 < y0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    # banded scan: a world-extent polygon at high res would otherwise
    # materialize the whole bbox grid at once (O(width*height) points)
    band = max(1, (1 << 20) // max(x1 - x0 + 1, 1))
    xs_all, ys_all = [], []
    for yb in range(y0, y1 + 1, band):
        ye = min(yb + band - 1, y1)
        gx, gy = np.meshgrid(np.arange(x0, x1 + 1), np.arange(yb, ye + 1), indexing="ij")
        gx, gy = gx.ravel().astype(np.float64), gy.ravel().astype(np.float64)
        loc = locate_points_in_polygon(gx, gy, pix_rings)
        inside = loc == INTERIOR
        xs_all.append(gx[inside].astype(np.int64))
        ys_all.append(gy[inside].astype(np.int64))
    return _clip_dedup(np.concatenate(xs_all), np.concatenate(ys_all), res_x, res_y)


def geometry_pixels(g: Geometry, boundary, res_x: int, res_y: int, fill: bool = False):
    """(px, py) pixels of one geometry: point pixel / Bresenham path /
    polygon outline (``fill=False``) or strict-interior fill (``fill=True``)."""
    if g.kind == GeometryType.POINT:
        x, y = g.all_coords()[0][:2]
        px, py = world_to_pixel(np.array([x]), np.array([y]), boundary, res_x, res_y)
        return _clip_dedup(px, py, res_x, res_y)
    if g.kind == GeometryType.LINESTRING:
        px, py = _ring_pixel_coords(np.asarray(g.coords, dtype=np.float64), boundary, res_x, res_y)
        return _clip_dedup(*_path_pixels(px, py), res_x, res_y)
    if g.kind == GeometryType.POLYGON:
        if fill:
            return polygon_fill_pixels(g, boundary, res_x, res_y)
        shell = np.asarray((g.coords if isinstance(g.coords, list) else [g.coords])[0], dtype=np.float64)
        px, py = _ring_pixel_coords(shell, boundary, res_x, res_y)
        return _clip_dedup(*_path_pixels(px, py), res_x, res_y)
    # multi / collection: union of parts
    xs_all, ys_all = [], []
    for p in g.parts():
        xs, ys = geometry_pixels(p, boundary, res_x, res_y, fill)
        xs_all.append(xs)
        ys_all.append(ys)
    if not xs_all:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return _clip_dedup(np.concatenate(xs_all), np.concatenate(ys_all), res_x, res_y)


def rasterize_batch_fn(
    boundary,
    res_x: int,
    res_y: int,
    geom_col: str = "geom",
    weight_col: str | None = None,
    fill: bool = False,
):
    """map_batches stage: WKB geometry rows -> (pixel_x, pixel_y, weight)
    rows. ``weight_col=None`` -> weight 1.0 per pixel (ScatterPlot);
    ``fill=True`` fills polygons (ChoroplethMap)."""

    def stage(batch: pa.Table) -> pa.Table:
        blobs = batch[geom_col].to_pylist()
        weights = (
            batch[weight_col].to_numpy(zero_copy_only=False)
            if weight_col is not None
            else np.ones(len(blobs))
        )
        xs_all, ys_all, w_all = [], [], []
        for blob, w in zip(blobs, weights):
            if blob is None:
                continue
            px, py = geometry_pixels(_wkb.from_wkb(blob), boundary, res_x, res_y, fill)
            xs_all.append(px)
            ys_all.append(py)
            w_all.append(np.full(len(px), float(w)))
        if xs_all:
            px = np.concatenate(xs_all)
            py = np.concatenate(ys_all)
            w = np.concatenate(w_all)
        else:
            px = py = np.empty(0, np.int64)
            w = np.empty(0, np.float64)
        return pa.table({"pixel_x": px, "pixel_y": py, "weight": w})

    return stage


def _pixel_sum(ds, res_x: int | None = None, res_y: int | None = None, dense_reduce_pixels: int = 1 << 21):
    """Per-pixel weight sums.

    When the grid size is known and bounded (every practical viz grid) the
    shuffle is skipped entirely: each block task bincounts into a dense
    float64 grid and the grids tree-merge through ``Dataset.aggregate`` —
    the same plan as ``heatmap_counts``, which replaced a ~2 s exchange
    with a sub-100 ms reduce at bench scale. Otherwise: partial per-batch
    pre-aggregation + one tiny shuffle + a vectorized native Sum (a
    per-group pandas ``map_groups`` here would pay one Python call per
    DISTINCT pixel)."""
    from ray.data.aggregate import Sum

    from .tile import block_col, dense_pixel_grids

    if res_x is not None and res_y is not None and res_x * res_y <= dense_reduce_pixels:
        n_pixels = res_x * res_y

        def extract(block):
            px = block_col(block, "pixel_x").astype(np.int64)
            py = block_col(block, "pixel_y").astype(np.int64)
            w = block_col(block, "weight")
            # rasterize_batch_fn pre-clips, but a future caller might not —
            # bound-filter so a stray pixel can't corrupt the bincount
            ok = (px >= 0) & (px < res_x) & (py >= 0) & (py < res_y)
            if not ok.all():
                px, py, w = px[ok], py[ok], w[ok]
            return py * res_x + px, w

        grid, presence = dense_pixel_grids(ds, n_pixels, extract)
        upid = np.flatnonzero(presence)
        import ray as _ray

        return _ray.data.from_arrow(
            pa.table(
                {
                    "pixel_x": pa.array(upid % res_x, type=pa.int64()),
                    "pixel_y": pa.array(upid // res_x, type=pa.int64()),
                    "weight": pa.array(grid[upid], type=pa.float64()),
                }
            )
        )

    def partial(batch: pa.Table) -> pa.Table:
        px = batch["pixel_x"].to_numpy(zero_copy_only=False)
        py = batch["pixel_y"].to_numpy(zero_copy_only=False)
        w = batch["weight"].to_numpy(zero_copy_only=False)
        key = px * np.int64(1 << 32) + py
        uniq, inv = np.unique(key, return_inverse=True)
        sums = np.bincount(inv, weights=w)
        return pa.table({"pk": uniq, "weight": sums})

    comb = ds.map_batches(partial, batch_format="pyarrow")
    agg = comb.groupby("pk").aggregate(Sum("weight", alias_name="weight"))

    def decode(batch: pa.Table) -> pa.Table:
        pk = batch["pk"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "pixel_x": (pk // (1 << 32)).astype(np.int64),
                "pixel_y": (pk % (1 << 32)).astype(np.int64),
                "weight": batch["weight"].to_numpy(zero_copy_only=False).astype(np.float64),
            }
        )

    return agg.map_batches(decode, batch_format="pyarrow")


def scatter_plot(ds, boundary, res_x, res_y, part_x, part_y, geom_col="geom", blur_radius=0):
    """ScatterPlot (``extension/visualizationEffect/ScatterPlot.java``):
    rasterize each geometry (point pixel / line path / polygon outline),
    count per pixel, render per-tile PNGs."""
    from .viz import render_tiles

    pix = _pixel_sum(
        ds.map_batches(rasterize_batch_fn(boundary, res_x, res_y, geom_col), batch_format="pyarrow"),
        res_x=res_x, res_y=res_y,
    )
    return render_tiles(pix, res_x, res_y, part_x, part_y, blur_radius=blur_radius)


def choropleth_map(ds, boundary, res_x, res_y, part_x, part_y, geom_col="geom", value_col="value", blur_radius=0):
    """ChoroplethMap (``extension/visualizationEffect/ChoroplethMap.java``):
    polygons filled with a per-polygon value (e.g. a join count), summed
    per pixel where polygons overlap, rendered per-tile."""
    from .viz import render_tiles

    pix = _pixel_sum(
        ds.map_batches(
            rasterize_batch_fn(boundary, res_x, res_y, geom_col, weight_col=value_col, fill=True),
            batch_format="pyarrow",
        ),
        res_x=res_x, res_y=res_y,
    )
    return render_tiles(pix, res_x, res_y, part_x, part_y, blur_radius=blur_radius)
