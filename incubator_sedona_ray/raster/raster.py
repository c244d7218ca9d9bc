"""In-memory raster grid + RS_ functions.

Replaces the reference's GeoTools ``GridCoverage2D`` surface
(``common/.../raster/RasterConstructors.java:48-95``, ``PixelFunctions.java:
39-80`` RS_Value/RS_Values, ``RasterOutputs``) with a plain
(bands, H, W) ndarray + affine anchor. GeoTIFF decode/encode is REAL
(pure-numpy codec, :mod:`.geotiff`); ArcInfo ASCII Grid decode/encode is
real (text format). The Ray-side plumbing — broadcast the raster once via
``ray.put``, vectorized world->grid->value lookups inside an actor-pool
``map_batches`` stage — is likewise real and tested.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray

from ..partition.assign import resolve_ref


@dataclass
class Raster:
    """North-up=False convention: row 0 anchored at (x0, y0) growing upward;
    grid col = floor((x - x0)/pixel_w), row = floor((y - y0)/pixel_h).
    (FIXTURES.md F5: value under a point == data[floor(y)][floor(x)] for the
    unit raster anchored at the origin.)"""

    data: np.ndarray  # (bands, H, W) float64
    x0: float = 0.0
    y0: float = 0.0
    pixel_w: float = 1.0
    pixel_h: float = 1.0
    srid: int = 0
    nodata: float | None = None

    @property
    def num_bands(self) -> int:
        return self.data.shape[0]

    @property
    def height(self) -> int:
        return self.data.shape[1]

    @property
    def width(self) -> int:
        return self.data.shape[2]

    def world_to_grid(self, xs: np.ndarray, ys: np.ndarray):
        col = np.floor((np.asarray(xs, dtype=np.float64) - self.x0) / self.pixel_w).astype(np.int64)
        row = np.floor((np.asarray(ys, dtype=np.float64) - self.y0) / self.pixel_h).astype(np.int64)
        return col, row


def make_empty_raster(bands: int, width: int, height: int, x0=0.0, y0=0.0, pixel_size=1.0) -> Raster:
    """RS_MakeEmptyRaster (``RasterConstructors.java:72``)."""
    return Raster(np.zeros((bands, height, width)), x0, y0, pixel_size, pixel_size)


def from_geotiff(blob: bytes) -> Raster:
    """RS_FromGeoTiff (``RasterConstructors.java:41-48``) via the
    pure-numpy codec in :mod:`.geotiff` (strips/tiles, deflate/PackBits,
    predictor 2, PixelScale+Tiepoint geo tags — no GDAL needed)."""
    from .geotiff import decode_geotiff

    return decode_geotiff(blob)


def as_geotiff(raster: Raster) -> bytes:
    """RS_AsGeoTiff (``RasterOutputs``): lossless float64 strip GeoTIFF."""
    from .geotiff import encode_geotiff

    return encode_geotiff(raster)


def from_arc_grid(text: str | bytes) -> Raster:
    """RS_FromArcInfoAsciiGrid (``RasterConstructors.java:41``): ESRI ASCII
    grid — header (ncols/nrows/xllcorner/yllcorner/cellsize[/nodata_value])
    then rows TOP-to-bottom; flipped into this Raster's row-0-at-bottom
    convention."""
    if isinstance(text, bytes):
        text = text.decode()
    lines = [ln for ln in text.splitlines() if ln.strip()]
    hdr: dict[str, float] = {}
    i = 0
    while i < len(lines):
        parts = lines[i].split()
        if len(parts) == 2 and parts[0].lower() in (
            "ncols", "nrows", "xllcorner", "yllcorner", "xllcenter", "yllcenter", "cellsize", "nodata_value",
        ):
            hdr[parts[0].lower()] = float(parts[1])
            i += 1
        else:
            break
    ncols, nrows = int(hdr["ncols"]), int(hdr["nrows"])
    cell = hdr["cellsize"]
    # llcenter anchors the CENTER of the lower-left cell
    xll = hdr.get("xllcorner", hdr.get("xllcenter", 0.0) - cell / 2.0)
    yll = hdr.get("yllcorner", hdr.get("yllcenter", 0.0) - cell / 2.0)
    vals = np.array(" ".join(lines[i:]).split(), dtype=np.float64)
    if vals.size != nrows * ncols:
        raise ValueError(f"ArcGrid payload has {vals.size} values, expected {nrows * ncols}")
    grid = np.flipud(vals.reshape(nrows, ncols))  # top-first file order -> row 0 at bottom
    return Raster(grid[None, :, :], xll, yll, cell, cell, nodata=hdr.get("nodata_value"))


def as_arc_grid(raster: Raster, band: int = 1, fmt: str = "%.10g") -> str:
    """RS_AsArcGrid (``RasterOutputs.java``): single band -> ESRI ASCII grid
    text (rows emitted top-first). Requires square pixels (|pixel_w| ==
    |pixel_h|), the format's constraint."""
    if abs(abs(raster.pixel_w) - abs(raster.pixel_h)) > 1e-12:
        raise ValueError("ArcInfo ASCII grid requires square cells")
    g = raster.data[band - 1]
    out = [
        f"ncols {raster.width}",
        f"nrows {raster.height}",
        f"xllcorner {raster.x0!r}",
        f"yllcorner {raster.y0!r}",
        f"cellsize {abs(raster.pixel_w)!r}",
    ]
    if raster.nodata is not None:
        out.append(f"NODATA_value {raster.nodata!r}")
    for row in np.flipud(g):  # row 0 at bottom -> file wants top first
        out.append(" ".join(fmt % v for v in row))
    return "\n".join(out) + "\n"


def rs_envelope(raster: Raster):
    """RS_Envelope (``RasterAccessors.java``): the raster's bounding box as
    a polygon Geometry (min/max-normalized for negative pixel sizes)."""
    from ..geom.core import Geometry

    x1 = raster.x0 + raster.width * raster.pixel_w
    y1 = raster.y0 + raster.height * raster.pixel_h
    return Geometry.box(min(raster.x0, x1), min(raster.y0, y1), max(raster.x0, x1), max(raster.y0, y1))


def rs_metadata(raster: Raster) -> dict:
    """RS_Metadata (``RasterAccessors.java``): anchor, pixel sizes, grid
    shape, band count, srid."""
    return {
        "upperleft_x": raster.x0,
        "upperleft_y": raster.y0 + raster.height * raster.pixel_h,
        "width": raster.width,
        "height": raster.height,
        "pixel_w": raster.pixel_w,
        "pixel_h": raster.pixel_h,
        "num_bands": raster.num_bands,
        "srid": raster.srid,
    }


def rs_num_bands(raster: Raster) -> int:
    return raster.num_bands


def rs_srid(raster: Raster) -> int:
    return raster.srid


def rs_set_srid(raster: Raster, srid: int) -> Raster:
    return Raster(raster.data, raster.x0, raster.y0, raster.pixel_w, raster.pixel_h, srid, raster.nodata)


def rs_band_as_array(raster: Raster, band: int = 1) -> np.ndarray:
    """RS_BandAsArray: one band as a (H, W) float64 array (copy)."""
    return np.array(raster.data[band - 1], dtype=np.float64)


def rs_add_band_from_array(raster: Raster, band_data: np.ndarray) -> Raster:
    """RS_AddBandFromArray: append one (H, W) band."""
    band = np.asarray(band_data, dtype=np.float64).reshape(1, raster.height, raster.width)
    return Raster(
        np.concatenate([raster.data, band]),
        raster.x0,
        raster.y0,
        raster.pixel_w,
        raster.pixel_h,
        raster.srid,
        raster.nodata,
    )


def fake_checkerboard_raster(width: int = 256, height: int = 256) -> Raster:
    """Deterministic test raster: value[y][x] = y*width + x (FIXTURES.md F5)."""
    yy, xx = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    return Raster((yy * width + xx).astype(np.float64)[None, :, :])


def rs_value(raster: Raster, xs: np.ndarray, ys: np.ndarray, band: int = 1) -> np.ndarray:
    """RS_Value semantics (``PixelFunctions.java:39-80``): band is 1-based,
    out-of-extent or nodata -> NaN (the reference returns SQL NULL)."""
    if band < 1 or band > raster.num_bands:
        return np.full(len(np.atleast_1d(xs)), np.nan)
    col, row = raster.world_to_grid(xs, ys)
    ok = (col >= 0) & (col < raster.width) & (row >= 0) & (row < raster.height)
    out = np.full(len(col), np.nan)
    vals = raster.data[band - 1, row[ok], col[ok]]
    if raster.nodata is not None:
        vals = np.where(vals == raster.nodata, np.nan, vals)
    out[ok] = vals
    return out


class RasterValueLookup:
    """Actor-pool map_batches stage: holds the broadcast raster once per
    actor (the 'model loaded once per worker' analog, SURVEY.md §2.3) and
    appends a ``band_value`` column per batch."""

    def __init__(self, raster_ref, band: int = 1, x_col: str = "lon", y_col: str = "lat", out_col: str = "band_value"):
        self.raster: Raster = resolve_ref(raster_ref)
        self.band = band
        self.x_col, self.y_col, self.out_col = x_col, y_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch[self.x_col].to_numpy(zero_copy_only=False)
        y = batch[self.y_col].to_numpy(zero_copy_only=False)
        vals = rs_value(self.raster, x, y, self.band)
        return batch.append_column(self.out_col, pa.array(vals, type=pa.float64()))


def zonal_stats(
    ds,
    raster_ref,
    *,
    band: int = 1,
    zone_col: str = "band_value",
    value_col: str | None = None,
    x_col: str = "lon",
    y_col: str = "lat",
    concurrency: int | tuple[int, int] = (1, 4),
):
    """Raster-tile <-> vector zonal assignment: look up each point's raster
    zone (actor pool), then aggregate per zone. Returns a Dataset
    (zone, n [, sum_value]); NaN zones (outside the raster) are dropped."""
    from ray.data.aggregate import Count, Sum

    looked = ds.map_batches(
        RasterValueLookup,
        fn_constructor_kwargs={"raster_ref": raster_ref, "band": band, "x_col": x_col, "y_col": y_col, "out_col": zone_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def drop_nan(batch: pa.Table) -> pa.Table:
        z = batch[zone_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(~np.isnan(z)))

    looked = looked.map_batches(drop_nan, batch_format="pyarrow")
    aggs = [Count(alias_name="n")]
    if value_col:
        aggs.append(Sum(value_col, alias_name=f"sum_{value_col}"))
    return looked.groupby(zone_col).aggregate(*aggs)
