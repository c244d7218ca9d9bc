"""Viz pipeline tail: colorize, per-tile rendering, halo exchange + photo
filter (SURVEY.md §3.3 steps 3-6).

Ports the reference semantics without java.awt:

* colorize: pixel weight -> RGB via a vectorized ramp
  (``HeatMap.EncodeToRGB:89`` uses a piecewise color curve; we ship linear
  + log ramps over a red-yellow-white heat palette)
* photo filter: a (2r+1)^2 mean blur over pixel weights
  (``VisualizationOperator.ApplyPhotoFilter``) — needs neighbour pixels, so
  boundary pixels are DUPLICATED into neighbouring tiles first
  (``VisualizationPartitioner.assignPartitionIDs:139-205`` halo idiom)
* render: each tile's pixels -> an image; PNG needs zlib only (stdlib), so
  tiles are emitted as real binary images (PNG, 8-bit RGB)

Everything is columns + one ``groupby(tile_id)``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .tile import pixel_to_tile


def halo_rows(
    px: np.ndarray,
    py: np.ndarray,
    weight: np.ndarray,
    res_x: int,
    res_y: int,
    part_x: int,
    part_y: int,
    halo: int,
):
    """Duplicate pixels within ``halo`` of a tile edge into the neighbouring
    tiles (so a per-tile blur sees its neighbourhood). Returns
    (px, py, weight, tile_id) row arrays INCLUDING the originals."""
    ix, iy = res_x // part_x, res_y // part_y
    out_px, out_py, out_w, out_t = [px], [py], [weight], [pixel_to_tile(px, py, res_x, res_y, part_x, part_y)]
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            # pixels whose neighbour-tile in direction (dx, dy) is within
            # `halo` of this pixel
            near_x = ((px % ix) < halo) if dx < 0 else (((px % ix) >= ix - halo) if dx > 0 else np.ones(len(px), bool))
            near_y = ((py % iy) < halo) if dy < 0 else (((py % iy) >= iy - halo) if dy > 0 else np.ones(len(py), bool))
            m = near_x & near_y
            if not m.any():
                continue
            tx = px[m] // ix + dx
            ty_grid = py[m] // iy + dy
            valid = (tx >= 0) & (tx < part_x) & (ty_grid >= 0) & (ty_grid < part_y)
            if not valid.any():
                continue
            sel = np.nonzero(m)[0][valid]
            # tile id of the neighbour tile (with the reference's y flip)
            tid = (tx[valid]) + (part_y - 1 - ty_grid[valid]) * part_x
            out_px.append(px[sel])
            out_py.append(py[sel])
            out_w.append(weight[sel])
            out_t.append(tid)
    return (
        np.concatenate(out_px),
        np.concatenate(out_py),
        np.concatenate(out_w),
        np.concatenate(out_t),
    )


def colorize(weight: np.ndarray, max_weight: float, log_scale: bool = True) -> np.ndarray:
    """(n,) weights -> (n, 3) uint8 RGB, black->red->yellow->white ramp."""
    w = np.asarray(weight, dtype=np.float64)
    if log_scale:
        t = np.log1p(w) / max(np.log1p(max_weight), 1e-9)
    else:
        t = w / max(max_weight, 1e-9)
    t = np.clip(t, 0.0, 1.0)
    r = np.clip(3 * t, 0, 1)
    g = np.clip(3 * t - 1, 0, 1)
    b = np.clip(3 * t - 2, 0, 1)
    return (np.stack([r, g, b], axis=1) * 255).astype(np.uint8)


def png_encode_rgb(img: np.ndarray) -> bytes:
    """Minimal PNG encoder (8-bit RGB, no deps beyond zlib)."""
    h, w, _ = img.shape
    raw = b"".join(b"\x00" + img[row].tobytes() for row in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def render_tiles(
    pixel_ds,
    res_x: int,
    res_y: int,
    part_x: int,
    part_y: int,
    *,
    blur_radius: int = 0,
    max_weight: float | None = None,
    log_scale: bool = True,
):
    """(pixel_x, pixel_y, weight) Dataset -> (tile_id, png, width, height).

    With ``blur_radius`` > 0 the mean photo filter runs per tile over the
    halo-extended pixel set, exactly reproducing a global blur for the
    tile's own pixels. ``max_weight`` defaults to a driver-side max pass.
    """
    from ray.data.aggregate import Max

    if max_weight is None:
        max_weight = float(pixel_ds.aggregate(Max("weight"))["max(weight)"])
    ix, iy = res_x // part_x, res_y // part_y
    halo = blur_radius

    def explode(batch: pa.Table) -> pa.Table:
        px = batch["pixel_x"].to_numpy(zero_copy_only=False)
        py = batch["pixel_y"].to_numpy(zero_copy_only=False)
        w = batch["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
        if halo > 0:
            px, py, w, tid = halo_rows(px, py, w, res_x, res_y, part_x, part_y, halo)
        else:
            tid = pixel_to_tile(px, py, res_x, res_y, part_x, part_y)
        return pa.table({"pixel_x": px, "pixel_y": py, "weight": w, "tile_id": tid})

    exploded = pixel_ds.map_batches(explode, batch_format="pyarrow")

    def render(g: pd.DataFrame) -> pd.DataFrame:
        tid = int(g["tile_id"].iloc[0])
        tx = tid % part_x
        ty = part_y - 1 - tid // part_x  # un-flip to grid row
        x0, y0 = tx * ix, ty * iy
        pad = halo
        grid = np.zeros((iy + 2 * pad, ix + 2 * pad), dtype=np.float64)
        gx = g["pixel_x"].to_numpy() - x0 + pad
        gy = g["pixel_y"].to_numpy() - y0 + pad
        ok = (gx >= 0) & (gx < grid.shape[1]) & (gy >= 0) & (gy < grid.shape[0])
        np.add.at(grid, (gy[ok].astype(int), gx[ok].astype(int)), g["weight"].to_numpy()[ok])
        if pad > 0:
            k = 2 * pad + 1
            csum = np.cumsum(np.cumsum(np.pad(grid, ((1, 0), (1, 0))), axis=0), axis=1)
            blurred = (
                csum[k:, k:] - csum[:-k, k:] - csum[k:, :-k] + csum[:-k, :-k]
            ) / (k * k)
            core = blurred
        else:
            core = grid
        rgb = colorize(core.ravel(), max_weight, log_scale).reshape(core.shape[0], core.shape[1], 3)
        # image row 0 = TOP of the tile -> flip vertical (pixel y grows up)
        png = png_encode_rgb(rgb[::-1])
        return pd.DataFrame(
            {"tile_id": [tid], "png": [png], "width": [core.shape[1]], "height": [core.shape[0]]}
        )

    return exploded.groupby("tile_id").map_groups(render, batch_format="pandas")


def stitch_tiles(tile_ds, res_x: int, res_y: int, part_x: int, part_y: int):
    """(tile_id, png, width, height) Dataset -> single-row Dataset
    (png, width, height) of the full stitched image.

    Reference parity: ``viz/.../utils/ImageStitcher.java`` reassembles
    per-tile renders into one global image. Ray-Data shape: the per-tile
    PNG decode runs distributed in ``map_batches``; only the final paste
    (one task, output = exactly one image) sees all tiles — grouped under
    a constant key so the assembly itself is a ``map_groups`` stage, not
    a driver-side loop. Tiles rendered with a blur halo are cropped back
    to their core (pad inferred from width vs res_x/part_x).
    """
    from .png import png_decode

    ix, iy = res_x // part_x, res_y // part_y

    def decode(batch: pa.Table) -> pa.Table:
        rgb = [png_decode(b).tobytes() for b in batch["png"].to_pylist()]
        return pa.table(
            {
                "img_id": pa.array(np.zeros(batch.num_rows, dtype=np.int64)),
                "tile_id": batch["tile_id"],
                "rgb": pa.array(rgb, type=pa.binary()),
                "width": batch["width"],
                "height": batch["height"],
            }
        )

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        canvas = np.zeros((res_y, res_x, 3), dtype=np.uint8)
        for _, row in g.iterrows():
            tid = int(row["tile_id"])
            w, h = int(row["width"]), int(row["height"])
            pad = (w - ix) // 2
            tile = np.frombuffer(row["rgb"], dtype=np.uint8).reshape(h, w, 3)
            if pad:
                tile = tile[pad:-pad, pad:-pad]
            tx = tid % part_x
            ty_img = tid // part_x  # tile_id rows are already top-down (y flip)
            canvas[ty_img * iy : (ty_img + 1) * iy, tx * ix : (tx + 1) * ix] = tile
        png = png_encode_rgb(canvas)
        return pd.DataFrame({"png": [png], "width": [res_x], "height": [res_y]})

    return (
        tile_ds.map_batches(decode, batch_format="pyarrow")
        .groupby("img_id")
        .map_groups(assemble, batch_format="pandas")
    )
