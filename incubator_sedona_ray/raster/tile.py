"""Pixel / tile assignment — vectorized ports of the reference's viz
formulas, so tile ids match exactly:

* world -> pixel: ``RasterizationUtils.FindOnePixelCoordinate``
  (``viz/.../utils/RasterizationUtils.java:59-100``): linear scale + clamp
  of the max edge into the last pixel
* pixel -> 1D pixel id: ``Encode2DTo1DId`` (``:173``): ``px + py * resX``
* pixel -> tile id: ``VisualizationPartitioner.Calculate2DPartitionId``
  (``viz/.../core/VisualizationPartitioner.java:105-112``; note the
  Y-FLIP: tile row 0 is the TOP row) then ``Encode2DTo1DId(partX, partY)``

The heatmap pipeline (SURVEY.md §3.3) = ``tile_assign`` ->
``groupby(pixel_id).sum(weight)``, with per-batch partial bincount
pre-aggregation so the shuffle moves one row per distinct pixel per batch,
not one row per input point.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def world_to_pixel(
    x: np.ndarray,
    y: np.ndarray,
    boundary: tuple[float, float, float, float],
    res_x: int,
    res_y: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized FindOnePixelCoordinate. Returns int64 (px, py); points
    outside the boundary produce out-of-range pixels — filter with
    ``(0 <= px) & (px < res_x) & ...`` (the reference drops them at encode)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    minx, miny, maxx, maxy = (float(v) for v in boundary)
    w, h = maxx - minx, maxy - miny
    fx = (x - minx) / w * res_x
    fy = (y - miny) / h * res_y
    px = fx.astype(np.int64)
    py = fy.astype(np.int64)
    xrem = (x - minx) % w
    yrem = (y - miny) % h
    px = np.where((xrem == 0.0) & (fx != 0.0), px - 1, px)
    py = np.where((yrem == 0.0) & (fy != 0.0), py - 1, py)
    px = np.where(px >= res_x, px - 1, px)
    py = np.where(py >= res_y, py - 1, py)
    return px, py


def encode_pixel_id(px: np.ndarray, py: np.ndarray, res_x: int) -> np.ndarray:
    return np.asarray(px, dtype=np.int64) + np.asarray(py, dtype=np.int64) * res_x


def pixel_to_tile(
    px: np.ndarray,
    py: np.ndarray,
    res_x: int,
    res_y: int,
    part_x: int,
    part_y: int,
) -> np.ndarray:
    """CalculatePartitionId: tile column px//(resX/partX), tile row
    FLIPPED (partY-1 - py//(resY/partY)), encoded as col + row*partX."""
    ix = res_x // part_x
    iy = res_y // part_y
    tx = np.asarray(px, dtype=np.int64) // ix
    ty = part_y - 1 - np.asarray(py, dtype=np.int64) // iy
    return tx + ty * part_x


def tile_assign_batch_fn(
    boundary: tuple[float, float, float, float],
    res_x: int,
    res_y: int,
    part_x: int,
    part_y: int,
    x_col: str = "lon",
    y_col: str = "lat",
    drop_outside: bool = True,
):
    """map_batches stage appending ``pixel_x, pixel_y, pixel_id, tile_id``."""

    def fn(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False)
        y = batch[y_col].to_numpy(zero_copy_only=False)
        px, py = world_to_pixel(x, y, boundary, res_x, res_y)
        inside = (px >= 0) & (px < res_x) & (py >= 0) & (py < res_y)
        if drop_outside and not inside.all():
            batch = batch.filter(pa.array(inside))
            px, py = px[inside], py[inside]
        pid = encode_pixel_id(px, py, res_x)
        tid = pixel_to_tile(px, py, res_x, res_y, part_x, part_y)
        return (
            batch.append_column("pixel_x", pa.array(px))
            .append_column("pixel_y", pa.array(py))
            .append_column("pixel_id", pa.array(pid))
            .append_column("tile_id", pa.array(tid))
        )

    return fn


def block_col(block, name) -> np.ndarray:
    """Column -> numpy for both block formats an ``AggregateFn`` may see."""
    c = block[name]
    try:  # pyarrow column
        return c.to_numpy(zero_copy_only=False)
    except TypeError:  # pandas Series
        return c.to_numpy()


def dense_pixel_grids(ds, n_pixels: int, extract) -> tuple[np.ndarray, np.ndarray]:
    """Shuffle-free per-pixel reduce over a BOUNDED grid: each block task
    bincounts into a dense float64 accumulator, accumulators tree-merge
    through ``Dataset.aggregate``. ``extract(block) -> (pid, weights|None)``
    must return pixel ids already clipped to ``[0, n_pixels)``.

    Returns ``(weight_grid, presence_grid)`` — presence counts occurrences
    so callers can preserve groupby emit semantics (a pixel whose weights
    sum to 0 is still emitted). Driver merge cost is O(blocks x grid);
    callers gate on grid size and fall back to a groupby shuffle above it.
    """
    from ray.data.aggregate import AggregateFn

    def acc_block(acc: np.ndarray, block) -> np.ndarray:
        pid, w = extract(block)
        acc = acc.copy()
        counts = np.bincount(pid, minlength=n_pixels)
        acc[:n_pixels] += counts if w is None else np.bincount(pid, weights=w, minlength=n_pixels)
        acc[n_pixels:] += counts
        return acc

    agg = ds.aggregate(
        AggregateFn(
            init=lambda k: np.zeros(2 * n_pixels, dtype=np.float64),
            merge=lambda a, b: a + b,
            accumulate_block=acc_block,
            name="pixel_grid",
        )
    )
    full = agg["pixel_grid"] if agg else np.zeros(2 * n_pixels, dtype=np.float64)
    return full[:n_pixels], full[n_pixels:]


def heatmap_counts(
    ds,
    boundary: tuple[float, float, float, float],
    res_x: int,
    res_y: int,
    part_x: int,
    part_y: int,
    x_col: str = "lon",
    y_col: str = "lat",
    weight_col: str | None = None,
    partial_batch_size: int = 262144,
    dense_reduce_pixels: int = 1 << 21,
):
    """HeatMap.Visualize steps 1-2 (``viz/.../HeatMap.java:133`` +
    ``VisualizationOperator.Rasterize``): per-pixel weight sums.

    Two plans by grid size:

    * ``res_x * res_y <= dense_reduce_pixels`` (every practical viz grid):
      NO shuffle — each block task accumulates a DENSE float64 grid
      (``np.bincount`` over the whole grid), the grids tree-merge through
      ``Dataset.aggregate``, and the sparse (pixel, weight) rows are built
      from the final grid. The exchange this replaces cost more wall time
      than the whole rasterization at bench scale. Driver merge cost is
      O(blocks x grid), so huge grids fall through to the shuffle plan.
    * larger grids: pre-aggregate inside each batch (one output row per
      DISTINCT pixel per batch) so the ``groupby(pixel_id)`` shuffle is
      tiny, then sum partials. ``partial_batch_size`` is deliberately
      large: with a res_x*res_y-key space, bigger batches collapse more
      rows map-side.

    Returns a Dataset (pixel_id, pixel_x, pixel_y, tile_id, weight).
    """
    from ray.data.aggregate import Sum

    n_pixels = res_x * res_y
    if n_pixels <= dense_reduce_pixels:

        def extract(block):
            x = block_col(block, x_col)
            y = block_col(block, y_col)
            px, py = world_to_pixel(x, y, boundary, res_x, res_y)
            inside = (px >= 0) & (px < res_x) & (py >= 0) & (py < res_y)
            pid = encode_pixel_id(px[inside], py[inside], res_x)
            w = block_col(block, weight_col)[inside] if weight_col else None
            return pid, w

        grid, presence = dense_pixel_grids(ds, n_pixels, extract)
        upid = np.flatnonzero(presence)
        upx = upid % res_x
        upy = upid // res_x
        import ray as _ray

        return _ray.data.from_arrow(
            pa.table(
                {
                    "pixel_id": pa.array(upid, type=pa.int64()),
                    "pixel_x": pa.array(upx, type=pa.int64()),
                    "pixel_y": pa.array(upy, type=pa.int64()),
                    "tile_id": pa.array(
                        pixel_to_tile(upx, upy, res_x, res_y, part_x, part_y), type=pa.int64()
                    ),
                    "weight": pa.array(grid[upid], type=pa.float64()),
                }
            )
        )

    def partial(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False)
        y = batch[y_col].to_numpy(zero_copy_only=False)
        px, py = world_to_pixel(x, y, boundary, res_x, res_y)
        inside = (px >= 0) & (px < res_x) & (py >= 0) & (py < res_y)
        px, py = px[inside], py[inside]
        pid = encode_pixel_id(px, py, res_x)
        w = (
            batch[weight_col].to_numpy(zero_copy_only=False)[inside]
            if weight_col
            else np.ones(len(pid))
        )
        upid, inv = np.unique(pid, return_inverse=True)
        wsum = np.bincount(inv, weights=w)
        upx = upid % res_x
        upy = upid // res_x
        return pa.table(
            {
                "pixel_id": upid,
                "pixel_x": upx,
                "pixel_y": upy,
                "tile_id": pixel_to_tile(upx, upy, res_x, res_y, part_x, part_y),
                "weight": wsum,
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=partial_batch_size)
    agg = partials.groupby("pixel_id").aggregate(Sum("weight", alias_name="weight"))

    def reattach(batch: pa.Table) -> pa.Table:
        pid = batch["pixel_id"].to_numpy(zero_copy_only=False)
        px = pid % res_x
        py = pid // res_x
        return (
            batch.append_column("pixel_x", pa.array(px))
            .append_column("pixel_y", pa.array(py))
            .append_column("tile_id", pa.array(pixel_to_tile(px, py, res_x, res_y, part_x, part_y)))
        )

    return agg.map_batches(reattach, batch_format="pyarrow")
