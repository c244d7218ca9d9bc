"""Raster / tiling (SURVEY.md §2.8 viz partitioner + §3.3 pipeline).

* :mod:`.tile`   — world->pixel->tile assignment (exact port of the
  reference formulas) + heatmap-style per-pixel aggregation
* :mod:`.raster` — in-memory raster grid, RS_Value lookups, zonal stats
"""

from .tile import pixel_to_tile, tile_assign_batch_fn, world_to_pixel  # noqa: F401
from .raster import Raster, RasterValueLookup, rs_value  # noqa: F401
