"""Raster / tiling (SURVEY.md §2.8 viz partitioner + §3.3 pipeline).

* :mod:`.tile`   — world->pixel->tile assignment (exact port of the
  reference formulas) + heatmap-style per-pixel aggregation
* :mod:`.raster` — in-memory raster grid, RS_Value lookups, zonal stats,
  GeoTIFF + ArcInfo ASCII Grid codecs
"""

from .tile import pixel_to_tile, tile_assign_batch_fn, world_to_pixel  # noqa: F401
from .rasterize import choropleth_map, geometry_pixels, rasterize_batch_fn, scatter_plot  # noqa: F401
from .raster import (  # noqa: F401
    Raster,
    RasterValueLookup,
    as_arc_grid,
    as_geotiff,
    from_arc_grid,
    from_geotiff,
    rs_value,
)
