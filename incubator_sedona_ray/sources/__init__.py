"""Sources / sinks beyond plain parquet (SURVEY.md §2.1)."""

from .readers import read_geoparquet, read_wkt_csv, write_wkt  # noqa: F401
from .earthdata import earthdata_points, earthdata_points_fn  # noqa: F401
