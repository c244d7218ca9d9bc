"""Cell / space-filling-curve encoders (SURVEY.md §2.2 "cell encoders").

The reference exposes ``ST_S2CellIDs`` (``common/.../Functions.java:572-585``
via ``utils/S2Utils.java``) and ``ST_GeoHash``
(``utils/PointGeoHashEncoder.java``). This package provides:

* :mod:`.s2`      — S2 cell ids (faithful numpy port of the public
  face/UV/ST quadratic projection + Hilbert curve position algorithm)
* :mod:`.geohash` — standard base-32 geohash encode/decode
* :mod:`.grid`    — plain lon/lat power-of-two grid (SQL-expressible;
  used for DuckDB oracles)
* :mod:`.h3lite`  — hexagonal hierarchical encoder behind the same
  interface (NOT bit-compatible with Uber H3; no H3 lib in this env)

All encoders are vectorized numpy: arrays of lon/lat in, int64/str cell
ids out — used as ``map_batches`` stages.
"""

from . import geohash, grid, h3lite, s2  # noqa: F401

ENCODERS = {
    "s2": s2.cells_for_points,
    "geohash": geohash.encode_many,
    "grid": grid.cell_ids,
    "h3lite": h3lite.cell_ids,
}
