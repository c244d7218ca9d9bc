"""Plain lon/lat power-of-two grid cells.

The SQL-expressible member of the encoder family: the exact same arithmetic
runs in the DuckDB oracle (`oracle_sql`), so grid-cell joins/aggregations
get a bit-exact correctness check. Level L splits [-180,180]x[-90,90] into
2^L x 2^L cells; ``cell_id = ix * 2^L + iy``.

DuckDB equivalent (mirror the expression tree exactly for bit-identical
floats)::

    least(greatest(floor((lon + 180.0) / 360.0 * n), 0), n - 1) * n
      + least(greatest(floor((lat + 90.0) / 180.0 * n), 0), n - 1)
"""

from __future__ import annotations

import numpy as np


def cell_ids(lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
    n = 1 << level
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    ix = np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    iy = np.clip(np.floor((lat + 90.0) / 180.0 * n), 0, n - 1).astype(np.int64)
    return ix * n + iy


def cell_bounds(cell_id: int, level: int) -> tuple[float, float, float, float]:
    n = 1 << level
    ix, iy = divmod(int(cell_id), n)
    w, h = 360.0 / n, 180.0 / n
    return (-180.0 + ix * w, -90.0 + iy * h, -180.0 + (ix + 1) * w, -90.0 + (iy + 1) * h)


def sql_expr(lon_col: str, lat_col: str, level: int) -> str:
    """DuckDB SQL expression computing the same cell id."""
    n = 1 << level
    return (
        f"(CAST(least(greatest(floor(({lon_col} + 180.0) / 360.0 * {n}), 0), {n - 1}) AS BIGINT) * {n} "
        f"+ CAST(least(greatest(floor(({lat_col} + 90.0) / 180.0 * {n}), 0), {n - 1}) AS BIGINT))"
    )
