"""CRS transforms + spheroid measures.

The reference delegates ST_Transform to GeoTools (``Functions.java:184-212``)
and spheroid math to GeographicLib (``sphere/Spheroid.java``). Without those
libs we implement the pair of CRSs the web-scale pipeline actually uses —
EPSG:4326 (lon/lat) <-> EPSG:3857 (Web Mercator), closed-form public
formulas — plus Vincenty's inverse for WGS84 spheroid distance.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

_R = 6378137.0  # WGS84 semi-major
_F = 1.0 / 298.257223563
_B = _R * (1.0 - _F)
_ORIGIN = math.pi * _R  # 20037508.342789244


def lonlat_to_mercator(lon: np.ndarray, lat: np.ndarray):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -85.06, 85.06)
    x = lon * _ORIGIN / 180.0
    y = np.log(np.tan((90.0 + lat) * math.pi / 360.0)) * _R
    return x, y


def mercator_to_lonlat(x: np.ndarray, y: np.ndarray):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = x / _ORIGIN * 180.0
    lat = np.degrees(2.0 * np.arctan(np.exp(y / _R)) - math.pi / 2.0)
    return lon, lat


def st_transform_batch(src: str, dst: str, x_col: str, y_col: str, out_x: str = "x", out_y: str = "y"):
    """map_batches stage transforming coordinate columns between
    EPSG:4326 and EPSG:3857."""
    key = (src.upper(), dst.upper())
    fns = {
        ("EPSG:4326", "EPSG:3857"): lonlat_to_mercator,
        ("EPSG:3857", "EPSG:4326"): mercator_to_lonlat,
    }
    if key not in fns:
        raise NotImplementedError(f"transform {src}->{dst} (only 4326<->3857 without GeoTools)")
    fn = fns[key]

    def stage(batch: pa.Table) -> pa.Table:
        x, y = fn(
            batch[x_col].to_numpy(zero_copy_only=False),
            batch[y_col].to_numpy(zero_copy_only=False),
        )
        return batch.append_column(out_x, pa.array(x)).append_column(out_y, pa.array(y))

    return stage


def vincenty_distance(lon1: float, lat1: float, lon2: float, lat2: float, tol: float = 1e-12, max_iter: int = 200) -> float:
    """WGS84 spheroid geodesic distance in meters (Vincenty inverse,
    public-domain algorithm; ST_DistanceSpheroid semantics)."""
    phi1, phi2 = math.radians(lat1), math.radians(lat2)
    L = math.radians(lon2 - lon1)
    U1 = math.atan((1 - _F) * math.tan(phi1))
    U2 = math.atan((1 - _F) * math.tan(phi2))
    sinU1, cosU1 = math.sin(U1), math.cos(U1)
    sinU2, cosU2 = math.sin(U2), math.cos(U2)
    lam = L
    for _ in range(max_iter):
        sinL, cosL = math.sin(lam), math.cos(lam)
        sin_sigma = math.sqrt((cosU2 * sinL) ** 2 + (cosU1 * sinU2 - sinU1 * cosU2 * cosL) ** 2)
        if sin_sigma == 0:
            return 0.0
        cos_sigma = sinU1 * sinU2 + cosU1 * cosU2 * cosL
        sigma = math.atan2(sin_sigma, cos_sigma)
        sin_alpha = cosU1 * cosU2 * sinL / sin_sigma
        cos2_alpha = 1 - sin_alpha**2
        cos_2sm = cos_sigma - 2 * sinU1 * sinU2 / cos2_alpha if cos2_alpha else 0.0
        C = _F / 16 * cos2_alpha * (4 + _F * (4 - 3 * cos2_alpha))
        lam_prev = lam
        lam = L + (1 - C) * _F * sin_alpha * (
            sigma + C * sin_sigma * (cos_2sm + C * cos_sigma * (-1 + 2 * cos_2sm**2))
        )
        if abs(lam - lam_prev) < tol:
            break
    u2 = cos2_alpha * (_R**2 - _B**2) / _B**2
    A = 1 + u2 / 16384 * (4096 + u2 * (-768 + u2 * (320 - 175 * u2)))
    Bc = u2 / 1024 * (256 + u2 * (-128 + u2 * (74 - 47 * u2)))
    d_sigma = Bc * sin_sigma * (
        cos_2sm
        + Bc / 4 * (cos_sigma * (-1 + 2 * cos_2sm**2) - Bc / 6 * cos_2sm * (-3 + 4 * sin_sigma**2) * (-3 + 4 * cos_2sm**2))
    )
    return _B * A * (sigma - d_sigma)


def st_distancespheroid(col_a, col_b) -> pa.Array:
    from ..geom import wkb as _wkb

    out = []
    for a, b in zip(col_a, col_b):
        if a is None or b is None:
            out.append(None)
            continue
        ga, gb = _wkb.from_wkb(a if isinstance(a, bytes) else a.as_py()), _wkb.from_wkb(
            b if isinstance(b, bytes) else b.as_py()
        )
        out.append(vincenty_distance(ga.coords[0], ga.coords[1], gb.coords[0], gb.coords[1]))
    return pa.array(out, type=pa.float64())
