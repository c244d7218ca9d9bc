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
    """map_batches stage transforming coordinate columns between supported
    CRSs: EPSG:4326, EPSG:3857, and any WGS84 UTM zone (EPSG:32601-60
    north / 32701-60 south, Krueger-series Transverse Mercator below)."""

    def stage(batch: pa.Table) -> pa.Table:
        x, y = transform_xy(
            src,
            dst,
            batch[x_col].to_numpy(zero_copy_only=False),
            batch[y_col].to_numpy(zero_copy_only=False),
        )
        return batch.append_column(out_x, pa.array(np.asarray(x))).append_column(
            out_y, pa.array(np.asarray(y))
        )

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


def vincenty_distance_arr(lon1, lat1, lon2, lat2, tol: float = 1e-12, max_iter: int = 200) -> np.ndarray:
    """Vectorized Vincenty inverse over coordinate arrays (WGS84 meters).
    Coincident points yield 0; antipodal non-convergence falls back to the
    scalar path's last iterate (same as the reference behavior)."""
    phi1 = np.radians(np.asarray(lat1, dtype=np.float64))
    phi2 = np.radians(np.asarray(lat2, dtype=np.float64))
    L = np.radians(np.asarray(lon2, dtype=np.float64) - np.asarray(lon1, dtype=np.float64))
    U1 = np.arctan((1 - _F) * np.tan(phi1))
    U2 = np.arctan((1 - _F) * np.tan(phi2))
    sinU1, cosU1 = np.sin(U1), np.cos(U1)
    sinU2, cosU2 = np.sin(U2), np.cos(U2)
    lam = L.copy()
    sin_sigma = np.zeros_like(lam)
    cos_sigma = np.ones_like(lam)
    sigma = np.zeros_like(lam)
    cos2_alpha = np.ones_like(lam)
    cos_2sm = np.zeros_like(lam)
    active = np.ones(lam.shape, dtype=bool)
    for _ in range(max_iter):
        if not active.any():
            break
        sinL, cosL = np.sin(lam), np.cos(lam)
        ss = np.sqrt((cosU2 * sinL) ** 2 + (cosU1 * sinU2 - sinU1 * cosU2 * cosL) ** 2)
        cs = sinU1 * sinU2 + cosU1 * cosU2 * cosL
        sg = np.arctan2(ss, cs)
        with np.errstate(invalid="ignore", divide="ignore"):
            sin_alpha = np.where(ss > 0, cosU1 * cosU2 * sinL / np.where(ss > 0, ss, 1.0), 0.0)
            c2a = 1.0 - sin_alpha**2
            c2sm = np.where(c2a != 0, cs - 2 * sinU1 * sinU2 / np.where(c2a != 0, c2a, 1.0), 0.0)
        C = _F / 16 * c2a * (4 + _F * (4 - 3 * c2a))
        lam_new = L + (1 - C) * _F * sin_alpha * (
            sg + C * ss * (c2sm + C * cs * (-1 + 2 * c2sm**2))
        )
        upd = active
        sin_sigma = np.where(upd, ss, sin_sigma)
        cos_sigma = np.where(upd, cs, cos_sigma)
        sigma = np.where(upd, sg, sigma)
        cos2_alpha = np.where(upd, c2a, cos2_alpha)
        cos_2sm = np.where(upd, c2sm, cos_2sm)
        still = np.abs(lam_new - lam) >= tol
        lam = np.where(upd, lam_new, lam)
        active = active & still
    u2 = cos2_alpha * (_R**2 - _B**2) / _B**2
    A = 1 + u2 / 16384 * (4096 + u2 * (-768 + u2 * (320 - 175 * u2)))
    Bc = u2 / 1024 * (256 + u2 * (-128 + u2 * (74 - 47 * u2)))
    d_sigma = Bc * sin_sigma * (
        cos_2sm
        + Bc / 4 * (cos_sigma * (-1 + 2 * cos_2sm**2) - Bc / 6 * cos_2sm * (-3 + 4 * sin_sigma**2) * (-3 + 4 * cos_2sm**2))
    )
    out = _B * A * (sigma - d_sigma)
    return np.where(sin_sigma == 0, 0.0, out)


def st_distancespheroid(col_a, col_b) -> pa.Array:
    """Vectorized when every row is a plain 21-byte WKB point (batch coord
    extract + one Vincenty array pass); mixed/null/exotic rows fall back to
    the per-row kernel, nulls yielding null."""
    from ..geom import wkb as _wkb

    def _blob(v):
        return v if isinstance(v, (bytes, bytearray)) or v is None else v.as_py()

    a_vals = [_blob(v) for v in col_a]
    b_vals = [_blob(v) for v in col_b]
    if a_vals and all(
        v is not None and len(v) == 21 and v[0] == 1 for v in a_vals
    ) and all(v is not None and len(v) == 21 and v[0] == 1 for v in b_vals):
        x1, y1 = _wkb.points_from_wkb(a_vals)
        x2, y2 = _wkb.points_from_wkb(b_vals)
        return pa.array(vincenty_distance_arr(x1, y1, x2, y2), type=pa.float64())
    out = []
    for a, b in zip(a_vals, b_vals):
        if a is None or b is None:
            out.append(None)
            continue
        ga, gb = _wkb.from_wkb(a), _wkb.from_wkb(b)
        out.append(vincenty_distance(ga.coords[0], ga.coords[1], gb.coords[0], gb.coords[1]))
    return pa.array(out, type=pa.float64())


# ---------------------------------------------------------------------------
# Transverse Mercator / UTM (Karney 2011 Krueger-series, public formulas) —
# unlocks arbitrary EPSG:326xx/327xx (WGS84 UTM) transforms with EPSG:4326
# as the hub CRS. Sub-millimeter accuracy within a zone (6th-order series).
# Reference behavior: Functions.java:184-212 delegates to GeoTools; we
# implement the same projection math directly.
# ---------------------------------------------------------------------------

_N3 = _F / (2.0 - _F)  # third flattening n
_A_TM = _R / (1.0 + _N3) * (1.0 + _N3**2 / 4.0 + _N3**4 / 64.0 + _N3**6 / 256.0)
_K0 = 0.9996
_E0, _N0_NORTH, _N0_SOUTH = 500000.0, 0.0, 10000000.0
_E1 = math.sqrt(_F * (2.0 - _F))  # eccentricity

_ALPHA = [
    _N3 / 2 - 2 * _N3**2 / 3 + 5 * _N3**3 / 16 + 41 * _N3**4 / 180 - 127 * _N3**5 / 288 + 7891 * _N3**6 / 37800,
    13 * _N3**2 / 48 - 3 * _N3**3 / 5 + 557 * _N3**4 / 1440 + 281 * _N3**5 / 630 - 1983433 * _N3**6 / 1935360,
    61 * _N3**3 / 240 - 103 * _N3**4 / 140 + 15061 * _N3**5 / 26880 + 167603 * _N3**6 / 181440,
    49561 * _N3**4 / 161280 - 179 * _N3**5 / 168 + 6601661 * _N3**6 / 7257600,
    34729 * _N3**5 / 80640 - 3418889 * _N3**6 / 1995840,
    212378941 * _N3**6 / 319334400,
]
_BETA = [
    _N3 / 2 - 2 * _N3**2 / 3 + 37 * _N3**3 / 96 - _N3**4 / 360 - 81 * _N3**5 / 512 + 96199 * _N3**6 / 604800,
    _N3**2 / 48 + _N3**3 / 15 - 437 * _N3**4 / 1440 + 46 * _N3**5 / 105 - 1118711 * _N3**6 / 3870720,
    17 * _N3**3 / 480 - 37 * _N3**4 / 840 - 209 * _N3**5 / 4480 + 5569 * _N3**6 / 90720,
    4397 * _N3**4 / 161280 - 11 * _N3**5 / 504 - 830251 * _N3**6 / 7257600,
    4583 * _N3**5 / 161280 - 108847 * _N3**6 / 3991680,
    20648693 * _N3**6 / 638668800,
]


def lonlat_to_utm(lon, lat, zone: int, south: bool = False):
    """Vectorized WGS84 lon/lat -> UTM easting/northing (meters)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lam0 = math.radians(zone * 6.0 - 183.0)
    lam = np.radians(lon) - lam0
    phi = np.radians(lat)
    s = np.sin(phi)
    # conformal latitude
    t = np.sinh(np.arctanh(s) - _E1 * np.arctanh(_E1 * s))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arctanh(np.sin(lam) / np.sqrt(1.0 + t * t))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    E = _E0 + _K0 * _A_TM * eta
    N = (_N0_SOUTH if south else _N0_NORTH) + _K0 * _A_TM * xi
    return E, N


def utm_to_lonlat(E, N, zone: int, south: bool = False):
    """Vectorized UTM easting/northing -> WGS84 lon/lat (degrees)."""
    E = np.asarray(E, dtype=np.float64)
    N = np.asarray(N, dtype=np.float64)
    lam0 = math.radians(zone * 6.0 - 183.0)
    xi = (N - (_N0_SOUTH if south else _N0_NORTH)) / (_K0 * _A_TM)
    eta = (E - _E0) / (_K0 * _A_TM)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    # tau' on the sphere -> tau on the ellipsoid via Newton (Karney eq. 19-21)
    tau_p = np.sin(xi_p) / np.sqrt(np.sinh(eta_p) ** 2 + np.cos(xi_p) ** 2)
    tau = tau_p.copy()
    for _ in range(5):
        sigma = np.sinh(_E1 * np.arctanh(_E1 * tau / np.sqrt(1.0 + tau * tau)))
        f_tau = tau * np.sqrt(1.0 + sigma * sigma) - sigma * np.sqrt(1.0 + tau * tau) - tau_p
        d_tau = (np.sqrt((1.0 + sigma * sigma) * (1.0 + tau * tau)) - sigma * tau) * (
            1.0 - _E1 * _E1
        ) * np.sqrt(1.0 + tau * tau) / (1.0 + (1.0 - _E1 * _E1) * tau * tau)
        tau -= f_tau / d_tau
    lat = np.degrees(np.arctan(tau))
    lon = np.degrees(np.arctan2(np.sinh(eta_p), np.cos(xi_p)) + lam0)
    return lon, lat


def _parse_crs(name: str):
    """EPSG name -> ('lonlat' | 'mercator' | ('utm', zone, south) | ('crs', CRS)).

    4326 / 3857 / WGS84-UTM keep their dedicated fast paths; every other
    code resolves through the general projection registry (``proj.py``:
    parameterized TM / LCC / Albers / LAEA + Helmert datum shifts)."""
    if name.lstrip().startswith("+"):
        # proj string ("+proj=tmerc +lat_0=... +towgs84=...") — evaluated
        # by the minimal proj-string parser over the same projection engine
        from . import proj as _proj

        return ("crs", _proj.crs_from_proj4(name))
    code = name.upper().replace("EPSG:", "")
    if code == "4326":
        return "lonlat"
    if code in ("3857", "900913", "102100"):
        return "mercator"
    if code.isdigit():
        c = int(code)
        if 32601 <= c <= 32660:
            return ("utm", c - 32600, False)
        if 32701 <= c <= 32760:
            return ("utm", c - 32700, True)
        from . import proj as _proj

        return ("crs", _proj.get_crs(c))
    raise NotImplementedError(f"CRS {name!r}: expected an EPSG:<code> name")


def _to_lonlat(crs, x, y):
    if crs == "lonlat":
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    if crs == "mercator":
        return mercator_to_lonlat(x, y)
    if crs[0] == "crs":
        return crs[1].to_wgs84(x, y)
    return utm_to_lonlat(x, y, crs[1], crs[2])


def _from_lonlat(crs, lon, lat):
    if crs == "lonlat":
        return lon, lat
    if crs == "mercator":
        return lonlat_to_mercator(lon, lat)
    if crs[0] == "crs":
        return crs[1].from_wgs84(lon, lat)
    return lonlat_to_utm(lon, lat, crs[1], crs[2])


def transform_xy(src: str, dst: str, x, y):
    """Arbitrary supported CRS -> CRS via the 4326 hub."""
    lon, lat = _to_lonlat(_parse_crs(src), x, y)
    return _from_lonlat(_parse_crs(dst), lon, lat)
