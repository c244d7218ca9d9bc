"""Standard base-32 geohash (ST_GeoHash / ST_GeomFromGeoHash semantics,
reference ``common/.../utils/PointGeoHashEncoder.java`` and
``GeoHashDecoder.java:28``). Vectorized bit-interleave encode."""

from __future__ import annotations

import numpy as np

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_BASE32_INV = {c: i for i, c in enumerate(_BASE32)}


def encode_many(lon: np.ndarray, lat: np.ndarray, precision: int) -> np.ndarray:
    """Geohash strings for arrays of lon/lat at the given precision
    (number of base-32 characters)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    nbits = precision * 5
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    # quantize each axis to its bit count (binary subdivision == floor scaling)
    li = np.clip(((lon + 180.0) / 360.0 * (1 << lon_bits)).astype(np.int64), 0, (1 << lon_bits) - 1)
    la = np.clip(((lat + 90.0) / 180.0 * (1 << lat_bits)).astype(np.int64), 0, (1 << lat_bits) - 1)
    # interleave: even global bit positions (0-based from MSB) take lon
    total = np.zeros(len(lon), dtype=np.uint64)
    for b in range(nbits):
        if b % 2 == 0:  # lon bit
            src = (li >> np.int64(lon_bits - 1 - b // 2)) & 1
        else:  # lat bit
            src = (la >> np.int64(lat_bits - 1 - b // 2)) & 1
        total = (total << np.uint64(1)) | src.astype(np.uint64)
    chars = np.empty((len(lon), precision), dtype="<U1")
    for c in range(precision):
        idx = (total >> np.uint64(5 * (precision - 1 - c))) & np.uint64(31)
        chars[:, c] = np.array(list(_BASE32))[idx.astype(np.int64)]
    out = np.empty(len(lon), dtype=object)
    for i in range(len(lon)):
        out[i] = "".join(chars[i])
    return out


def encode(lon: float, lat: float, precision: int) -> str:
    return str(encode_many(np.array([lon]), np.array([lat]), precision)[0])


def decode_bbox(gh: str) -> tuple[float, float, float, float]:
    """Geohash -> (minlon, minlat, maxlon, maxlat)."""
    lon_lo, lon_hi = -180.0, 180.0
    lat_lo, lat_hi = -90.0, 90.0
    even = True
    for ch in gh.lower():
        val = _BASE32_INV[ch]
        for b in range(4, -1, -1):
            bit = (val >> b) & 1
            if even:
                mid = (lon_lo + lon_hi) / 2
                if bit:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if bit:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return (lon_lo, lat_lo, lon_hi, lat_hi)


def decode(gh: str) -> tuple[float, float]:
    """Geohash -> center (lon, lat)."""
    minlon, minlat, maxlon, maxlat = decode_bbox(gh)
    return ((minlon + maxlon) / 2, (minlat + maxlat) / 2)
