"""General map-projection engine: parameterized Transverse Mercator,
Lambert Conformal Conic (1SP/2SP), Albers Equal Area, Lambert Azimuthal
Equal Area, plus 7-parameter Helmert datum shifts and an EPSG registry.

The reference delegates ST_Transform to GeoTools for arbitrary CRSs
(``common/src/main/java/org/apache/sedona/common/Functions.java:184-212``).
Without GeoTools we implement the same projection families directly from
the public EPSG Guidance Note 7-2 formulas (methods 9807 TM, 9801/9802
LCC, 9822 Albers, 9820 LAEA) and the standard position-vector Helmert,
all vectorized over numpy arrays.

Every registered CRS transforms through the WGS84 geographic hub:

    src grid --inverse proj--> src-datum lon/lat --Helmert--> WGS84 lon/lat
             --Helmert--> dst-datum lon/lat --forward proj--> dst grid

Datums that are null-shifted relative to WGS84 at the meter level
(ETRS89, RGF93, NAD83, GDA94, CGCS2000) carry ``helmert=None`` and skip
the ECEF round-trip entirely.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import lru_cache as _lru_cache

import numpy as np

__all__ = ["get_crs", "register_crs", "crs_from_proj4", "CRS", "Ellipsoid", "SUPPORTED_HINT"]


# ---------------------------------------------------------------------------
# Ellipsoids (public EPSG parameter values)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Ellipsoid:
    a: float
    inv_f: float

    @property
    def f(self) -> float:
        return 1.0 / self.inv_f

    @property
    def b(self) -> float:
        return self.a * (1.0 - self.f)

    @property
    def e2(self) -> float:
        return self.f * (2.0 - self.f)

    @property
    def e(self) -> float:
        return math.sqrt(self.e2)

    @property
    def n3(self) -> float:
        """Third flattening n = f / (2 - f)."""
        return self.f / (2.0 - self.f)


WGS84 = Ellipsoid(6378137.0, 298.257223563)
GRS80 = Ellipsoid(6378137.0, 298.257222101)
AIRY1830 = Ellipsoid(6377563.396, 299.3249646)
CLARKE1866 = Ellipsoid(6378206.4, 294.9786982138982)
INTL1924 = Ellipsoid(6378388.0, 297.0)
BESSEL1841 = Ellipsoid(6377397.155, 299.1528128)
KRASSOVSKY1940 = Ellipsoid(6378245.0, 298.3)


# ---------------------------------------------------------------------------
# Helmert 7-parameter datum shift (position-vector convention)
# ---------------------------------------------------------------------------

_ARCSEC = math.pi / (180.0 * 3600.0)


@dataclass(frozen=True)
class Helmert:
    """src-datum -> WGS84, position-vector sign convention:
    X_wgs = T + (1 + s*1e-6) * R(rx, ry, rz) @ X_src  (rotations arcsec)."""

    tx: float
    ty: float
    tz: float
    rx: float = 0.0  # arcsec
    ry: float = 0.0
    rz: float = 0.0
    s_ppm: float = 0.0


def _geodetic_to_ecef(ell: Ellipsoid, lon, lat):
    phi = np.radians(lat)
    lam = np.radians(lon)
    sphi, cphi = np.sin(phi), np.cos(phi)
    nu = ell.a / np.sqrt(1.0 - ell.e2 * sphi * sphi)
    x = nu * cphi * np.cos(lam)
    y = nu * cphi * np.sin(lam)
    z = nu * (1.0 - ell.e2) * sphi
    return x, y, z


def _ecef_to_geodetic(ell: Ellipsoid, x, y, z):
    lam = np.arctan2(y, x)
    p = np.hypot(x, y)
    phi = np.arctan2(z, p * (1.0 - ell.e2))
    for _ in range(6):
        sphi = np.sin(phi)
        nu = ell.a / np.sqrt(1.0 - ell.e2 * sphi * sphi)
        phi = np.arctan2(z + ell.e2 * nu * sphi, p)
    return np.degrees(lam), np.degrees(phi)


def _helmert_apply(h: Helmert, x, y, z, inverse: bool = False):
    rx, ry, rz = h.rx * _ARCSEC, h.ry * _ARCSEC, h.rz * _ARCSEC
    m = 1.0 + h.s_ppm * 1e-6
    if not inverse:
        xo = h.tx + m * (x - rz * y + ry * z)
        yo = h.ty + m * (rz * x + y - rx * z)
        zo = h.tz + m * (-ry * x + rx * y + z)
        return xo, yo, zo
    # exact inverse of the small-angle forward: subtract T, divide by m,
    # apply transposed rotation (orthonormal to first order)
    xs, ys, zs = (x - h.tx) / m, (y - h.ty) / m, (z - h.tz) / m
    xo = xs + rz * ys - ry * zs
    yo = -rz * xs + ys + rx * zs
    zo = ry * xs - rx * ys + zs
    return xo, yo, zo


# ---------------------------------------------------------------------------
# Projection implementations. Each takes/returns numpy float64 arrays;
# angles in degrees at the API boundary, radians internally.
# ---------------------------------------------------------------------------


def _krueger_coeffs(n: float):
    """6th-order Krueger series alpha/beta coefficients (Karney 2011,
    public formulas) for third flattening n."""
    alpha = [
        n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180 - 127 * n**5 / 288 + 7891 * n**6 / 37800,
        13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440 + 281 * n**5 / 630 - 1983433 * n**6 / 1935360,
        61 * n**3 / 240 - 103 * n**4 / 140 + 15061 * n**5 / 26880 + 167603 * n**6 / 181440,
        49561 * n**4 / 161280 - 179 * n**5 / 168 + 6601661 * n**6 / 7257600,
        34729 * n**5 / 80640 - 3418889 * n**6 / 1995840,
        212378941 * n**6 / 319334400,
    ]
    beta = [
        n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - n**4 / 360 - 81 * n**5 / 512 + 96199 * n**6 / 604800,
        n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440 + 46 * n**5 / 105 - 1118711 * n**6 / 3870720,
        17 * n**3 / 480 - 37 * n**4 / 840 - 209 * n**5 / 4480 + 5569 * n**6 / 90720,
        4397 * n**4 / 161280 - 11 * n**5 / 504 - 830251 * n**6 / 7257600,
        4583 * n**5 / 161280 - 108847 * n**6 / 3991680,
        20648693 * n**6 / 638668800,
    ]
    return alpha, beta


@dataclass(frozen=True)
class TransverseMercator:
    """EPSG method 9807 via the Krueger series (sub-mm within ~3900 km of
    the central meridian — covers every national TM/UTM grid)."""

    ell: Ellipsoid
    lon0: float
    lat0: float
    k0: float
    fe: float
    fn: float
    _cache: dict = field(default_factory=dict, compare=False)

    def _consts(self):
        c = self._cache.get("c")
        if c is None:
            n = self.ell.n3
            a_tm = self.ell.a / (1.0 + n) * (1.0 + n**2 / 4.0 + n**4 / 64.0 + n**6 / 256.0)
            alpha, beta = _krueger_coeffs(n)
            e1 = self.ell.e
            # meridian offset: xi at (lat0, lam=0) so northing is relative
            # to the latitude of natural origin (OSGB lat0=49N etc.)
            if self.lat0 != 0.0:
                s0 = math.sin(math.radians(self.lat0))
                t0 = math.sinh(math.atanh(s0) - e1 * math.atanh(e1 * s0))
                xi0_p = math.atan(t0)  # xi' at (lat0, lam=0); eta' there is 0
                xi0 = xi0_p + sum(a * math.sin(2 * j * xi0_p) for j, a in enumerate(alpha, start=1))
                m0 = a_tm * xi0
            else:
                m0 = 0.0
            c = (a_tm, alpha, beta, e1, m0)
            self._cache["c"] = c
        return c

    def forward(self, lon, lat):
        a_tm, alpha, _beta, e1, m0 = self._consts()
        lam = np.radians(np.asarray(lon, dtype=np.float64)) - math.radians(self.lon0)
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        s = np.sin(phi)
        t = np.sinh(np.arctanh(s) - e1 * np.arctanh(e1 * s))
        xi_p = np.arctan2(t, np.cos(lam))
        eta_p = np.arctanh(np.sin(lam) / np.sqrt(1.0 + t * t))
        xi = xi_p.copy()
        eta = eta_p.copy()
        for j, a in enumerate(alpha, start=1):
            xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
            eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
        E = self.fe + self.k0 * a_tm * eta
        N = self.fn + self.k0 * (a_tm * xi - m0)
        return E, N

    def inverse(self, E, N):
        a_tm, _alpha, beta, e1, m0 = self._consts()
        E = np.asarray(E, dtype=np.float64)
        N = np.asarray(N, dtype=np.float64)
        xi = (N - self.fn + self.k0 * m0) / (self.k0 * a_tm)
        eta = (E - self.fe) / (self.k0 * a_tm)
        xi_p = xi.copy()
        eta_p = eta.copy()
        for j, b in enumerate(beta, start=1):
            xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        tau_p = np.sin(xi_p) / np.sqrt(np.sinh(eta_p) ** 2 + np.cos(xi_p) ** 2)
        tau = tau_p.copy()
        for _ in range(5):  # Newton on the ellipsoid tangent (Karney eq 19-21)
            sig = np.sinh(e1 * np.arctanh(e1 * tau / np.sqrt(1.0 + tau * tau)))
            f_tau = tau * np.sqrt(1.0 + sig * sig) - sig * np.sqrt(1.0 + tau * tau) - tau_p
            d_tau = (np.sqrt((1.0 + sig * sig) * (1.0 + tau * tau)) - sig * tau) * (
                1.0 - e1 * e1
            ) * np.sqrt(1.0 + tau * tau) / (1.0 + (1.0 - e1 * e1) * tau * tau)
            tau -= f_tau / d_tau
        lat = np.degrees(np.arctan(tau))
        lon = np.degrees(np.arctan2(np.sinh(eta_p), np.cos(xi_p))) + self.lon0
        return lon, lat


def _t_conformal(e: float, phi):
    """EPSG isometric-latitude helper t(phi) used by LCC."""
    esin = e * np.sin(phi)
    return np.tan(math.pi / 4.0 - phi / 2.0) / ((1.0 - esin) / (1.0 + esin)) ** (e / 2.0)


def _m_parallel(e2: float, phi):
    return np.cos(phi) / np.sqrt(1.0 - e2 * np.sin(phi) ** 2)


def _phi_from_t(e: float, t):
    """Invert t(phi) by fixed-point iteration (EPSG method)."""
    phi = math.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(8):
        esin = e * np.sin(phi)
        phi = math.pi / 2.0 - 2.0 * np.arctan(t * ((1.0 - esin) / (1.0 + esin)) ** (e / 2.0))
    return phi


@dataclass(frozen=True)
class LambertConformal:
    """EPSG 9802 (2SP) / 9801 (1SP when sp1 == sp2 and k0 != 1)."""

    ell: Ellipsoid
    lon0: float
    lat0: float
    sp1: float
    sp2: float
    fe: float
    fn: float
    k0: float = 1.0
    _cache: dict = field(default_factory=dict, compare=False)

    def _consts(self):
        c = self._cache.get("c")
        if c is None:
            e, e2, a = self.ell.e, self.ell.e2, self.ell.a
            p1, p2, p0 = (math.radians(v) for v in (self.sp1, self.sp2, self.lat0))
            t1, t2, t0 = (float(_t_conformal(e, np.float64(p))) for p in (p1, p2, p0))
            m1 = float(_m_parallel(e2, np.float64(p1)))
            if abs(self.sp1 - self.sp2) < 1e-12:
                n = math.sin(p1)
            else:
                m2 = float(_m_parallel(e2, np.float64(p2)))
                n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
            F = m1 / (n * t1**n)
            r0 = a * F * self.k0 * t0**n
            c = (n, a * F * self.k0, r0, e)
            self._cache["c"] = c
        return c

    def forward(self, lon, lat):
        n, aF, r0, e = self._consts()
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        theta = n * (np.radians(np.asarray(lon, dtype=np.float64)) - math.radians(self.lon0))
        r = aF * _t_conformal(e, phi) ** n
        E = self.fe + r * np.sin(theta)
        N = self.fn + r0 - r * np.cos(theta)
        return E, N

    def inverse(self, E, N):
        n, aF, r0, e = self._consts()
        dE = np.asarray(E, dtype=np.float64) - self.fe
        dN = r0 - (np.asarray(N, dtype=np.float64) - self.fn)
        r = np.hypot(dE, dN) * np.sign(n)
        t = (r / aF) ** (1.0 / n)
        theta = np.arctan2(np.sign(n) * dE, np.sign(n) * dN)
        lon = np.degrees(theta / n) + self.lon0
        lat = np.degrees(_phi_from_t(e, t))
        return lon, lat


def _q_authalic(e: float, e2: float, phi):
    """Authalic-latitude helper q(phi) (EPSG 9822/9820)."""
    sphi = np.sin(phi)
    esin = e * sphi
    return (1.0 - e2) * (sphi / (1.0 - e2 * sphi * sphi) - (1.0 / (2.0 * e)) * np.log((1.0 - esin) / (1.0 + esin)))


def _phi_from_q(e: float, e2: float, q):
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _ in range(8):
        sphi = np.sin(phi)
        esin = e * sphi
        one = 1.0 - e2 * sphi * sphi
        corr = (one**2 / (2.0 * np.cos(phi))) * (
            q / (1.0 - e2) - sphi / one + (1.0 / (2.0 * e)) * np.log((1.0 - esin) / (1.0 + esin))
        )
        phi = phi + corr
    return phi


@dataclass(frozen=True)
class AlbersEqualArea:
    """EPSG method 9822."""

    ell: Ellipsoid
    lon0: float
    lat0: float
    sp1: float
    sp2: float
    fe: float
    fn: float
    _cache: dict = field(default_factory=dict, compare=False)

    def _consts(self):
        c = self._cache.get("c")
        if c is None:
            e, e2, a = self.ell.e, self.ell.e2, self.ell.a
            p1, p2, p0 = (math.radians(v) for v in (self.sp1, self.sp2, self.lat0))
            m1 = float(_m_parallel(e2, np.float64(p1)))
            m2 = float(_m_parallel(e2, np.float64(p2)))
            q1 = float(_q_authalic(e, e2, np.float64(p1)))
            q2 = float(_q_authalic(e, e2, np.float64(p2)))
            q0 = float(_q_authalic(e, e2, np.float64(p0)))
            n = (m1 * m1 - m2 * m2) / (q2 - q1)
            C = m1 * m1 + n * q1
            rho0 = a * math.sqrt(C - n * q0) / n
            c = (n, C, rho0, e, e2, a)
            self._cache["c"] = c
        return c

    def forward(self, lon, lat):
        n, C, rho0, e, e2, a = self._consts()
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        theta = n * (np.radians(np.asarray(lon, dtype=np.float64)) - math.radians(self.lon0))
        rho = a * np.sqrt(C - n * _q_authalic(e, e2, phi)) / n
        return self.fe + rho * np.sin(theta), self.fn + rho0 - rho * np.cos(theta)

    def inverse(self, E, N):
        n, C, rho0, e, e2, a = self._consts()
        dE = np.asarray(E, dtype=np.float64) - self.fe
        dN = rho0 - (np.asarray(N, dtype=np.float64) - self.fn)
        rho = np.hypot(dE, dN) * np.sign(n)
        q = (C - (rho * n / a) ** 2) / n
        theta = np.arctan2(np.sign(n) * dE, np.sign(n) * dN)
        return np.degrees(theta / n) + self.lon0, np.degrees(_phi_from_q(e, e2, q))


@dataclass(frozen=True)
class LambertAzimuthalEqualArea:
    """EPSG method 9820 (oblique aspect — the ETRS89-LAEA Europe grid)."""

    ell: Ellipsoid
    lon0: float
    lat0: float
    fe: float
    fn: float
    _cache: dict = field(default_factory=dict, compare=False)

    def _consts(self):
        c = self._cache.get("c")
        if c is None:
            e, e2, a = self.ell.e, self.ell.e2, self.ell.a
            p0 = math.radians(self.lat0)
            qp = float(_q_authalic(e, e2, np.float64(math.pi / 2.0)))
            q0 = float(_q_authalic(e, e2, np.float64(p0)))
            rq = a * math.sqrt(qp / 2.0)
            beta0 = math.asin(q0 / qp)
            d = a * (math.cos(p0) / math.sqrt(1.0 - e2 * math.sin(p0) ** 2)) / (rq * math.cos(beta0))
            c = (e, e2, qp, rq, beta0, d)
            self._cache["c"] = c
        return c

    def forward(self, lon, lat):
        e, e2, qp, rq, beta0, d = self._consts()
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        dlam = np.radians(np.asarray(lon, dtype=np.float64)) - math.radians(self.lon0)
        beta = np.arcsin(np.clip(_q_authalic(e, e2, phi) / qp, -1.0, 1.0))
        b = rq * np.sqrt(2.0 / (1.0 + math.sin(beta0) * np.sin(beta) + math.cos(beta0) * np.cos(beta) * np.cos(dlam)))
        E = self.fe + b * d * np.cos(beta) * np.sin(dlam)
        N = self.fn + (b / d) * (math.cos(beta0) * np.sin(beta) - math.sin(beta0) * np.cos(beta) * np.cos(dlam))
        return E, N

    def inverse(self, E, N):
        e, e2, qp, rq, beta0, d = self._consts()
        dE = (np.asarray(E, dtype=np.float64) - self.fe) / d
        dN = (np.asarray(N, dtype=np.float64) - self.fn) * d
        rho = np.hypot(dE, dN)
        C = 2.0 * np.arcsin(np.clip(rho / (2.0 * rq), -1.0, 1.0))
        with np.errstate(invalid="ignore", divide="ignore"):
            q = qp * (np.cos(C) * math.sin(beta0) + dN * np.sin(C) * math.cos(beta0) / rho)
            lam = np.arctan2(dE * np.sin(C), rho * math.cos(beta0) * np.cos(C) - dN * math.sin(beta0) * np.sin(C))
        # at the exact origin rho == 0: q -> q0, lam -> 0
        at0 = rho == 0.0
        if np.any(at0):
            q = np.where(at0, qp * math.sin(beta0), q)
            lam = np.where(at0, 0.0, lam)
        return np.degrees(lam) + self.lon0, np.degrees(_phi_from_q(e, e2, q))


@dataclass(frozen=True)
class MercatorEllipsoidal:
    """EPSG 9804 (Mercator variant A, 1SP): ellipsoidal Mercator — the
    basis of EPSG:3395 World Mercator. ``k0`` scales at the equator."""

    ell: Ellipsoid
    lon0: float = 0.0
    k0: float = 1.0
    fe: float = 0.0
    fn: float = 0.0

    def forward(self, lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64) - self.lon0)
        a, e = self.ell.a, self.ell.e
        E = self.fe + a * self.k0 * lam
        N = self.fn - a * self.k0 * np.log(_t_conformal(e, phi))
        return E, N

    def inverse(self, E, N):
        a, e = self.ell.a, self.ell.e
        t = np.exp((self.fn - np.asarray(N, dtype=np.float64)) / (a * self.k0))
        phi = _phi_from_t(e, t)
        lam = (np.asarray(E, dtype=np.float64) - self.fe) / (a * self.k0)
        return np.degrees(lam) + self.lon0, np.degrees(phi)


@dataclass(frozen=True)
class ObliqueStereographic:
    """EPSG method 9809 (Oblique and Equatorial Stereographic) — the
    double-projection via the conformal sphere used by the Dutch RD New
    grid (EPSG:28992). Formulas from EPSG Guidance Note 7-2 §3.2.3.2."""

    ell: Ellipsoid
    lon0: float
    lat0: float
    k0: float
    fe: float
    fn: float
    _cache: dict = field(default_factory=dict, compare=False)

    def _consts(self):
        c = self._cache.get("c")
        if c is None:
            e, e2, a = self.ell.e, self.ell.e2, self.ell.a
            p0 = math.radians(self.lat0)
            s0 = math.sin(p0)
            rho0 = a * (1.0 - e2) / (1.0 - e2 * s0 * s0) ** 1.5
            nu0 = a / math.sqrt(1.0 - e2 * s0 * s0)
            R = math.sqrt(rho0 * nu0)
            n = math.sqrt(1.0 + e2 * math.cos(p0) ** 4 / (1.0 - e2))
            S1 = (1.0 + s0) / (1.0 - s0)
            S2 = (1.0 - e * s0) / (1.0 + e * s0)
            w1 = (S1 * S2**e) ** n
            sin_chi00 = (w1 - 1.0) / (w1 + 1.0)
            cc = (n + s0) * (1.0 - sin_chi00) / ((n - s0) * (1.0 + sin_chi00))
            w2 = cc * w1
            chi0 = math.asin((w2 - 1.0) / (w2 + 1.0))
            c = (R, n, cc, chi0, e)
            self._cache["c"] = c
        return c

    def forward(self, lon, lat):
        R, n, cc, chi0, e = self._consts()
        lam0 = math.radians(self.lon0)
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        dL = n * (lam - lam0)
        sphi = np.sin(phi)
        Sa = (1.0 + sphi) / (1.0 - sphi)
        Sb = (1.0 - e * sphi) / (1.0 + e * sphi)
        w = cc * (Sa * Sb**e) ** n
        chi = np.arcsin(np.clip((w - 1.0) / (w + 1.0), -1.0, 1.0))
        B = 1.0 + np.sin(chi) * math.sin(chi0) + np.cos(chi) * math.cos(chi0) * np.cos(dL)
        E = self.fe + 2.0 * R * self.k0 * np.cos(chi) * np.sin(dL) / B
        N = self.fn + 2.0 * R * self.k0 * (np.sin(chi) * math.cos(chi0) - np.cos(chi) * math.sin(chi0) * np.cos(dL)) / B
        return E, N

    def inverse(self, E, N):
        R, n, cc, chi0, e = self._consts()
        e2 = self.ell.e2
        lam0 = math.radians(self.lon0)
        dE = np.asarray(E, dtype=np.float64) - self.fe
        dN = np.asarray(N, dtype=np.float64) - self.fn
        g = 2.0 * R * self.k0 * math.tan(math.pi / 4.0 - chi0 / 2.0)
        h = 4.0 * R * self.k0 * math.tan(chi0) + g
        i = np.arctan2(dE, h + dN)
        j = np.arctan2(dE, g - dN) - i
        chi = chi0 + 2.0 * np.arctan((dN - dE * np.tan(j / 2.0)) / (2.0 * R * self.k0))
        dL = j + 2.0 * i
        lam = dL / n + lam0
        psi = 0.5 * np.log((1.0 + np.sin(chi)) / (cc * (1.0 - np.sin(chi)))) / n
        phi = 2.0 * np.arctan(np.exp(psi)) - math.pi / 2.0
        for _ in range(8):
            esin = e * np.sin(phi)
            psi_i = np.log(np.tan(phi / 2.0 + math.pi / 4.0) * ((1.0 - esin) / (1.0 + esin)) ** (e / 2.0))
            phi = phi - (psi_i - psi) * np.cos(phi) * (1.0 - esin * esin) / (1.0 - e2)
        return np.degrees(lam), np.degrees(phi)


@dataclass(frozen=True)
class PolarStereographic:
    """EPSG method 9810 (variant A, ``k0`` at the pole — UPS) / 9829
    (variant B, ``lat_ts`` standard parallel — EPSG:3031/3413). Set
    ``south=True`` for the south-pole aspect."""

    ell: Ellipsoid
    lon0: float
    fe: float
    fn: float
    south: bool = False
    k0: float = 1.0
    lat_ts: float | None = None
    _cache: dict = field(default_factory=dict, compare=False)

    def _consts(self):
        c = self._cache.get("c")
        if c is None:
            e, e2, a = self.ell.e, self.ell.e2, self.ell.a
            root = math.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e))
            if self.lat_ts is not None:
                # variant B: scale is true at lat_ts
                pF = math.radians(-self.lat_ts if self.south else self.lat_ts)
                mF = math.cos(pF) / math.sqrt(1.0 - e2 * math.sin(pF) ** 2)
                tF = float(_t_conformal(e, np.float64(pF)))
                k0 = mF * root / (2.0 * tF)
            else:
                k0 = self.k0
            c = (a, e, root, k0)
            self._cache["c"] = c
        return c

    def forward(self, lon, lat):
        a, e, root, k0 = self._consts()
        lat = np.asarray(lat, dtype=np.float64)
        lon = np.asarray(lon, dtype=np.float64)
        phi = np.radians(-lat if self.south else lat)
        theta = np.radians(lon - self.lon0)
        t = _t_conformal(e, phi)
        rho = 2.0 * a * k0 * t / root
        E = self.fe + rho * np.sin(theta)
        N = self.fn + (rho * np.cos(theta) if self.south else -rho * np.cos(theta))
        return E, N

    def inverse(self, E, N):
        a, e, root, k0 = self._consts()
        dE = np.asarray(E, dtype=np.float64) - self.fe
        dN = np.asarray(N, dtype=np.float64) - self.fn
        rho = np.hypot(dE, dN)
        t = rho * root / (2.0 * a * k0)
        phi = _phi_from_t(e, t)
        lam = np.arctan2(dE, dN) if self.south else np.arctan2(dE, -dN)
        # the polar aspect spans all longitudes: wrap lon0-shifted output
        # back into (-180, 180]
        lon = np.degrees(lam) + self.lon0
        lon = lon - 360.0 * np.ceil((lon - 180.0) / 360.0)
        return lon, -np.degrees(phi) if self.south else np.degrees(phi)


@dataclass(frozen=True)
class SwissObliqueMercator:
    """EPSG method 9814 (Swiss Oblique Cylindrical / ``somerc``): conformal
    sphere at the centre, pole rotation, equatorial Mercator — the CH1903
    LV03 (EPSG:21781) and CH1903+ LV95 (EPSG:2056) grids."""

    ell: Ellipsoid
    lon0: float
    lat0: float
    k0: float
    fe: float
    fn: float
    _cache: dict = field(default_factory=dict, compare=False)

    def _consts(self):
        c = self._cache.get("c")
        if c is None:
            e, e2, a = self.ell.e, self.ell.e2, self.ell.a
            p0 = math.radians(self.lat0)
            s0 = math.sin(p0)
            cc = math.sqrt(1.0 + e2 * math.cos(p0) ** 4 / (1.0 - e2))
            b0 = math.asin(s0 / cc)
            R = a * math.sqrt(1.0 - e2) / (1.0 - e2 * s0 * s0)
            K = math.log(math.tan(math.pi / 4.0 + b0 / 2.0)) - cc * (
                math.log(math.tan(math.pi / 4.0 + p0 / 2.0))
                - (e / 2.0) * math.log((1.0 + e * s0) / (1.0 - e * s0))
            )
            c = (cc, b0, R * self.k0, K, e)
            self._cache["c"] = c
        return c

    def forward(self, lon, lat):
        cc, b0, kR, K, e = self._consts()
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = cc * (np.radians(np.asarray(lon, dtype=np.float64)) - math.radians(self.lon0))
        esin = e * np.sin(phi)
        # ellipsoid -> conformal sphere latitude
        phi_s = 2.0 * np.arctan(
            np.exp(cc * (np.log(np.tan(math.pi / 4.0 + phi / 2.0)) - (e / 2.0) * np.log((1.0 + esin) / (1.0 - esin))) + K)
        ) - math.pi / 2.0
        # rotate the sphere so the centre lands on the equator
        sb, cb = math.sin(b0), math.cos(b0)
        sp, cp = np.sin(phi_s), np.cos(phi_s)
        sphi2 = cb * sp - sb * cp * np.cos(lam)
        lam2 = np.arctan2(cp * np.sin(lam), sb * sp + cb * cp * np.cos(lam))
        E = self.fe + kR * lam2
        N = self.fn + kR / 2.0 * np.log((1.0 + sphi2) / (1.0 - sphi2))
        return E, N

    def inverse(self, E, N):
        cc, b0, kR, K, e = self._consts()
        lam2 = (np.asarray(E, dtype=np.float64) - self.fe) / kR
        phi2 = 2.0 * np.arctan(np.exp((np.asarray(N, dtype=np.float64) - self.fn) / kR)) - math.pi / 2.0
        sb, cb = math.sin(b0), math.cos(b0)
        sp, cp = np.sin(phi2), np.cos(phi2)
        phi_s = np.arcsin(np.clip(cb * sp + sb * cp * np.cos(lam2), -1.0, 1.0))
        lam_s = np.arctan2(cp * np.sin(lam2), -sb * sp + cb * cp * np.cos(lam2))
        # conformal sphere -> ellipsoid latitude (fixed point)
        base = (np.log(np.tan(math.pi / 4.0 + phi_s / 2.0)) - K) / cc
        phi = phi_s
        for _ in range(8):
            esin = e * np.sin(phi)
            phi = 2.0 * np.arctan(np.exp(base + (e / 2.0) * np.log((1.0 + esin) / (1.0 - esin)))) - math.pi / 2.0
        lam = lam_s / cc + math.radians(self.lon0)
        return np.degrees(lam), np.degrees(phi)


@dataclass(frozen=True)
class Krovak:
    """EPSG method 9819 (Krovak oblique conformal conic) oriented as
    *Krovak East North* (EPSG:5514): E = -westing, N = -southing. ``czech``
    flips back to positive southing/westing axes (the +czech proj flag)."""

    ell: Ellipsoid
    lon0: float  # longitude of origin, Greenwich degrees (24d50' E for S-JTSK)
    latc: float = 49.5  # latitude of projection centre
    alphac: float = 30.28813972222222  # azimuth of centre line, degrees
    latp: float = 78.5  # latitude of pseudo standard parallel
    k0: float = 0.9999
    fe: float = 0.0
    fn: float = 0.0
    czech: bool = False
    _cache: dict = field(default_factory=dict, compare=False)

    def _consts(self):
        c = self._cache.get("c")
        if c is None:
            e, e2, a = self.ell.e, self.ell.e2, self.ell.a
            pC = math.radians(self.latc)
            sC = math.sin(pC)
            A = a * math.sqrt(1.0 - e2) / (1.0 - e2 * sC * sC)
            B = math.sqrt(1.0 + e2 * math.cos(pC) ** 4 / (1.0 - e2))
            g0 = math.asin(sC / B)
            t0 = (
                math.tan(math.pi / 4.0 + g0 / 2.0)
                * ((1.0 + e * sC) / (1.0 - e * sC)) ** (e * B / 2.0)
                / math.tan(math.pi / 4.0 + pC / 2.0) ** B
            )
            n = math.sin(math.radians(self.latp))
            r0 = self.k0 * A / math.tan(math.radians(self.latp))
            tanP = math.tan(math.pi / 4.0 + math.radians(self.latp) / 2.0)
            c = (e, B, t0, n, r0, tanP, math.radians(self.alphac))
            self._cache["c"] = c
        return c

    def forward(self, lon, lat):
        e, B, t0, n, r0, tanP, aC = self._consts()
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        esin = e * np.sin(phi)
        U = 2.0 * (
            np.arctan(t0 * np.tan(phi / 2.0 + math.pi / 4.0) ** B * ((1.0 - esin) / (1.0 + esin)) ** (e * B / 2.0))
            - math.pi / 4.0
        )
        V = B * (math.radians(self.lon0) - lam)
        T = np.arcsin(np.clip(math.cos(aC) * np.sin(U) + math.sin(aC) * np.cos(U) * np.cos(V), -1.0, 1.0))
        D = np.arcsin(np.clip(np.cos(U) * np.sin(V) / np.cos(T), -1.0, 1.0))
        r = r0 * tanP**n / np.tan(T / 2.0 + math.pi / 4.0) ** n
        southing = r * np.cos(n * D)
        westing = r * np.sin(n * D)
        if self.czech:
            return southing + self.fe, westing + self.fn
        return self.fe - westing, self.fn - southing

    def inverse(self, E, N):
        e, B, t0, n, r0, tanP, aC = self._consts()
        e2 = self.ell.e2
        if self.czech:
            southing = np.asarray(E, dtype=np.float64) - self.fe
            westing = np.asarray(N, dtype=np.float64) - self.fn
        else:
            westing = self.fe - np.asarray(E, dtype=np.float64)
            southing = self.fn - np.asarray(N, dtype=np.float64)
        r = np.hypot(southing, westing)
        theta = np.arctan2(westing, southing)
        D = theta / n
        T = 2.0 * (np.arctan((r0 / r) ** (1.0 / n) * tanP) - math.pi / 4.0)
        U = np.arcsin(np.clip(math.cos(aC) * np.sin(T) - math.sin(aC) * np.cos(T) * np.cos(D), -1.0, 1.0))
        V = np.arcsin(np.clip(np.cos(T) * np.sin(D) / np.cos(U), -1.0, 1.0))
        lam = math.radians(self.lon0) - V / B
        tU = np.tan(U / 2.0 + math.pi / 4.0) ** (1.0 / B) * t0 ** (-1.0 / B)
        phi = U
        for _ in range(8):
            esin = e * np.sin(phi)
            phi = 2.0 * (np.arctan(tU * ((1.0 + esin) / (1.0 - esin)) ** (e / 2.0)) - math.pi / 4.0)
        return np.degrees(lam), np.degrees(phi)


@dataclass(frozen=True)
class LambertCylindricalEqualArea:
    """EPSG method 9835 (ellipsoidal Lambert cylindrical equal area) — the
    EASE-Grid 2.0 global grid (EPSG:6933, ``lat_ts=30``)."""

    ell: Ellipsoid
    lon0: float
    lat_ts: float
    fe: float = 0.0
    fn: float = 0.0

    def _k(self) -> float:
        pF = math.radians(self.lat_ts)
        return math.cos(pF) / math.sqrt(1.0 - self.ell.e2 * math.sin(pF) ** 2)

    def forward(self, lon, lat):
        e, e2, a = self.ell.e, self.ell.e2, self.ell.a
        k = self._k()
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64) - self.lon0)
        E = self.fe + a * k * lam
        N = self.fn + a * _q_authalic(e, e2, phi) / (2.0 * k)
        return E, N

    def inverse(self, E, N):
        e, e2, a = self.ell.e, self.ell.e2, self.ell.a
        k = self._k()
        q = 2.0 * k * (np.asarray(N, dtype=np.float64) - self.fn) / a
        lam = (np.asarray(E, dtype=np.float64) - self.fe) / (a * k)
        return np.degrees(lam) + self.lon0, np.degrees(_phi_from_q(e, e2, q))


def _merid_arc_coeffs(n: float):
    """Meridian-arc series in the third flattening (public Helmert/Karney
    series): returns (rectifying radius factor, sin(2k phi) coeffs forward,
    inverse coeffs)."""
    fwd = (
        -1.5 * n + 9.0 / 16.0 * n**3,
        15.0 / 16.0 * n**2 - 15.0 / 32.0 * n**4,
        -35.0 / 48.0 * n**3,
        315.0 / 512.0 * n**4,
    )
    inv = (
        1.5 * n - 27.0 / 32.0 * n**3,
        21.0 / 16.0 * n**2 - 55.0 / 32.0 * n**4,
        151.0 / 96.0 * n**3,
        1097.0 / 512.0 * n**4,
    )
    return fwd, inv


@dataclass(frozen=True)
class EquidistantCylindrical:
    """EPSG method 1028 (ellipsoidal equidistant cylindrical) — EPSG:4087
    World Equidistant Cylindrical / EPSG:32662 Plate Carree."""

    ell: Ellipsoid
    lon0: float = 0.0
    lat_ts: float = 0.0
    fe: float = 0.0
    fn: float = 0.0
    _cache: dict = field(default_factory=dict, compare=False)

    def _consts(self):
        c = self._cache.get("c")
        if c is None:
            a, e2, n3 = self.ell.a, self.ell.e2, self.ell.n3
            pF = math.radians(self.lat_ts)
            nu1_cos = a * math.cos(pF) / math.sqrt(1.0 - e2 * math.sin(pF) ** 2)
            A = a / (1.0 + n3) * (1.0 + n3**2 / 4.0 + n3**4 / 64.0)
            fwd, inv = _merid_arc_coeffs(n3)
            c = (nu1_cos, A, fwd, inv)
            self._cache["c"] = c
        return c

    def forward(self, lon, lat):
        nu1_cos, A, fwd, _ = self._consts()
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64) - self.lon0)
        M = A * (phi + sum(ck * np.sin(2.0 * (k + 1) * phi) for k, ck in enumerate(fwd)))
        return self.fe + nu1_cos * lam, self.fn + M

    def inverse(self, E, N):
        nu1_cos, A, _, inv = self._consts()
        mu = (np.asarray(N, dtype=np.float64) - self.fn) / A
        phi = mu + sum(dk * np.sin(2.0 * (k + 1) * mu) for k, dk in enumerate(inv))
        lam = (np.asarray(E, dtype=np.float64) - self.fe) / nu1_cos
        return np.degrees(lam) + self.lon0, np.degrees(phi)


@dataclass(frozen=True)
class CassiniSoldner:
    """EPSG method 9806 (Cassini-Soldner) — the Singapore SVY21 grid
    (EPSG:3414) and several Caribbean cadastral grids. Snyder/EPSG series
    formulas; exact to << 1 mm within the narrow bands the method is
    designed for."""

    ell: Ellipsoid
    lon0: float
    lat0: float
    fe: float = 0.0
    fn: float = 0.0
    _cache: dict = field(default_factory=dict, compare=False)

    def _consts(self):
        c = self._cache.get("c")
        if c is None:
            a, e2, n3 = self.ell.a, self.ell.e2, self.ell.n3
            A = a / (1.0 + n3) * (1.0 + n3**2 / 4.0 + n3**4 / 64.0)
            fwd, inv = _merid_arc_coeffs(n3)
            p0 = math.radians(self.lat0)
            M0 = A * (p0 + sum(ck * math.sin(2.0 * (k + 1) * p0) for k, ck in enumerate(fwd)))
            c = (A, fwd, inv, M0)
            self._cache["c"] = c
        return c

    def forward(self, lon, lat):
        A_r, fwd, _, M0 = self._consts()
        a, e2 = self.ell.a, self.ell.e2
        ep2 = e2 / (1.0 - e2)
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        dlam = np.radians(np.asarray(lon, dtype=np.float64) - self.lon0)
        sphi, cphi = np.sin(phi), np.cos(phi)
        nu = a / np.sqrt(1.0 - e2 * sphi * sphi)
        T = np.tan(phi) ** 2
        C = ep2 * cphi * cphi
        Aq = dlam * cphi
        M = A_r * (phi + sum(ck * np.sin(2.0 * (k + 1) * phi) for k, ck in enumerate(fwd)))
        E = self.fe + nu * (Aq - T * Aq**3 / 6.0 - (8.0 - T + 8.0 * C) * T * Aq**5 / 120.0)
        N = self.fn + M - M0 + nu * np.tan(phi) * (Aq**2 / 2.0 + (5.0 - T + 6.0 * C) * Aq**4 / 24.0)
        return E, N

    def inverse(self, E, N):
        A_r, _, inv, M0 = self._consts()
        a, e2 = self.ell.a, self.ell.e2
        M1 = M0 + (np.asarray(N, dtype=np.float64) - self.fn)
        mu = M1 / A_r
        phi1 = mu + sum(dk * np.sin(2.0 * (k + 1) * mu) for k, dk in enumerate(inv))
        s1 = np.sin(phi1)
        w1 = 1.0 - e2 * s1 * s1
        nu1 = a / np.sqrt(w1)
        rho1 = a * (1.0 - e2) / w1**1.5
        T1 = np.tan(phi1) ** 2
        D = (np.asarray(E, dtype=np.float64) - self.fe) / nu1
        phi = phi1 - (nu1 * np.tan(phi1) / rho1) * (D**2 / 2.0 - (1.0 + 3.0 * T1) * D**4 / 24.0)
        lam = (D - T1 * D**3 / 3.0 + (1.0 + 3.0 * T1) * T1 * D**5 / 15.0) / np.cos(phi1)
        return np.degrees(lam) + self.lon0, np.degrees(phi)


@dataclass(frozen=True)
class Geographic:
    """Identity projection: grid coords ARE lon/lat degrees on the datum."""

    ell: Ellipsoid

    def forward(self, lon, lat):
        return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)

    def inverse(self, x, y):
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)


# ---------------------------------------------------------------------------
# CRS = projection + datum shift to WGS84
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CRS:
    code: int
    proj: object  # one of the projection dataclasses above
    helmert: Helmert | None = None  # datum -> WGS84; None == identical to WGS84
    name: str = ""

    def to_wgs84(self, x, y):
        lon, lat = self.proj.inverse(x, y)
        if self.helmert is None:
            return lon, lat
        ex, ey, ez = _geodetic_to_ecef(self.proj.ell, lon, lat)
        ex, ey, ez = _helmert_apply(self.helmert, ex, ey, ez)
        return _ecef_to_geodetic(WGS84, ex, ey, ez)

    def from_wgs84(self, lon, lat):
        if self.helmert is not None:
            ex, ey, ez = _geodetic_to_ecef(WGS84, np.asarray(lon, np.float64), np.asarray(lat, np.float64))
            ex, ey, ez = _helmert_apply(self.helmert, ex, ey, ez, inverse=True)
            lon, lat = _ecef_to_geodetic(self.proj.ell, ex, ey, ez)
        return self.proj.forward(lon, lat)


# published OSGB36 -> WGS84 Helmert (inverse of the OS National Grid
# ETRS89->OSGB36 set; position-vector convention, ~3.5 m accuracy)
_OSGB36_TO_WGS84 = Helmert(446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894)
# NAD27 -> WGS84 CONUS 3-parameter (EPSG 1173-style geocentric translation)
_NAD27_TO_WGS84 = Helmert(-8.0, 160.0, 176.0)
# ED50 -> WGS84 mean-European 3-parameter (EPSG 1133-style)
_ED50_TO_WGS84 = Helmert(-87.0, -98.0, -121.0)
# Pulkovo 1942 -> WGS84 (EPSG 1254-style mean)
_PULKOVO42_TO_WGS84 = Helmert(28.0, -130.0, -95.0)
# DHDN (Bessel, Germany) -> WGS84 (EPSG 1777 position-vector)
_DHDN_TO_WGS84 = Helmert(598.1, 73.7, 418.2, 0.202, 0.045, -2.455, 6.7)
# Amersfoort (Bessel, Netherlands) -> WGS84 (published position-vector set,
# ~1 m class; RDNAPTRANS grid correction is out of scope)
_AMERSFOORT_TO_WGS84 = Helmert(565.417, 50.3319, 465.552, -0.406857, 0.350733, -1.87035, 4.0812)
# CH1903+ -> WGS84 geocentric translation (swisstopo published values)
_CH1903P_TO_WGS84 = Helmert(674.374, 15.056, 405.346)
# CH1903 (LV03) -> WGS84 mean translation
_CH1903_TO_WGS84 = Helmert(674.4, 15.1, 405.3)
# S-JTSK (Bessel, CZ/SK) -> WGS84 mean translation (~1 m class)
_SJTSK_TO_WGS84 = Helmert(589.0, 76.0, 480.0)
# MGI (Bessel, Austria) -> WGS84 position-vector (published Austrian set)
_MGI_TO_WGS84 = Helmert(577.326, 90.129, 463.919, 5.137, 1.474, 5.297, 2.4232)
# GGRS87 (GRS80, Greece) -> WGS84 translation
_GGRS87_TO_WGS84 = Helmert(-199.87, 74.79, 246.62)


_REGISTRY: dict[int, CRS] = {}


def register_crs(crs: CRS) -> None:
    _REGISTRY[crs.code] = crs


def _utm(ell: Ellipsoid, zone: int, south: bool) -> TransverseMercator:
    return TransverseMercator(
        ell, lon0=zone * 6.0 - 183.0, lat0=0.0, k0=0.9996, fe=500000.0, fn=10000000.0 if south else 0.0
    )


def _populate() -> None:
    reg = register_crs
    # geographic CRSs (lon/lat degrees on their datum)
    reg(CRS(4326, Geographic(WGS84), None, "WGS 84"))
    reg(CRS(4258, Geographic(GRS80), None, "ETRS89"))
    reg(CRS(4269, Geographic(GRS80), None, "NAD83"))
    reg(CRS(4171, Geographic(GRS80), None, "RGF93"))
    reg(CRS(4283, Geographic(GRS80), None, "GDA94"))
    reg(CRS(4490, Geographic(GRS80), None, "CGCS2000"))
    reg(CRS(4277, Geographic(AIRY1830), _OSGB36_TO_WGS84, "OSGB36"))
    reg(CRS(4267, Geographic(CLARKE1866), _NAD27_TO_WGS84, "NAD27"))
    reg(CRS(4230, Geographic(INTL1924), _ED50_TO_WGS84, "ED50"))
    reg(CRS(4314, Geographic(BESSEL1841), _DHDN_TO_WGS84, "DHDN"))
    reg(CRS(4284, Geographic(KRASSOVSKY1940), _PULKOVO42_TO_WGS84, "Pulkovo 1942"))

    # national grids
    reg(
        CRS(
            27700,
            TransverseMercator(AIRY1830, lon0=-2.0, lat0=49.0, k0=0.9996012717, fe=400000.0, fn=-100000.0),
            _OSGB36_TO_WGS84,
            "OSGB36 / British National Grid",
        )
    )
    reg(
        CRS(
            2154,
            LambertConformal(GRS80, lon0=3.0, lat0=46.5, sp1=49.0, sp2=44.0, fe=700000.0, fn=6600000.0),
            None,
            "RGF93 / Lambert-93",
        )
    )
    reg(
        CRS(
            3035,
            LambertAzimuthalEqualArea(GRS80, lon0=10.0, lat0=52.0, fe=4321000.0, fn=3210000.0),
            None,
            "ETRS89-extended / LAEA Europe",
        )
    )
    reg(
        CRS(
            5070,
            AlbersEqualArea(GRS80, lon0=-96.0, lat0=23.0, sp1=29.5, sp2=45.5, fe=0.0, fn=0.0),
            None,
            "NAD83 / Conus Albers",
        )
    )
    reg(
        CRS(
            31370,
            # Belgian Lambert 72 projection parameters (EPSG); BD72 datum
            # shift (position-vector) per the NGI-published values
            LambertConformal(
                INTL1924,
                lon0=4.367486666666666,
                lat0=90.0,
                sp1=51.16666723333333,
                sp2=49.8333339,
                fe=150000.013,
                fn=5400088.438,
            ),
            Helmert(-106.8686, 52.2978, -103.7239, 0.3366, -0.457, 1.8422, -1.2747),
            "BD72 / Belgian Lambert 72",
        )
    )
    reg(CRS(3395, MercatorEllipsoidal(WGS84), None, "WGS 84 / World Mercator"))
    # France legacy Lambert zone II (NTF datum, Clarke 1880 IGN) omitted:
    # Clarke 1880 IGN + NTF grid shift is gridded, not Helmert-clean.

    # geographic datums for the round-4 grid additions
    reg(CRS(4289, Geographic(BESSEL1841), _AMERSFOORT_TO_WGS84, "Amersfoort"))
    reg(CRS(4150, Geographic(BESSEL1841), _CH1903P_TO_WGS84, "CH1903+"))
    reg(CRS(4149, Geographic(BESSEL1841), _CH1903_TO_WGS84, "CH1903"))
    reg(CRS(4156, Geographic(BESSEL1841), _SJTSK_TO_WGS84, "S-JTSK"))
    reg(CRS(4312, Geographic(BESSEL1841), _MGI_TO_WGS84, "MGI"))
    reg(CRS(4121, Geographic(GRS80), _GGRS87_TO_WGS84, "GGRS87"))
    reg(CRS(4167, Geographic(GRS80), None, "NZGD2000"))
    reg(CRS(4612, Geographic(GRS80), None, "JGD2000"))
    reg(CRS(6668, Geographic(GRS80), None, "JGD2011"))

    # oblique stereographic: Dutch RD New (EPSG method 9809)
    reg(
        CRS(
            28992,
            ObliqueStereographic(
                BESSEL1841,
                lon0=5.387638888888889,  # 5d23'15.500"E
                lat0=52.15616055555555,  # 52d09'22.178"N
                k0=0.9999079,
                fe=155000.0,
                fn=463000.0,
            ),
            _AMERSFOORT_TO_WGS84,
            "Amersfoort / RD New",
        )
    )
    # Swiss oblique Mercator (EPSG method 9814)
    _swiss = dict(lon0=7.439583333333333, lat0=46.952405555555565, k0=1.0)  # Bern
    reg(
        CRS(
            2056,
            SwissObliqueMercator(BESSEL1841, fe=2600000.0, fn=1200000.0, **_swiss),
            _CH1903P_TO_WGS84,
            "CH1903+ / LV95",
        )
    )
    reg(
        CRS(
            21781,
            SwissObliqueMercator(BESSEL1841, fe=600000.0, fn=200000.0, **_swiss),
            _CH1903_TO_WGS84,
            "CH1903 / LV03",
        )
    )
    # Krovak East North (EPSG method 9819); lon0 = 24d50' E of Greenwich
    # (42d30' E of Ferro)
    reg(
        CRS(
            5514,
            Krovak(BESSEL1841, lon0=24.833333333333332),
            _SJTSK_TO_WGS84,
            "S-JTSK / Krovak East North",
        )
    )
    # polar stereographic
    reg(
        CRS(
            3031,
            PolarStereographic(WGS84, lon0=0.0, fe=0.0, fn=0.0, south=True, lat_ts=-71.0),
            None,
            "WGS 84 / Antarctic Polar Stereographic",
        )
    )
    reg(
        CRS(
            3976,
            PolarStereographic(WGS84, lon0=0.0, fe=0.0, fn=0.0, south=True, lat_ts=-70.0),
            None,
            "WGS 84 / NSIDC Sea Ice Polar Stereographic South",
        )
    )
    reg(
        CRS(
            3413,
            PolarStereographic(WGS84, lon0=-45.0, fe=0.0, fn=0.0, lat_ts=70.0),
            None,
            "WGS 84 / NSIDC Sea Ice Polar Stereographic North",
        )
    )
    reg(
        CRS(
            3995,
            PolarStereographic(WGS84, lon0=0.0, fe=0.0, fn=0.0, lat_ts=71.0),
            None,
            "WGS 84 / Arctic Polar Stereographic",
        )
    )
    reg(
        CRS(
            32661,
            PolarStereographic(WGS84, lon0=0.0, fe=2000000.0, fn=2000000.0, k0=0.994),
            None,
            "WGS 84 / UPS North",
        )
    )
    reg(
        CRS(
            32761,
            PolarStereographic(WGS84, lon0=0.0, fe=2000000.0, fn=2000000.0, south=True, k0=0.994),
            None,
            "WGS 84 / UPS South",
        )
    )
    # cylindrical equal area / equidistant cylindrical world grids
    reg(
        CRS(
            6933,
            LambertCylindricalEqualArea(WGS84, lon0=0.0, lat_ts=30.0),
            None,
            "WGS 84 / NSIDC EASE-Grid 2.0 Global",
        )
    )
    reg(CRS(4087, EquidistantCylindrical(WGS84), None, "WGS 84 / World Equidistant Cylindrical"))
    reg(CRS(32662, EquidistantCylindrical(WGS84), None, "WGS 84 / Plate Carree"))

    # additional Transverse-Mercator national grids (parameters are the
    # published EPSG projection values; null-shift modern datums)
    reg(
        CRS(
            2193,
            TransverseMercator(GRS80, lon0=173.0, lat0=0.0, k0=0.9996, fe=1600000.0, fn=10000000.0),
            None,
            "NZGD2000 / New Zealand Transverse Mercator",
        )
    )
    reg(
        CRS(
            3067,
            TransverseMercator(GRS80, lon0=27.0, lat0=0.0, k0=0.9996, fe=500000.0, fn=0.0),
            None,
            "ETRS89 / TM35FIN",
        )
    )
    reg(
        CRS(
            2180,
            TransverseMercator(GRS80, lon0=19.0, lat0=0.0, k0=0.9993, fe=500000.0, fn=-5300000.0),
            None,
            "ETRS89 / Poland CS92",
        )
    )
    for z, (lon0, fe) in enumerate(((15.0, 5500000.0), (18.0, 6500000.0), (21.0, 7500000.0), (24.0, 8500000.0))):
        reg(
            CRS(
                2176 + z,
                TransverseMercator(GRS80, lon0=lon0, lat0=0.0, k0=0.999923, fe=fe, fn=0.0),
                None,
                f"ETRS89 / Poland CS2000 zone {z + 5}",
            )
        )
    reg(
        CRS(
            2100,
            TransverseMercator(GRS80, lon0=24.0, lat0=0.0, k0=0.9996, fe=500000.0, fn=0.0),
            _GGRS87_TO_WGS84,
            "GGRS87 / Greek Grid",
        )
    )
    reg(
        CRS(
            3826,
            TransverseMercator(GRS80, lon0=121.0, lat0=0.0, k0=0.9999, fe=250000.0, fn=0.0),
            None,
            "TWD97 / TM2 zone 121",
        )
    )
    reg(
        CRS(
            5186,
            TransverseMercator(GRS80, lon0=127.0, lat0=38.0, k0=1.0, fe=200000.0, fn=600000.0),
            None,
            "Korea 2000 / Central Belt 2010",
        )
    )
    reg(
        CRS(
            3414,
            TransverseMercator(
                WGS84, lon0=103.83333333333333, lat0=1.3666666666666667, k0=1.0, fe=28001.642, fn=38744.572
            ),
            None,
            "SVY21 / Singapore TM",
        )
    )
    # additional conic national/continental grids on the existing families
    reg(
        CRS(
            3577,
            AlbersEqualArea(GRS80, lon0=132.0, lat0=0.0, sp1=-18.0, sp2=-36.0, fe=0.0, fn=0.0),
            None,
            "GDA94 / Australian Albers",
        )
    )
    reg(
        CRS(
            3112,
            LambertConformal(GRS80, lon0=134.0, lat0=0.0, sp1=-18.0, sp2=-36.0, fe=0.0, fn=0.0),
            None,
            "GDA94 / Geoscience Australia Lambert",
        )
    )
    reg(
        CRS(
            31287,
            LambertConformal(BESSEL1841, lon0=13.333333333333334, lat0=47.5, sp1=49.0, sp2=46.0, fe=400000.0, fn=400000.0),
            _MGI_TO_WGS84,
            "MGI / Austria Lambert",
        )
    )

    # UTM families
    for z in range(1, 61):
        reg(CRS(32600 + z, _utm(WGS84, z, False), None, f"WGS 84 / UTM {z}N"))
        reg(CRS(32700 + z, _utm(WGS84, z, True), None, f"WGS 84 / UTM {z}S"))
    for z in range(28, 39):
        reg(CRS(25800 + z, _utm(GRS80, z, False), None, f"ETRS89 / UTM {z}N"))
    for z in range(1, 24):
        reg(CRS(26900 + z, _utm(GRS80, z, False), None, f"NAD83 / UTM {z}N"))
    for z in range(3, 24):
        reg(CRS(26700 + z, _utm(CLARKE1866, z, False), _NAD27_TO_WGS84, f"NAD27 / UTM {z}N"))
    for z in range(48, 59):
        reg(CRS(28300 + z, _utm(GRS80, z, True), None, f"GDA94 / MGA zone {z}"))
    for z in range(28, 39):
        reg(CRS(23000 + z, _utm(INTL1924, z, False), _ED50_TO_WGS84, f"ED50 / UTM {z}N"))


_populate()

SUPPORTED_HINT = (
    "EPSG:4326/3857, WGS84 UTM 326xx/327xx, ETRS89 UTM 258xx, NAD83 UTM 269xx, "
    "NAD27 UTM 267xx, ED50 UTM 230xx, GDA94 MGA 283xx, 27700 (OSGB), 2154 "
    "(Lambert-93), 3035 (LAEA Europe), 5070 (Conus Albers), 31370 (Belgian "
    "Lambert 72), 3395 (World Mercator), 28992 (RD New), 2056/21781 (Swiss "
    "LV95/LV03), 5514 (Krovak), 3031/3413/3976/3995 + 32661/32761 (polar "
    "stereographic/UPS), 6933 (EASE-Grid 2.0), 4087/32662 (equidistant "
    "cylindrical), 2193 (NZTM), 3067 (TM35FIN), 2180/2176-2179 (Poland), "
    "2100 (Greek Grid), 3826 (TWD97), 5186 (Korea 2000), 3577/3112 "
    "(Australian Albers/Lambert), 31287 (Austria Lambert), geographic "
    "4258/4269/4267/4277/4171/4283/4490/4230/4314/4284/4289/4150/4149/4156/"
    "4312/4121/4167/4612/6668 — or any proj4 string via crs_from_proj4"
)


def get_crs(code: int) -> CRS:
    crs = _REGISTRY.get(code)
    if crs is None:
        raise NotImplementedError(f"EPSG:{code} not in the projection registry (supported: {SUPPORTED_HINT})")
    return crs


# ---------------------------------------------------------------------------
# Minimal proj-string evaluator (public PROJ.4 keyword semantics) — covers
# CRSs absent from the registry without needing an EPSG entry.
# ---------------------------------------------------------------------------

_ELLPS_BY_NAME = {
    "WGS84": WGS84,
    "GRS80": GRS80,
    "airy": AIRY1830,
    "bessel": BESSEL1841,
    "clrk66": CLARKE1866,
    "intl": INTL1924,
    "krass": KRASSOVSKY1940,
}


@_lru_cache(maxsize=256)
def crs_from_proj4(s: str) -> CRS:
    """Evaluate a proj string like ``+proj=tmerc +lat_0=49 +lon_0=-2
    +k=0.9996012717 +x_0=400000 +y_0=-100000 +ellps=airy
    +towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489``.

    Supported ``+proj``: ``tmerc``, ``utm`` (+zone, +south), ``lcc``
    (2SP, or 1SP when ``lat_2`` is absent and ``k_0`` == 1), ``aea``,
    ``laea``, ``longlat``/``latlong``. Ellipsoid from ``+ellps`` or
    ``+a``/``+b``/``+rf``/``+f`` (default WGS84); datum from ``+towgs84``
    with 3 or 7 parameters (position-vector, mapping 1:1 onto
    :class:`Helmert`). Anything else raises ``NotImplementedError``."""
    kv: dict[str, str] = {}
    flags: set[str] = set()
    for tok in s.split():
        if not tok.startswith("+"):
            continue
        body = tok[1:]
        if "=" in body:
            k, v = body.split("=", 1)
            kv[k] = v
        else:
            flags.add(body)

    # strictness: any parameter that would alter the projection but is not
    # modeled here must RAISE, not silently distort coordinates. Track the
    # keys each branch consumes and reject leftovers at the end.
    consumed: set[str] = set()
    harmless = {"no_defs", "wktext", "type", "over"}
    bad_flags = flags - harmless - {"south", "czech"}
    if bad_flags:
        raise NotImplementedError(f"unsupported proj flags: {sorted(bad_flags)}")
    if kv.get("units", "m") != "m":
        raise NotImplementedError(f"+units={kv['units']}: only meters supported")
    if kv.get("axis", "enu") != "enu":
        raise NotImplementedError(f"+axis={kv['axis']}: only enu supported")
    consumed |= {"units", "axis", "type"}

    def num(key: str, default: float = 0.0) -> float:
        consumed.add(key)
        return float(kv.get(key, default))

    # ellipsoid (+datum implies one, plus a null WGS84 shift for the names
    # modeled here)
    consumed |= {"ellps", "a", "b", "rf", "f", "datum", "towgs84", "proj", "zone"}
    if "datum" in kv:
        if kv["datum"] == "WGS84":
            kv.setdefault("ellps", "WGS84")
        elif kv["datum"] == "NAD83":
            kv.setdefault("ellps", "GRS80")
        else:
            raise NotImplementedError(f"+datum={kv['datum']}: use +ellps + +towgs84 instead")
    if "ellps" in kv:
        ell = _ELLPS_BY_NAME.get(kv["ellps"])
        if ell is None:
            raise NotImplementedError(f"+ellps={kv['ellps']}: known names {sorted(_ELLPS_BY_NAME)}")
    elif "a" in kv:
        a = num("a")
        if "rf" in kv:
            ell = Ellipsoid(a, num("rf"))
        elif "f" in kv and num("f") != 0.0:
            ell = Ellipsoid(a, 1.0 / num("f"))
        elif "b" in kv:
            b = num("b")
            ell = Ellipsoid(a, a / (a - b)) if b != a else Ellipsoid(a, 1e12)  # sphere ~ inf inv_f
        else:
            ell = Ellipsoid(a, 1e12)
    else:
        ell = WGS84

    # datum shift
    helmert = None
    if "towgs84" in kv:
        parts = [float(p) for p in kv["towgs84"].split(",")]
        if len(parts) == 3:
            helmert = Helmert(*parts)
        elif len(parts) == 7:
            helmert = Helmert(*parts)
        else:
            raise NotImplementedError("+towgs84 needs 3 or 7 comma-separated values")
        if all(p == 0.0 for p in parts):
            helmert = None

    name = kv.get("proj")
    if name in ("longlat", "latlong", "lonlat"):
        proj = Geographic(ell)
    elif name == "utm":
        if "zone" not in kv:
            raise NotImplementedError("+proj=utm needs +zone")
        proj = _utm(ell, int(kv["zone"]), "south" in flags)
    elif name == "tmerc":
        proj = TransverseMercator(
            ell, lon0=num("lon_0"), lat0=num("lat_0"),
            k0=num("k", num("k_0", 1.0)), fe=num("x_0"), fn=num("y_0"),
        )
    elif name == "lcc":
        sp1 = num("lat_1", num("lat_0"))
        sp2 = num("lat_2", sp1)
        k0 = num("k", num("k_0", 1.0))
        if "lat_2" not in kv and "lat_1" not in kv:
            raise NotImplementedError("+proj=lcc needs +lat_1 (and optionally +lat_2)")
        if k0 != 1.0:
            raise NotImplementedError("+proj=lcc with k_0 != 1 (scaled 1SP) is not supported")
        proj = LambertConformal(ell, lon0=num("lon_0"), lat0=num("lat_0"), sp1=sp1, sp2=sp2, fe=num("x_0"), fn=num("y_0"))
    elif name == "aea":
        proj = AlbersEqualArea(
            ell, lon0=num("lon_0"), lat0=num("lat_0"),
            sp1=num("lat_1"), sp2=num("lat_2", num("lat_1")), fe=num("x_0"), fn=num("y_0"),
        )
    elif name == "laea":
        proj = LambertAzimuthalEqualArea(ell, lon0=num("lon_0"), lat0=num("lat_0"), fe=num("x_0"), fn=num("y_0"))
    elif name == "merc":
        if "lat_ts" in kv:
            # Mercator variant B: k0 derived from the true-scale latitude
            if "k" in kv or "k_0" in kv:
                raise NotImplementedError("+proj=merc accepts +lat_ts or +k_0, not both")
            phi_ts = math.radians(num("lat_ts"))
            k0 = math.cos(phi_ts) / math.sqrt(1.0 - ell.e2 * math.sin(phi_ts) ** 2)
        else:
            k0 = num("k", num("k_0", 1.0))
        proj = MercatorEllipsoidal(ell, lon0=num("lon_0"), k0=k0, fe=num("x_0"), fn=num("y_0"))
    elif name == "sterea":
        proj = ObliqueStereographic(
            ell, lon0=num("lon_0"), lat0=num("lat_0"),
            k0=num("k", num("k_0", 1.0)), fe=num("x_0"), fn=num("y_0"),
        )
    elif name == "stere":
        lat0 = num("lat_0")
        if abs(lat0) != 90.0:
            raise NotImplementedError("+proj=stere: only the polar aspects (lat_0=+-90) are supported; use sterea for oblique")
        lat_ts = None
        k0 = num("k", num("k_0", 1.0))
        if "lat_ts" in kv:
            if "k" in kv or "k_0" in kv:
                raise NotImplementedError("+proj=stere accepts +lat_ts or +k_0, not both")
            lat_ts = num("lat_ts")
        proj = PolarStereographic(
            ell, lon0=num("lon_0"), fe=num("x_0"), fn=num("y_0"),
            south=lat0 < 0.0, k0=k0, lat_ts=lat_ts,
        )
    elif name == "somerc":
        proj = SwissObliqueMercator(
            ell, lon0=num("lon_0"), lat0=num("lat_0"),
            k0=num("k", num("k_0", 1.0)), fe=num("x_0"), fn=num("y_0"),
        )
    elif name == "krovak":
        proj = Krovak(
            ell,
            lon0=num("lon_0", 24.833333333333332),
            latc=num("lat_0", 49.5),
            alphac=num("alpha", 30.28813972222222),
            latp=num("lat_ts", 78.5),
            k0=num("k", num("k_0", 0.9999)),
            fe=num("x_0"), fn=num("y_0"),
            czech="czech" in flags,
        )
    elif name == "cass":
        proj = CassiniSoldner(ell, lon0=num("lon_0"), lat0=num("lat_0"), fe=num("x_0"), fn=num("y_0"))
    elif name == "cea":
        proj = LambertCylindricalEqualArea(ell, lon0=num("lon_0"), lat_ts=num("lat_ts"), fe=num("x_0"), fn=num("y_0"))
    elif name == "eqc":
        proj = EquidistantCylindrical(ell, lon0=num("lon_0"), lat_ts=num("lat_ts"), fe=num("x_0"), fn=num("y_0"))
    else:
        raise NotImplementedError(
            f"+proj={name}: supported values are tmerc, utm, lcc, aea, laea, merc, "
            "sterea, stere (polar), somerc, krovak, cass, cea, eqc, longlat"
        )
    leftover = set(kv) - consumed
    if leftover:
        raise NotImplementedError(
            f"unsupported proj parameters {sorted(leftover)} for +proj={name} "
            "(refusing to silently distort coordinates)"
        )
    return CRS(0, proj, helmert, f"proj4:{name}")
