"""Round-4 projection families (functions/proj.py): oblique/polar
stereographic, Swiss oblique Mercator, Krovak, cylindrical equal area,
equidistant cylindrical — worked examples, differential scale/area
invariants, and round-trip fuzz for every newly registered grid.

Reference parity target: ST_Transform accepts arbitrary EPSG codes via
GeoTools (common/src/main/java/org/apache/sedona/common/Functions.java:184-212).
"""

import math

import numpy as np
import pytest

from incubator_sedona_ray.functions import proj
from incubator_sedona_ray.functions.transform import transform_xy


class TestGoldenExamples:
    def test_rd_new_epsg_worked_example(self):
        """EPSG Guidance Note 7-2 oblique stereographic worked example
        (Amersfoort / RD New): Bessel geographic 53N 6E ->
        E 196105.283 N 557057.739 (projection only, no datum shift)."""
        rd = proj.get_crs(28992).proj
        E, N = rd.forward(np.array([6.0]), np.array([53.0]))
        assert abs(E[0] - 196105.283) < 0.002
        assert abs(N[0] - 557057.739) < 0.002

    def test_swiss_grid_origins_exact(self):
        """The projection centre (Bern old observatory) is by definition
        the false origin of both Swiss grids."""
        lon = np.array([7.439583333333333])
        lat = np.array([46.952405555555565])
        for code, fe, fn in ((2056, 2600000.0, 1200000.0), (21781, 600000.0, 200000.0)):
            E, N = proj.get_crs(code).proj.forward(lon, lat)
            assert abs(E[0] - fe) < 1e-6 and abs(N[0] - fn) < 1e-6

    def test_swiss_scale_unity_at_centre(self):
        """somerc is conformal with k0=1 at the centre: differential scale
        along the meridian at Bern must be 1."""
        p = proj.get_crs(2056).proj
        lat0, lon0 = 46.952405555555565, 7.439583333333333
        d = 1e-5  # small enough for truncation, large enough for fp cancellation
        _, n1 = p.forward(np.array([lon0]), np.array([lat0 - d / 2]))
        _, n2 = p.forward(np.array([lon0]), np.array([lat0 + d / 2]))
        ell = proj.BESSEL1841
        phi = math.radians(lat0)
        rho = ell.a * (1 - ell.e2) / (1 - ell.e2 * math.sin(phi) ** 2) ** 1.5
        k = (n2[0] - n1[0]) / (rho * math.radians(d))
        assert abs(k - 1.0) < 1e-7

    def test_polar_stereographic_pole_and_true_scale(self):
        """EPSG:3031 (variant B, lat_ts=-71): the pole maps to the false
        origin and the differential scale on the standard parallel is 1."""
        p = proj.get_crs(3031).proj
        E, N = p.forward(np.array([137.0]), np.array([-90.0]))
        assert abs(E[0]) < 1e-6 and abs(N[0]) < 1e-6
        d = 1e-7
        _, n1 = p.forward(np.array([0.0]), np.array([-71.0 - d / 2]))
        _, n2 = p.forward(np.array([0.0]), np.array([-71.0 + d / 2]))
        ell = proj.WGS84
        phi = math.radians(-71.0)
        rho = ell.a * (1 - ell.e2) / (1 - ell.e2 * math.sin(phi) ** 2) ** 1.5
        k = abs(n2[0] - n1[0]) / (rho * math.radians(d))
        assert abs(k - 1.0) < 1e-6

    def test_ups_north_scale_at_pole(self):
        """EPSG:32661 (variant A): k0=0.994 exactly at the pole — measure
        via the limit rho/(distance from pole along the meridian)."""
        p = proj.get_crs(32661).proj
        ell = proj.WGS84
        d = 1e-5  # degrees below the pole
        E, N = p.forward(np.array([0.0]), np.array([90.0 - d]))
        rho_grid = math.hypot(E[0] - 2000000.0, N[0] - 2000000.0)
        # meridian radius at the pole: a(1-e2)/(1-e2)^(3/2) = a/sqrt(1-e2)
        rho_m = ell.a / math.sqrt(1 - ell.e2)
        assert abs(rho_grid / (rho_m * math.radians(d)) - 0.994) < 1e-6

    def test_krovak_prague_sanity(self):
        """Krovak East North at Prague centre: the published 5514
        coordinates are near (-743000, -1043000); allow the ~1 m datum
        class + coordinate pick slack."""
        x, y = transform_xy("EPSG:4326", "EPSG:5514", np.array([14.4208]), np.array([50.0880]))
        assert -746000 < x[0] < -740000
        assert -1046000 < y[0] < -1040000

    def test_krovak_conformal_isotropy_and_scale_band(self):
        """Krovak is conformal: the differential scale along the meridian
        equals the scale along the parallel at every point (isotropy), and
        across CZ/SK it stays within the designed ~1e-4 band of 1."""
        p = proj.get_crs(5514).proj
        ell = proj.BESSEL1841
        rng = np.random.default_rng(5514)
        lon = rng.uniform(12.5, 22.0, 50)
        lat = rng.uniform(48.0, 51.0, 50)
        d = 1e-5
        e1, n1 = p.forward(lon, lat - d / 2)
        e2, n2 = p.forward(lon, lat + d / 2)
        e3, n3 = p.forward(lon - d / 2, lat)
        e4, n4 = p.forward(lon + d / 2, lat)
        phi = np.radians(lat)
        w = 1 - ell.e2 * np.sin(phi) ** 2
        rho = ell.a * (1 - ell.e2) / w**1.5
        nu_cos = ell.a * np.cos(phi) / np.sqrt(w)
        k_merid = np.hypot(n2 - n1, e2 - e1) / (rho * math.radians(d))
        k_par = np.hypot(n4 - n3, e4 - e3) / (nu_cos * math.radians(d))
        assert np.max(np.abs(k_merid - k_par)) < 1e-7  # conformal
        assert np.max(np.abs(k_merid - 1.0)) < 1.5e-3  # design scale band

    def test_cea_preserves_area(self):
        """EPSG:6933 (EASE-Grid 2.0): the differential area scale is 1
        everywhere (equal-area by construction)."""
        p = proj.get_crs(6933).proj
        ell = proj.WGS84
        rng = np.random.default_rng(6933)
        lon = rng.uniform(-170.0, 170.0, 40)
        lat = rng.uniform(-80.0, 80.0, 40)
        d = 1e-6
        ex1, _ = p.forward(lon - d / 2, lat)
        ex2, _ = p.forward(lon + d / 2, lat)
        _, ny1 = p.forward(lon, lat - d / 2)
        _, ny2 = p.forward(lon, lat + d / 2)
        phi = np.radians(lat)
        w = 1 - ell.e2 * np.sin(phi) ** 2
        rho = ell.a * (1 - ell.e2) / w**1.5
        nu_cos = ell.a * np.cos(phi) / np.sqrt(w)
        area_scale = ((ex2 - ex1) * (ny2 - ny1)) / (nu_cos * math.radians(d) * rho * math.radians(d))
        assert np.max(np.abs(area_scale - 1.0)) < 1e-5

    def test_eqc_meridian_arc(self):
        """EPSG:4087 northing IS the meridian arc: quarter meridian of
        WGS84 = 10001965.729 m; equator scale true (E = a * lon_rad)."""
        p = proj.get_crs(4087).proj
        _, N = p.forward(np.array([0.0]), np.array([90.0]))
        assert abs(N[0] - 10001965.729) < 0.01
        E, _ = p.forward(np.array([90.0]), np.array([0.0]))
        assert abs(E[0] - proj.WGS84.a * math.pi / 2) < 1e-6

    def test_nztm_wellington_sanity(self):
        """NZTM2000 Wellington (~174.777E, -41.289): published grid coords
        are near E 1748700, N 5427900."""
        x, y = transform_xy("EPSG:4326", "EPSG:2193", np.array([174.777]), np.array([-41.289]))
        assert abs(x[0] - 1748700) < 2000
        assert abs(y[0] - 5427900) < 2000


class TestCassini:
    def test_central_meridian_is_meridian_arc(self):
        """On the central meridian Cassini northing IS the meridian-arc
        difference and easting is exactly 0."""
        p = proj.crs_from_proj4("+proj=cass +lat_0=1.366666666666667 +lon_0=103.85 +ellps=WGS84")
        eq = proj.get_crs(4087).proj  # northing = meridian arc from equator
        lat = np.array([0.5, 1.366666666666667, 2.1, 4.0])
        E, N = p.proj.forward(np.full(4, 103.85), lat)
        assert np.max(np.abs(E)) < 1e-9
        _, m = eq.forward(np.zeros(4), lat)
        _, m0 = eq.forward(np.zeros(1), np.array([1.366666666666667]))
        assert np.max(np.abs(N - (m - m0[0]))) < 1e-6

    def test_agrees_with_tmerc_near_central_meridian(self):
        """Cassini and TM (k0=1) share series terms through O(dlam^2): they
        must agree to micrometers within 0.01 deg of the central meridian."""
        c = proj.crs_from_proj4("+proj=cass +lat_0=10 +lon_0=50 +ellps=WGS84")
        t = proj.crs_from_proj4("+proj=tmerc +lat_0=10 +lon_0=50 +k=1 +ellps=WGS84")
        lon = np.array([50.01, 49.995, 50.002])
        lat = np.array([8.0, 12.0, 15.0])
        ce, cn = c.proj.forward(lon, lat)
        te, tn = t.proj.forward(lon, lat)
        assert np.max(np.abs(ce - te)) < 1e-4
        assert np.max(np.abs(cn - tn)) < 1e-4

    def test_roundtrip(self):
        p = proj.crs_from_proj4("+proj=cass +lat_0=31 +lon_0=35.2 +x_0=170251.555 +y_0=126867.909 +ellps=GRS80")
        rng = np.random.default_rng(9806)
        lon = rng.uniform(34.2, 36.2, 300)
        lat = rng.uniform(29.2, 33.3, 300)
        lon2, lat2 = p.proj.inverse(*p.proj.forward(lon, lat))
        assert np.max(np.abs(lon2 - lon)) < 5e-9
        assert np.max(np.abs(lat2 - lat)) < 5e-9

    def test_svy21_singapore_sanity(self):
        """SVY21 (EPSG:3414): the projection origin maps to the false
        origin; downtown Singapore (~103.852E 1.29N) lands near
        E 30000 N 30000 (published city-centre grid values)."""
        x, y = transform_xy(
            "EPSG:4326", "EPSG:3414", np.array([103.83333333333333, 103.852]), np.array([1.3666666666666667, 1.29])
        )
        assert abs(x[0] - 28001.642) < 1e-6 and abs(y[0] - 38744.572) < 1e-6
        assert abs(x[1] - 30079) < 500 and abs(y[1] - 30266) < 500


class TestRoundTrips:
    WINDOWS = [
        (28992, (3.3, 7.2), (50.7, 53.6)),
        (2056, (6.0, 10.5), (45.8, 47.8)),
        (21781, (6.0, 10.5), (45.8, 47.8)),
        (5514, (12.0, 22.5), (47.7, 51.1)),
        (3031, (-180.0, 180.0), (-89.9, -60.0)),
        (3976, (-180.0, 180.0), (-89.9, -55.0)),
        (3413, (-180.0, 180.0), (60.0, 89.9)),
        (3995, (-180.0, 180.0), (60.0, 89.9)),
        (32661, (-180.0, 180.0), (60.0, 89.9)),
        (32761, (-180.0, 180.0), (-89.9, -60.0)),
        (6933, (-179.0, 179.0), (-85.0, 85.0)),
        (4087, (-179.0, 179.0), (-89.0, 89.0)),
        (32662, (-179.0, 179.0), (-89.0, 89.0)),
        (2193, (166.0, 179.0), (-47.5, -34.0)),
        (3067, (19.0, 32.0), (58.8, 70.1)),
        (2180, (14.0, 24.2), (49.0, 55.0)),
        (2177, (16.5, 19.5), (49.0, 55.0)),
        (2100, (19.5, 28.3), (34.7, 41.8)),
        (3826, (119.2, 122.1), (21.8, 25.4)),
        (5186, (124.5, 129.5), (33.0, 38.7)),
        (3577, (112.0, 154.0), (-44.0, -9.0)),
        (3112, (112.0, 154.0), (-44.0, -9.0)),
        (31287, (9.5, 17.2), (46.4, 49.1)),
        (4289, (3.3, 7.2), (50.7, 53.6)),
        (4156, (12.0, 22.5), (47.7, 51.1)),
    ]

    @pytest.mark.parametrize("code,lon_w,lat_w", WINDOWS, ids=[str(w[0]) for w in WINDOWS])
    def test_roundtrip(self, code, lon_w, lat_w):
        rng = np.random.default_rng(code)
        lon = rng.uniform(*lon_w, size=200)
        lat = rng.uniform(*lat_w, size=200)
        x, y = transform_xy("EPSG:4326", f"EPSG:{code}", lon, lat)
        lon2, lat2 = transform_xy(f"EPSG:{code}", "EPSG:4326", x, y)
        assert np.max(np.abs(lon2 - lon)) < 5e-8
        assert np.max(np.abs(lat2 - lat)) < 5e-8

    def test_polar_inverse_wraps_longitude(self):
        """3413 (lon0=-45) spans all longitudes: the inverse must return
        lon in (-180, 180] even where lam + lon0 leaves that range."""
        p = proj.get_crs(3413).proj
        lon = np.array([179.0, -179.0, 170.0])
        lat = np.array([70.0, 75.0, 65.0])
        lon2, _ = p.inverse(*p.forward(lon, lat))
        assert np.max(np.abs(lon2 - lon)) < 1e-9


class TestProj4Strings:
    def test_sterea_matches_rd_registry(self):
        got = proj.crs_from_proj4(
            "+proj=sterea +lat_0=52.15616055555555 +lon_0=5.387638888888889 "
            "+k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel +units=m +no_defs"
        )
        reg = proj.get_crs(28992)
        lon = np.array([4.9, 6.1])
        lat = np.array([51.2, 52.9])
        for a, b in zip(got.proj.forward(lon, lat), reg.proj.forward(lon, lat)):
            assert np.max(np.abs(a - b)) == 0.0

    def test_somerc_matches_lv95_registry(self):
        got = proj.crs_from_proj4(
            "+proj=somerc +lat_0=46.952405555555565 +lon_0=7.439583333333333 "
            "+k_0=1 +x_0=2600000 +y_0=1200000 +ellps=bessel +units=m"
        )
        reg = proj.get_crs(2056)
        lon = np.array([7.0, 9.2])
        lat = np.array([46.2, 47.5])
        for a, b in zip(got.proj.forward(lon, lat), reg.proj.forward(lon, lat)):
            assert np.max(np.abs(a - b)) == 0.0

    def test_krovak_default_parameters_match_5514(self):
        got = proj.crs_from_proj4("+proj=krovak +ellps=bessel +units=m +no_defs")
        reg = proj.get_crs(5514)
        lon = np.array([14.42, 17.1])
        lat = np.array([50.09, 48.15])
        for a, b in zip(got.proj.forward(lon, lat), reg.proj.forward(lon, lat)):
            assert np.max(np.abs(a - b)) == 0.0

    def test_krovak_czech_flag_flips_signs(self):
        pos = proj.crs_from_proj4("+proj=krovak +czech +ellps=bessel")
        neg = proj.crs_from_proj4("+proj=krovak +ellps=bessel")
        lon = np.array([15.0])
        lat = np.array([49.8])
        xp, yp = pos.proj.forward(lon, lat)
        xn, yn = neg.proj.forward(lon, lat)
        # czech: (southing, westing) positive; default East-North: E=-westing
        assert abs(xp[0] + yn[0]) < 1e-9  # southing == -N
        assert abs(yp[0] + xn[0]) < 1e-9  # westing == -E
        assert xp[0] > 0 and yp[0] > 0

    def test_stere_polar_matches_3031(self):
        got = proj.crs_from_proj4("+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +datum=WGS84")
        reg = proj.get_crs(3031)
        lon = np.array([45.0, -120.0])
        lat = np.array([-75.0, -82.0])
        for a, b in zip(got.proj.forward(lon, lat), reg.proj.forward(lon, lat)):
            assert np.max(np.abs(a - b)) == 0.0

    def test_stere_oblique_raises(self):
        with pytest.raises(NotImplementedError):
            proj.crs_from_proj4("+proj=stere +lat_0=45 +lon_0=0 +ellps=WGS84")

    def test_cea_and_eqc_match_registry(self):
        cea = proj.crs_from_proj4("+proj=cea +lat_ts=30 +lon_0=0 +datum=WGS84")
        eqc = proj.crs_from_proj4("+proj=eqc +lat_ts=0 +lon_0=0 +datum=WGS84")
        lon = np.array([12.0, -77.0])
        lat = np.array([55.0, -33.0])
        for a, b in zip(cea.proj.forward(lon, lat), proj.get_crs(6933).proj.forward(lon, lat)):
            assert np.max(np.abs(a - b)) == 0.0
        for a, b in zip(eqc.proj.forward(lon, lat), proj.get_crs(4087).proj.forward(lon, lat)):
            assert np.max(np.abs(a - b)) == 0.0
