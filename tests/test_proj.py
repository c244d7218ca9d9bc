"""Golden tests for the general projection engine (functions/proj.py)
against published worked examples, plus round-trip fuzz for every
registered grid CRS.

Reference parity target: ST_Transform accepts arbitrary EPSG codes via
GeoTools (common/src/main/java/org/apache/sedona/common/Functions.java:184-212).
"""

import math

import numpy as np
import pytest

from incubator_sedona_ray.functions import proj
from incubator_sedona_ray.functions.transform import transform_xy


def dms(d, m, s):
    return d + m / 60.0 + s / 3600.0


class TestGoldenExamples:
    def test_osgb_projection_os_worked_example(self):
        """OS 'A guide to coordinate systems in Great Britain' worked
        example: OSGB36 geographic -> National Grid (projection only,
        no datum shift). Published result E 651409.903 N 313177.270."""
        tm = proj.get_crs(27700).proj
        E, N = tm.forward(np.array([dms(1, 43, 4.5177)]), np.array([dms(52, 39, 27.2531)]))
        assert abs(E[0] - 651409.903) < 0.002
        assert abs(N[0] - 313177.270) < 0.002

    def test_osgb_full_chain_with_helmert(self):
        """ETRS89 (~WGS84) position of the same OS example point through
        the published OSGB36 Helmert; the single 7-param shift is
        documented as ~3.5 m accurate, so the tolerance is 5 m."""
        x, y = transform_xy(
            "EPSG:4326", "EPSG:27700", np.array([dms(1, 42, 57.8663)]), np.array([dms(52, 39, 28.8282)])
        )
        assert abs(x[0] - 651409.903) < 5.0
        assert abs(y[0] - 313177.270) < 5.0

    def test_lcc_2sp_epsg_worked_example(self):
        """EPSG Guidance Note 7-2 Lambert Conic Conformal (2SP) example:
        NAD27 / Texas South Central (Clarke 1866, US survey feet).
        phi=28d30'N lam=96dW -> E 2963503.91 ftUS, N 254759.80 ftUS."""
        ft_us = 1200.0 / 3937.0
        clarke_ft = proj.Ellipsoid(6378206.4 / ft_us, proj.CLARKE1866.inv_f)
        lcc = proj.LambertConformal(
            clarke_ft,
            lon0=-99.0,
            lat0=dms(27, 50, 0),
            sp1=dms(28, 23, 0),
            sp2=dms(30, 17, 0),
            fe=2000000.0,
            fn=0.0,
        )
        E, N = lcc.forward(np.array([-96.0]), np.array([28.5]))
        assert abs(E[0] - 2963503.91) < 0.02
        assert abs(N[0] - 254759.80) < 0.02
        lon, lat = lcc.inverse(E, N)
        assert abs(lon[0] + 96.0) < 1e-9 and abs(lat[0] - 28.5) < 1e-9

    def test_lambert93_grid_origin_exact(self):
        x, y = transform_xy("EPSG:4326", "EPSG:2154", np.array([3.0]), np.array([46.5]))
        assert abs(x[0] - 700000.0) < 1e-6
        assert abs(y[0] - 6600000.0) < 1e-6

    def test_lambert93_scale_unity_on_standard_parallels(self):
        """LCC preserves scale exactly along both standard parallels:
        a small east-west step at lat 44/49 must map to (step * cos(lat)
        * meridian-normal radius) meters of grid distance."""
        crs = proj.get_crs(2154)
        for sp in (44.0, 49.0):
            d = 1e-4
            x0, y0 = crs.from_wgs84(np.array([3.0]), np.array([sp]))
            x1, y1 = crs.from_wgs84(np.array([3.0 + d]), np.array([sp]))
            grid = math.hypot(x1[0] - x0[0], y1[0] - y0[0])
            phi = math.radians(sp)
            nu = proj.GRS80.a / math.sqrt(1 - proj.GRS80.e2 * math.sin(phi) ** 2)
            true = math.radians(d) * nu * math.cos(phi)
            assert abs(grid / true - 1.0) < 1e-9

    def test_laea_and_albers_grid_origins_exact(self):
        x, y = transform_xy("EPSG:4326", "EPSG:3035", np.array([10.0]), np.array([52.0]))
        assert abs(x[0] - 4321000.0) < 1e-6 and abs(y[0] - 3210000.0) < 1e-6
        x, y = transform_xy("EPSG:4326", "EPSG:5070", np.array([-96.0]), np.array([23.0]))
        assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6

    def test_albers_preserves_area(self):
        """EPSG 9822 is equal-area: two 1x1-degree cells at different
        latitudes must keep the exact ellipsoidal area ratio (cell edges
        densified — they curve on the grid)."""
        crs = proj.get_crs(5070)

        def cell_area(lon, lat, dens=64):
            t = np.linspace(0.0, 1.0, dens)
            lons = np.concatenate([lon + t, np.full(dens, lon + 1.0), lon + 1.0 - t, np.full(dens, lon)])
            lats = np.concatenate([np.full(dens, lat), lat + t, np.full(dens, lat + 1.0), lat + 1.0 - t])
            x, y = crs.from_wgs84(lons, lats)
            return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))

        e2 = proj.GRS80.e2

        def ell_weight(lat):
            p = math.radians(lat)
            return math.cos(p) * (1 - e2) / (1 - e2 * math.sin(p) ** 2) ** 2

        ratio_true = ell_weight(30.5) / ell_weight(45.5)
        ratio_grid = cell_area(-100.0, 30.0) / cell_area(-100.0, 45.0)
        assert abs(ratio_grid / ratio_true - 1.0) < 1e-4

    def test_etrs89_utm_matches_wgs84_utm_sub_mm(self):
        x1, y1 = transform_xy("EPSG:4326", "EPSG:32632", np.array([9.0]), np.array([48.0]))
        x2, y2 = transform_xy("EPSG:4326", "EPSG:25832", np.array([9.0]), np.array([48.0]))
        assert abs(x1[0] - x2[0]) < 1e-3 and abs(y1[0] - y2[0]) < 1e-3

    def test_belgian_lambert72_brussels_sanity(self):
        """Brussels city centre (~4.3517E 50.8466N): x must sit ~1.1 km
        west of the 150000 false easting (the point is 0.0158 deg west of
        the lon origin) and y in the published ~170.7 km band. A wrong
        standard parallel, FE/FN, or datum sign blows past 300 m."""
        x, y = transform_xy("EPSG:4326", "EPSG:31370", np.array([4.3517]), np.array([50.8466]))
        assert abs(x[0] - 148850) < 300 and abs(y[0] - 170650) < 300


class TestRoundTrips:
    # (code, lon window, lat window) inside each grid's validity area
    WINDOWS = [
        (27700, (-7.5, 1.7), (50.0, 60.8)),
        (2154, (-5.0, 9.5), (41.0, 51.0)),
        (3035, (-10.0, 30.0), (35.0, 70.0)),
        (5070, (-124.0, -67.0), (24.0, 49.0)),
        (31370, (2.5, 6.4), (49.5, 51.5)),
        (25832, (6.0, 12.0), (38.0, 83.0)),
        (26917, (-84.0, -78.0), (24.0, 83.0)),
        (26713, (-108.0, -102.0), (25.0, 60.0)),
        (23031, (0.0, 6.0), (36.0, 70.0)),
        (28355, (144.0, 150.0), (-44.0, -10.0)),
        (4277, (-7.5, 1.7), (50.0, 60.8)),
        (4267, (-120.0, -75.0), (25.0, 49.0)),
        (4314, (6.0, 15.0), (47.0, 55.0)),
    ]

    @pytest.mark.parametrize("code,lon_w,lat_w", WINDOWS, ids=[str(w[0]) for w in WINDOWS])
    def test_roundtrip(self, code, lon_w, lat_w):
        rng = np.random.default_rng(code)
        lon = rng.uniform(*lon_w, size=200)
        lat = rng.uniform(*lat_w, size=200)
        x, y = transform_xy("EPSG:4326", f"EPSG:{code}", lon, lat)
        lon2, lat2 = transform_xy(f"EPSG:{code}", "EPSG:4326", x, y)
        # degree tolerance ~ 2 mm ground distance (Helmert inverse is exact
        # to first order; projections are exact to machine precision)
        assert np.max(np.abs(lon2 - lon)) < 5e-8
        assert np.max(np.abs(lat2 - lat)) < 5e-8

    def test_cross_crs_hub(self):
        """27700 -> 2154 directly (through the WGS84 hub) must equal the
        two-leg composition."""
        lon = np.array([0.5, -3.0])
        lat = np.array([51.5, 55.9])
        e, n = transform_xy("EPSG:4326", "EPSG:27700", lon, lat)
        x1, y1 = transform_xy("EPSG:27700", "EPSG:2154", e, n)
        lo, la = transform_xy("EPSG:27700", "EPSG:4326", e, n)
        x2, y2 = transform_xy("EPSG:4326", "EPSG:2154", lo, la)
        assert np.allclose(x1, x2, atol=1e-6) and np.allclose(y1, y2, atol=1e-6)

    def test_unknown_code_raises(self):
        with pytest.raises(NotImplementedError):
            transform_xy("EPSG:4326", "EPSG:99999", np.array([0.0]), np.array([0.0]))


class TestStTransformGeometry:
    def test_wkb_polygon_through_27700(self):
        from incubator_sedona_ray.functions.st import st_geomfromtext, st_transform, st_x, st_y, st_centroid

        wkt = ["POLYGON ((-0.2 51.4, 0.1 51.4, 0.1 51.6, -0.2 51.6, -0.2 51.4))", "POINT (-2 53)"]
        geoms = st_geomfromtext(wkt)
        out = st_transform(geoms, "EPSG:4326", "EPSG:27700")
        cx = st_x(st_centroid(out)).to_pylist()
        cy = st_y(st_centroid(out)).to_pylist()
        # London-ish centroid near grid (530k, 180k); point near (400k, 345k)
        assert 510000 < cx[0] < 550000 and 160000 < cy[0] < 200000
        assert 395000 < cx[1] < 405000 and 330000 < cy[1] < 360000


class TestProjString:
    """Minimal proj-string evaluator over the same projection engine."""

    def test_osgb_string_matches_registry(self):
        import numpy as np

        from incubator_sedona_ray.functions.transform import transform_xy

        lon, lat = np.array([-0.1276]), np.array([51.5072])
        s = (
            "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 "
            "+y_0=-100000 +ellps=airy "
            "+towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489"
        )
        x1, y1 = transform_xy("EPSG:4326", s, lon, lat)
        x2, y2 = transform_xy("EPSG:4326", "EPSG:27700", lon, lat)
        # the proj-string towgs84 values are the published 3-decimal ones;
        # the registry stores full precision -> mm-level agreement
        assert abs(x1[0] - x2[0]) < 0.01 and abs(y1[0] - y2[0]) < 0.01

    def test_utm_and_lcc_strings_bit_match_registry(self):
        import numpy as np

        from incubator_sedona_ray.functions.transform import transform_xy

        p = (np.array([15.0]), np.array([52.0]))
        a = transform_xy("EPSG:4326", "+proj=utm +zone=33 +ellps=WGS84", *p)
        b = transform_xy("EPSG:4326", "EPSG:32633", *p)
        assert a[0][0] == b[0][0] and a[1][0] == b[1][0]
        q = (np.array([2.3522]), np.array([48.8566]))
        c = transform_xy(
            "EPSG:4326",
            "+proj=lcc +lat_0=46.5 +lon_0=3 +lat_1=49 +lat_2=44 "
            "+x_0=700000 +y_0=6600000 +ellps=GRS80",
            *q,
        )
        d = transform_xy("EPSG:4326", "EPSG:2154", *q)
        assert c[0][0] == d[0][0] and c[1][0] == d[1][0]

    def test_roundtrip_and_custom_ellipsoid(self):
        import numpy as np

        from incubator_sedona_ray.functions.transform import transform_xy

        s = "+proj=laea +lat_0=45 +lon_0=10 +x_0=1000 +y_0=2000 +a=6378137 +rf=298.25"
        lon, lat = np.array([11.5]), np.array([46.2])
        x, y = transform_xy("EPSG:4326", s, lon, lat)
        lo, la = transform_xy(s, "EPSG:4326", x, y)
        assert abs(lo[0] - lon[0]) < 1e-7 and abs(la[0] - lat[0]) < 1e-7

    def test_unsupported_proj_raises(self):
        import numpy as np
        import pytest

        from incubator_sedona_ray.functions.transform import transform_xy

        with pytest.raises(NotImplementedError):
            transform_xy("EPSG:4326", "+proj=sinu", np.array([0.0]), np.array([0.0]))
        with pytest.raises(NotImplementedError):
            transform_xy("EPSG:4326", "+proj=lcc +k_0=0.9 +lat_1=10", np.array([0.0]), np.array([0.0]))

    def test_world_mercator_3395_known_value(self):
        import numpy as np

        from incubator_sedona_ray.functions.transform import transform_xy

        # EPSG GN7-2 Mercator worked example is on the Makassar datum; for
        # 3395 pin against the published EPSG:3395 coords of (lon 10, lat 53)
        # computed with PROJ: E=1113194.908, N=6948849.385 (mm-level)
        x, y = transform_xy("EPSG:4326", "EPSG:3395", np.array([10.0]), np.array([53.0]))
        assert abs(x[0] - 1113194.9079327357) < 1e-6
        assert abs(y[0] - 6948849.385) < 0.01
        lo, la = transform_xy("EPSG:3395", "EPSG:4326", x, y)
        assert abs(lo[0] - 10.0) < 1e-9 and abs(la[0] - 53.0) < 1e-9

    def test_merc_proj_string_matches_3395(self):
        import numpy as np

        from incubator_sedona_ray.functions.transform import transform_xy

        p = (np.array([-74.0]), np.array([40.7]))
        a = transform_xy("EPSG:4326", "+proj=merc +ellps=WGS84", *p)
        b = transform_xy("EPSG:4326", "EPSG:3395", *p)
        assert a[0][0] == b[0][0] and a[1][0] == b[1][0]

    def test_unsupported_params_raise_not_distort(self):
        import numpy as np
        import pytest

        from incubator_sedona_ray.functions.proj import crs_from_proj4
        from incubator_sedona_ray.functions.transform import transform_xy

        # +lat_ts on merc IS modeled (variant B: k0 from true-scale lat)
        x, _ = transform_xy(
            "EPSG:4326", "+proj=merc +lat_ts=30 +ellps=WGS84", np.array([10.0]), np.array([0.0])
        )
        # EPSG 9805 variant B: k0 = cos(phi_ts)/sqrt(1 - e2 sin^2(phi_ts))
        import math

        e2 = 0.00669437999014
        k0 = math.cos(math.radians(30)) / math.sqrt(1 - e2 * 0.25)
        assert abs(x[0] - 6378137.0 * k0 * math.radians(10.0)) < 1e-6
        assert x[0] < 1_000_000  # far from the k0=1 value 1113195
        # unknown projection-altering params must raise, never silently drop
        with pytest.raises(NotImplementedError):
            crs_from_proj4("+proj=tmerc +lat_0=0 +lon_0=9 +pm=paris")
        with pytest.raises(NotImplementedError):
            crs_from_proj4("+proj=merc +lat_ts=30 +k_0=0.9")
        with pytest.raises(NotImplementedError):
            crs_from_proj4("+proj=longlat +units=ft")
        # +datum=WGS84 resolves; exotic datums raise
        assert crs_from_proj4("+proj=utm +zone=31 +datum=WGS84").proj.ell.a == 6378137.0
        with pytest.raises(NotImplementedError):
            crs_from_proj4("+proj=utm +zone=31 +datum=potsdam")
