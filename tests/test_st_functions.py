"""ST_ catalog golden tests (mirroring functionTestScala expectations where
closed-form)."""

import numpy as np
import pyarrow as pa
import pytest

from incubator_sedona_ray.functions import FUNCTIONS, st_apply
from incubator_sedona_ray.functions import st as S
from incubator_sedona_ray.geom import Geometry
from incubator_sedona_ray.geom.wkb import from_wkb, to_wkb
from incubator_sedona_ray.geom.wkt import to_wkt

SQ = to_wkb(Geometry.box(0, 0, 4, 4))
TRI = to_wkb(Geometry.polygon([[0, 0], [6, 0], [0, 6]]))
LINE = to_wkb(Geometry.linestring([[0, 0], [3, 4]]))
PT = to_wkb(Geometry.point(1, 2))


def test_catalog_size():
    # breadth check: the catalog carries a meaningful share of the ~125
    # vector functions in the reference registry
    assert len(FUNCTIONS) >= 120


def test_catalog_name_coverage_vs_reference():
    """Every ST_ name in the reference Catalog.scala resolves here, except
    the aggregates (functions/aggregates.py) and SubDivideExplode (the
    flat-map stage factory st_subdivideexplode_fn)."""
    import re

    cat = open(
        "/root/reference/sql/common/src/main/scala/org/apache/sedona/sql/UDF/Catalog.scala"
    ).read()
    names = {n[3:].lower().replace("_", "") for n in re.findall(r"ST_[A-Za-z0-9_]+", cat)}
    ours = {k.lower().replace("_", "") for k in FUNCTIONS}
    allowed_elsewhere = {"unionaggr", "envelopeaggr", "intersectionaggr", "subdivideexplode"}
    assert names - ours <= allowed_elsewhere, names - ours - allowed_elsewhere


def test_constructors():
    pts = S.st_point([1.0, 2.0], [3.0, 4.0])
    g = from_wkb(pts[0].as_py())
    assert g == Geometry.point(1, 3)
    wkts = S.st_geomfromwkt(["POINT (5 6)", None])
    assert from_wkb(wkts[0].as_py()) == Geometry.point(5, 6)
    assert wkts[1].as_py() is None
    env = S.st_polygonfromenvelope([0.0], [0.0], [2.0], [3.0])
    assert from_wkb(env[0].as_py()) == Geometry.box(0, 0, 2, 3)
    gh = S.st_geomfromgeohash(["u4pruy"])
    box = from_wkb(gh[0].as_py()).envelope()
    assert box[0] <= 10.40744 <= box[2] and box[1] <= 57.64911 <= box[3]


def test_measures():
    assert S.st_area([SQ, TRI, LINE]).to_pylist() == [16.0, 18.0, 0.0]
    assert S.st_length([SQ, LINE]).to_pylist() == [16.0, 5.0]
    assert S.st_x([PT]).to_pylist() == [1.0]
    assert S.st_y([PT]).to_pylist() == [2.0]
    assert S.st_xmin([SQ]).to_pylist() == [0.0]
    assert S.st_xmax([SQ]).to_pylist() == [4.0]
    assert S.st_npoints([SQ, LINE]).to_pylist() == [5, 2]
    assert S.st_geometrytype([SQ, PT]).to_pylist() == ["ST_Polygon", "ST_Point"]
    assert S.st_distance([PT], [to_wkb(Geometry.point(4, 6))]).to_pylist() == [5.0]


def test_distancesphere_known():
    # Paris -> London great-circle ~343-344 km
    paris = to_wkb(Geometry.point(2.3522, 48.8566))
    london = to_wkb(Geometry.point(-0.1276, 51.5072))
    d = S.st_distancesphere([paris], [london]).to_pylist()[0]
    assert 330_000 < d < 350_000


def test_transformers():
    t = S.st_translate([PT], 10, 20)
    assert from_wkb(t[0].as_py()) == Geometry.point(11, 22)
    f = S.st_flipcoordinates([PT])
    assert from_wkb(f[0].as_py()) == Geometry.point(2, 1)
    r = S.st_reverse([LINE])
    np.testing.assert_array_equal(from_wkb(r[0].as_py()).coords, [[3, 4], [0, 0]])
    rp = S.st_reduceprecision([to_wkb(Geometry.point(1.23456, 7.891011))], 2)
    assert from_wkb(rp[0].as_py()) == Geometry.point(1.23, 7.89)


def test_topology():
    c = S.st_centroid([SQ])
    assert from_wkb(c[0].as_py()) == Geometry.point(2, 2)
    e = S.st_envelope([TRI])
    assert from_wkb(e[0].as_py()) == Geometry.box(0, 0, 6, 6)
    h = S.st_convexhull([to_wkb(Geometry(("MultiPoint"), np.array([[0.0, 0], [2, 0], [1, 1], [1, 0.2]])))])
    assert S.st_area([h[0].as_py()]).to_pylist()[0] == 1.0
    b = S.st_boundary([SQ])
    assert from_wkb(b[0].as_py()).kind == "LineString"
    dumped = S.st_dump([to_wkb(Geometry("MultiPoint", np.array([[0.0, 0], [1, 1]])))])
    assert len(dumped[0].as_py()) == 2
    pos = S.st_pointonsurface([SQ])
    g = from_wkb(pos[0].as_py())
    assert 0 <= g.coords[0] <= 4


def test_predicates_and_serde():
    assert S.st_contains([SQ], [PT]).to_pylist() == [True]
    assert S.st_within([PT], [SQ]).to_pylist() == [True]
    assert S.st_disjoint([SQ], [to_wkb(Geometry.point(9, 9))]).to_pylist() == [True]
    assert S.st_astext([PT]).to_pylist() == ["POINT (1 2)"]
    gj = S.st_asgeojson([PT]).to_pylist()[0]
    assert '"Point"' in gj
    back = S.st_geomfromgeojson([gj])
    assert from_wkb(back[0].as_py()) == Geometry.point(1, 2)
    # round-trip polygon through geojson
    gj2 = S.st_asgeojson([SQ]).to_pylist()[0]
    assert from_wkb(S.st_geomfromgeojson([gj2])[0].as_py()) == from_wkb(SQ)


def test_flags():
    ring = to_wkb(Geometry.linestring([[0, 0], [1, 0], [1, 1], [0, 0]]))
    open_line = LINE
    assert S.st_isclosed([ring, open_line]).to_pylist() == [True, False]
    assert S.st_isring([ring, open_line]).to_pylist() == [True, False]
    bowtie = to_wkb(Geometry.linestring([[0, 0], [2, 2], [2, 0], [0, 2]]))
    assert S.st_issimple([LINE, bowtie]).to_pylist() == [True, False]
    assert S.st_isempty([PT]).to_pylist() == [False]


def test_srid():
    s = S.st_setsrid([PT], 4326)
    assert S.st_srid(s).to_pylist() == [4326]


def test_st_apply_stage():
    batch = pa.table({"geom": [SQ, TRI]})
    out = st_apply("st_area", "area", "geom")(batch)
    assert out["area"].to_pylist() == [16.0, 18.0]


from incubator_sedona_ray.functions import st
from incubator_sedona_ray.geom.core import GeometryType


class TestAccessorFamily:
    """Golden tests for the accessor family (Functions.java:291-330,384-439,
    511,692; Predicates.java:47-52)."""

    def setup_method(self):
        import numpy as np
        self.line = to_wkb(Geometry.linestring([(0, 0), (1, 1), (2, 0), (4, 0)]))
        self.poly = to_wkb(
            Geometry(
                GeometryType.POLYGON,
                [
                    np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float),
                    np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], float),
                ],
            )
        )
        self.pt = to_wkb(Geometry.point(3, 4))

    def test_pointn_bounds_and_negative(self):
        got = st.st_pointn([self.line] * 4, 2).to_pylist()
        assert from_wkb(got[0]).coords.tolist() == [1.0, 1.0]
        assert st.st_pointn([self.line], -1).to_pylist()[0] == st.st_endpoint([self.line]).to_pylist()[0]
        assert st.st_pointn([self.line], 9).to_pylist() == [None]
        assert st.st_pointn([self.poly], 1).to_pylist() == [None]  # not a line

    def test_start_end_points(self):
        assert from_wkb(st.st_startpoint([self.line]).to_pylist()[0]).coords.tolist() == [0.0, 0.0]
        assert from_wkb(st.st_endpoint([self.line]).to_pylist()[0]).coords.tolist() == [4.0, 0.0]
        assert st.st_startpoint([self.pt]).to_pylist() == [None]

    def test_rings(self):
        ring = from_wkb(st.st_exteriorring([self.poly]).to_pylist()[0])
        assert ring.kind == GeometryType.LINESTRING and len(ring.coords) == 5
        hole = from_wkb(st.st_interiorringn([self.poly], 0).to_pylist()[0])
        assert hole.coords[0].tolist() == [1.0, 1.0]
        assert st.st_interiorringn([self.poly], 1).to_pylist() == [None]
        assert st.st_numinteriorrings([self.poly, self.line]).to_pylist() == [1, None]
        assert st.st_nrings([self.poly, self.pt]).to_pylist() == [2, 0]

    def test_geometryn_dimension_ndims(self):
        assert from_wkb(st.st_geometryn([self.poly], 0).to_pylist()[0]).kind == GeometryType.POLYGON
        assert st.st_geometryn([self.poly], 1).to_pylist() == [None]
        assert st.st_dimension([self.pt, self.line, self.poly]).to_pylist() == [0, 1, 2]
        assert st.st_ndims([self.pt]).to_pylist() == [2]

    def test_collect_and_multi(self):
        out = st.st_collect([self.pt], [to_wkb(Geometry.point(9, 9))]).to_pylist()
        g = from_wkb(out[0])
        assert g.kind == GeometryType.MULTIPOINT and len(g.coords) == 2
        mixed = st.st_collect([self.pt], [self.line]).to_pylist()
        assert from_wkb(mixed[0]).kind == GeometryType.GEOMETRYCOLLECTION
        assert from_wkb(st.st_multi([self.poly]).to_pylist()[0]).kind == GeometryType.MULTIPOLYGON
        # multi passthrough
        mp = st.st_multi(st.st_multi([self.pt])).to_pylist()
        assert from_wkb(mp[0]).kind == GeometryType.MULTIPOINT

    def test_orderingequals(self):
        shifted = to_wkb(Geometry.linestring([(1, 1), (2, 0), (4, 0), (0, 0)]))
        assert st.st_orderingequals([self.line], [self.line]).to_pylist() == [True]
        assert st.st_orderingequals([self.line], [shifted]).to_pylist() == [False]
        assert st.st_orderingequals([self.line], [self.pt]).to_pylist() == [False]

    def test_minimumboundingradius(self):
        import numpy as np
        mbr = st.st_minimumboundingradius([self.poly])
        assert mbr.field("radius").to_pylist()[0] == pytest.approx(np.hypot(2, 2))
        c = from_wkb(mbr.field("center").to_pylist()[0])
        assert c.coords.tolist() == [2.0, 2.0]

    def test_points_and_force2d(self):
        pts = from_wkb(st.st_points([self.line]).to_pylist()[0])
        assert pts.kind == GeometryType.MULTIPOINT and len(pts.coords) == 4
        assert st.st_force2d([self.pt]).to_pylist()[0] == self.pt


class TestZFamily:
    def test_pointz_roundtrip_and_accessors(self):
        ptz = st.st_pointz([1.0, 2.0], [3.0, 4.0], [5.0, 6.0]).to_pylist()
        g = from_wkb(ptz[0])
        assert g.coords.tolist() == [1.0, 3.0] and g.z == 5.0
        assert st.st_z(ptz).to_pylist() == [5.0, 6.0]
        assert st.st_zmax(ptz).to_pylist() == [5.0, 6.0]
        assert st.st_zmin(ptz).to_pylist() == [5.0, 6.0]

    def test_2d_inputs_null_z(self):
        assert st.st_z([PT]).to_pylist() == [None]
        assert st.st_zmax([SQ]).to_pylist() == [None]

    def test_3ddistance(self):
        a = st.st_pointz([0.0], [0.0], [0.0]).to_pylist()
        b = st.st_pointz([1.0], [1.0], [1.0]).to_pylist()
        assert st.st_3ddistance(a, b).to_pylist()[0] == pytest.approx(3 ** 0.5)
        # 2D fallback = planar distance
        assert st.st_3ddistance([PT], [to_wkb(Geometry.point(4, 6))]).to_pylist()[0] == pytest.approx(5.0)

    def test_z_linestring_wkb(self):
        import numpy as np
        from incubator_sedona_ray.geom.core import GeometryType as GT
        lz = Geometry(GT.LINESTRING, np.array([[0, 0], [1, 1]], float), z=np.array([7.0, 9.0]))
        g = from_wkb(to_wkb(lz))
        assert g.z.tolist() == [7.0, 9.0]
        assert st.st_zmax([to_wkb(lz)]).to_pylist() == [9.0]


class TestHullSplitBuildArea:
    def test_split_line_by_point(self):
        line = to_wkb(Geometry.linestring([(0, 0), (10, 0)]))
        pt = to_wkb(Geometry.point(4, 0))
        gc = from_wkb(st.st_split([line], [pt]).to_pylist()[0])
        assert len(gc.coords) == 2
        assert np.asarray(gc.coords[0].coords).tolist() == [[0, 0], [4, 0]]
        assert np.asarray(gc.coords[1].coords).tolist() == [[4, 0], [10, 0]]
        # point off the line: unchanged
        miss = from_wkb(st.st_split([line], [to_wkb(Geometry.point(4, 5))]).to_pylist()[0])
        assert len(miss.coords) == 1

    def test_split_polygon_by_line(self):
        from incubator_sedona_ray.geom import ops as O
        sq = to_wkb(Geometry.box(0, 0, 10, 10))
        blade = to_wkb(Geometry.linestring([(4, -1), (4, 11)]))
        gc = from_wkb(st.st_split([sq], [blade]).to_pylist()[0])
        areas = sorted(round(O.area(p), 9) for p in gc.coords)
        assert areas == [40.0, 60.0]

    def test_buildarea_nesting(self):
        from incubator_sedona_ray.geom import ops as O
        from incubator_sedona_ray.geom.core import GeometryType as GT
        shell = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
        hole = [(3, 3), (7, 3), (7, 7), (3, 7), (3, 3)]
        island = [(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)]
        def ml(*rings):
            return to_wkb(Geometry(GT.MULTILINESTRING, [np.asarray(r, float) for r in rings]))
        assert O.area(from_wkb(st.st_buildarea([ml(shell)]).to_pylist()[0])) == 100.0
        g = from_wkb(st.st_buildarea([ml(shell, hole)]).to_pylist()[0])
        assert g.kind == "Polygon" and len(g.coords) == 2 and O.area(g) == 84.0
        g2 = from_wkb(st.st_buildarea([ml(shell, hole, island)]).to_pylist()[0])
        assert g2.kind == "MultiPolygon" and O.area(g2) == 88.0
        # open line -> empty collection
        open_line = to_wkb(Geometry.linestring([(0, 0), (5, 5)]))
        assert from_wkb(st.st_buildarea([open_line]).to_pylist()[0]).kind == "GeometryCollection"

    def test_concavehull_tighter_than_convex(self):
        from incubator_sedona_ray.geom import ops as O
        from incubator_sedona_ray.geom.core import GeometryType as GT
        from incubator_sedona_ray.geom import predicates as P
        rng = np.random.default_rng(0)
        ts = rng.uniform(0, 1.5 * np.pi, 150)
        pts = np.column_stack([np.cos(ts) * 10, np.sin(ts) * 10]) + rng.normal(0, 0.3, (150, 2))
        mp = Geometry(GT.MULTIPOINT, [p for p in pts])
        hull = from_wkb(st.st_concavehull([to_wkb(mp)], k=8).to_pylist()[0])
        assert hull.kind == "Polygon"
        # covers every input point, and is genuinely tighter than convex
        loc = P.locate_points_in_polygon(pts[:, 0], pts[:, 1], hull.coords)
        assert (loc >= P.BOUNDARY).all()
        assert O.area(hull) < 0.9 * O.area(O.convex_hull(mp))

    def test_subdivide_explode_stage(self):
        import pyarrow as pa
        dense = Geometry.polygon([(np.cos(t) * 5, np.sin(t) * 5) for t in np.linspace(0, 2 * np.pi, 600)])
        batch = pa.table({"gid": pa.array([1]), "geom": pa.array([to_wkb(dense)], type=pa.binary())})
        out = st.st_subdivideexplode_fn("geom", max_vertices=100)(batch)
        assert out.num_rows > 1
        assert (out["gid"].to_numpy(zero_copy_only=False) == 1).all()


def test_geomfromkml():
    kml_pt = "<Point><coordinates>-122.08,37.42,0</coordinates></Point>"
    g = from_wkb(S.st_geomfromkml([kml_pt])[0].as_py())
    assert g == Geometry.point(-122.08, 37.42)
    kml_poly = (
        "<Polygon><outerBoundaryIs><LinearRing><coordinates>"
        "0,0 4,0 4,4 0,4 0,0"
        "</coordinates></LinearRing></outerBoundaryIs>"
        "<innerBoundaryIs><LinearRing><coordinates>"
        "1,1 2,1 2,2 1,2 1,1"
        "</coordinates></LinearRing></innerBoundaryIs></Polygon>"
    )
    g = from_wkb(S.st_geomfromkml([kml_poly])[0].as_py())
    assert to_wkt(g) == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
    assert S.st_area([to_wkb(g)])[0].as_py() == pytest.approx(15.0)
    # Placemark wrapper + MultiGeometry, namespaced
    kml_multi = (
        '<kml xmlns="http://www.opengis.net/kml/2.2"><Placemark><MultiGeometry>'
        "<Point><coordinates>1,2</coordinates></Point>"
        "<Point><coordinates>3,4</coordinates></Point>"
        "</MultiGeometry></Placemark></kml>"
    )
    g = from_wkb(S.st_geomfromkml([kml_multi])[0].as_py())
    assert to_wkt(g) == "MULTIPOINT ((1 2), (3 4))"
    assert S.st_geomfromkml([None])[0].as_py() is None


def test_geomfromgml():
    gml2_pt = '<gml:Point xmlns:gml="http://www.opengis.net/gml"><gml:coordinates>1,2</gml:coordinates></gml:Point>'
    assert from_wkb(S.st_geomfromgml([gml2_pt])[0].as_py()) == Geometry.point(1, 2)
    gml3_pt = '<gml:Point xmlns:gml="http://www.opengis.net/gml"><gml:pos>5 6</gml:pos></gml:Point>'
    assert from_wkb(S.st_geomfromgml([gml3_pt])[0].as_py()) == Geometry.point(5, 6)
    gml3_line = (
        '<gml:LineString xmlns:gml="http://www.opengis.net/gml">'
        "<gml:posList>0 0 3 4 6 0</gml:posList></gml:LineString>"
    )
    g = from_wkb(S.st_geomfromgml([gml3_line])[0].as_py())
    assert to_wkt(g) == "LINESTRING (0 0, 3 4, 6 0)"
    gml2_poly = (
        '<gml:Polygon xmlns:gml="http://www.opengis.net/gml"><gml:outerBoundaryIs><gml:LinearRing>'
        "<gml:coordinates>0,0 4,0 4,4 0,4 0,0</gml:coordinates>"
        "</gml:LinearRing></gml:outerBoundaryIs></gml:Polygon>"
    )
    g = from_wkb(S.st_geomfromgml([gml2_poly])[0].as_py())
    assert to_wkt(g) == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    gml3_poly = (
        '<gml:Polygon xmlns:gml="http://www.opengis.net/gml"><gml:exterior><gml:LinearRing>'
        "<gml:posList srsDimension=\"2\">0 0 2 0 2 2 0 2 0 0</gml:posList>"
        "</gml:LinearRing></gml:exterior></gml:Polygon>"
    )
    g = from_wkb(S.st_geomfromgml([gml3_poly])[0].as_py())
    assert S.st_area([to_wkb(g)])[0].as_py() == pytest.approx(4.0)
    # unclosed ring is closed by the parser (JTS GMLReader leniency)
    gml_open = (
        '<gml:Polygon xmlns:gml="http://www.opengis.net/gml"><gml:exterior><gml:LinearRing>'
        "<gml:posList>0 0 2 0 2 2 0 2</gml:posList>"
        "</gml:LinearRing></gml:exterior></gml:Polygon>"
    )
    g = from_wkb(S.st_geomfromgml([gml_open])[0].as_py())
    assert S.st_area([to_wkb(g)])[0].as_py() == pytest.approx(4.0)
    multi = (
        '<gml:MultiPolygon xmlns:gml="http://www.opengis.net/gml">'
        "<gml:polygonMember><gml:Polygon><gml:exterior><gml:LinearRing>"
        "<gml:posList>0 0 1 0 1 1 0 1 0 0</gml:posList>"
        "</gml:LinearRing></gml:exterior></gml:Polygon></gml:polygonMember>"
        "<gml:polygonMember><gml:Polygon><gml:exterior><gml:LinearRing>"
        "<gml:posList>5 5 6 5 6 6 5 6 5 5</gml:posList>"
        "</gml:LinearRing></gml:exterior></gml:Polygon></gml:polygonMember>"
        "</gml:MultiPolygon>"
    )
    g = from_wkb(S.st_geomfromgml([multi])[0].as_py())
    assert to_wkt(g) == "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))"


def test_asgml_askml_roundtrip():
    from incubator_sedona_ray.geom.markup import from_gml, from_kml

    geoms = [
        Geometry.point(1.5, -2.25),
        Geometry.linestring([[0, 0], [3, 4], [6, 0]]),
        Geometry.box(0, 0, 4, 4),
        Geometry.polygon(
            [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]],
            holes=[[[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]]],
        ),
    ]
    for g in geoms:
        wkb = to_wkb(g)
        gml = S.st_asgml([wkb])[0].as_py()
        kml = S.st_askml([wkb])[0].as_py()
        assert gml.startswith("<gml:") and "xmlns:gml" in gml
        assert from_gml(gml) == g
        assert from_kml(kml) == g
    assert S.st_asgml([None])[0].as_py() is None
    # multi round-trip
    mp = from_wkb(S.st_geomfromkml(["<MultiGeometry><Point><coordinates>1,2</coordinates></Point><Point><coordinates>3,4</coordinates></Point></MultiGeometry>"])[0].as_py())
    assert from_kml(S.st_askml([to_wkb(mp)])[0].as_py()) == mp
    assert from_gml(S.st_asgml([to_wkb(mp)])[0].as_py()) == mp


class TestCatalogCompletion:
    def test_aliases(self):
        assert S.st_aswkb([PT])[0].as_py() == S.st_asbinary([PT])[0].as_py()
        assert S.st_aswkt([PT])[0].as_py() == "POINT (1 2)"
        assert from_wkb(S.st_geomfromtext(["POINT (5 6)"])[0].as_py()) == Geometry.point(5, 6)

    def test_typed_fromtext(self):
        assert from_wkb(S.st_pointfromtext(["1.0,2.0"])[0].as_py()) == Geometry.point(1, 2)
        g = from_wkb(S.st_linestringfromtext(["0.0,0.0,3.0,4.0"])[0].as_py())
        assert to_wkt(g) == "LINESTRING (0 0, 3 4)"
        assert S.st_linefromtext(["POINT (1 2)"])[0].as_py() is None
        g = from_wkb(S.st_linefromtext(["LINESTRING (0 0, 1 1)"])[0].as_py())
        assert to_wkt(g) == "LINESTRING (0 0, 1 1)"
        assert S.st_mpolyfromtext(["POINT (1 2)"])[0].as_py() is None
        g = from_wkb(S.st_mpolyfromtext(["MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))"], srid=4326)[0].as_py())
        assert g.kind == "MultiPolygon"
        assert S.st_mlinefromtext(["MULTILINESTRING ((0 0, 1 1))"])[0].as_py() is not None

    def test_ewkb_ewkt(self):
        g = Geometry.point(1, 2, srid=4326)
        from incubator_sedona_ray.geom.wkb import to_wkb as _towkb

        blob = _towkb(g)
        assert S.st_asewkt([blob])[0].as_py() == "POINT (1 2)"  # srid lost in plain WKB
        eblob = S.st_asewkb([S.st_setsrid([blob], 4326)[0].as_py()])[0].as_py()
        assert from_wkb(eblob).srid == 4326
        assert S.st_asewkt([S.st_setsrid([blob], 4326)[0].as_py()])[0].as_py() == "SRID=4326;POINT (1 2)"

    def test_degrees_dump_numpoints(self):
        assert S.st_degrees([np.pi])[0].as_py() == pytest.approx(180.0)
        pts = S.st_dumppoints([LINE])[0].as_py()
        assert len(pts) == 2 and from_wkb(pts[1]) == Geometry.point(3, 4)
        assert S.st_numpoints([LINE])[0].as_py() == 2
        assert S.st_numpoints([SQ])[0].as_py() is None

    def test_force_z(self):
        up = S.st_force3d([PT], z=5.0)[0].as_py()
        g = from_wkb(up)
        assert g.z == 5.0
        back = from_wkb(S.st_force_2d([up])[0].as_py())
        assert back.z is None and back == Geometry.point(1, 2)

    def test_isvalid(self):
        assert S.st_isvalid([SQ])[0].as_py() is True
        bowtie = to_wkb(Geometry("Polygon", [np.array([[0.0, 0.0], [2.0, 2.0], [2.0, 0.0], [0.0, 2.0], [0.0, 0.0]])]))
        assert S.st_isvalid([bowtie])[0].as_py() is False
        open_ring = to_wkb(Geometry("Polygon", [np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])]))
        assert S.st_isvalid([open_ring])[0].as_py() is False
        assert S.st_isvalid([LINE])[0].as_py() is True

    def test_geohash_s2(self):
        gh = S.st_geohash([to_wkb(Geometry.point(10.40744, 57.64911))], precision=6)[0].as_py()
        assert gh == "u4pruy"
        cells = S.st_s2cellids([SQ], level=8)[0].as_py()
        assert len(cells) >= 1 and all(isinstance(c, int) for c in cells)

    def test_transform_spheroid(self):
        out = S.st_transform([PT], "EPSG:4326", "EPSG:3857")
        g = from_wkb(out[0].as_py())
        x, y = g.all_coords()[0][:2]
        assert x == pytest.approx(111319.49, abs=1.0) and y == pytest.approx(222684.2, abs=1.0)
        d = S.st_distancespheroid([to_wkb(Geometry.point(0, 0))], [to_wkb(Geometry.point(1, 0))])[0].as_py()
        assert d == pytest.approx(111319.49, rel=1e-4)
        ln = S.st_lengthspheroid([to_wkb(Geometry.linestring([[0, 0], [1, 0], [2, 0]]))])[0].as_py()
        assert ln == pytest.approx(2 * 111319.49, rel=1e-4)

    def test_areaspheroid(self):
        # 1x1 degree box at the equator ~ 12364 km^2 (public reference value)
        box = to_wkb(Geometry.box(0, 0, 1, 1))
        a = S.st_areaspheroid([box])[0].as_py()
        assert a == pytest.approx(12364e6 * 1e3 / 1e3, rel=0.01)  # ~1.236e10 m^2


def test_geomfromgml_undeclared_prefix():
    # standalone fragment with no xmlns declaration (PostGIS-style leniency)
    frag = "<gml:Point><gml:coordinates>7,8</gml:coordinates></gml:Point>"
    assert from_wkb(S.st_geomfromgml([frag])[0].as_py()) == Geometry.point(7, 8)
