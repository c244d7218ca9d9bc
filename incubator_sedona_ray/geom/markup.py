"""GML / KML geometry parsing (pure python, no GEOS/GeoTools).

Mirrors the reference's ST_GeomFromGML / ST_GeomFromKML constructors
(``common/.../Constructors.java:160-164``, which delegate to the JTS/GeoTools
GMLReader and KMLReader). Both formats are public OGC specs:

* KML 2.2: ``<coordinates>`` holds whitespace-separated tuples whose
  components are comma-separated ``lon,lat[,alt]``.
* GML 2: ``<gml:coordinates cs="," ts=" ">``; GML 3: ``<gml:pos>`` /
  ``<gml:posList>`` hold space-separated ``x y`` pairs.

Namespaces are ignored (tag local-name dispatch), matching the lenient
behavior of the JTS readers.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np

from .core import Geometry, GeometryType

__all__ = ["from_gml", "from_kml", "to_gml", "to_kml"]


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _find(el, name):
    for child in el.iter():
        if _local(child.tag) == name:
            return child
    return None


def _children(el, names):
    return [c for c in el if _local(c.tag) in names]


def _parse_coordinates(text: str) -> np.ndarray:
    """KML/GML2 <coordinates>: 'x,y[,z] x,y[,z] ...' -> (n, 2) float64."""
    pts = []
    for tok in (text or "").split():
        parts = tok.split(",")
        if len(parts) >= 2:
            pts.append((float(parts[0]), float(parts[1])))
    return np.asarray(pts, dtype=np.float64).reshape(-1, 2)


def _parse_poslist(text: str, dim: int = 2) -> np.ndarray:
    """GML3 <posList>: 'x1 y1 x2 y2 ...' -> (n, 2) float64 (extra
    dimensions beyond the first two are dropped)."""
    vals = [float(v) for v in (text or "").split()]
    if dim < 2:
        dim = 2
    arr = np.asarray(vals, dtype=np.float64).reshape(-1, dim)
    return arr[:, :2]


def _coords_of(el) -> np.ndarray:
    """Coordinate content of a GML/KML geometry element, whichever spec
    variant is present."""
    for child in el.iter():
        name = _local(child.tag)
        if name == "coordinates":
            return _parse_coordinates(child.text)
        if name == "posList":
            dim = int(child.get("srsDimension", 2) or 2)
            return _parse_poslist(child.text, dim)
        if name == "pos":
            return _parse_poslist(child.text, 2)
    raise ValueError(f"no coordinates in <{_local(el.tag)}>")


def _ring_coords(ring_parent) -> np.ndarray:
    ring = _find(ring_parent, "LinearRing")
    if ring is None:
        raise ValueError("boundary without LinearRing")
    c = _coords_of(ring)
    if len(c) >= 1 and not np.array_equal(c[0], c[-1]):
        c = np.vstack([c, c[:1]])
    return c


def _parse_polygon(el) -> list[np.ndarray]:
    """<Polygon> -> [exterior, hole, ...] ring list (GML2 outer/innerBoundaryIs,
    GML3 exterior/interior, identical KML tags)."""
    rings: list[np.ndarray] = []
    outer = None
    inners = []
    for child in el:
        name = _local(child.tag)
        if name in ("outerBoundaryIs", "exterior"):
            outer = _ring_coords(child)
        elif name in ("innerBoundaryIs", "interior"):
            inners.append(_ring_coords(child))
    if outer is None:  # bare <Polygon><LinearRing> leniency
        outer = _ring_coords(el)
    rings.append(outer)
    rings.extend(inners)
    return rings


_MULTI_TAGS = {
    "MultiGeometry",
    "MultiPoint",
    "MultiLineString",
    "MultiCurve",
    "MultiPolygon",
    "MultiSurface",
    "GeometryCollection",
}
_MEMBER_TAGS = {
    "geometryMember",
    "geometryMembers",
    "pointMember",
    "pointMembers",
    "lineStringMember",
    "curveMember",
    "curveMembers",
    "polygonMember",
    "surfaceMember",
    "surfaceMembers",
}
_GEOM_TAGS = {"Point", "LineString", "Curve", "Polygon", "Surface"} | _MULTI_TAGS


def _parse_geom(el) -> Geometry:
    name = _local(el.tag)
    if name == "Point":
        c = _coords_of(el)
        return Geometry.point(float(c[0, 0]), float(c[0, 1]))
    if name in ("LineString", "Curve"):
        return Geometry(GeometryType.LINESTRING, _coords_of(el))
    if name in ("Polygon", "Surface"):
        return Geometry(GeometryType.POLYGON, _parse_polygon(el))
    if name in _MULTI_TAGS:
        parts: list[Geometry] = []
        for child in el:
            cname = _local(child.tag)
            if cname in _MEMBER_TAGS:
                parts.extend(_parse_geom(g) for g in child if _local(g.tag) in _GEOM_TAGS)
            elif cname in _GEOM_TAGS:
                parts.append(_parse_geom(child))
        kinds = {p.kind for p in parts}
        if kinds == {GeometryType.POINT}:
            return Geometry(GeometryType.MULTIPOINT, np.vstack([p.all_coords() for p in parts]))
        if kinds == {GeometryType.LINESTRING}:
            return Geometry(GeometryType.MULTILINESTRING, [p.coords for p in parts])
        if kinds == {GeometryType.POLYGON}:
            return Geometry(GeometryType.MULTIPOLYGON, [p.coords for p in parts])
        return Geometry(GeometryType.GEOMETRYCOLLECTION, parts)
    raise ValueError(f"unsupported geometry element <{name}>")


def _parse_markup(text: str) -> Geometry:
    root = ET.fromstring(text)
    if _local(root.tag) in _GEOM_TAGS:
        return _parse_geom(root)
    # wrapper document (e.g. <Placemark>): first geometry element inside
    for el in root.iter():
        if _local(el.tag) in _GEOM_TAGS:
            return _parse_geom(el)
    raise ValueError("no geometry element found")


def from_gml(text: str) -> Geometry:
    """GML 2/3 fragment -> Geometry (ST_GeomFromGML). Fragments with an
    UNDECLARED ``gml:`` prefix (common when stored standalone in a column)
    are retried with the prefixes stripped — PostGIS/JTS leniency."""
    try:
        return _parse_markup(text)
    except ET.ParseError:
        import re

        stripped = re.sub(r"(</?)[A-Za-z_][\w.-]*:", r"\1", text)
        return _parse_markup(stripped)


def from_kml(text: str) -> Geometry:
    """KML geometry fragment -> Geometry (ST_GeomFromKML)."""
    return _parse_markup(text)


# -- writers (ST_AsGML / ST_AsKML, Functions.java:324,328) -------------------

def _fmt(v: float) -> str:
    return repr(float(v))  # shortest round-trip decimal


def _coord_text(coords: np.ndarray) -> str:
    return " ".join(f"{_fmt(x)},{_fmt(y)}" for x, y in np.asarray(coords).reshape(-1, 2))


def _rings_of(g: Geometry) -> list[np.ndarray]:
    c = g.coords
    return [np.asarray(r) for r in c] if isinstance(c, list) else [np.asarray(c)]


def _write(g: Geometry, pre: str, outer: str, inner: str, multi_wrap: bool) -> str:
    k = g.kind
    if k == GeometryType.POINT:
        x, y = g.all_coords()[0][:2]
        return f"<{pre}Point><{pre}coordinates>{_fmt(x)},{_fmt(y)}</{pre}coordinates></{pre}Point>"
    if k == GeometryType.LINESTRING:
        return f"<{pre}LineString><{pre}coordinates>{_coord_text(g.coords)}</{pre}coordinates></{pre}LineString>"
    if k == GeometryType.POLYGON:
        rings = _rings_of(g)
        parts = [
            f"<{pre}{outer}><{pre}LinearRing><{pre}coordinates>{_coord_text(rings[0])}"
            f"</{pre}coordinates></{pre}LinearRing></{pre}{outer}>"
        ]
        for r in rings[1:]:
            parts.append(
                f"<{pre}{inner}><{pre}LinearRing><{pre}coordinates>{_coord_text(r)}"
                f"</{pre}coordinates></{pre}LinearRing></{pre}{inner}>"
            )
        return f"<{pre}Polygon>" + "".join(parts) + f"</{pre}Polygon>"
    # Multi* / collections: KML wraps everything in MultiGeometry; GML uses
    # per-type containers with geometryMember leniency on read
    members = "".join(_write(p, pre, outer, inner, multi_wrap) for p in g.parts())
    if multi_wrap:
        return f"<{pre}MultiGeometry>{members}</{pre}MultiGeometry>"
    tag = {
        GeometryType.MULTIPOINT: "MultiPoint",
        GeometryType.MULTILINESTRING: "MultiLineString",
        GeometryType.MULTIPOLYGON: "MultiPolygon",
    }.get(k, "MultiGeometry")
    members = "".join(
        f"<{pre}geometryMember>{_write(p, pre, outer, inner, multi_wrap)}</{pre}geometryMember>"
        for p in g.parts()
    )
    return f"<{pre}{tag}>{members}</{pre}{tag}>"


def to_gml(g: Geometry) -> str:
    """Geometry -> GML 2 fragment (gml: prefix + namespace declaration,
    outer/innerBoundaryIs)."""
    s = _write(g, "gml:", "outerBoundaryIs", "innerBoundaryIs", multi_wrap=False)
    head, rest = s.split(">", 1)
    return f'{head} xmlns:gml="http://www.opengis.net/gml">{rest}'


def to_kml(g: Geometry) -> str:
    """Geometry -> KML geometry fragment (unprefixed, MultiGeometry)."""
    return _write(g, "", "outerBoundaryIs", "innerBoundaryIs", multi_wrap=True)
