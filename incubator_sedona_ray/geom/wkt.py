"""WKT parse / format (ST_GeomFromWKT / ST_AsText semantics).

Reference: ``common/.../Constructors.java:38`` (geomFromWKT via JTS
WKTReader) and ``Functions.java:267`` (asWKT). Formatting follows JTS
``WKTWriter`` conventions: uppercase tags, ``EMPTY`` for empty geometries,
coordinates as shortest round-trip decimal.
"""

from __future__ import annotations

import re

import numpy as np

from .core import Geometry, GeometryType

_NUM = r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?"


def from_wkt(text: str, srid: int = 0) -> Geometry:
    s = text.strip()
    m = re.match(r"^SRID=(\d+)\s*;\s*", s, re.I)
    if m:
        srid = int(m.group(1))
        s = s[m.end():]
    kind, body = _split_tag(s)
    if body.strip().upper() == "EMPTY":
        empty = {
            GeometryType.POINT: np.empty((0,)),
            GeometryType.LINESTRING: np.empty((0, 2)),
            GeometryType.MULTIPOINT: np.empty((0, 2)),
        }.get(kind, [])
        return Geometry(kind, empty, srid)
    inner = _strip_parens(body)
    if kind == GeometryType.POINT:
        return Geometry(kind, _parse_coord(inner), srid)
    if kind in (GeometryType.LINESTRING, GeometryType.MULTIPOINT):
        return Geometry(kind, _parse_coordseq(inner), srid)
    if kind == GeometryType.POLYGON:
        return Geometry(kind, [_parse_coordseq(_strip_parens(r)) for r in _split_parts(inner)], srid)
    if kind == GeometryType.MULTILINESTRING:
        return Geometry(kind, [_parse_coordseq(_strip_parens(r)) for r in _split_parts(inner)], srid)
    if kind == GeometryType.MULTIPOLYGON:
        polys = []
        for part in _split_parts(inner):
            rings = [_parse_coordseq(_strip_parens(r)) for r in _split_parts(_strip_parens(part))]
            polys.append(rings)
        return Geometry(kind, polys, srid)
    if kind == GeometryType.GEOMETRYCOLLECTION:
        return Geometry(kind, [from_wkt(part, srid) for part in _split_parts(inner)], srid)
    raise ValueError(f"cannot parse WKT kind {kind}")


def _split_tag(s: str) -> tuple[str, str]:
    m = re.match(r"^\s*([A-Za-z]+)\s*(.*)$", s, re.S)
    if not m:
        raise ValueError(f"bad WKT: {s[:40]!r}")
    tag = m.group(1).upper()
    kinds = {
        "POINT": GeometryType.POINT,
        "LINESTRING": GeometryType.LINESTRING,
        "POLYGON": GeometryType.POLYGON,
        "MULTIPOINT": GeometryType.MULTIPOINT,
        "MULTILINESTRING": GeometryType.MULTILINESTRING,
        "MULTIPOLYGON": GeometryType.MULTIPOLYGON,
        "GEOMETRYCOLLECTION": GeometryType.GEOMETRYCOLLECTION,
    }
    if tag not in kinds:
        raise ValueError(f"unknown WKT tag {tag}")
    return kinds[tag], m.group(2)


def _strip_parens(s: str) -> str:
    s = s.strip()
    if not s.startswith("("):
        return s
    depth = 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return s[1:i]
    raise ValueError("unbalanced parens in WKT")


def _split_parts(s: str) -> list[str]:
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p for p in (q.strip() for q in parts) if p]


def _parse_coord(s: str) -> np.ndarray:
    vals = [float(v) for v in re.findall(_NUM, s)]
    return np.array(vals[:2], dtype=np.float64)


def _parse_coordseq(s: str) -> np.ndarray:
    rows = []
    for part in s.split(","):
        # MULTIPOINT may wrap each coord in parens
        vals = [float(v) for v in re.findall(_NUM, part)]
        if vals:
            rows.append(vals[:2])
    return np.array(rows, dtype=np.float64)


# ---------------------------------------------------------------------------
# formatting
# ---------------------------------------------------------------------------

def _fmt(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def _fmt_coord(c) -> str:
    return f"{_fmt(c[0])} {_fmt(c[1])}"


def _fmt_seq(arr) -> str:
    return "(" + ", ".join(_fmt_coord(c) for c in np.asarray(arr).reshape(-1, 2)) + ")"


def to_wkt(g: Geometry) -> str:
    k, c = g.kind, g.coords
    tag = k.upper()
    if g.is_empty:
        return f"{tag} EMPTY"
    if k == GeometryType.POINT:
        return f"POINT ({_fmt_coord(c)})"
    if k == GeometryType.LINESTRING:
        return f"LINESTRING {_fmt_seq(c)}"
    if k == GeometryType.MULTIPOINT:
        return "MULTIPOINT (" + ", ".join(f"({_fmt_coord(p)})" for p in np.asarray(c).reshape(-1, 2)) + ")"
    if k == GeometryType.POLYGON:
        return "POLYGON (" + ", ".join(_fmt_seq(r) for r in c) + ")"
    if k == GeometryType.MULTILINESTRING:
        return "MULTILINESTRING (" + ", ".join(_fmt_seq(l) for l in c) + ")"
    if k == GeometryType.MULTIPOLYGON:
        return "MULTIPOLYGON (" + ", ".join("(" + ", ".join(_fmt_seq(r) for r in poly) + ")" for poly in c) + ")"
    if k == GeometryType.GEOMETRYCOLLECTION:
        return "GEOMETRYCOLLECTION (" + ", ".join(to_wkt(s) for s in c) + ")"
    raise ValueError(f"cannot format {k}")
