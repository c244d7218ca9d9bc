"""GeometryCollection support: the vectorized join refine (fast path E,
join/spatial_join.py) must agree exactly with the GC-aware generic
evaluator (geom/predicates.py) — and neither may crash — on collection
operands, incl. nested collections, Multi* children and empty parts.

Reference semantics: JTS decomposes collections for intersects/disjoint
(``Geometry.intersects``); relate-family predicates throw in JTS, so the
engine extends them with the documented part-decomposition formulas
(``common/.../Functions.java:466,641`` rely on overlay ops that DO accept
collections, which is what mixed-type GeoJSON layers hit in practice)."""

import numpy as np
import pyarrow as pa
import pytest

import importlib

import incubator_sedona_ray.geom.predicates as P

# the join package re-exports spatial_join the FUNCTION under the module's
# dotted name — load the module explicitly
SJ = importlib.import_module("incubator_sedona_ray.join.spatial_join")
from incubator_sedona_ray.geom import wkb as W
from incubator_sedona_ray.geom.core import Geometry, GeometryType

GC = GeometryType.GEOMETRYCOLLECTION


def gc(*parts):
    return Geometry(GC, list(parts), 0)


def _geoms_left():
    sq = Geometry.polygon([(0, 0), (4, 0), (4, 4), (0, 4)])
    east = Geometry.polygon([(10, 0), (14, 0), (14, 4), (10, 4)])
    tri = Geometry.polygon([(2, 2), (6, 2), (4, 6)])
    ln = Geometry.linestring([(0, 5), (5, 5)])
    pt = Geometry.point(7.0, 7.0)
    return [
        gc(sq, east),                          # two disjoint polygons
        gc(sq, pt, ln),                        # mixed-type collection
        gc(gc(sq), gc(east, gc(pt))),          # nested collections
        gc(Geometry(GeometryType.MULTIPOLYGON, [sq.coords, east.coords], 0)),
        sq,                                    # plain polygon (control)
        gc(tri),                               # single-part collection
    ]


def _geoms_right():
    return [
        Geometry.point(1.0, 1.0),              # inside sq
        Geometry.point(11.0, 1.0),             # inside east
        Geometry.point(0.0, 0.0),              # on sq corner
        Geometry.point(50.0, 50.0),            # far away
        Geometry.polygon([(1, 1), (2, 1), (2, 2), (1, 2)]),   # inside sq
        Geometry.polygon([(3, 1), (11, 1), (11, 3), (3, 3)]), # spans sq+gap+east
        Geometry.linestring([(1, 1), (3, 3)]),                # inside sq
        gc(Geometry.point(1.0, 1.0), Geometry.point(11.0, 1.0)),  # GC both sides
        gc(Geometry.polygon([(1, 1), (2, 1), (2, 2), (1, 2)])),
    ]


def _side_from_geoms(geoms):
    blobs = [W.to_wkb(g) for g in geoms]
    tbl = pa.table({"geom": pa.array(blobs, type=pa.binary())})
    side = SJ._side_fields(tbl, "geom")
    side["kind"] = SJ._wkb_kinds(side["wkb"], tbl.num_rows)
    return side


PREDS = [
    "intersects",
    "disjoint",
    "covers",
    "contains",
    "within",
    "covered_by",
    "touches",
    "equals",
]


@pytest.mark.parametrize("predicate", PREDS)
def test_kernel_matches_generic_on_collections(predicate):
    L = _geoms_left()
    R = _geoms_right()
    lt = _side_from_geoms(L)
    rt = _side_from_geoms(R)
    li, ri = np.meshgrid(np.arange(len(L)), np.arange(len(R)), indexing="ij")
    li, ri = li.ravel(), ri.ravel()
    got = SJ._pair_mask_predicate(lt, rt, li, ri, predicate)
    fn = P.PREDICATES[predicate]
    want = np.array([fn(L[i], R[j]) for i, j in zip(li, ri)])
    bad = np.nonzero(got != want)[0]
    assert not len(bad), [
        (int(li[b]), int(ri[b]), bool(got[b]), bool(want[b])) for b in bad
    ]


def test_kernel_no_per_row_fallback_for_collections(monkeypatch):
    """Collection pairs whose parts have vectorized kernels (polygonal /
    point parts) must NEVER reach the per-row generic evaluator — the
    explode path routes every part pair through fast paths A-D. (Line
    parts still use the generic path, exactly as non-collection lines
    do.)"""
    calls = []

    def make_spy(name, orig):
        def wrapped(a, b):
            calls.append(name)
            return orig(a, b)

        return wrapped

    # the generic rest-loop resolves the predicate through P.PREDICATES —
    # wrap every entry so any per-pair scalar evaluation is observable
    for name, fn in list(P.PREDICATES.items()):
        monkeypatch.setitem(P.PREDICATES, name, make_spy(name, fn))
    sq = Geometry.polygon([(0, 0), (4, 0), (4, 4), (0, 4)])
    east = Geometry.polygon([(10, 0), (14, 0), (14, 4), (10, 4)])
    L = [
        gc(sq, east),
        gc(gc(sq), gc(east)),
        gc(Geometry(GeometryType.MULTIPOLYGON, [sq.coords, east.coords], 0)),
        gc(sq, Geometry.point(7.0, 7.0)),
    ]
    R = [Geometry.point(1.0, 1.0), Geometry.point(50.0, 50.0)]
    lt = _side_from_geoms(L)
    rt = _side_from_geoms(R)
    li, ri = np.meshgrid(np.arange(len(L)), np.arange(len(R)), indexing="ij")
    for pred in ("covers", "contains", "intersects", "disjoint"):
        SJ._pair_mask_predicate(lt, rt, li.ravel(), ri.ravel(), pred)
    assert calls == []


def test_empty_collection_semantics():
    empty = gc()
    sq = Geometry.polygon([(0, 0), (4, 0), (4, 4), (0, 4)])
    lt = _side_from_geoms([empty])
    rt = _side_from_geoms([sq])
    z = np.zeros(1, dtype=np.int64)
    assert not SJ._pair_mask_predicate(lt, rt, z, z, "intersects")[0]
    assert SJ._pair_mask_predicate(lt, rt, z, z, "disjoint")[0]
    assert not SJ._pair_mask_predicate(lt, rt, z, z, "covers")[0]
    assert not SJ._pair_mask_predicate(rt, lt, z, z, "covers")[0]


def test_collection_parts_wkb_flattens_nested():
    sq = Geometry.polygon([(0, 0), (1, 0), (1, 1), (0, 1)])
    pt = Geometry.point(5.0, 5.0)
    nested = gc(gc(sq), gc(pt, gc()))
    parts = W.collection_parts_wkb(W.to_wkb(nested))
    kinds = [W.from_wkb(b).kind for b in parts]
    assert kinds == [GeometryType.POLYGON, GeometryType.POINT]
    # non-collection blob -> itself
    assert W.collection_parts_wkb(W.to_wkb(sq)) == [W.to_wkb(sq)]


def test_join_with_collection_windows(ray_session):
    """End-to-end: partitioned spatial join with GEOMETRYCOLLECTION window
    rows matches the brute-force generic evaluation."""
    import ray

    from incubator_sedona_ray.join import spatial_join

    rng = np.random.default_rng(7)
    xs = rng.uniform(0, 20, 300)
    ys = rng.uniform(0, 20, 300)
    pts_tbl = pa.table(
        {
            "pid": pa.array(np.arange(300), pa.int64()),
            "x": pa.array(xs),
            "y": pa.array(ys),
        }
    )
    windows = []
    for i in range(6):
        x0, y0 = (i % 3) * 6.0, (i // 3) * 9.0
        a = Geometry.polygon([(x0, y0), (x0 + 4, y0), (x0 + 4, y0 + 4), (x0, y0 + 4)])
        b = Geometry.polygon(
            [(x0 + 1, y0 + 5), (x0 + 3, y0 + 5), (x0 + 3, y0 + 8), (x0 + 1, y0 + 8)]
        )
        windows.append(gc(a, b) if i % 2 == 0 else gc(gc(a), b))
    win_tbl = pa.table(
        {
            "wid": pa.array(np.arange(len(windows)), pa.int64()),
            "geom": pa.array([W.to_wkb(g) for g in windows], pa.binary()),
        }
    )
    joined = spatial_join(
        ray.data.from_arrow(win_tbl),
        ray.data.from_arrow(pts_tbl).repartition(4),
        "covers",
        left_geom="geom",
        right_geom=("x", "y"),
        num_partitions=4,
        boundary=(0.0, 0.0, 20.0, 20.0),
    ).to_pandas()
    got = sorted(zip(joined["l_wid"], joined["r_pid"]))
    want = sorted(
        (int(w), int(p))
        for w, gw in enumerate(windows)
        for p in range(300)
        if P.covers(gw, Geometry.point(xs[p], ys[p]))
    )
    assert got == want and len(want) > 0


def test_boolean_ops_on_collections():
    """intersection/union/difference accept GeometryCollection operands
    (the reference's Functions.java:466,641 overlay semantics) — exact
    areas on disjoint-part collections."""
    import incubator_sedona_ray.geom.ops as OPS
    import incubator_sedona_ray.geom.triangulate as T

    sq = Geometry.polygon([(0, 0), (4, 0), (4, 4), (0, 4)])
    east = Geometry.polygon([(6, 0), (9, 0), (9, 3), (6, 3)])
    coll = gc(sq, east)
    other = Geometry.polygon([(2, 2), (8, 2), (8, 8), (2, 8)])
    assert OPS.area(T.intersection(coll, other)) == 6.0
    assert OPS.area(T.union(coll, other)) == 55.0
    assert OPS.area(T.difference(coll, other)) == 19.0
    assert OPS.area(coll) == 25.0
