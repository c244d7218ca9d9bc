"""Broadcast join, kNN query/join, range query, distance join (SQL mode)."""

import numpy as np
import pandas as pd
import pytest
import ray

from incubator_sedona_ray.geom import Geometry
from incubator_sedona_ray.geom.wkb import to_wkb
from incubator_sedona_ray.join import (
    broadcast_spatial_join,
    distance_join,
    knn_join,
    knn_query,
    range_query,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def _points_df(n=400, seed=11):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "pid": np.arange(n),
            "lon": rng.uniform(0, 100, n),
            "lat": rng.uniform(0, 100, n),
        }
    )


def _zones_df():
    rows = []
    for bx in range(0, 100, 20):
        for by in range(0, 100, 20):
            rows.append({"zone_id": f"{bx}:{by}", "geom": to_wkb(Geometry.box(bx, by, bx + 20, by + 20))})
    return pd.DataFrame(rows)


def _expected_pairs(pts, zones_df):
    out = set()
    for _, z in zones_df.iterrows():
        bx, by = map(int, z.zone_id.split(":"))
        m = (pts.lon >= bx) & (pts.lon <= bx + 20) & (pts.lat >= by) & (pts.lat <= by + 20)
        for pid in pts.pid[m]:
            out.add((int(pid), z.zone_id))
    return out


def test_broadcast_inner_matches_bruteforce():
    pts = _points_df()
    zones = _zones_df()
    ds = ray.data.from_pandas(pts)
    out = broadcast_spatial_join(
        ds, zones, "covered_by", big_geom=("lon", "lat"), small_geom="geom", how="inner"
    ).to_pandas()
    got = set(zip(out.pid.astype(int), out.z_zone_id))
    assert got == _expected_pairs(pts, zones)


def test_broadcast_semi_anti_outer():
    pts = _points_df()
    # zones covering only the left half
    zones = _zones_df()
    zones = zones[zones.zone_id.str.startswith(("0:", "20:", "40:"))].reset_index(drop=True)
    ds = ray.data.from_pandas(pts)
    semi = broadcast_spatial_join(ds, zones, "covered_by", big_geom=("lon", "lat"), small_geom="geom", how="left_semi").to_pandas()
    anti = broadcast_spatial_join(ds, zones, "covered_by", big_geom=("lon", "lat"), small_geom="geom", how="left_anti").to_pandas()
    in_left = pts.lon <= 60.0
    assert set(semi.pid) == set(pts.pid[in_left])
    assert set(anti.pid) == set(pts.pid[~in_left])
    assert len(semi) + len(anti) == len(pts)
    outer = broadcast_spatial_join(ds, zones, "covered_by", big_geom=("lon", "lat"), small_geom="geom", how="left_outer").to_pandas()
    # every left row appears; unmatched rows carry null zone
    assert set(outer.pid) == set(pts.pid)
    assert set(outer.loc[outer.z_zone_id.isna(), "pid"]) == set(pts.pid[~in_left])


def test_broadcast_agrees_with_partitioned():
    pts = _points_df(300, seed=5)
    zones = _zones_df()
    ds = ray.data.from_pandas(pts)
    b = broadcast_spatial_join(ds, zones, "covered_by", big_geom=("lon", "lat"), small_geom="geom").to_pandas()
    from incubator_sedona_ray.join import spatial_join

    p = spatial_join(
        ray.data.from_pandas(zones),
        ds,
        "covers",
        left_geom="geom",
        right_geom=("lon", "lat"),
        num_partitions=4,
    ).to_pandas()
    assert set(zip(b.pid.astype(int), b.z_zone_id)) == set(zip(p.r_pid.astype(int), p.l_zone_id))


def test_knn_query_closed_form():
    # rings of 8 points at radii 1..10 around (50, 50) — F4 fixture style
    rows = []
    pid = 0
    for r in range(1, 11):
        for a in range(8):
            ang = 2 * np.pi * a / 8
            rows.append({"pid": pid, "lon": 50 + r * np.cos(ang), "lat": 50 + r * np.sin(ang), "ring": r})
            pid += 1
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = knn_query(ds, Geometry.point(50, 50), k=16, id_col="pid").to_pandas()
    assert len(out) == 16
    assert set(out.ring) == {1, 2}  # exactly the two innermost rings
    assert out.dist.is_monotonic_increasing


def test_knn_join_matches_bruteforce():
    pts = _points_df(500, seed=21)
    rng = np.random.default_rng(3)
    queries = pd.DataFrame(
        {"query_id": np.arange(5), "qx": rng.uniform(0, 100, 5), "qy": rng.uniform(0, 100, 5)}
    )
    ds = ray.data.from_pandas(pts).repartition(4)
    out = knn_join(ds, queries, k=7, right_geom=("lon", "lat"), right_id="pid").to_pandas()
    assert len(out) == 35
    for _, q in queries.iterrows():
        d = np.hypot(pts.lon - q.qx, pts.lat - q.qy)
        expect = set(pts.pid.iloc[np.argsort(d, kind="stable")[:7]])
        got = set(out.loc[out.query_id == q.query_id, "pid"])
        assert got == expect
        ranks = sorted(out.loc[out.query_id == q.query_id, "rank"])
        assert ranks == list(range(1, 8))


def test_range_query():
    pts = _points_df(300, seed=9)
    ds = ray.data.from_pandas(pts)
    win = Geometry.box(10, 10, 40, 40)
    out = range_query(ds, win, "covers", geom=("lon", "lat")).to_pandas()
    m = (pts.lon >= 10) & (pts.lon <= 40) & (pts.lat >= 10) & (pts.lat <= 40)
    assert set(out.pid) == set(pts.pid[m])


def test_distance_join_sql_semantics():
    a = pd.DataFrame({"aid": [0, 1], "lon": [0.0, 50.0], "lat": [0.0, 50.0]})
    b = pd.DataFrame({"bid": [0, 1, 2], "lon": [3.0, 50.0, 54.0], "lat": [4.0, 52.0, 50.0]})
    out = distance_join(
        ray.data.from_pandas(a),
        ray.data.from_pandas(b),
        radius=5.0,
        left_geom=("lon", "lat"),
        right_geom=("lon", "lat"),
        num_partitions=1,
    ).to_pandas()
    got = set(zip(out.l_aid, out.r_bid))
    # (0,0): dist 5 inclusive; (1,1): dist 2; (1,2): dist 4
    assert got == {(0, 0), (1, 1), (1, 2)}
    strict = distance_join(
        ray.data.from_pandas(a),
        ray.data.from_pandas(b),
        radius=5.0,
        inclusive=False,
        left_geom=("lon", "lat"),
        right_geom=("lon", "lat"),
        num_partitions=1,
    ).to_pandas()
    assert set(zip(strict.l_aid, strict.r_bid)) == {(1, 1), (1, 2)}


def test_auto_broadcast_matches_partitioned():
    from incubator_sedona_ray.conf import SpatialConf
    from incubator_sedona_ray.join import spatial_join

    pts = _points_df(300, seed=8)
    zones = _zones_df()
    zds = ray.data.from_pandas(zones)
    pds = ray.data.from_pandas(pts)

    def run(conf):
        out = spatial_join(
            zds, pds, "covers", left_geom="geom", right_geom=("lon", "lat"),
            num_partitions=4, conf=conf,
        ).to_pandas()
        return set(zip(out.l_zone_id, out.r_pid))

    part = run(SpatialConf(auto_broadcast_rows=0))
    auto = run(SpatialConf(auto_broadcast_rows=1000))  # zones side qualifies
    assert part == auto
    # and with the SMALL side on the right (points big, zones small = left)
    out2 = spatial_join(
        pds, zds, "covered_by", left_geom=("lon", "lat"), right_geom="geom",
        num_partitions=4, conf=SpatialConf(auto_broadcast_rows=1000),
    ).to_pandas()
    assert set(zip(out2.r_zone_id, out2.l_pid)) == part


def test_s2_cell_join_matches_bruteforce():
    from incubator_sedona_ray.join.cell_join import s2_cell_join

    # S2 cells are GEOGRAPHIC — keep the fixture on the real sphere
    rng = np.random.default_rng(14)
    n = 300
    pts = pd.DataFrame({"pid": np.arange(n), "lon": rng.uniform(-60, 60, n), "lat": rng.uniform(-60, 60, n)})
    zones = []
    for bx in range(-60, 60, 24):
        for by in range(-60, 60, 24):
            zones.append({"zone_id": f"{bx}:{by}", "geom": to_wkb(Geometry.box(bx, by, bx + 24, by + 24))})
    zones = pd.DataFrame(zones)
    expected = set()
    for _, z in zones.iterrows():
        bx, by = map(int, z.zone_id.split(":"))
        m = (pts.lon >= bx) & (pts.lon <= bx + 24) & (pts.lat >= by) & (pts.lat <= by + 24)
        expected |= {(int(p), z.zone_id) for p in pts.pid[m]}
    out = s2_cell_join(
        ray.data.from_pandas(zones),
        ray.data.from_pandas(pts),
        "covers",
        level=5,  # ~4.7-degree cells: coverings of 24-degree zones stay small
        left_geom="geom",
        right_geom=("lon", "lat"),
    ).to_pandas()
    assert set(zip(out.r_pid.astype(int), out.l_zone_id)) == expected


def test_broadcast_wkb_big_side():
    # big side carries POLYGON WKB (not points): envelope probe + general refine
    rng = np.random.default_rng(31)
    rows = []
    for i in range(200):
        x, y = rng.uniform(0, 96, 2)
        rows.append({"bid": i, "geom": to_wkb(Geometry.box(x, y, x + 4, y + 4))})
    big = pd.DataFrame(rows)
    zones = _zones_df()
    out = broadcast_spatial_join(
        ray.data.from_pandas(big), zones, "intersects", big_geom="geom", small_geom="geom", how="inner"
    ).to_pandas()
    # brute force
    expect = set()
    for _, r in big.iterrows():
        from incubator_sedona_ray.geom.wkb import from_wkb as _fw
        g = _fw(r.geom)
        for _, z in zones.iterrows():
            import incubator_sedona_ray.geom.predicates as PP
            if PP.intersects(g, _fw(z.geom)):
                expect.add((r.bid, z.zone_id))
    assert set(zip(out.bid, out.z_zone_id)) == expect


def test_knn_tie_at_cutoff_keeps_smallest_ids():
    """Rows tied at the k-th distance must resolve by smallest id, even when
    the tie group spans a local batch top-k cutoff (ADVICE regression)."""
    # 40 coincident points (exactly tied distance), ids shuffled across blocks
    n = 40
    rng = np.random.default_rng(3)
    perm = rng.permutation(n)
    pts = pd.DataFrame({"pid": np.arange(n)[perm], "lon": np.full(n, 5.0), "lat": np.zeros(n)})
    ds = ray.data.from_pandas([pts.iloc[:13], pts.iloc[13:26], pts.iloc[26:]])
    out = knn_query(ds, Geometry.point(0.0, 0.0), k=7, id_col="pid").to_pandas()
    assert sorted(out.pid) == list(range(7))
    # broadcast kNN join: same tie rule per query
    q = pd.DataFrame({"query_id": [0], "qx": [0.0], "qy": [0.0]})
    j = knn_join(ds, q, k=7, right_geom=("lon", "lat"), right_id="pid").to_pandas()
    assert sorted(j.pid) == list(range(7))


def test_partitioned_outer_semi_anti():
    """Partitioned-path left_outer/semi/anti (extension beyond the
    reference's broadcast-only non-inner joins): agreement with the
    broadcast planner on the same data."""
    from incubator_sedona_ray.join import spatial_join_outer

    pts = _points_df(300, seed=9)
    zones = _zones_df()
    zones = zones[zones.zone_id.str.startswith(("0:", "20:"))].reset_index(drop=True)  # left strip only
    zds = ray.data.from_pandas(zones)
    pds = ray.data.from_pandas(pts)
    in_strip = pts.lon <= 40.0

    semi = spatial_join_outer(
        pds, zds, "covered_by", left_id="pid", how="left_semi",
        left_geom=("lon", "lat"), right_geom="geom", num_partitions=4,
    ).to_pandas()
    anti = spatial_join_outer(
        pds, zds, "covered_by", left_id="pid", how="left_anti",
        left_geom=("lon", "lat"), right_geom="geom", num_partitions=4,
    ).to_pandas()
    assert set(semi.pid) == set(pts.pid[in_strip])
    assert set(anti.pid) == set(pts.pid[~in_strip])

    outer = spatial_join_outer(
        pds, zds, "covered_by", left_id="pid", how="left_outer",
        left_geom=("lon", "lat"), right_geom="geom", num_partitions=4,
    ).to_pandas()
    # every left point appears; unmatched rows carry null zone
    assert set(outer.l_pid) == set(pts.pid)
    assert set(outer.loc[outer.r_zone_id.isna(), "l_pid"]) == set(pts.pid[~in_strip])
    # matched rows equal the broadcast inner join
    bc = broadcast_spatial_join(pds, zones, "covered_by", big_geom=("lon", "lat"), small_geom="geom").to_pandas()
    assert set(zip(outer.dropna(subset=["r_zone_id"]).l_pid, outer.dropna(subset=["r_zone_id"]).r_zone_id)) == set(zip(bc.pid, bc.z_zone_id))


def test_partitioned_outer_empty_right():
    """Zero matches anywhere (empty right side): outer = all-left padded,
    semi = empty, anti = all-left (found by an empty-side probe)."""
    from incubator_sedona_ray.join import spatial_join_outer

    pts = _points_df(60, seed=2)
    empty_zones = _zones_df().iloc[0:0]
    pds = ray.data.from_pandas(pts)
    zds = ray.data.from_pandas(empty_zones)
    outer = spatial_join_outer(
        pds, zds, "covered_by", left_id="pid", how="left_outer",
        left_geom=("lon", "lat"), right_geom="geom", num_partitions=2,
    ).to_pandas()
    assert len(outer) == 60 and outer.r_zone_id.isna().all()
    semi = spatial_join_outer(
        pds, zds, "covered_by", left_id="pid", how="left_semi",
        left_geom=("lon", "lat"), right_geom="geom", num_partitions=2,
    )
    assert semi.count() == 0
    anti = spatial_join_outer(
        pds, zds, "covered_by", left_id="pid", how="left_anti",
        left_geom=("lon", "lat"), right_geom="geom", num_partitions=2,
    )
    assert anti.count() == 60


def test_poly_poly_fastpath_matches_bruteforce():
    """The vectorized polygon-x-polygon intersects/disjoint refine (fast
    path D: batch ring extraction + grouped vertex locate + segment
    crossing) must match the per-pair predicate evaluator on adversarial
    pairs: holes, shared edges/vertices, containment both ways, B inside
    A's hole, crossing a hole boundary."""
    import importlib

    from incubator_sedona_ray.geom import predicates as PP
    from incubator_sedona_ray.geom import wkb as wkbm

    SJ = importlib.import_module("incubator_sedona_ray.join.spatial_join")
    rng = np.random.default_rng(3)

    def rand_poly(cx, cy, r, nv=6, hole=False):
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        rad = rng.uniform(0.5 * r, r, nv)
        ring = np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])
        if hole:
            hr = 0.2 * r
            h = np.column_stack([cx + hr * np.cos(ang), cy + hr * np.sin(ang)])
            return Geometry.polygon(ring.tolist(), holes=[h[::-1].tolist()])
        return Geometry.polygon(ring.tolist())

    from incubator_sedona_ray.geom import GeometryType

    def rand_multi(cx, cy):
        def ring(px, py, r, nv):
            ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
            rad = rng.uniform(0.5 * r, r, nv)
            rr = np.column_stack([px + rad * np.cos(ang), py + rad * np.sin(ang)])
            return np.vstack([rr, rr[:1]])

        return Geometry(
            GeometryType.MULTIPOLYGON,
            [
                [ring(cx, cy, rng.uniform(0.5, 2.0), int(rng.integers(3, 7)))],
                [ring(cx + 6, cy, rng.uniform(0.5, 2.0), int(rng.integers(3, 7)))],
            ],
        )

    lpolys, rpolys = [], []
    for i in range(150):
        cx, cy = rng.uniform(-10, 10, 2)
        if i % 6 == 1:
            lpolys.append(rand_multi(cx, cy))
        else:
            lpolys.append(rand_poly(cx, cy, rng.uniform(0.5, 3.0), nv=int(rng.integers(3, 8)), hole=(i % 5 == 0)))
        dx, dy = rng.uniform(-2, 2, 2)
        if i % 4 == 2:
            rpolys.append(rand_multi(cx + dx, cy + dy))
        else:
            rpolys.append(rand_poly(cx + dx, cy + dy, rng.uniform(0.2, 4.0), nv=int(rng.integers(3, 8)), hole=(i % 7 == 0)))
    A = Geometry.polygon([[0, 0], [10, 0], [10, 10], [0, 10]], holes=[[[3, 3], [7, 3], [7, 7], [3, 7]]])

    def sq(x0, y0, x1, y1):
        return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)

    # multipolygon with one part inside A and one far outside: test-3's
    # per-part probe must still find the inside part
    Bm = Geometry(GeometryType.MULTIPOLYGON, [[sq(0.5, 0.5, 2, 2)], [sq(50, 50, 60, 60)]])
    Cm = Geometry(GeometryType.MULTIPOLYGON, [[sq(20, 20, 30, 30)], [sq(50, 50, 60, 60)]])
    lpolys += [A, Bm, A]
    rpolys += [Bm, A, Cm]
    for pair in [
        (A, Geometry.polygon([[4, 4], [6, 4], [6, 6], [4, 6]])),  # B inside A's hole
        (A, Geometry.polygon([[2, 2], [8, 2], [8, 8], [2, 8]])),  # crosses hole boundary
        (A, Geometry.polygon([[10, 0], [20, 0], [20, 10], [10, 10]])),  # shared edge
        (A, Geometry.polygon([[10, 10], [20, 10], [20, 20]])),  # shared vertex
        (A, Geometry.polygon([[-5, -5], [15, -5], [15, 15], [-5, 15]])),  # A inside B
        (Geometry.polygon([[4, 4], [6, 4], [6, 6], [4, 6]]), A),  # reversed
        (A, Geometry.polygon([[11, 11], [12, 11], [12, 12]])),  # fully disjoint
    ]:
        lpolys.append(pair[0])
        rpolys.append(pair[1])

    lw = [to_wkb(g) for g in lpolys]
    rw = [to_wkb(g) for g in rpolys]

    def mkside(ws):
        env = wkbm.envelopes_from_wkb(ws)
        return {
            "x": np.full(len(ws), np.nan), "y": np.full(len(ws), np.nan),
            "e": env, "ispt": np.zeros(len(ws), bool), "wkb": ws,
            "kind": wkbm.kinds_from_wkb(ws),
        }

    li = np.arange(len(lw))
    for pred in ("intersects", "disjoint"):
        lt, rt = mkside(lw), mkside(rw)
        got = SJ._pair_mask_predicate(lt, rt, li, li, pred)
        fn = PP.PREDICATES[pred]
        want = np.array([fn(lpolys[i], rpolys[i]) for i in range(len(lw))])
        np.testing.assert_array_equal(got, want)


def test_distance_refine_fastpath_matches_bruteforce():
    """Vectorized distance refine (point-polygon min-segment + grouped
    inside test, polygon-polygon intersects-or-min-segseg) must match the
    per-pair evaluator across mixed point/polygon/holed/multi rows."""
    import importlib

    from incubator_sedona_ray.geom import GeometryType
    from incubator_sedona_ray.geom import ops as gops
    from incubator_sedona_ray.geom import wkb as wkbm

    SJ = importlib.import_module("incubator_sedona_ray.join.spatial_join")
    rng = np.random.default_rng(17)

    def ring(cx, cy, r, nv):
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        rad = rng.uniform(0.5 * r, r, nv)
        rr = np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])
        return np.vstack([rr, rr[:1]])

    def rand_geom(i, cx, cy):
        k = i % 4
        if k == 0:
            return Geometry.point(cx, cy)
        if k == 1:
            return Geometry(GeometryType.POLYGON, [ring(cx, cy, rng.uniform(0.5, 2.0), int(rng.integers(3, 8)))])
        if k == 2:
            return Geometry(GeometryType.POLYGON, [ring(cx, cy, 2.0, 6), ring(cx, cy, 0.3, 6)[::-1]])
        return Geometry(GeometryType.MULTIPOLYGON, [[ring(cx, cy, 1.0, 5)], [ring(cx + 3, cy, 1.0, 5)]])

    lp, rp = [], []
    for i in range(300):
        cx, cy = rng.uniform(-10, 10, 2)
        dx, dy = rng.uniform(-4, 4, 2)
        lp.append(rand_geom(i, cx, cy))
        rp.append(rand_geom(i // 4, cx + dx, cy + dy))
    lw = [to_wkb(g) for g in lp]
    rw = [to_wkb(g) for g in rp]

    def mkside(ws, radius):
        env = wkbm.envelopes_from_wkb(ws)
        ispt = np.array([len(b) == 21 for b in ws]) & (radius == 0.0)
        return {
            "x": np.where(ispt, env[:, 0], np.nan), "y": np.where(ispt, env[:, 1], np.nan),
            "e": env, "ispt": ispt, "wkb": ws, "kind": wkbm.kinds_from_wkb(ws),
        }

    li = np.arange(len(lw))
    for radius in (0.5, 2.0):
        lt, rt = mkside(lw, radius), mkside(rw, radius)
        got = SJ._pair_mask_distance(lt, rt, li, li, radius, True)
        want = np.array([gops.distance(lp[i], rp[i]) <= radius for i in range(len(lw))])
        np.testing.assert_array_equal(got, want)


def test_point_to_wkb_polygons_dist_and_knn_wkb():
    """point_to_wkb_polygons_dist must equal ops.distance on polygon /
    holed / multi rows (NaN for lines/points -> per-row fallback), and
    knn_query over a WKB column must rank by those distances."""
    import importlib

    import pyarrow as pa

    from incubator_sedona_ray.geom import GeometryType
    from incubator_sedona_ray.geom import ops as gops
    from incubator_sedona_ray.geom import wkb as wkbm

    SJ = importlib.import_module("incubator_sedona_ray.join.spatial_join")
    rng = np.random.default_rng(23)

    def ring(cx, cy, r, nv):
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        rad = rng.uniform(0.5 * r, r, nv)
        rr = np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])
        return np.vstack([rr, rr[:1]])

    geoms = []
    for i in range(200):
        cx, cy = rng.uniform(-10, 10, 2)
        k = i % 5
        if k == 0:
            geoms.append(Geometry.point(cx, cy))
        elif k == 1:
            geoms.append(Geometry(GeometryType.POLYGON, [ring(cx, cy, rng.uniform(0.5, 2), int(rng.integers(3, 8)))]))
        elif k == 2:
            geoms.append(Geometry(GeometryType.POLYGON, [ring(cx, cy, 2.0, 6), ring(cx, cy, 0.3, 6)[::-1]]))
        elif k == 3:
            geoms.append(Geometry(GeometryType.MULTIPOLYGON, [[ring(cx, cy, 1, 5)], [ring(cx + 3, cy, 1, 5)]]))
        else:
            geoms.append(Geometry(GeometryType.LINESTRING, rng.uniform(-10, 10, (4, 2))))
    blobs = [wkbm.to_wkb(g) for g in geoms]
    qx, qy = 0.5, -0.25
    d = SJ.point_to_wkb_polygons_dist(pa.array(blobs, type=pa.binary()), qx, qy)
    q = Geometry.point(qx, qy)
    want = np.array([gops.distance(q, g) for g in geoms])
    m = ~np.isnan(d)
    assert m.sum() == 120  # the polygonal 3/5 of rows
    np.testing.assert_allclose(d[m], want[m], atol=1e-9)

    df = pd.DataFrame({"gid": np.arange(len(blobs)), "geom": blobs})
    out = knn_query(ray.data.from_pandas(df), q, 12, geom="geom", id_col="gid").to_pandas()
    np.testing.assert_allclose(
        np.sort(out.dist.to_numpy()), np.sort(want[np.argsort(want, kind="stable")[:12]]), atol=1e-9
    )


def test_s2_cell_join_poly_poly():
    """Cell join with polygons on BOTH sides (the refine dict needs the
    envelope key for fast path D's inside-test prefilter) must match the
    brute-force predicate."""
    import incubator_sedona_ray.geom.predicates as PP
    from incubator_sedona_ray.join.cell_join import s2_cell_join

    rng = np.random.default_rng(2)
    lrows, lg, rrows, rg = [], [], [], []
    for i in range(40):
        x, y = rng.uniform(-40, 40, 2)
        g = Geometry.box(x, y, x + 3, y + 3)
        lg.append(g)
        lrows.append({"aid": i, "geom": to_wkb(g)})
        x, y = rng.uniform(-40, 40, 2)
        g = Geometry.box(x, y, x + 4, y + 4)
        rg.append(g)
        rrows.append({"bid": i, "geom": to_wkb(g)})
    out = s2_cell_join(
        ray.data.from_pandas(pd.DataFrame(lrows)),
        ray.data.from_pandas(pd.DataFrame(rrows)),
        "intersects", level=8, left_geom="geom", right_geom="geom",
    ).to_pandas()
    got = set(zip(out.l_aid, out.r_bid))
    want = {(i, j) for i in range(40) for j in range(40) if PP.intersects(lg[i], rg[j])}
    assert got == want


def test_fast_path_join_never_materializes_blob_list():
    """VERDICT r02 #4: when every candidate pair is handled by the
    vectorized fast paths (polygon x point here), the WKB side must stay
    a LazyBlobs view — zero to_pylist calls."""
    import pyarrow as pa

    from incubator_sedona_ray.geom.wkb import LazyBlobs
    from incubator_sedona_ray.join.spatial_join import (
        _pair_mask_predicate,
        _side_fields,
        _wkb_kinds,
    )

    polys = [Geometry.box(i * 10.0, 0.0, i * 10.0 + 8.0, 8.0) for i in range(5)]
    lt_tbl = pa.table({"geom": [to_wkb(g) for g in polys]})
    rt_tbl = pa.table({"lon": [1.0, 11.0, 21.0, 99.0], "lat": [1.0, 1.0, 1.0, 99.0]})
    lt = _side_fields(lt_tbl, "geom")
    rt = _side_fields(rt_tbl, ("lon", "lat"))
    lt["kind"] = _wkb_kinds(lt["wkb"], lt_tbl.num_rows)
    rt["kind"] = _wkb_kinds(rt["wkb"], rt_tbl.num_rows)
    assert isinstance(lt["wkb"], LazyBlobs) and not lt["wkb"].materialized
    li = np.repeat(np.arange(5), 4)
    ri = np.tile(np.arange(4), 5)
    mask = _pair_mask_predicate(lt, rt, li, ri, "contains")
    got = {(int(a), int(b)) for a, b in zip(li[mask], ri[mask])}
    assert got == {(0, 0), (1, 1), (2, 2)}
    assert not lt["wkb"].materialized, "fast path should not build the python blob list"
