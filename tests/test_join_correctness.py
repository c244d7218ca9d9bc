"""Port of the reference's JoinQueryCorrectnessChecker synthetic world
(core/src/test/.../spatialOperator/JoinQueryCorrectnessChecker.java:139-183):

10x10 grid of cells; per cell two duplicate 5x5 window polygons (ids a:/b:),
plus inside/overlapping/outside polygons, linestrings and
inside/on-boundary/outside points. Every window must match exactly its own
cell's a: and b: objects; outside sets must produce zero pairs.

Parameterized over {kdbtree, quadtree} like the reference (:105-112).
``considerBoundaryIntersection=false`` == predicate "covers",
``=true`` == "intersects" (JudgementBase match semantics).
"""

import numpy as np
import pandas as pd
import pytest
import ray

from incubator_sedona_ray.conf import SpatialConf
from incubator_sedona_ray.geom import Geometry
from incubator_sedona_ray.geom.wkb import to_wkb
from incubator_sedona_ray.join import spatial_join


def make_square(minx, miny, side):
    return Geometry.polygon(
        [[minx, miny], [minx + side, miny], [minx + side, miny + side], [minx, miny + side], [minx, miny]]
    )


def make_square_line(minx, miny, side):
    return Geometry.linestring([[minx, miny], [minx + side, miny], [minx + side, miny + side]])


def _world():
    windows, rows = [], {k: [] for k in [
        "inside_poly", "overlap_poly", "outside_poly",
        "inside_line", "overlap_line", "outside_line",
        "inside_point", "boundary_point", "outside_point",
    ]}
    for bx in range(0, 100, 10):
        for by in range(0, 100, 10):
            cid = f"{bx}:{by}"
            for p in ("a", "b"):
                uid = f"{p}:{cid}"
                windows.append({"zone_id": uid, "geom": to_wkb(make_square(bx, by, 5))})
                rows["inside_poly"].append({"obj_id": uid, "geom": to_wkb(make_square(bx + 2, by + 2, 2))})
                rows["overlap_poly"].append({"obj_id": uid, "geom": to_wkb(make_square(bx + 3, by + 3, 3))})
                rows["outside_poly"].append({"obj_id": uid, "geom": to_wkb(make_square(bx + 6, by + 6, 3))})
                rows["inside_line"].append({"obj_id": uid, "geom": to_wkb(make_square_line(bx + 2, by + 2, 2))})
                rows["overlap_line"].append({"obj_id": uid, "geom": to_wkb(make_square_line(bx + 3, by + 3, 3))})
                rows["outside_line"].append({"obj_id": uid, "geom": to_wkb(make_square_line(bx + 6, by + 6, 3))})
                rows["inside_point"].append({"obj_id": uid, "lon": bx + 2.5, "lat": by + 2.5})
                rows["boundary_point"].append({"obj_id": uid, "lon": bx + 5.0, "lat": by + 5.0})
                rows["outside_point"].append({"obj_id": uid, "lon": bx + 6.0, "lat": by + 6.0})
    return windows, rows


WINDOWS, OBJECTS = _world()


def _verify(pairs: pd.DataFrame):
    """verifyJoinResults (:396-420): every one of the 200 windows matched
    exactly the {a:id, b:id} pair of its own cell."""
    assert len(pairs) == 400
    grouped = pairs.groupby("l_zone_id")["r_obj_id"].apply(set)
    assert len(grouped) == 200
    for zone_id, objs in grouped.items():
        cell = zone_id.split(":", 1)[1]
        assert objs == {f"a:{cell}", f"b:{cell}"}, (zone_id, objs)


def _run(grid, obj_key, predicate, radius=None, circle=False):
    conf = SpatialConf(grid_type=grid)
    win_ds = ray.data.from_pandas(pd.DataFrame(WINDOWS))
    objs = OBJECTS[obj_key]
    obj_ds = ray.data.from_pandas(pd.DataFrame(objs))
    right_geom = ("lon", "lat") if "lon" in objs[0] else "geom"
    joined = spatial_join(
        win_ds,
        obj_ds,
        predicate,
        left_geom="geom",
        right_geom=right_geom,
        num_partitions=4,
        conf=conf,
        radius=radius,
        circle=circle,
    )
    return joined.select_columns(["l_zone_id", "r_obj_id"]).to_pandas()


GRIDS = ["kdbtree", "quadtree"]


@pytest.mark.parametrize("grid", GRIDS)
@pytest.mark.usefixtures("ray_session")
class TestJoinWorld:
    def test_inside_point(self, grid):
        _verify(_run(grid, "inside_point", "covers"))

    def test_boundary_point(self, grid):
        _verify(_run(grid, "boundary_point", "covers"))

    def test_outside_point(self, grid):
        assert len(_run(grid, "outside_point", "covers")) == 0

    def test_inside_polygon(self, grid):
        _verify(_run(grid, "inside_poly", "covers"))

    def test_overlap_polygon_intersects(self, grid):
        _verify(_run(grid, "overlap_poly", "intersects"))

    def test_outside_polygon(self, grid):
        assert len(_run(grid, "outside_poly", "covers")) == 0

    def test_inside_line(self, grid):
        _verify(_run(grid, "inside_line", "covers"))

    def test_overlap_line_intersects(self, grid):
        _verify(_run(grid, "overlap_line", "intersects"))

    def test_outside_line(self, grid):
        assert len(_run(grid, "outside_line", "covers")) == 0

    def test_distance_join_inside_polygon(self, grid):
        # CircleRDD(windows, 0.1) vs inside polygons, considerBoundary=false
        _verify(_run(grid, "inside_poly", "covers", radius=0.1, circle=True))

    def test_distance_join_overlap_polygon(self, grid):
        _verify(_run(grid, "overlap_poly", "intersects", radius=0.1, circle=True))


@pytest.mark.usefixtures("ray_session")
def test_grouped_and_count_outputs():
    """SpatialJoinQuery grouped/count semantics over the flat join."""
    win_ds = ray.data.from_pandas(pd.DataFrame(WINDOWS))
    obj_ds = ray.data.from_pandas(pd.DataFrame(OBJECTS["inside_point"]))
    joined = spatial_join(
        win_ds, obj_ds, "covers", left_geom="geom", right_geom=("lon", "lat"), num_partitions=4
    )
    counts = joined.groupby("l_zone_id").count().to_pandas()
    assert len(counts) == 200
    assert (counts["count()"] == 2).all()


@pytest.mark.usefixtures("ray_session")
def test_lineal_container_contains_covers():
    """contains/covers with a LineString container must NOT be trivially
    false: a point lying on a line's interior is contained by it (ADVICE
    regression — the point-false shortcut may only fire when the point is
    the container)."""
    from incubator_sedona_ray.geom import Geometry
    from incubator_sedona_ray.geom.wkb import to_wkb
    from incubator_sedona_ray.join import broadcast_spatial_join

    lines = pd.DataFrame(
        {
            "line_id": ["diag", "flat"],
            "geom": [
                to_wkb(Geometry.linestring([(0.0, 0.0), (10.0, 10.0)])),
                to_wkb(Geometry.linestring([(0.0, 5.0), (10.0, 5.0)])),
            ],
        }
    )
    pts = pd.DataFrame(
        {
            "pid": [0, 1, 2, 3],
            "lon": [2.0, 5.0, 0.0, 9.0],
            "lat": [2.0, 5.0, 5.0, 1.0],
        }
    )
    # pid0 on diag interior; pid1 on both (diag midpoint + flat interior);
    # pid2 at flat's START VERTEX (boundary: covers yes, contains no);
    # pid3 on neither.
    pts_ds = ray.data.from_pandas(pts)
    for how in ("partitioned", "broadcast"):
        if how == "broadcast":
            cov = broadcast_spatial_join(
                pts_ds, lines, "covered_by", big_geom=("lon", "lat"), small_geom="geom"
            ).to_pandas()
            got_cov = set(zip(cov.pid.astype(int), cov.z_line_id))
        else:
            lines_ds = ray.data.from_pandas(lines)
            cov = spatial_join(
                lines_ds, pts_ds, "covers", left_geom="geom", right_geom=("lon", "lat"),
                num_partitions=2,
            ).to_pandas()
            got_cov = set(zip(cov.r_pid.astype(int), cov.l_line_id))
    expected_cov = {(0, "diag"), (1, "diag"), (1, "flat"), (2, "flat")}
    assert got_cov == expected_cov

    lines_ds = ray.data.from_pandas(lines)
    cont = spatial_join(
        lines_ds, pts_ds, "contains", left_geom="geom", right_geom=("lon", "lat"),
        num_partitions=2,
    ).to_pandas()
    got_cont = set(zip(cont.r_pid.astype(int), cont.l_line_id))
    # pid2 sits on flat's boundary endpoint -> covers but NOT contains
    assert got_cont == {(0, "diag"), (1, "diag"), (1, "flat")}
