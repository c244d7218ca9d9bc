"""incubator_sedona_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch reimplementation of the query/data-processing capabilities of
Apache Sedona (reference: douglasdennis/incubator-sedona, surveyed in
SURVEY.md) expressed in the idiomatic Ray Data model:

* one logical table == one ``ray.data.Dataset``; blocks are Arrow tables
* geometry lives in plain ``float64`` coordinate columns on the hot path
  (points) or WKB ``binary`` columns (general geometries)
* every scalar ST_ function is a vectorized ``map_batches`` stage
* space partitioning (KDB / quadtree, Sedona semantics incl. +0.01 padding,
  half-open rectangles, boundary duplication, reference-point dedup) produces
  a ``part_id`` column; the spatial join is a tagged-union →
  ``groupby(part_id)`` → ``map_groups`` local index join
* small sides (polygon layers, indexes, partitioner trees) are broadcast
  once via ``ray.put``

No GEOS/Shapely/JTS dependency: the geometry kernel under ``geom/`` is pure
numpy and implements the subset of DE-9IM predicates, measures and
constructions the Sedona test surface exercises.
"""

__version__ = "0.1.0"

# primary API surface
from .conf import SpatialConf  # noqa: E402,F401
from .spatial_dataset import SpatialDataset  # noqa: E402,F401
from .join import (  # noqa: E402,F401
    broadcast_spatial_join,
    distance_join,
    knn_join,
    knn_query,
    range_query,
    spatial_join,
)
