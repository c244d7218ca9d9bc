"""Joins / lookups (SURVEY.md §2.4).

* :mod:`.spatial_join` — partitioned range/predicate join + distance join
  (tagged-union -> groupby(part_id) -> map_groups local index join with
  reference-point dedup)
* :mod:`.broadcast`   — broadcast-index join (inner/semi/anti/left_outer),
  the no-shuffle path for big-table × small-polygon-layer
* :mod:`.knn`         — global kNN query + broadcast kNN join
* :mod:`.range_query` — spatial range filter (RangeQuery semantics)
"""

from .spatial_join import distance_join, spatial_join, spatial_join_count, spatial_join_outer  # noqa: F401
from .broadcast import broadcast_spatial_join  # noqa: F401
from .knn import knn_join, knn_query  # noqa: F401
from .range_query import range_query  # noqa: F401
