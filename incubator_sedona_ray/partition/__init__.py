"""Space partitioning — the spatial shuffle keys (SURVEY.md §2.8).

Driver-side sample → fit a KDB-tree / quadtree → broadcast → vectorized
``assign_partitions`` map_batches stage producing an exploded ``part_id``
column. Semantics replicated from the reference where they affect join
output (SURVEY.md §7.0): +0.01 max-edge padding
(``SpatialRDD.java:247-249``), half-open rectangles for points
(``HalfOpenRectangle.java:26-48``), boundary-object duplication for extended
geometries, reference-point dedup extents.
"""

from .base import SpatialPartitioner, get_sample_count  # noqa: F401
from .kdb import KDBTree  # noqa: F401
from .quadtree import QuadTree, equal_grid  # noqa: F401
from .assign import fit_partitioner_from_dataset, make_assign_fn  # noqa: F401
