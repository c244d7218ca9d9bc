"""SpatialDataset — the SpatialRDD-shaped facade.

A thin wrapper giving users of the reference a familiar surface
(``core/.../spatialRDD/SpatialRDD.java``): ``analyze()``,
``spatial_partitioning()``, ``range_query``, ``knn``, ``join``,
``distance_join``, ``save_as_*`` — all delegating to the Ray-Data-native
operators. The wrapped object is always a plain ``ray.data.Dataset``; use
``.ds`` to drop down.
"""

from __future__ import annotations

import numpy as np
import ray

from .conf import DEFAULT_CONF, SpatialConf
from .geom.core import Geometry
from .join import knn_query as _knn_query, range_query as _range_query
from .join.spatial_join import distance_join as _distance_join, spatial_join as _spatial_join
from .partition.assign import fit_partitioner_from_dataset, make_assign_fn


class SpatialDataset:
    def __init__(self, ds, geom=("lon", "lat"), conf: SpatialConf = DEFAULT_CONF):
        self.ds = ds
        self.geom = geom
        self.conf = conf
        self.partitioner = None
        self._stats = None  # (count, boundary) after analyze()

    # -- SpatialRDD.analyze() -------------------------------------------
    def analyze(self) -> "SpatialDataset":
        from .partition.assign import dataset_envelope_stats

        if isinstance(self.geom, (tuple, list)):
            self._stats = dataset_envelope_stats(self.ds, self.geom[0], self.geom[1])
        else:
            self._stats = dataset_envelope_stats(self.ds, geom_col=self.geom)
        return self

    @property
    def approximate_total_count(self) -> int:
        if self._stats is None:
            self.analyze()
        return int(self._stats[0])

    @property
    def boundary_envelope(self):
        if self._stats is None:
            self.analyze()
        return self._stats[1]

    # -- SpatialRDD.spatialPartitioning() -------------------------------
    def spatial_partitioning(self, grid_type: str = "kdbtree", num_partitions: int = 16) -> "SpatialDataset":
        kw = (
            {"x_col": self.geom[0], "y_col": self.geom[1]}
            if isinstance(self.geom, (tuple, list))
            else {"geom_col": self.geom}
        )
        self.partitioner = fit_partitioner_from_dataset(
            self.ds, num_partitions, grid_type, seed=self.conf.seed, **kw
        )
        return self

    def partitioned(self):
        """Dataset with the exploded ``part_id`` column (the spatial shuffle
        key); requires spatial_partitioning() first."""
        if self.partitioner is None:
            raise RuntimeError("call spatial_partitioning() first")
        ref = ray.put(self.partitioner)
        kw = (
            {"x_col": self.geom[0], "y_col": self.geom[1]}
            if isinstance(self.geom, (tuple, list))
            else {"geom_col": self.geom}
        )
        return self.ds.map_batches(make_assign_fn(ref, **kw), batch_format="pyarrow")

    # -- operators -------------------------------------------------------
    def range_query(self, window: Geometry, predicate: str = "covers"):
        return _range_query(self.ds, window, predicate, geom=self.geom)

    def knn(self, query: Geometry, k: int, id_col: str | None = None):
        return _knn_query(self.ds, query, k, geom=self.geom, id_col=id_col)

    def join(self, other: "SpatialDataset", predicate: str = "intersects", **kw):
        return _spatial_join(
            self.ds, other.ds, predicate, left_geom=self.geom, right_geom=other.geom, conf=self.conf, **kw
        )

    def distance_join(self, other: "SpatialDataset", radius: float, **kw):
        return _distance_join(
            self.ds, other.ds, radius, left_geom=self.geom, right_geom=other.geom, conf=self.conf, **kw
        )

    # -- sinks (saveAsWKT / GeoParquet) ---------------------------------
    def save_as_wkt(self, path: str):
        from .sources.readers import write_wkt

        if isinstance(self.geom, (tuple, list)):
            raise ValueError("save_as_wkt needs a WKB geometry column")
        write_wkt(self.ds, path, self.geom)

    def save_as_geoparquet(self, path: str):
        from .sources.readers import write_geoparquet

        if isinstance(self.geom, (tuple, list)):
            self.ds.write_parquet(path)
        else:
            write_geoparquet(self.ds, path, geom_col=self.geom)
