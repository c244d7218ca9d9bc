#!/usr/bin/env python
"""Co-location mining example — the reference's flagship RDD walkthrough
(``examples/spark-rdd-colocation-mining/ScalaExample.scala:146-167``,
traced in SURVEY.md §3.1) re-expressed on this engine.

Workflow: two point layers (here: geocoded documents split into "shops"
and "users" by id parity) -> distance join within a radius -> count
co-located pairs per shop -> top co-location hotspots.

Run standalone:

    python examples/colocation_mining.py [sf_dir]

or submit as a Ray job:

    ray job submit --working-dir . -- python examples/colocation_mining.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa

import ray


def colocation_pipeline(sf_dir: str, radius: float = 15.0):
    """Returns a Dataset of (shop doc_id, n co-located users), descending."""
    from incubator_sedona_ray.join import spatial_join
    from incubator_sedona_ray.text.geocode import geocode_docs_batch

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    pts = docs.map_batches(geocode_docs_batch, batch_format="pyarrow")

    def split(parity):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"]
            import pyarrow.compute as pc

            keep = pc.equal(pc.bit_wise_and(ids, 1), parity)
            return batch.filter(keep)

        return fn

    shops = pts.map_batches(split(0), batch_format="pyarrow")
    users = pts.map_batches(split(1), batch_format="pyarrow")

    # one spatial shuffle: KDB-partitioned distance join (boundary known)
    joined = spatial_join(
        shops,
        users,
        radius=radius,
        left_geom=("lon", "lat"),
        right_geom=("lon", "lat"),
        lprefix="shop_",
        rprefix="user_",
        boundary=(-180.0, -90.0, 180.0, 90.0),
        num_partitions=max(8, int(ray.cluster_resources().get("CPU", 8))),
    )
    counts = joined.groupby("shop_doc_id").count()
    return counts.sort("count()", descending=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)
    top = colocation_pipeline(sf_dir).limit(10).to_pandas()
    print(top.to_string(index=False))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
