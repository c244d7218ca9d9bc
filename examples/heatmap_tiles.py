#!/usr/bin/env python
"""Viz pipeline example — geocoded documents rendered to heatmap PNG tiles
(the reference's HeatMap walkthrough, SURVEY.md §3.3), plus the scatter /
choropleth variants over the same data.

    python examples/heatmap_tiles.py [sf_dir] [out_dir]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/heatmap_tiles"
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)

    from incubator_sedona_ray.raster.tile import heatmap_counts
    from incubator_sedona_ray.raster.viz import render_tiles
    from incubator_sedona_ray.text.geocode import geocode_docs_batch

    WORLD = (-180.0, -90.0, 180.0, 90.0)
    pts = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"]).map_batches(
        geocode_docs_batch, batch_format="pyarrow"
    )
    hm = heatmap_counts(pts, WORLD, 256, 128, 4, 4)
    tiles = render_tiles(hm, 256, 128, 4, 4, blur_radius=1)

    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for batch in tiles.iter_batches(batch_format="pyarrow"):
        for tid, png in zip(batch["tile_id"].to_pylist(), batch["png"].to_pylist()):
            with open(os.path.join(out_dir, f"tile_{tid}.png"), "wb") as fh:
                fh.write(png)
            n += 1
    print(f"wrote {n} heatmap tiles to {out_dir}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
