#!/usr/bin/env python
"""`ray job submit` entry point for the flagship pages pipeline.

The north-rule launch path: run the read -> geocode -> S2 -> PIP join ->
tile pipeline as a Ray JOB against a fixed-size cluster, writing
tile-partitioned checkpointed parquet so a killed job RESUMES (completed
tiles are skipped via their `_SUCCESS` markers + manifest lineage).

    ray job submit --working-dir . -- \
        python scripts/run_flagship_job.py --input /data/pages/*.parquet \
        --out /data/out/flagship

Local smoke (single node):

    python scripts/run_flagship_job.py \
        --input /root/testdata/sf0.001/documents.parquet --out /tmp/flagship_job

Re-running with the same --out prints which tiles were skipped (resume).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet path/glob of the documents table")
    ap.add_argument("--out", required=True, help="output dir (tile-partitioned, resumable)")
    ap.add_argument("--s2-level", type=int, default=10)
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--tiles", type=int, default=8)
    args = ap.parse_args()

    # `ray job submit` provides the cluster; standalone runs init locally
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)

    from incubator_sedona_ray.pipelines.pages import run_flagship_checkpointed

    t0 = time.time()
    docs = ray.data.read_parquet(args.input)
    manifest = run_flagship_checkpointed(
        docs, args.out, s2_level=args.s2_level, res=args.res, tiles=args.tiles
    )
    wall = time.time() - t0
    completed = manifest.get("completed", [])
    skipped = manifest.get("skipped_resume", [])
    print(
        json.dumps(
            {
                "out": args.out,
                "wall_s": round(wall, 2),
                "partitions_completed": len(completed),
                "partitions_skipped_resume": len(skipped),
                "manifest": os.path.join(args.out, "manifest.json"),
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
