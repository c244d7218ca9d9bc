"""Engine configuration (defaults mirror ``core/.../utils/SedonaConf.java:51-66``)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class SpatialConf:
    use_index: bool = True                      # sedona.global.index
    index_type: str = "strtree"                 # sedona.global.indextype (quadtree|rtree) — we ship STR
    grid_type: str = "kdbtree"                  # sedona.join.gridtype
    index_build_side: str = "auto"              # sedona.join.indexbuildside (left) — auto = smaller group side
    partition_side: str = "left"                # sedona.join.spatitionside (dominant side for sampling)
    num_partitions: int = -1                    # sedona.join.numpartition (-1 = derive)
    auto_broadcast_threshold_bytes: int = 10 * 1024 * 1024  # sedona.join.autoBroadcastJoinThreshold
    # auto-broadcast when a side has <= this many rows (0 = off; the
    # reference's planner auto-broadcasts by size, JoinQueryDetector.scala:93-104)
    auto_broadcast_rows: int = 0
    sample_number: int = -1
    seed: int = 42
    target_rows_per_partition: int = 500_000    # scale guardrail for num_partitions derivation
    # skew: leaves with sample share > salt_threshold x mean are split into
    # hash salts (0 disables; see partition/salt.py). Applied automatically
    # when one join side is a plain point side.
    salt_threshold: float = 8.0
    salt_max: int = 16

    def derive_num_partitions(self, total_rows: int, current_blocks: int) -> int:
        if self.num_partitions > 0:
            return self.num_partitions
        by_rows = max(1, total_rows // self.target_rows_per_partition)
        # partitions <= records/2 guardrail (RDDSampleUtils.java:59-61)
        cap = max(1, (total_rows + 1) // 2)
        return int(min(max(by_rows, min(current_blocks, cap)), cap))


DEFAULT_CONF = SpatialConf()
