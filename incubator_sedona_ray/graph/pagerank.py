"""Distributed PageRank over a crawl/link graph — the canonical iterative
all-to-all workload (Page et al. 1999; the Common-Crawl host-level graph is
the web-scale instance of exactly this edge list).

EXACT FIXED-POINT ARITHMETIC: ranks are int64 "picoranks" (``scale`` =
10^12 per unit of probability mass) and every step is integer-only —
``r // out_degree`` per edge, order-independent integer sums, one shared
``(num * x) // den`` damping formula. Floating-point PageRank is
summation-order-dependent (a distributed groupby adds in nondeterministic
order), so no float implementation can be bit-compared against a SQL
engine; the fixed-point contract makes every iteration bit-equal to the
unrolled DuckDB oracle on any cluster size. The float ``rank`` column is a
single deterministic ``rank_fp / scale`` conversion at the end.

Distributed shape, per iteration (everything stays in the object store):

  contribs   hash join edges x ranks on src  -> (dst, r // deg)   [edge-sized]
  base rows  the static (node, deg) table with contrib 0 — unioned in so
             nodes with no in-links survive the groupby (no outer join)
  combine    groupby(node): Sum(contrib), Max(deg)  [deg >= 0 and only the
             base row carries it, so Max recovers it]   [node-sized]
  damp       map_batches: r' = base + (d_num * (s + dangling // n)) // d_den

The dangling mass (rank parked on zero-out-degree nodes) is a one-scalar
aggregate over the node-sized rank table per iteration, redistributed
uniformly — the standard PageRank completion. ``ranks`` is materialized
once per iteration to truncate lineage (node-sized, not edge-sized).

Both shuffles are keyed on the node id; skew follows in-degree (the web's
power law) — at 100 TB the hot-site fix is the same salting used by the
spatial joins (partial per-partition Sum before the global groupby is
already what Ray's groupby does map-side).

No counterpart in the reference repo (Sedona has no graph ops); the
operator comes from the north rule's Common-Crawl input shape.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def pagerank(
    edges,
    nodes,
    *,
    iters: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    num_partitions: int | None = None,
    n_nodes: int | None = None,
):
    """Dataset(node, rank_fp:int64, rank:float64) after ``iters`` rounds.

    ``edges``: Dataset(src, dst) int64 — multi-edges count multiply, the
    same contract as summing over ``regexp_extract_all`` matches.
    ``nodes``: Dataset(node) int64 — the full node universe (isolated
    nodes hold base rank and collect the dangling redistribution).
    """
    import ray
    from ray.data.aggregate import Count, Max, Sum

    from ..state.blocks import safe_hash_join

    if num_partitions is None:
        try:
            num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)
        except Exception:
            num_partitions = 4
    if n_nodes is None:
        n_nodes = nodes.count()
    if n_nodes <= 0:
        raise ValueError("pagerank needs a non-empty node set")

    base = ((damping_den - damping_num) * (scale // n_nodes)) // damping_den
    r0 = scale // n_nodes

    deg = (
        edges.select_columns([src_col])
        .groupby(src_col)
        .aggregate(Count(alias_name="deg"))
    )

    def deg_to_node(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                node_col: t[src_col].cast(pa.int64()),
                "deg": t["deg"].cast(pa.int64()),
            }
        )

    def zero_deg(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                node_col: t[node_col].cast(pa.int64()),
                "deg": pa.array([0] * n, type=pa.int64()),
            }
        )

    # node universe with out-degree: deg rows win over the 0-filled
    # universe rows via Max (deg >= 1 on any node that appears as a src)
    node_deg = (
        deg.map_batches(deg_to_node, batch_format="pyarrow")
        .union(nodes.map_batches(zero_deg, batch_format="pyarrow"))
        .groupby(node_col)
        .aggregate(Max("deg", alias_name="deg"))
        .materialize()
    )

    def seed(t: pa.Table) -> pa.Table:
        return t.append_column("r", pa.array([r0] * t.num_rows, type=pa.int64()))

    ranks = node_deg.map_batches(seed, batch_format="pyarrow").materialize()

    edges_slim = edges.select_columns([src_col, dst_col]).materialize()

    def contrib_fn(t: pa.Table) -> pa.Table:
        c = pc.divide(t["r"].cast(pa.int64()), t["deg"].cast(pa.int64()))
        return pa.table(
            {
                node_col: t[dst_col].cast(pa.int64()),
                "deg": pa.array([0] * t.num_rows, type=pa.int64()),
                "c": c.cast(pa.int64()),
            }
        )

    def base_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                node_col: t[node_col],
                "deg": t["deg"],
                "c": pa.array([0] * t.num_rows, type=pa.int64()),
            }
        )

    for _ in range(iters):
        dang_rows = ranks.map_batches(
            lambda t: pa.table(
                {
                    "d": pa.array(
                        [
                            pc.sum(
                                pc.if_else(
                                    pc.equal(t["deg"], 0),
                                    t["r"],
                                    pa.scalar(0, type=pa.int64()),
                                )
                            ).as_py()
                            or 0
                        ],
                        type=pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        )
        dangling = int(dang_rows.sum("d") or 0)
        redistribute = dangling // n_nodes

        joined = safe_hash_join(
            edges_slim,
            ranks,
            "inner",
            num_partitions,
            on=(src_col,),
            right_on=(node_col,),
            # both sides are iteration-reused materialized datasets, so the
            # empty-block scrub costs one cheap pass and protects against
            # the Ray 2.49 empty-first-block schema fault on small inputs
            scrub_left=True,
            scrub_right=True,
        )
        contribs = joined.map_batches(contrib_fn, batch_format="pyarrow").union(
            node_deg.map_batches(base_rows, batch_format="pyarrow")
        )

        def damp(t: pa.Table, _redist=redistribute) -> pa.Table:
            s = t["s"].cast(pa.int64())
            r = pc.add(
                pa.scalar(base, type=pa.int64()),
                pc.divide(
                    pc.multiply(
                        pa.scalar(damping_num, type=pa.int64()),
                        pc.add(s, pa.scalar(_redist, type=pa.int64())),
                    ),
                    pa.scalar(damping_den, type=pa.int64()),
                ),
            )
            return pa.table(
                {
                    node_col: t[node_col].cast(pa.int64()),
                    "deg": t["deg"].cast(pa.int64()),
                    "r": r,
                }
            )

        ranks = (
            contribs.groupby(node_col)
            .aggregate(Sum("c", alias_name="s"), Max("deg", alias_name="deg"))
            .map_batches(damp, batch_format="pyarrow")
            .materialize()
        )

    def finalize(t: pa.Table) -> pa.Table:
        r = t["r"].cast(pa.int64())
        return pa.table(
            {
                node_col: t[node_col],
                "rank_fp": r,
                "rank": pc.divide(r.cast(pa.float64()), pa.scalar(float(scale))),
            }
        )

    return ranks.map_batches(finalize, batch_format="pyarrow")
