"""Iterative graph operators beyond connected components
(operators/dedup.py:dedup_clusters): weighted PageRank.

PageRank is normally hopeless to oracle-check across engines — every
implementation sums floating-point contributions in its own order. This
one is **integer-scaled**: ranks live as BIGINTs scaled by ``scale``
(default 10⁹), every transition is integer multiply → integer floor
division, and the damping mix is exact rational arithmetic
(``damping_num/damping_den``). Integer addition is associative, so the
result is bit-identical under any partitioning AND in any engine — the
DuckDB oracle replays the same fixed iteration count with ``//``
arithmetic. The quantization error vs true PageRank is O(iterations /
scale) per node — documented semantics, not noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iterations: int = 8,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**9,
    checkpoint_every: int = 0,
) -> DataFrame:
    """Weighted PageRank over a directed edge list (symmetrize first
    for undirected graphs), integer-scaled for determinism.

    Per iteration: ONE equi-join of the node-sized rank frame against
    the checkpointed edge list on ``src`` and ONE groupBy(``dst``) sum
    — the classic distributed formulation, O(edges) shuffle per
    iteration with map-side partial sums. Iterations stay LAZY: each
    rank generation references the previous exactly once, so lineage
    grows linearly (unlike dedup_clusters' 3x-per-pass jump join) and
    a fixed-iteration run needs NO per-iteration materialization
    (measured at sf0.1: fully lazy is ~1.5x faster than per-iteration
    checkpointing — the whole run is ONE job AQE schedules stage by
    stage). ``checkpoint_every`` (default 0 = never) bounds plan
    depth/optimizer time for runs of tens of iterations. The driver sees
    only the node count; ranks never leave the cluster.

    Every node must appear as a source (true after symmetrization —
    no dangling-mass redistribution is needed or implemented).

    Returns (node, rank_scaled BIGINT, rank DOUBLE = scaled/scale).
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty edge list")
    outw = edges.groupBy(src).agg(
        F.sum(F.col(weight).cast("long")).alias("ow")
    )
    e = (
        edges.join(outw, src)
        .select(
            F.col(src).alias("e_src"),
            F.col(dst).alias("e_dst"),
            F.col(weight).cast("long").alias("w"),
            F.col("ow"),
        )
        .localCheckpoint()
    )
    base = ((damping_den - damping_num) * scale) // (damping_den * n)
    r = nodes.select(
        "node", F.lit(scale // n).cast("long").alias("r")
    )
    for i in range(iterations):
        contrib = (
            e.join(r, e["e_src"] == r["node"])
            .select(
                F.col("e_dst").alias("c_node"),
                F.expr("(r * w) div ow").alias("c"),
            )
            .groupBy("c_node")
            .agg(F.sum("c").alias("s"))
        )
        r = nodes.join(
            contrib, nodes["node"] == contrib["c_node"], "left"
        ).select(
            "node",
            (
                F.lit(base)
                + F.expr(
                    f"({damping_num} * coalesce(s, 0L)) div {damping_den}"
                )
            ).cast("long").alias("r"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            r = r.localCheckpoint()
    return r.select(
        "node",
        F.col("r").alias("rank_scaled"),
        (F.col("r").cast("double") / F.lit(float(scale))).alias("rank"),
    )
