"""Fixed-iteration PageRank, DataFrame-native.

The second iterative graph operator beside connected components
(``operators/components.py``, d07). One Lloyd-style synchronous update per
iteration:

    rank'(v) = (1-d)/N + d · Σ_{u→v} rank(u) / outdeg(u)

expressed as two co-partitioned equi-joins (ranks⋈edges on src, +outdeg)
and one hash aggregate on dst per iteration — every stage shuffles on a
vertex key, nothing is global, so the plan scales with executors exactly
like any keyed aggregation. Dangling-node mass is dropped (the common
simplified form; redistributing it is one extra 1-row aggregate).

Ranks are rounded to 10 decimal places after every update on BOTH engines
(the oracle mirrors it): the inflow sum is floating-point
accumulation-order dependent, and without per-iteration quantization the
engines' last-ulp drift compounds across iterations.

For a handful of iterations the loop unrolls into one lazy plan (registry
builders must not run jobs at build time); a production run over a deep
graph would ``localCheckpoint`` each iteration to truncate lineage, as
``connected_components`` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Return (node, rank) after ``n_iter`` synchronous updates over the
    distinct directed edge set. Deterministic given the edge set."""
    e = edges.select(src, dst).distinct()
    nodes = (
        e.select(F.col(src).alias("node"))
        .union(e.select(F.col(dst).alias("node")))
        .distinct()
    )
    deg = e.groupBy(src).agg(F.count(F.lit(1)).alias("deg"))
    nn = nodes.groupBy().agg(F.count(F.lit(1)).alias("n_nodes"))

    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", (F.lit(1.0) / F.col("n_nodes")).alias("rank")
    )
    teleport = F.lit(1.0 - damping) / F.col("n_nodes")
    for _ in range(n_iter):
        inflow = (
            e.join(ranks.withColumnRenamed("node", src), src)
            .join(deg, src)
            .groupBy(dst)
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("inflow"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(nn))
            .join(inflow.withColumnRenamed(dst, "node"), "node", "left")
            .select(
                "node",
                F.round(
                    teleport
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0)),
                    10,
                ).alias("rank"),
            )
        )
    return ranks
