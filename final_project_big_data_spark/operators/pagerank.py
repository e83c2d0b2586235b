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
    bounded_graph: bool = False,
) -> DataFrame:
    """Return (node, rank) after ``n_iter`` synchronous updates over the
    distinct directed edge set. Deterministic given the edge set.

    ``bounded_graph=True`` (round-12 optimization, guide §2.4) declares
    that the CALLER knows the edge set is size-bounded independent of
    the input volume (x05's is ≤2000 modulo-classed edges by
    construction): the per-iteration joins then broadcast the edge/deg/
    inflow sides, so the iterating rank frame never crosses an exchange
    and each round plans ONE tiny aggregation shuffle instead of three.
    Values are unchanged — the per-iteration ROUND(·, 10) already
    quantizes away accumulation-order ulps (the same ulps any partition
    -count change reorders). Default False: a graph that grows with the
    data must keep the shuffled joins (broadcasting it would OOM).

    The loop stays UNROLLED into one lazy plan: ``ranks`` is referenced
    exactly once per round (the step join below), so the logical tree
    grows LINEARLY with rounds and the registry's zero-jobs-at-build
    contract holds. (A round-12 interim used ``localCheckpoint(eager=False)`` per
    round to truncate lineage — reverted: under AQE even a lazy local
    checkpoint materializes every upstream query stage at BUILD time
    (``AdaptiveSparkPlanExec.getFinalPhysicalPlan`` runs the stage jobs),
    which both breaks the lazy-build contract and moves computation
    outside any caller's timed action. A production run over a DEEP
    many-round graph should still checkpoint every few rounds, as
    ``connected_components`` — an EAGER_BY_CONTRACT entry — does.)"""
    e = edges.select(src, dst).distinct()
    nodes = (
        e.select(F.col(src).alias("node"))
        .union(e.select(F.col(dst).alias("node")))
        .distinct()
    )
    deg = e.groupBy(src).agg(F.count(F.lit(1)).alias("deg"))
    nn = nodes.groupBy().agg(F.count(F.lit(1)).alias("n_nodes"))
    hint = F.broadcast if bounded_graph else (lambda df: df)

    # One constant STEP relation drives every round (round-12, guide
    # §2.4/§3.3): each real edge carries its source's out-degree, and a
    # degree-less self-loop per node keeps no-inflow groups alive — its
    # contribution is NULL, which sum() skips, reproducing the old
    # left-join + coalesce(inflow, 0) semantics addend-for-addend. The
    # rank update then needs ONE join + ONE aggregation per round
    # (previously: two joins, an aggregation, and a second merge join
    # against the nodes frame), ``ranks`` is still referenced exactly
    # once per round (linear plan growth), and because ``steps`` is the
    # IDENTICAL subtree in every round, physical planning reuses one
    # exchange/broadcast for all rounds instead of building a fresh
    # inflow broadcast per round.
    steps = (
        e.join(deg, src)
        .select(
            F.col(src).alias("_s"),
            F.col(dst).alias("_d"),
            F.col("deg").alias("_deg"),
            F.lit(True).alias("_real"),
        )
        .unionByName(
            nodes.select(
                F.col("node").alias("_s"),
                F.col("node").alias("_d"),
                F.lit(1).cast("long").alias("_deg"),
                F.lit(False).alias("_real"),
            )
        )
    )

    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", (F.lit(1.0) / F.col("n_nodes")).alias("rank")
    )
    teleport = F.lit(1.0 - damping) / F.col("n_nodes")
    contrib = F.when(F.col("_real"), F.col("rank") / F.col("_deg"))
    for _ in range(n_iter):
        ranks = (
            ranks.join(hint(steps), F.col("node") == F.col("_s"))
            .groupBy(F.col("_d").alias("node"))
            .agg(F.sum(contrib).alias("inflow"))
            .crossJoin(F.broadcast(nn))
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
