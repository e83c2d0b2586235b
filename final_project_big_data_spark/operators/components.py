"""Connected components by iterative min-label propagation.

The missing step between near-dup *pair* generation (LSH/Jaccard/cosine)
and actually deduplicating a corpus: pairs form a graph, and each document
keeps the minimum doc_id of its component as the canonical representative.

Spark shape: a driver-side loop of joins — each iteration sends every
node's current label across the (symmetrized) edge list and takes the min.
Converges in O(graph diameter) iterations; dup clusters are shallow (stars
/ short chains), so 3-5 iterations cover real corpora. Each iteration is
one shuffle join + one aggregation — at 100 TB this is the standard
iterate-until-fixpoint pattern (persist the frontier, checkpoint lineage
every few rounds); for adversarially deep graphs switch to the
large-star/small-star variant (O(log n) rounds), same building blocks.

Oracle: DuckDB ``WITH RECURSIVE`` reachability (queries/dedup.py d07).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "a",
    dst_col: str = "b",
    max_iter: int = 20,
) -> DataFrame:
    """Return (id, cluster_id) where cluster_id = min node id reachable.

    ``nodes``: one column ``id_col``; ``edges``: undirected pairs
    (``src_col``, ``dst_col``). Isolated nodes keep their own id.
    """
    # caching pins the physical partitioning (AQE cannot re-coalesce a
    # cached plan), so choose it explicitly: hash-partition both working
    # sets on their join keys at defaultParallelism width. Every loop join
    # is then co-partitioned (zero extra exchange) and no stage inherits a
    # foreign session's 200-partition default. Duplicate edges are NOT
    # deduped — min-propagation is idempotent and a distinct() would cost
    # a full (src,dst) shuffle per run for no semantic gain.
    n_parts = nodes.sparkSession.sparkContext.defaultParallelism

    sym = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
    sym = sym.repartition(n_parts, "src").persist()

    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("label")
    ).repartition(n_parts, "id").persist()

    for _ in range(max_iter):
        msgs = (
            sym.join(labels, sym.src == labels.id)
            .select(F.col("dst").alias("id"), "label")
        )
        new_labels = (
            labels.select("id", "label")
            .union(msgs)
            .repartition(n_parts, "id")
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    # materialize + truncate the iterative lineage before releasing the
    # cache (otherwise the first action on the result replays every round)
    out = labels.select("id", F.col("label").alias("cluster_id")).localCheckpoint(
        eager=True
    )
    labels.unpersist()
    return out
