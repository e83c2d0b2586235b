"""Global row indexing — ``zipWithIndex`` semantics, DataFrame-first.

A training-data pipeline constantly needs a stable, dense, 0-based global
row id — for sharding, example numbering, and join-back after shuffling.
Spark has no scalable built-in: ``monotonically_increasing_id`` leaves
gaps between partitions, and ``row_number() OVER (ORDER BY ...)`` with no
PARTITION BY collapses the whole table into ONE window task — the
classic single-reducer cliff at 100 TB.

This operator composes the scalable two-pass idiom from built-in ops:

1. range-repartition + local sort on the order key (the same exchange a
   global ``orderBy`` performs — partition *p* holds keys strictly below
   partition *p+1*);
2. a tiny side job counts rows per physical partition (groupBy on
   ``spark_partition_id()`` — #partitions rows, not data rows);
3. a broadcast join maps each partition to its exclusive prefix-sum
   offset, and a window partitioned BY PARTITION ID adds the local rank.

No single-task stage ever sees more than one partition of data; the only
full-data movements are the range exchange (pass 1) and the hash exchange
on partition id for the window (narrow rows). The driver touches
#partitions integers, never rows.

The reference has no such operator (it has no global ordering at all —
SURVEY.md §2.1); this is part of the training-data-pipeline extension
surface mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

_PID = "_gidx_pid"
_OFFSET = "_gidx_offset"


def with_global_index(
    df: DataFrame,
    order_cols: list[str | Column],
    index_col: str = "row_index",
) -> DataFrame:
    """Append a dense 0-based ``index_col`` numbering rows by ``order_cols``
    (names or sort expressions like ``F.desc(...)``).

    ``order_cols`` must be a total order (include a unique tiebreak) for the
    index to be deterministic.
    """
    ranged = df.repartitionByRange(*order_cols).sortWithinPartitions(*order_cols)
    tagged = ranged.withColumn(_PID, F.spark_partition_id())

    counts = tagged.groupBy(_PID).agg(F.count(F.lit(1)).alias("_n"))
    w_off = W.orderBy(_PID).rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        _PID, F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias(_OFFSET)
    )
    # offsets is #partitions rows: the window above runs on one task over
    # a handful of integers, and the join below broadcasts them.
    w_local = W.partitionBy(_PID).orderBy(*order_cols)
    return (
        tagged.join(F.broadcast(offsets), _PID)
        .withColumn(
            index_col,
            (F.col(_OFFSET) + F.row_number().over(w_local) - 1).cast("long"),
        )
        .drop(_PID, _OFFSET)
    )


def with_shard(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    shard_col: str = "shard",
) -> DataFrame:
    """Stable shard assignment ``pmod(key, n_shards)`` for sharded training
    output (`df.write.partitionBy(shard_col)` → n_shards directories).

    Keyed on a column, not on physical placement, so the assignment
    survives repartitioning and reruns.
    """
    return df.withColumn(
        shard_col, F.pmod(F.col(key_col).cast("long"), F.lit(n_shards)).cast("int")
    )
