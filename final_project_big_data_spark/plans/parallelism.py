"""Parallelism-floor rewrite.

A parquet scan's partition count is ⌈bytes / maxPartitionBytes⌉ — a small
input (one file, one row group) becomes ONE task, and everything pipelined
above it (md5 chains, regexes, array math) runs on one core while the rest
idle. ``widen`` inserts a round-robin repartition to the session's default
parallelism, but only when the scan is narrower than the core count — on a
real cluster reading many splits it is a no-op, so the same plan serves
local fixtures and 100 TB inputs. The repartition shuffles the *raw* rows
once, which is worth it exactly when the downstream per-row compute
dominates — callers apply it only on compute-heavy pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen(df: DataFrame) -> DataFrame:
    """Round-robin repartition up to default parallelism iff the plan is
    currently narrower. No-op (returns ``df``) when already wide enough."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
