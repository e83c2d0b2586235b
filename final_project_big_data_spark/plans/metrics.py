"""Zero-cost pipeline observability via ``DataFrame.observe``.

At 100 TB, "how many rows survived the quality filter?" must not cost a
second scan: ``observe`` attaches named aggregate metrics to the plan
itself, computed incrementally by the running job and published when the
action finishes — one pass, no extra shuffle, no ``count()`` side jobs.
The reference has no observability at all (its jobs print nothing but
Spark's own logs); this is the engine-level replacement for the
count-and-log pattern that silently doubles a pipeline's IO.

Batch: read metrics from the returned ``Observation`` after any action.
Streaming: the same ``observe`` call surfaces per-batch metrics on
``StreamingQueryProgress.observedMetrics`` (used by the streaming
pipeline's monitoring hook).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed(
    df: DataFrame, name: str, *metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach named metrics to ``df``'s plan; returns (df, observation).

    ``observation.get`` blocks until the FIRST action on the returned
    frame completes, then yields ``{alias: value}``. Metrics must be
    aggregates over the observed frame (count/sum/min/max/...);
    non-deterministic or windowed expressions are rejected by Spark.
    """
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def curation_metrics(df: DataFrame) -> tuple[DataFrame, Observation]:
    """Standard corpus-pipeline counters: rows seen, null-text rows, and
    total characters — the triple every ingest stage should publish.
    Attach BEFORE filters so the metrics describe the raw input and the
    filter's selectivity is (rows_out / rows_in) across two stages.
    """
    return observed(
        df,
        "curation_input",
        F.count(F.lit(1)).alias("rows_in"),
        F.sum(F.col("text").isNull().cast("long")).alias("null_text"),
        F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("total_chars"),
    )
